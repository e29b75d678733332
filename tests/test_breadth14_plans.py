"""Plan-shape assertions for the round-5 second-wave queries
(breadth14): the retrieval/mixing/quality passes must keep their
documented scale properties, not just their oracle hashes."""

from __future__ import annotations

from light_etl_windows_container_poc_spark.plans import (
    assert_broadcast_join, assert_no_python_udf, assert_reads_only_columns,
    assert_single_shuffle, formatted_plan)
from light_etl_windows_container_poc_spark.queries import QUERIES

_DOC_COLS = {"doc_id", "text", "lang", "source", "n_chars"}
_EVENT_COLS = {"event_id", "ts", "user_id", "event_type", "value", "props"}
_LINEITEM_COLS = {"l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
                  "l_quantity", "l_extendedprice", "l_discount", "l_tax",
                  "l_returnflag", "l_linestatus", "l_shipdate"}


def test_new_queries_prune_scan_columns(spark, sf_dir):
    """Every wave's scan must request only the columns it uses — a 100 TB
    scan that reads `text` for a zone map (or `props` for OHLC) is
    wrong regardless of the result hash."""
    cases = [
        ("bm25_search", _DOC_COLS, {"doc_id", "text"}),
        ("text_word_entropy", _DOC_COLS, {"doc_id", "text"}),
        ("mad_outliers", _DOC_COLS, {"doc_id", "source", "n_chars"}),
        ("token_budget_mix", _DOC_COLS, {"source", "text"}),
        ("dup_source_overlap", _DOC_COLS, {"text", "source"}),
        ("zonemap_stats", _LINEITEM_COLS,
         {"l_orderkey", "l_shipdate", "l_extendedprice"}),
        ("market_basket_lift", _LINEITEM_COLS,
         {"l_orderkey", "l_partkey"}),
        ("ohlc_bars", _EVENT_COLS,
         {"event_type", "ts", "event_id", "value"}),
        ("event_transitions", _EVENT_COLS,
         {"user_id", "event_type", "ts", "event_id"}),
        ("seasonality_dow", _EVENT_COLS, {"event_type", "ts", "value"}),
        ("daily_anomaly_mad", _EVENT_COLS, {"event_type", "ts"}),
        ("quantile_bands_daily", _EVENT_COLS, {"event_type", "ts", "value"}),
        ("journey_trigrams", _EVENT_COLS,
         {"user_id", "event_type", "ts", "event_id"}),
        ("first_touch_attribution", _EVENT_COLS,
         {"user_id", "event_type", "ts", "event_id"}),
    ]
    for name, table_cols, allowed in cases:
        assert_reads_only_columns(QUERIES[name](spark, sf_dir),
                                  table_cols, allowed)


def test_bm25_topk_is_take_ordered_and_stats_broadcast(spark, sf_dir):
    """The scored relation scales with |matching docs|: top-k must be the
    distributed TakeOrderedAndProject (the trailing rank window runs over
    the 20-row limit result only), and the df/corpus-stats sides must
    ride broadcasts, never shuffle the postings stream."""
    df = QUERIES["bm25_search"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "TakeOrderedAndProject" in plan
    assert_broadcast_join(df, min_count=2)
    assert_no_python_udf(df)


def test_mad_outliers_percentile_sides_broadcast(spark, sf_dir):
    # both per-source percentile relations (|sources| rows) broadcast back
    # onto the document stream — the docs never shuffle
    assert_broadcast_join(QUERIES["mad_outliers"](spark, sf_dir),
                          min_count=2)


def test_zonemap_single_aggregation(spark, sf_dir):
    # one map-side-combined agg + the output orderBy: two exchanges max
    assert_single_shuffle(QUERIES["zonemap_stats"](spark, sf_dir),
                          max_exchanges=2)


def test_token_budget_mix_scalar_broadcast(spark, sf_dir):
    assert_broadcast_join(QUERIES["token_budget_mix"](spark, sf_dir),
                          min_count=1)


def test_entropy_and_perplexity_stay_jvm_side(spark, sf_dir):
    for name in ("text_word_entropy", "lm_perplexity_filter"):
        assert_no_python_udf(QUERIES[name](spark, sf_dir))


def test_robust_scale_stats_broadcast(spark, sf_dir):
    # the dim-row median/IQR relation broadcasts onto the cell stream
    df = QUERIES["embed_robust_scale"](spark, sf_dir)
    assert_broadcast_join(df, min_count=1)
    assert_no_python_udf(df)


def test_ohlc_single_exchange(spark, sf_dir):
    """Both row_number windows and the bar aggregation share the
    (event_type, bucket) keys: one shuffle of the events stream plus the
    output orderBy — nothing else."""
    assert_single_shuffle(QUERIES["ohlc_bars"](spark, sf_dir),
                          max_exchanges=2)


def test_rfm_no_global_windows(spark, sf_dir):
    """Quintiles come from broadcast exact-quantile cut points + a CASE
    ladder: the FINAL plan must contain no window operator at all (the
    old global ntile collapsed the |users| relation onto ONE task,
    three times; the cut relations are materialized separately by
    exact_quantile_cuts and enter this plan as a checkpointed 1-row
    scan), and the cuts ride a broadcast join."""
    df = QUERIES["user_rfm"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "Window" not in plan, "global window reintroduced in user_rfm"
    assert "ntile" not in plan
    assert_broadcast_join(df, min_count=1)
    assert_no_python_udf(df)


def test_event_transitions_row_totals_broadcast(spark, sf_dir):
    assert_broadcast_join(QUERIES["event_transitions"](spark, sf_dir),
                          min_count=1)


def test_hybrid_rrf_both_leg_topk_distributed(spark, sf_dir):
    """Both ranking legs cut to depth with TakeOrderedAndProject; the
    query vector rides a broadcast. The cosine leg's candidates are the
    per-batch GEMM (MapInPandas — ann_bruteforce_topk's round-6 scale
    shape), so the only allowed Python node is that candidate stage."""
    df = QUERIES["hybrid_rrf_search"](spark, sf_dir)
    plan = formatted_plan(df)
    assert plan.count("TakeOrderedAndProject") >= 2
    assert_broadcast_join(df, min_count=2)
    assert "BatchEvalPython" not in plan  # no row-at-a-time Python ever
    assert "MapInPandas" in plan


def test_length_histogram_single_agg(spark, sf_dir):
    assert_single_shuffle(QUERIES["length_histogram_log2"](spark, sf_dir),
                          max_exchanges=2)


def test_embed_outliers_centroid_and_mad_broadcast(spark, sf_dir):
    # centroid (|labels|·dim), median, and MAD relations all broadcast
    df = QUERIES["embed_outliers"](spark, sf_dir)
    assert_broadcast_join(df, min_count=3)
    assert_no_python_udf(df)


def test_temporal_wave_stats_broadcast(spark, sf_dir):
    # seasonality baseline / MAD relations are |types| rows → broadcasts
    for name in ("seasonality_dow", "daily_anomaly_mad"):
        assert_broadcast_join(QUERIES[name](spark, sf_dir), min_count=1)


def test_attribution_windows_share_user_partitioning(spark, sf_dir):
    # all three windows partition by user (then user+session): exactly
    # one data-sized Exchange over events, plus the final agg exchange
    df = QUERIES["first_touch_attribution"](spark, sf_dir)
    assert_single_shuffle(df, max_exchanges=4)
    assert_no_python_udf(df)


def test_market_basket_supports_broadcast(spark, sf_dir):
    # brand supports and the order-count scalar are broadcast; the only
    # data-sized shuffle keys on the bounded basket (order key)
    df = QUERIES["market_basket_lift"](spark, sf_dir)
    assert_broadcast_join(df, min_count=2)
    assert_no_python_udf(df)


def test_dup_overlap_no_pair_relation(spark, sf_dir):
    # pair counts come from the counts-squared identity — a materialized
    # pair relation would show as a second self-join of the clique key
    df = QUERIES["dup_source_overlap"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_budget_apply_fraction_broadcast_and_map_only_decision(spark, sf_dir):
    df = QUERIES["budget_sample_apply"](spark, sf_dir)
    assert_broadcast_join(df, min_count=1)
    assert_no_python_udf(df)


def test_ngram_novelty_no_doc_pair_join(spark, sf_dir):
    # novelty joins postings on the bigram key — a nested-loop (doc-pair)
    # plan would be the naive quadratic formulation
    df = QUERIES["ngram_novelty"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert_no_python_udf(df)
