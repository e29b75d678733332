"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()`` / ``oracle_sql()`` expose the SURVEY.md §2 inventory for the
driver's DuckDB hash-compare at sf0.01.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# importable regardless of the caller's cwd / sys.path
_HERE = os.path.dirname(os.path.abspath(__file__))
if _HERE not in sys.path:
    sys.path.insert(0, _HERE)

from light_etl_windows_container_poc_spark.queries import ORACLES, QUERIES  # noqa: E402

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape) on /root/testdata/sf0.001."""
    return QUERIES["q1_pricing_summary"](spark, _SMOKE_SF_DIR)


# The driver certifies ~50 queries per round (budget). Order the dict so
# NOT-yet-certified entries run first, then the one red row from r2, then
# previously-certified rows oldest-certification-first: whatever budget the
# driver has, it certifies new surface before re-certifying known-good rows.
_R01_CERTIFIED = [
    "q1_pricing_summary", "q3_shipping_priority", "q4_order_priority",
    "q5_local_supplier", "q6_forecast_revenue", "q7_volume_shipping",
    "q10_returned_items", "q14_promo_effect", "q18_large_orders",
    "q19_discount_revenue", "topk_per_group", "window_running",
    "window_lag_delta", "agg_rollup", "agg_cube", "pivot_wide",
    "unpivot_long", "set_ops", "join_anti", "subquery_scalar",
    "percentiles", "q11_important_parts", "q13_cust_distribution",
    "q15_top_supplier", "q16_supplier_counts", "q17_small_qty_revenue",
    "q22_sales_opportunity", "agg_approx_distinct", "agg_grouping_sets",
    "string_funcs", "time_functions", "array_funcs", "map_funcs",
    "window_ntile_firstlast", "q2_min_cost_supplier", "q20_promo_suppliers",
    "q8_market_share", "q9_product_profit", "q12_late_priority",
    "q21_waiting_supplier", "asof_join", "sessionize", "time_window_agg",
    "range_join", "window_rolling_time", "etl_clean_columns",
    "etl_type_coercion", "etl_drop_empty_rows", "etl_dedup_rows",
    "etl_enrich_metadata",
]

# CORRECTNESS_r02.json keys (round-2 driver run). 49 green; the one red row
# (etl_quality_profile, oracle HUGEINT output since cast to BIGINT) is pulled
# forward for re-certification.
_R02_CERTIFIED = [
    "interval_join", "etl_pattern_route", "etl_processing_stats",
    "etl_file_stats", "etl_quality_profile", "etl_validate_rows",
    "etl_json_extract", "etl_scd2_merge", "etl_snapshot_diff", "src_excel",
    "dedup_exact", "dedup_ngram_jaccard", "dedup_minhash_lsh", "dedup_simhash",
    "dedup_embedding", "ann_bruteforce", "ann_lsh", "text_token_count",
    "text_quality", "text_langid", "text_fingerprint", "dedup_clusters",
    "ann_ivf", "text_tfidf", "text_clean_pii", "corpus_report",
    "split_train_test", "dedup_keep_one", "stream_window_agg", "stream_dedup",
    "stream_static_join", "stream_stateful", "stream_session_window",
    "stream_stream_join", "explode_wordcount", "regex_funcs", "null_funcs",
    "window_percent_rank", "agg_stats_moments", "agg_median", "text_chunk",
    "agg_filter", "agg_misc", "agg_histogram", "sample_stratified",
    "inverted_index", "doc_cooccur", "embed_centroid", "funnel",
    "cohort_retention",
]

# CORRECTNESS_r03.json keys (round-3 driver run): all 50 green.
_R03_CERTIFIED = [
    "gap_fill_daily", "zscore_outliers", "pagerank_words", "contamination",
    "pack_sequences", "window_range_value", "mm_media_meta", "mm_features",
    "mm_frame_sample", "mm_decode_real", "fuzzy_join_parts", "window_share",
    "join_semi", "rolling_uniques", "session_window_agg", "hash_funcs",
    "sketch_hll_mergeable", "grouped_ols", "sketch_approx_percentile",
    "cdc_apply", "impute_forward_fill", "impute_group_mean",
    "dedup_embedding_blocked", "boilerplate_shingles", "text_rarity",
    "window_moving_avg", "safe_casts", "array_set_ops", "skew_profile",
    "text_repetition", "quality_gopher_rules", "domain_cap",
    "boilerplate_strip", "text_bigram_lm", "embed_quantize", "knn_graph",
    "embed_standardize", "curate_corpus", "impute_linear_interp",
    "event_streaks", "time_rollup", "etl_quality_profile",
    "q1_pricing_summary", "q3_shipping_priority", "q4_order_priority",
    "q5_local_supplier", "q6_forecast_revenue", "q7_volume_shipping",
    "q10_returned_items", "q14_promo_effect",
]

# CORRECTNESS_r04.json keys (round-4 driver run): all 50 green.
_R04_CERTIFIED = [
    "src_excel_xlsb", "src_excel_xls", "stream_stateful_final",
    "graph_triangles", "minhash_band_containment", "simhash_pigeonhole",
    "sketch_hll_bounds", "sketch_hll_merge_consistent", "sketch_pct_bounds",
    "ann_ivf_fullprobe_exact", "ann_lsh_recall_floor",
    "dedup_blocked_invariance", "pagerank_invariants",
    "approx_distinct_bounds", "kmeans_inertia_monotone", "semdedup_keep",
    "semdedup_soundness", "domain_temperature_sample", "dsir_weights",
    "ann_lsh", "ann_ivf", "dedup_minhash_lsh", "dedup_embedding",
    "dedup_embedding_blocked", "knn_graph", "src_excel", "mm_features",
    "mm_frame_sample", "pagerank_words", "dedup_clusters", "dedup_keep_one",
    "curate_corpus", "q1_pricing_summary", "q3_shipping_priority",
    "q4_order_priority", "q5_local_supplier", "q6_forecast_revenue",
    "q7_volume_shipping", "q10_returned_items", "q14_promo_effect",
    "q18_large_orders", "q19_discount_revenue", "topk_per_group",
    "window_running", "window_lag_delta", "agg_rollup", "agg_cube",
    "pivot_wide", "unpivot_long", "set_ops",
]

# CORRECTNESS_r05.json keys (round-5 driver run): 47 hash-green + 2
# rows-only; embed_pca ERRORED (array-column canonicalization) so it is
# NOT listed — it stays in the never-certified head until a green row.
_R05_CERTIFIED = [
    "stream_ohlc_final", "mm_resize_real", "pca_invariants",
    "quality_logistic_score", "cc_convergence", "bm25_search",
    "token_budget_mix", "text_word_entropy", "lm_perplexity_filter",
    "mad_outliers", "zonemap_stats", "embed_robust_scale",
    "ngram_novelty", "ohlc_bars", "user_rfm", "event_transitions",
    "salted_join_agg", "dup_source_overlap", "budget_sample_apply",
    "hybrid_rrf_search", "market_basket_lift", "seasonality_dow",
    "daily_anomaly_mad", "first_touch_attribution",
    "length_histogram_log2", "vocab_growth", "embed_outliers",
    "sink_partitioned_roundtrip", "compaction_roundtrip",
    "anti_contamination_split", "journey_trigrams",
    "quantile_bands_daily", "dq_rules", "dup_span_census",
    "shard_assign", "ewma_halflife", "agg_incremental_merge",
    "join_null_safe", "degree_distribution", "source_gini",
    "semdedup_keep", "semdedup_soundness", "ann_ivf",
    "ann_ivf_fullprobe_exact", "kmeans_inertia_monotone",
    "graph_triangles", "pagerank_invariants", "curate_corpus",
    "fuzzy_join_parts",
]

# CORRECTNESS_r06.json keys (round-6 driver run): 48 hash-green + 2
# clean rows-only records (embed_pca, ann_pq — both SURVEY-declared
# rows-only with green hash-certified twins, so they count as
# certified; only ERRORED rows are excluded from these lists).
_R06_CERTIFIED = [
    "embed_pca", "dedup_incremental_exact", "dedup_incremental_consistency",
    "dup_span_strip", "fingerprint_winnowing", "equidepth_histogram",
    "benford_digit_profile", "chi2_independence", "pct_change_wow",
    "top_movers", "text_bpe_tokenize", "text_bigram_kn", "ann_pq",
    "ann_pq_recall_floor", "user_rfm", "ann_bruteforce", "fuzzy_join_parts",
    "ann_lsh_recall_floor", "ann_ivf_fullprobe_exact", "hybrid_rrf_search",
    "src_excel", "src_excel_xls", "src_excel_xlsb", "stream_window_agg",
    "stream_dedup", "stream_static_join", "stream_stream_join",
    "stream_session_window", "join_anti", "subquery_scalar", "percentiles",
    "q11_important_parts", "q13_cust_distribution", "q15_top_supplier",
    "q16_supplier_counts", "q17_small_qty_revenue", "q22_sales_opportunity",
    "agg_grouping_sets", "string_funcs", "time_functions", "array_funcs",
    "map_funcs", "window_ntile_firstlast", "q2_min_cost_supplier",
    "q9_product_profit", "asof_join", "sessionize", "time_window_agg",
    "range_join", "window_rolling_time",
]

_R07_CERTIFIED = [
    "agg_approx_distinct", "agg_filter", "agg_histogram",
    "agg_incremental_retract", "agg_median", "agg_misc",
    "agg_stats_moments", "ann_ivfpq", "ann_ivfpq_fullprobe_exact",
    "bloom_zone_prune", "boilerplate_shingles", "bpe_learn",
    "corpus_report", "dedup_jaccard_prefix", "dedup_ngram_jaccard",
    "dedup_paragraph", "dedup_simhash", "embed_centroid",
    "etl_clean_columns", "etl_dedup_rows", "etl_drop_empty_rows",
    "etl_enrich_metadata", "etl_file_stats", "etl_json_extract",
    "etl_pattern_route", "etl_processing_stats", "etl_scd2_merge",
    "etl_snapshot_diff", "etl_type_coercion", "etl_validate_rows",
    "explode_wordcount", "heavy_hitters", "interval_join",
    "q11_important_parts", "q12_late_priority", "q20_promo_suppliers",
    "q21_waiting_supplier", "q8_market_share", "skyline_parts",
    "split_train_test", "stream_stateful", "text_clean_pii",
    "text_fingerprint", "text_langid", "text_quality",
    "text_token_count", "text_trigram_kn", "weighted_sample",
    "window_percent_rank", "zorder_zone_prune",
]

# CORRECTNESS_r08.json keys (round-8 driver run): 48 hash-green + 1
# clean rows-only record (unigram_lm_learn, SURVEY-declared rows-only
# with its hash-certified twin unigram_invariants green in the same
# run). The one red row (cusum_drift — an uncast HUGEINT in the ORACLE,
# judge-adjudicated r8: the Spark answer was verified correct 4/4; the
# oracle cast landed in r9 with a DESCRIBE-based gate guard in
# tools/check_oracle.py) is NOT listed, so it returns to the head for a
# green driver row.
_R08_CERTIFIED = [
    "ann_ivfpq_recall_floor", "array_set_ops", "boilerplate_strip",
    "bpe_apply_large", "bpe_symbol_census", "cc_star_components",
    "cdc_apply", "cohort_retention", "contamination",
    "countmin_sketch", "curate_corpus_v2", "dedup_containment_keep",
    "dedup_containment_prefix", "dedup_exact", "doc_cooccur",
    "domain_cap", "embed_quantize", "embed_standardize",
    "entity_resolution", "etl_quality_profile", "event_streaks",
    "fd_profile", "funnel", "gap_fill_daily",
    "graph_kcore", "graph_label_propagation", "grouped_theil_sen",
    "hilbert_zone_prune", "interval_concurrency", "inverted_index",
    "join_incremental_delta", "median_polish_anomaly", "mm_audiofp_dedup",
    "mm_phash_dedup", "null_funcs", "quality_curriculum_tiers",
    "regex_funcs", "sample_stratified", "split_leakage_safe",
    "stream_countmin_cert", "stream_heavy_hitters_cert",
    "stream_histogram_quantiles", "text_chunk", "text_tfidf",
    "unigram_invariants", "unigram_lm_learn", "zipf_slope",
    "zorder_optimize_roundtrip", "zorder_write_roundtrip",
]

# CORRECTNESS_r09.json keys (round-9 driver run): 47 hash-green + 3
# clean rows-only records (sketch_approx_percentile,
# sketch_hll_mergeable, ann_lsh — all SURVEY-declared rows-only with
# green hash-certified twins in the same run). Zero red rows — the
# first fully green round.
_R09_CERTIFIED = [
    "agg_cube", "agg_rollup", "ann_lifecycle_refresh", "ann_lsh",
    "approx_distinct_bounds", "bpe_fertility_by_lang", "cusum_drift",
    "dedup_blocked_invariance", "dedup_clusters", "dedup_embedding",
    "graph_adamic_adar", "grouped_ols", "hash_funcs", "hll_grid_estimate",
    "hll_grid_sketch", "impute_forward_fill", "impute_group_mean",
    "impute_linear_interp", "join_semi", "js_divergence_types",
    "kendall_tau_daily", "kmv_set_cardinality", "kmv_source_overlap",
    "ks_two_sample", "langid_confusion", "mann_whitney_u", "mm_decode_real",
    "mm_media_meta", "pack_sequences", "psi_drift", "quality_gopher_rules",
    "rolling_uniques", "safe_casts", "seasonality_dft", "session_window_agg",
    "sketch_approx_percentile", "sketch_hll_mergeable", "skew_profile",
    "stream_dq_gate_cert", "stream_hll_cert", "text_bigram_lm", "text_rarity",
    "text_repetition", "theil_u_dow_type", "time_rollup", "window_moving_avg",
    "window_range_value", "window_share", "zipf_slope", "zscore_outliers",
]

# Round-10's 50 green driver rows (CORRECTNESS_r10.json: 47 hash-pass
# + 3 recorded rows-only), folded in as the newest certification tail.
_R10_CERTIFIED = [
    "ams_f2_bounds", "ams_f2_sketch", "ams_skew_by_type", "ann_append_cert",
    "cm_join_size", "dedup_embedding_blocked", "dedup_keep_one",
    "dedup_minhash_lsh", "domain_temperature_sample", "dsir_weights",
    "graph_adamic_adar", "graph_clustering_coeff", "hll_rolling_uniques",
    "knn_graph", "minhash_band_containment", "mm_features",
    "mm_frame_sample", "pagerank_words", "pipeline_e2e_cert", "pivot_wide",
    "q10_returned_items", "q14_promo_effect", "q18_large_orders",
    "q19_discount_revenue", "q1_pricing_summary", "q3_shipping_priority",
    "q4_order_priority", "q5_local_supplier", "q6_forecast_revenue",
    "q7_volume_shipping", "qsketch_build", "qsketch_by_source",
    "qsketch_merge_consistent", "qsketch_rank_bounds",
    "reservoir_by_source", "set_ops", "simhash_pigeonhole",
    "sketch_hll_bounds", "sketch_hll_merge_consistent", "sketch_pct_bounds",
    "stream_ams_cert", "stream_kmv_cert", "stream_qsketch_cert",
    "stream_reservoir_cert", "stream_stateful_final", "topk_per_group",
    "unpivot_long", "weighted_sample_merge", "window_lag_delta",
    "window_running",
]

# CORRECTNESS_r11.json keys (round-11 driver run): 48 hash-green + 2
# clean rows-only records (ann_ivf, semdedup_keep — both SURVEY-declared
# rows-only with green hash-certified twins ann_ivf_fullprobe_exact /
# semdedup_soundness in the same run). Zero red rows.
_R11_CERTIFIED = [
    "acf_daily", "agg_incremental_merge", "ann_ivf",
    "anti_contamination_split", "bm25_batch_cert", "bm25_search",
    "budget_sample_apply", "cc_convergence", "compaction_roundtrip",
    "curate_corpus", "daily_anomaly_mad", "degree_distribution",
    "dq_rules", "dup_source_overlap", "dup_span_census", "embed_outliers",
    "embed_robust_scale", "event_transitions", "ewma_halflife",
    "first_touch_attribution", "graph_triangles", "join_null_safe",
    "journey_trigrams", "kmeans_inertia_monotone", "length_histogram_log2",
    "lm_perplexity_filter", "mad_outliers", "mann_kendall_trend",
    "market_basket_lift", "mm_resize_real", "ngram_novelty", "ohlc_bars",
    "pagerank_invariants", "pca_invariants", "quality_logistic_score",
    "quantile_bands_daily", "salted_join_agg", "salting_advice_cert",
    "seasonality_dow", "semdedup_keep", "semdedup_soundness",
    "shard_assign", "sink_partitioned_roundtrip", "source_gini",
    "stream_bm25_cert", "stream_ohlc_final", "text_word_entropy",
    "token_budget_mix", "vocab_growth", "zonemap_stats",
]

# CORRECTNESS_r12.json keys (round-12 driver run): 48 hash-green + 2
# clean rows-only records (ann_pq, embed_pca — both SURVEY-declared
# rows-only with green hash-certified twins ann_pq_recall_floor /
# pca_invariants in the same run). Zero red rows.
_R12_CERTIFIED = [
    "agg_grouping_sets", "ann_bruteforce", "ann_dim_truncation_recall",
    "ann_ivf_fullprobe_exact", "ann_lsh_recall_floor", "ann_pq",
    "ann_pq_recall_floor", "ann_takedown_cert", "array_funcs",
    "asof_join", "benford_digit_profile", "bm25_takedown_cert",
    "changepoint_binary_seg", "chi2_independence",
    "dedup_incremental_consistency", "dedup_incremental_exact",
    "dedup_takedown_cert", "delete_where_cert",
    "delete_where_versioned_cert", "dup_span_strip", "embed_pca",
    "equidepth_histogram", "fingerprint_winnowing", "fuzzy_join_parts",
    "graph_jaccard_similarity", "hybrid_rrf_search", "join_anti",
    "map_funcs", "pct_change_wow", "percentiles",
    "phrase_search_cert", "pipeline_e2e_stream_cert", "proximity_search_cert",
    "q13_cust_distribution", "q15_top_supplier", "q16_supplier_counts",
    "q17_small_qty_revenue", "q22_sales_opportunity", "q2_min_cost_supplier",
    "q9_product_profit", "range_join", "sessionize",
    "src_excel", "src_excel_xls", "src_excel_xlsb",
    "stream_dedup", "stream_session_window", "stream_static_join",
    "stream_stream_join", "wordpiece_tokenize",
]

# CORRECTNESS_r13.json keys (round-13 driver run): 47 hash-green + 3
# clean rows-only records (agg_approx_distinct, ann_ivfpq,
# dedup_simhash — all SURVEY-declared rows-only with green
# hash-certified invariant twins in the cumulative record). Zero red
# rows.
_R13_CERTIFIED = [
    "agg_approx_distinct", "agg_filter", "agg_histogram",
    "agg_incremental_retract", "agg_median", "agg_misc",
    "agg_stats_moments", "ann_ivfpq", "ann_ivfpq_fullprobe_exact",
    "bloom_zone_prune", "boilerplate_shingles", "bpe_learn",
    "corpus_report", "decontaminate_substring", "dedup_jaccard_prefix",
    "dedup_ngram_jaccard", "dedup_paragraph", "dedup_simhash",
    "dedup_substring_exact", "dedup_substring_strip", "embed_centroid",
    "etl_clean_columns", "etl_dedup_rows", "etl_drop_empty_rows",
    "etl_enrich_metadata", "etl_file_stats", "etl_json_extract",
    "etl_pattern_route", "etl_processing_stats", "etl_scd2_merge",
    "etl_snapshot_diff", "etl_type_coercion", "etl_validate_rows",
    "explode_wordcount", "heavy_hitters", "interval_join",
    "q11_important_parts", "q12_late_priority", "q20_promo_suppliers",
    "stream_window_agg", "string_funcs", "subquery_scalar",
    "text_bigram_kn", "text_bpe_tokenize", "time_functions",
    "time_window_agg", "top_movers", "user_rfm",
    "window_ntile_firstlast", "window_rolling_time",
]

# CORRECTNESS_r14.json keys (round-14 driver run): 49 hash-green + 1
# clean rows-only record (stream_stateful — SURVEY-declared rows-only
# with its hash-certified twin stream_stateful_final green in the
# cumulative record). Zero red rows.
_R14_CERTIFIED = [
    "substring_incremental_cert", "substring_takedown_cert",
    "q21_waiting_supplier", "q8_market_share", "skyline_parts",
    "split_train_test", "stream_stateful", "text_clean_pii",
    "text_fingerprint", "text_langid", "text_quality",
    "text_token_count", "text_trigram_kn", "weighted_sample",
    "window_percent_rank", "zorder_zone_prune",
    "ann_ivfpq_recall_floor", "array_set_ops", "boilerplate_strip",
    "bpe_apply_large", "bpe_symbol_census", "cc_star_components",
    "cdc_apply", "cohort_retention", "contamination",
    "countmin_sketch", "curate_corpus_v2", "dedup_containment_keep",
    "dedup_containment_prefix", "dedup_exact", "doc_cooccur",
    "domain_cap", "embed_quantize", "embed_standardize",
    "entity_resolution", "etl_quality_profile", "event_streaks",
    "fd_profile", "funnel", "gap_fill_daily",
    "graph_kcore", "graph_label_propagation", "grouped_theil_sen",
    "hilbert_zone_prune", "interval_concurrency", "inverted_index",
    "join_incremental_delta", "median_polish_anomaly",
    "mm_audiofp_dedup", "mm_phash_dedup",
]

# Round-15 recertification allocation (head + this list == 50, the
# driver's per-round budget; test-locked) — executing the allocation
# the r14 verdict locked. Head of the list = the FOUR queries whose
# operator internals were reworked in r14 (ngram_jaccard_pairs in
# b0c1e99; the window_classes prefix-quadrupling in 62e3245) but
# rotated OUT of the r14 driver sample, so their green driver hashes
# predate the new code — they jump the staleness queue for a driver
# hash on the code that actually runs now. Then the FOURTEEN r8-latest
# rows the r14 allocation comment reserved for this round, then the
# THIRTY-TWO alphabetically-first r9-latest rows (alphabetical is the
# deterministic tie-break within a staleness round). 4 + 14 + 32 == 50.
# The remaining SEVENTEEN r9-latest rows head the r16 recertify floor:
# seasonality_dft, session_window_agg, sketch_approx_percentile,
# sketch_hll_mergeable, skew_profile, stream_dq_gate_cert,
# stream_hll_cert, text_bigram_lm, text_rarity, text_repetition,
# theil_u_dow_type, time_rollup, window_moving_avg,
# window_range_value, window_share, zipf_slope, zscore_outliers.
_RECERTIFY = [
    "dedup_ngram_jaccard", "dedup_substring_exact",
    "dedup_substring_strip", "decontaminate_substring",
    "null_funcs", "quality_curriculum_tiers", "regex_funcs",
    "sample_stratified", "split_leakage_safe", "stream_countmin_cert",
    "stream_heavy_hitters_cert", "stream_histogram_quantiles",
    "text_chunk", "text_tfidf", "unigram_invariants",
    "unigram_lm_learn", "zorder_optimize_roundtrip",
    "zorder_write_roundtrip",
    "agg_cube", "agg_rollup", "ann_lifecycle_refresh", "ann_lsh",
    "approx_distinct_bounds", "bpe_fertility_by_lang", "cusum_drift",
    "dedup_blocked_invariance", "dedup_clusters", "dedup_embedding",
    "grouped_ols", "hash_funcs", "hll_grid_estimate",
    "hll_grid_sketch", "impute_forward_fill", "impute_group_mean",
    "impute_linear_interp", "join_semi", "js_divergence_types",
    "kendall_tau_daily", "kmv_set_cardinality", "kmv_source_overlap",
    "ks_two_sample", "langid_confusion", "mann_whitney_u",
    "mm_decode_real", "mm_media_meta", "pack_sequences",
    "psi_drift", "quality_gopher_rules", "rolling_uniques",
    "safe_casts",
]


# The FROZEN round-5 query population (201 names) - bench.py's
# suite_r5_subset tripwire for round 6+: future rounds keep adding
# queries, so only a frozen whitelist keeps the suite total
# comparable round-over-round (a blacklist of additions would
# silently absorb them).
_R05_POPULATION = [
    "agg_approx_distinct", "agg_cube", "agg_filter",
    "agg_grouping_sets", "agg_histogram", "agg_incremental_merge",
    "agg_median", "agg_misc", "agg_rollup",
    "agg_stats_moments", "ann_bruteforce", "ann_ivf",
    "ann_ivf_fullprobe_exact", "ann_lsh", "ann_lsh_recall_floor",
    "anti_contamination_split", "approx_distinct_bounds", "array_funcs",
    "array_set_ops", "asof_join", "bm25_search",
    "boilerplate_shingles", "boilerplate_strip", "budget_sample_apply",
    "cc_convergence", "cdc_apply", "cohort_retention",
    "compaction_roundtrip", "contamination", "corpus_report",
    "curate_corpus", "daily_anomaly_mad", "dedup_blocked_invariance",
    "dedup_clusters", "dedup_embedding", "dedup_embedding_blocked",
    "dedup_exact", "dedup_keep_one", "dedup_minhash_lsh",
    "dedup_ngram_jaccard", "dedup_simhash", "degree_distribution",
    "doc_cooccur", "domain_cap", "domain_temperature_sample",
    "dq_rules", "dsir_weights", "dup_source_overlap",
    "dup_span_census", "embed_centroid", "embed_outliers",
    "embed_pca", "embed_quantize", "embed_robust_scale",
    "embed_standardize", "etl_clean_columns", "etl_dedup_rows",
    "etl_drop_empty_rows", "etl_enrich_metadata", "etl_file_stats",
    "etl_json_extract", "etl_pattern_route", "etl_processing_stats",
    "etl_quality_profile", "etl_scd2_merge", "etl_snapshot_diff",
    "etl_type_coercion", "etl_validate_rows", "event_streaks",
    "event_transitions", "ewma_halflife", "explode_wordcount",
    "first_touch_attribution", "funnel", "fuzzy_join_parts",
    "gap_fill_daily", "graph_triangles", "grouped_ols",
    "hash_funcs", "hybrid_rrf_search", "impute_forward_fill",
    "impute_group_mean", "impute_linear_interp", "interval_join",
    "inverted_index", "join_anti", "join_null_safe",
    "join_semi", "journey_trigrams", "kmeans_inertia_monotone",
    "knn_graph", "length_histogram_log2", "lm_perplexity_filter",
    "mad_outliers", "map_funcs", "market_basket_lift",
    "minhash_band_containment", "mm_decode_real", "mm_features",
    "mm_frame_sample", "mm_media_meta", "mm_resize_real",
    "ngram_novelty", "null_funcs", "ohlc_bars",
    "pack_sequences", "pagerank_invariants", "pagerank_words",
    "pca_invariants", "percentiles", "pivot_wide",
    "q10_returned_items", "q11_important_parts", "q12_late_priority",
    "q13_cust_distribution", "q14_promo_effect", "q15_top_supplier",
    "q16_supplier_counts", "q17_small_qty_revenue", "q18_large_orders",
    "q19_discount_revenue", "q1_pricing_summary", "q20_promo_suppliers",
    "q21_waiting_supplier", "q22_sales_opportunity", "q2_min_cost_supplier",
    "q3_shipping_priority", "q4_order_priority", "q5_local_supplier",
    "q6_forecast_revenue", "q7_volume_shipping", "q8_market_share",
    "q9_product_profit", "quality_gopher_rules", "quality_logistic_score",
    "quantile_bands_daily", "range_join", "regex_funcs",
    "rolling_uniques", "safe_casts", "salted_join_agg",
    "sample_stratified", "seasonality_dow", "semdedup_keep",
    "semdedup_soundness", "session_window_agg", "sessionize",
    "set_ops", "shard_assign", "simhash_pigeonhole",
    "sink_partitioned_roundtrip", "sketch_approx_percentile", "sketch_hll_bounds",
    "sketch_hll_merge_consistent", "sketch_hll_mergeable", "sketch_pct_bounds",
    "skew_profile", "source_gini", "split_train_test",
    "src_excel", "src_excel_xls", "src_excel_xlsb",
    "stream_dedup", "stream_ohlc_final", "stream_session_window",
    "stream_stateful", "stream_stateful_final", "stream_static_join",
    "stream_stream_join", "stream_window_agg", "string_funcs",
    "subquery_scalar", "text_bigram_lm", "text_chunk",
    "text_clean_pii", "text_fingerprint", "text_langid",
    "text_quality", "text_rarity", "text_repetition",
    "text_tfidf", "text_token_count", "text_word_entropy",
    "time_functions", "time_rollup", "time_window_agg",
    "token_budget_mix", "topk_per_group", "unpivot_long",
    "user_rfm", "vocab_growth", "window_lag_delta",
    "window_moving_avg", "window_ntile_firstlast", "window_percent_rank",
    "window_range_value", "window_rolling_time", "window_running",
    "window_share", "zonemap_stats", "zscore_outliers",
]


# The FROZEN round-6 query population (210 names) — bench.py's
# suite_r6_subset tripwire for round 7+ (same rationale as
# _R05_POPULATION: only a frozen whitelist keeps the total comparable
# as future rounds add queries). DELIBERATELY excludes the four
# breadth27 queries that landed after the freeze (ann_pq,
# ann_pq_recall_floor, text_bpe_tokenize, text_bigram_kn):
# BENCH_r06.json's recorded suite_r6_subset_sec was measured against
# THIS 210-name list, so adding them now would break the r6↔r7
# comparison the subset exists for. They are covered by the full-suite
# number and by _R07_POPULATION onward.
_R06_POPULATION = [
    "agg_approx_distinct", "agg_cube", "agg_filter",
    "agg_grouping_sets", "agg_histogram", "agg_incremental_merge",
    "agg_median", "agg_misc", "agg_rollup",
    "agg_stats_moments", "ann_bruteforce", "ann_ivf",
    "ann_ivf_fullprobe_exact", "ann_lsh", "ann_lsh_recall_floor",
    "anti_contamination_split", "approx_distinct_bounds", "array_funcs",
    "array_set_ops", "asof_join", "benford_digit_profile",
    "bm25_search", "boilerplate_shingles", "boilerplate_strip",
    "budget_sample_apply", "cc_convergence", "cdc_apply",
    "chi2_independence", "cohort_retention", "compaction_roundtrip",
    "contamination", "corpus_report", "curate_corpus",
    "daily_anomaly_mad", "dedup_blocked_invariance", "dedup_clusters",
    "dedup_embedding", "dedup_embedding_blocked", "dedup_exact",
    "dedup_incremental_consistency", "dedup_incremental_exact", "dedup_keep_one",
    "dedup_minhash_lsh", "dedup_ngram_jaccard", "dedup_simhash",
    "degree_distribution", "doc_cooccur", "domain_cap",
    "domain_temperature_sample", "dq_rules", "dsir_weights",
    "dup_source_overlap", "dup_span_census", "dup_span_strip",
    "embed_centroid", "embed_outliers", "embed_pca",
    "embed_quantize", "embed_robust_scale", "embed_standardize",
    "equidepth_histogram", "etl_clean_columns", "etl_dedup_rows",
    "etl_drop_empty_rows", "etl_enrich_metadata", "etl_file_stats",
    "etl_json_extract", "etl_pattern_route", "etl_processing_stats",
    "etl_quality_profile", "etl_scd2_merge", "etl_snapshot_diff",
    "etl_type_coercion", "etl_validate_rows", "event_streaks",
    "event_transitions", "ewma_halflife", "explode_wordcount",
    "fingerprint_winnowing", "first_touch_attribution", "funnel",
    "fuzzy_join_parts", "gap_fill_daily", "graph_triangles",
    "grouped_ols", "hash_funcs", "hybrid_rrf_search",
    "impute_forward_fill", "impute_group_mean", "impute_linear_interp",
    "interval_join", "inverted_index", "join_anti",
    "join_null_safe", "join_semi", "journey_trigrams",
    "kmeans_inertia_monotone", "knn_graph", "length_histogram_log2",
    "lm_perplexity_filter", "mad_outliers", "map_funcs",
    "market_basket_lift", "minhash_band_containment", "mm_decode_real",
    "mm_features", "mm_frame_sample", "mm_media_meta",
    "mm_resize_real", "ngram_novelty", "null_funcs",
    "ohlc_bars", "pack_sequences", "pagerank_invariants",
    "pagerank_words", "pca_invariants", "pct_change_wow",
    "percentiles", "pivot_wide", "q10_returned_items",
    "q11_important_parts", "q12_late_priority", "q13_cust_distribution",
    "q14_promo_effect", "q15_top_supplier", "q16_supplier_counts",
    "q17_small_qty_revenue", "q18_large_orders", "q19_discount_revenue",
    "q1_pricing_summary", "q20_promo_suppliers", "q21_waiting_supplier",
    "q22_sales_opportunity", "q2_min_cost_supplier", "q3_shipping_priority",
    "q4_order_priority", "q5_local_supplier", "q6_forecast_revenue",
    "q7_volume_shipping", "q8_market_share", "q9_product_profit",
    "quality_gopher_rules", "quality_logistic_score", "quantile_bands_daily",
    "range_join", "regex_funcs", "rolling_uniques",
    "safe_casts", "salted_join_agg", "sample_stratified",
    "seasonality_dow", "semdedup_keep", "semdedup_soundness",
    "session_window_agg", "sessionize", "set_ops",
    "shard_assign", "simhash_pigeonhole", "sink_partitioned_roundtrip",
    "sketch_approx_percentile", "sketch_hll_bounds", "sketch_hll_merge_consistent",
    "sketch_hll_mergeable", "sketch_pct_bounds", "skew_profile",
    "source_gini", "split_train_test", "src_excel",
    "src_excel_xls", "src_excel_xlsb", "stream_dedup",
    "stream_ohlc_final", "stream_session_window", "stream_stateful",
    "stream_stateful_final", "stream_static_join", "stream_stream_join",
    "stream_window_agg", "string_funcs", "subquery_scalar",
    "text_bigram_lm", "text_chunk", "text_clean_pii",
    "text_fingerprint", "text_langid", "text_quality",
    "text_rarity", "text_repetition", "text_tfidf",
    "text_token_count", "text_word_entropy", "time_functions",
    "time_rollup", "time_window_agg", "token_budget_mix",
    "top_movers", "topk_per_group", "unpivot_long",
    "user_rfm", "vocab_growth", "window_lag_delta",
    "window_moving_avg", "window_ntile_firstlast", "window_percent_rank",
    "window_range_value", "window_rolling_time", "window_running",
    "window_share", "zonemap_stats", "zscore_outliers",
]


# The FROZEN round-7 query population (218 names) — bench.py's
# suite_r7_subset tripwire for round 8+ (same rationale as the earlier
# freezes). The 218-name freeze PREDATES the round-7 closing waves
# (like _R06_POPULATION's breadth27 note): the 8 closing-wave queries
# (weighted_sample, skyline_parts, bloom_zone_prune, heavy_hitters,
# bpe_learn, dedup_jaccard_prefix, zorder_zone_prune,
# agg_incremental_retract) are registered but intentionally outside
# this tripwire; they enter the round-8 freeze.
_R07_POPULATION = [
    "agg_approx_distinct", "agg_cube", "agg_filter", "agg_grouping_sets",
    "agg_histogram", "agg_incremental_merge", "agg_median", "agg_misc",
    "agg_rollup", "agg_stats_moments", "ann_bruteforce", "ann_ivf",
    "ann_ivf_fullprobe_exact", "ann_ivfpq", "ann_ivfpq_fullprobe_exact",
    "ann_lsh", "ann_lsh_recall_floor", "ann_pq", "ann_pq_recall_floor",
    "anti_contamination_split", "approx_distinct_bounds", "array_funcs",
    "array_set_ops", "asof_join", "benford_digit_profile", "bm25_search",
    "boilerplate_shingles", "boilerplate_strip", "budget_sample_apply",
    "cc_convergence", "cdc_apply", "chi2_independence", "cohort_retention",
    "compaction_roundtrip", "contamination", "corpus_report",
    "curate_corpus", "daily_anomaly_mad", "dedup_blocked_invariance",
    "dedup_clusters", "dedup_embedding", "dedup_embedding_blocked",
    "dedup_exact", "dedup_incremental_consistency",
    "dedup_incremental_exact", "dedup_keep_one", "dedup_minhash_lsh",
    "dedup_ngram_jaccard", "dedup_paragraph", "dedup_simhash",
    "degree_distribution", "doc_cooccur", "domain_cap",
    "domain_temperature_sample", "dq_rules", "dsir_weights",
    "dup_source_overlap", "dup_span_census", "dup_span_strip",
    "embed_centroid", "embed_outliers", "embed_pca", "embed_quantize",
    "embed_robust_scale", "embed_standardize", "equidepth_histogram",
    "etl_clean_columns", "etl_dedup_rows", "etl_drop_empty_rows",
    "etl_enrich_metadata", "etl_file_stats", "etl_json_extract",
    "etl_pattern_route", "etl_processing_stats", "etl_quality_profile",
    "etl_scd2_merge", "etl_snapshot_diff", "etl_type_coercion",
    "etl_validate_rows", "event_streaks", "event_transitions",
    "ewma_halflife", "explode_wordcount", "fingerprint_winnowing",
    "first_touch_attribution", "funnel", "fuzzy_join_parts",
    "gap_fill_daily", "graph_triangles", "grouped_ols", "hash_funcs",
    "hybrid_rrf_search", "impute_forward_fill", "impute_group_mean",
    "impute_linear_interp", "interval_join", "inverted_index", "join_anti",
    "join_null_safe", "join_semi", "journey_trigrams",
    "kmeans_inertia_monotone", "knn_graph", "length_histogram_log2",
    "lm_perplexity_filter", "mad_outliers", "map_funcs",
    "market_basket_lift", "minhash_band_containment", "mm_decode_real",
    "mm_features", "mm_frame_sample", "mm_media_meta", "mm_resize_real",
    "ngram_novelty", "null_funcs", "ohlc_bars", "pack_sequences",
    "pagerank_invariants", "pagerank_words", "pca_invariants",
    "pct_change_wow", "percentiles", "pivot_wide", "q10_returned_items",
    "q11_important_parts", "q12_late_priority", "q13_cust_distribution",
    "q14_promo_effect", "q15_top_supplier", "q16_supplier_counts",
    "q17_small_qty_revenue", "q18_large_orders", "q19_discount_revenue",
    "q1_pricing_summary", "q20_promo_suppliers", "q21_waiting_supplier",
    "q22_sales_opportunity", "q2_min_cost_supplier",
    "q3_shipping_priority", "q4_order_priority", "q5_local_supplier",
    "q6_forecast_revenue", "q7_volume_shipping", "q8_market_share",
    "q9_product_profit", "quality_gopher_rules", "quality_logistic_score",
    "quantile_bands_daily", "range_join", "regex_funcs", "rolling_uniques",
    "safe_casts", "salted_join_agg", "sample_stratified",
    "seasonality_dow", "semdedup_keep", "semdedup_soundness",
    "session_window_agg", "sessionize", "set_ops", "shard_assign",
    "simhash_pigeonhole", "sink_partitioned_roundtrip",
    "sketch_approx_percentile", "sketch_hll_bounds",
    "sketch_hll_merge_consistent", "sketch_hll_mergeable",
    "sketch_pct_bounds", "skew_profile", "source_gini", "split_train_test",
    "src_excel", "src_excel_xls", "src_excel_xlsb", "stream_dedup",
    "stream_ohlc_final", "stream_session_window", "stream_stateful",
    "stream_stateful_final", "stream_static_join", "stream_stream_join",
    "stream_window_agg", "string_funcs", "subquery_scalar",
    "text_bigram_kn", "text_bigram_lm", "text_bpe_tokenize", "text_chunk",
    "text_clean_pii", "text_fingerprint", "text_langid", "text_quality",
    "text_rarity", "text_repetition", "text_tfidf", "text_token_count",
    "text_trigram_kn", "text_word_entropy", "time_functions",
    "time_rollup", "time_window_agg", "token_budget_mix", "top_movers",
    "topk_per_group", "unpivot_long", "user_rfm", "vocab_growth",
    "window_lag_delta", "window_moving_avg", "window_ntile_firstlast",
    "window_percent_rank", "window_range_value", "window_rolling_time",
    "window_running", "window_share", "zonemap_stats", "zscore_outliers",
]

# The FROZEN round-8 query population (237 names) — bench.py's
# suite_r8_subset tripwire for round 9+. Frozen at the round-8 OPEN
# (after the first two r8 waves, through zorder_optimize_roundtrip
# and dedup_containment_prefix); any later r8 closing-wave queries stay out
# of this list and enter the round-9 freeze, like every earlier freeze.
_R08_POPULATION = [
    "agg_approx_distinct", "agg_cube", "agg_filter",
    "agg_grouping_sets", "agg_histogram", "agg_incremental_merge",
    "agg_incremental_retract", "agg_median", "agg_misc",
    "agg_rollup", "agg_stats_moments", "ann_bruteforce",
    "ann_ivf", "ann_ivf_fullprobe_exact", "ann_ivfpq",
    "ann_ivfpq_fullprobe_exact", "ann_ivfpq_recall_floor", "ann_lsh",
    "ann_lsh_recall_floor", "ann_pq", "ann_pq_recall_floor",
    "anti_contamination_split", "approx_distinct_bounds", "array_funcs",
    "array_set_ops", "asof_join", "benford_digit_profile",
    "bloom_zone_prune", "bm25_search", "boilerplate_shingles",
    "boilerplate_strip", "bpe_apply_large", "bpe_learn",
    "bpe_symbol_census", "budget_sample_apply", "cc_convergence",
    "cdc_apply", "chi2_independence", "cohort_retention",
    "compaction_roundtrip", "contamination", "corpus_report",
    "curate_corpus", "curate_corpus_v2", "daily_anomaly_mad",
    "dedup_blocked_invariance", "dedup_clusters", "dedup_containment_keep",
    "dedup_containment_prefix", "dedup_embedding", "dedup_embedding_blocked",
    "dedup_exact", "dedup_incremental_consistency", "dedup_incremental_exact",
    "dedup_jaccard_prefix", "dedup_keep_one", "dedup_minhash_lsh",
    "dedup_ngram_jaccard", "dedup_paragraph", "dedup_simhash",
    "degree_distribution", "doc_cooccur", "domain_cap",
    "domain_temperature_sample", "dq_rules", "dsir_weights",
    "dup_source_overlap", "dup_span_census", "dup_span_strip",
    "embed_centroid", "embed_outliers", "embed_pca",
    "embed_quantize", "embed_robust_scale", "embed_standardize",
    "equidepth_histogram", "etl_clean_columns", "etl_dedup_rows",
    "etl_drop_empty_rows", "etl_enrich_metadata", "etl_file_stats",
    "etl_json_extract", "etl_pattern_route", "etl_processing_stats",
    "etl_quality_profile", "etl_scd2_merge", "etl_snapshot_diff",
    "etl_type_coercion", "etl_validate_rows", "event_streaks",
    "event_transitions", "ewma_halflife", "explode_wordcount",
    "fingerprint_winnowing", "first_touch_attribution", "funnel",
    "fuzzy_join_parts", "gap_fill_daily", "graph_triangles",
    "grouped_ols", "hash_funcs", "heavy_hitters",
    "hilbert_zone_prune", "hybrid_rrf_search", "impute_forward_fill",
    "impute_group_mean", "impute_linear_interp", "interval_join",
    "inverted_index", "join_anti", "join_null_safe",
    "join_semi", "journey_trigrams", "kmeans_inertia_monotone",
    "knn_graph", "length_histogram_log2", "lm_perplexity_filter",
    "mad_outliers", "map_funcs", "market_basket_lift",
    "minhash_band_containment", "mm_decode_real", "mm_features",
    "mm_frame_sample", "mm_media_meta", "mm_resize_real",
    "ngram_novelty", "null_funcs", "ohlc_bars",
    "pack_sequences", "pagerank_invariants", "pagerank_words",
    "pca_invariants", "pct_change_wow", "percentiles",
    "pivot_wide", "q10_returned_items", "q11_important_parts",
    "q12_late_priority", "q13_cust_distribution", "q14_promo_effect",
    "q15_top_supplier", "q16_supplier_counts", "q17_small_qty_revenue",
    "q18_large_orders", "q19_discount_revenue", "q1_pricing_summary",
    "q20_promo_suppliers", "q21_waiting_supplier", "q22_sales_opportunity",
    "q2_min_cost_supplier", "q3_shipping_priority", "q4_order_priority",
    "q5_local_supplier", "q6_forecast_revenue", "q7_volume_shipping",
    "q8_market_share", "q9_product_profit", "quality_curriculum_tiers",
    "quality_gopher_rules", "quality_logistic_score", "quantile_bands_daily",
    "range_join", "regex_funcs", "rolling_uniques",
    "safe_casts", "salted_join_agg", "sample_stratified",
    "seasonality_dow", "semdedup_keep", "semdedup_soundness",
    "session_window_agg", "sessionize", "set_ops",
    "shard_assign", "simhash_pigeonhole", "sink_partitioned_roundtrip",
    "sketch_approx_percentile", "sketch_hll_bounds", "sketch_hll_merge_consistent",
    "sketch_hll_mergeable", "sketch_pct_bounds", "skew_profile",
    "skyline_parts", "source_gini", "split_train_test",
    "src_excel", "src_excel_xls", "src_excel_xlsb",
    "stream_dedup", "stream_heavy_hitters_cert", "stream_ohlc_final",
    "stream_session_window", "stream_stateful", "stream_stateful_final",
    "stream_static_join", "stream_stream_join", "stream_window_agg",
    "string_funcs", "subquery_scalar", "text_bigram_kn",
    "text_bigram_lm", "text_bpe_tokenize", "text_chunk",
    "text_clean_pii", "text_fingerprint", "text_langid",
    "text_quality", "text_rarity", "text_repetition",
    "text_tfidf", "text_token_count", "text_trigram_kn",
    "text_word_entropy", "time_functions", "time_rollup",
    "time_window_agg", "token_budget_mix", "top_movers",
    "topk_per_group", "unpivot_long", "user_rfm",
    "vocab_growth", "weighted_sample", "window_lag_delta",
    "window_moving_avg", "window_ntile_firstlast", "window_percent_rank",
    "window_range_value", "window_rolling_time", "window_running",
    "window_share", "zonemap_stats", "zorder_optimize_roundtrip",
    "zorder_write_roundtrip", "zorder_zone_prune", "zscore_outliers",
]



# The FROZEN round-9 query population (260 names) — bench.py's
# suite_r9_subset tripwire for round 10+. Frozen at the round-9 OPEN
# (after the first r9 wave: ann_lifecycle_refresh, mann_whitney_u,
# ks_two_sample, kendall_tau_daily); every later r9 wave (psi_drift,
# js_divergence_types, stream_dq_gate_cert, kmv_set_cardinality,
# graph_adamic_adar, langid_confusion, bpe_fertility_by_lang,
# theil_u_dow_type, seasonality_dft, the hll_grid family,
# kmv_source_overlap, …) stays out and enters the round-10 freeze,
# like every earlier freeze.
_R09_POPULATION = [
    "agg_approx_distinct", "agg_cube", "agg_filter",
    "agg_grouping_sets", "agg_histogram", "agg_incremental_merge",
    "agg_incremental_retract", "agg_median", "agg_misc",
    "agg_rollup", "agg_stats_moments", "ann_bruteforce",
    "ann_ivf", "ann_ivf_fullprobe_exact", "ann_ivfpq",
    "ann_ivfpq_fullprobe_exact", "ann_ivfpq_recall_floor", "ann_lifecycle_refresh",
    "ann_lsh", "ann_lsh_recall_floor", "ann_pq",
    "ann_pq_recall_floor", "anti_contamination_split", "approx_distinct_bounds",
    "array_funcs", "array_set_ops", "asof_join",
    "benford_digit_profile", "bloom_zone_prune", "bm25_search",
    "boilerplate_shingles", "boilerplate_strip", "bpe_apply_large",
    "bpe_learn", "bpe_symbol_census", "budget_sample_apply",
    "cc_convergence", "cc_star_components", "cdc_apply",
    "chi2_independence", "cohort_retention", "compaction_roundtrip",
    "contamination", "corpus_report", "countmin_sketch",
    "curate_corpus", "curate_corpus_v2", "cusum_drift",
    "daily_anomaly_mad", "dedup_blocked_invariance", "dedup_clusters",
    "dedup_containment_keep", "dedup_containment_prefix", "dedup_embedding",
    "dedup_embedding_blocked", "dedup_exact", "dedup_incremental_consistency",
    "dedup_incremental_exact", "dedup_jaccard_prefix", "dedup_keep_one",
    "dedup_minhash_lsh", "dedup_ngram_jaccard", "dedup_paragraph",
    "dedup_simhash", "degree_distribution", "doc_cooccur",
    "domain_cap", "domain_temperature_sample", "dq_rules",
    "dsir_weights", "dup_source_overlap", "dup_span_census",
    "dup_span_strip", "embed_centroid", "embed_outliers",
    "embed_pca", "embed_quantize", "embed_robust_scale",
    "embed_standardize", "entity_resolution", "equidepth_histogram",
    "etl_clean_columns", "etl_dedup_rows", "etl_drop_empty_rows",
    "etl_enrich_metadata", "etl_file_stats", "etl_json_extract",
    "etl_pattern_route", "etl_processing_stats", "etl_quality_profile",
    "etl_scd2_merge", "etl_snapshot_diff", "etl_type_coercion",
    "etl_validate_rows", "event_streaks", "event_transitions",
    "ewma_halflife", "explode_wordcount", "fd_profile",
    "fingerprint_winnowing", "first_touch_attribution", "funnel",
    "fuzzy_join_parts", "gap_fill_daily", "graph_kcore",
    "graph_label_propagation", "graph_triangles", "grouped_ols",
    "grouped_theil_sen", "hash_funcs", "heavy_hitters",
    "hilbert_zone_prune", "hybrid_rrf_search", "impute_forward_fill",
    "impute_group_mean", "impute_linear_interp", "interval_concurrency",
    "interval_join", "inverted_index", "join_anti",
    "join_incremental_delta", "join_null_safe", "join_semi",
    "journey_trigrams", "kendall_tau_daily", "kmeans_inertia_monotone",
    "knn_graph", "ks_two_sample", "length_histogram_log2",
    "lm_perplexity_filter", "mad_outliers", "mann_whitney_u",
    "map_funcs", "market_basket_lift", "median_polish_anomaly",
    "minhash_band_containment", "mm_audiofp_dedup", "mm_decode_real",
    "mm_features", "mm_frame_sample", "mm_media_meta",
    "mm_phash_dedup", "mm_resize_real", "ngram_novelty",
    "null_funcs", "ohlc_bars", "pack_sequences",
    "pagerank_invariants", "pagerank_words", "pca_invariants",
    "pct_change_wow", "percentiles", "pivot_wide",
    "q10_returned_items", "q11_important_parts", "q12_late_priority",
    "q13_cust_distribution", "q14_promo_effect", "q15_top_supplier",
    "q16_supplier_counts", "q17_small_qty_revenue", "q18_large_orders",
    "q19_discount_revenue", "q1_pricing_summary", "q20_promo_suppliers",
    "q21_waiting_supplier", "q22_sales_opportunity", "q2_min_cost_supplier",
    "q3_shipping_priority", "q4_order_priority", "q5_local_supplier",
    "q6_forecast_revenue", "q7_volume_shipping", "q8_market_share",
    "q9_product_profit", "quality_curriculum_tiers", "quality_gopher_rules",
    "quality_logistic_score", "quantile_bands_daily", "range_join",
    "regex_funcs", "rolling_uniques", "safe_casts",
    "salted_join_agg", "sample_stratified", "seasonality_dow",
    "semdedup_keep", "semdedup_soundness", "session_window_agg",
    "sessionize", "set_ops", "shard_assign",
    "simhash_pigeonhole", "sink_partitioned_roundtrip", "sketch_approx_percentile",
    "sketch_hll_bounds", "sketch_hll_merge_consistent", "sketch_hll_mergeable",
    "sketch_pct_bounds", "skew_profile", "skyline_parts",
    "source_gini", "split_leakage_safe", "split_train_test",
    "src_excel", "src_excel_xls", "src_excel_xlsb",
    "stream_countmin_cert", "stream_dedup", "stream_heavy_hitters_cert",
    "stream_histogram_quantiles", "stream_ohlc_final", "stream_session_window",
    "stream_stateful", "stream_stateful_final", "stream_static_join",
    "stream_stream_join", "stream_window_agg", "string_funcs",
    "subquery_scalar", "text_bigram_kn", "text_bigram_lm",
    "text_bpe_tokenize", "text_chunk", "text_clean_pii",
    "text_fingerprint", "text_langid", "text_quality",
    "text_rarity", "text_repetition", "text_tfidf",
    "text_token_count", "text_trigram_kn", "text_word_entropy",
    "time_functions", "time_rollup", "time_window_agg",
    "token_budget_mix", "top_movers", "topk_per_group",
    "unigram_invariants", "unigram_lm_learn", "unpivot_long",
    "user_rfm", "vocab_growth", "weighted_sample",
    "window_lag_delta", "window_moving_avg", "window_ntile_firstlast",
    "window_percent_rank", "window_range_value", "window_rolling_time",
    "window_running", "window_share", "zipf_slope",
    "zonemap_stats", "zorder_optimize_roundtrip", "zorder_write_roundtrip",
    "zorder_zone_prune", "zscore_outliers",
]

# The frozen round-10 population (273 names — the full registry at the
# close of round 9, before this round's additions): bench.py's
# suite_r10_subset tripwire for round 11+.
_R10_POPULATION = [
    "agg_approx_distinct", "agg_cube", "agg_filter", "agg_grouping_sets",
    "agg_histogram", "agg_incremental_merge", "agg_incremental_retract",
    "agg_median", "agg_misc", "agg_rollup", "agg_stats_moments",
    "ann_bruteforce", "ann_ivf", "ann_ivf_fullprobe_exact", "ann_ivfpq",
    "ann_ivfpq_fullprobe_exact", "ann_ivfpq_recall_floor",
    "ann_lifecycle_refresh", "ann_lsh", "ann_lsh_recall_floor", "ann_pq",
    "ann_pq_recall_floor", "anti_contamination_split",
    "approx_distinct_bounds", "array_funcs", "array_set_ops", "asof_join",
    "benford_digit_profile", "bloom_zone_prune", "bm25_search",
    "boilerplate_shingles", "boilerplate_strip", "bpe_apply_large",
    "bpe_fertility_by_lang", "bpe_learn", "bpe_symbol_census",
    "budget_sample_apply", "cc_convergence", "cc_star_components",
    "cdc_apply", "chi2_independence", "cohort_retention",
    "compaction_roundtrip", "contamination", "corpus_report",
    "countmin_sketch", "curate_corpus", "curate_corpus_v2", "cusum_drift",
    "daily_anomaly_mad", "dedup_blocked_invariance", "dedup_clusters",
    "dedup_containment_keep", "dedup_containment_prefix", "dedup_embedding",
    "dedup_embedding_blocked", "dedup_exact", "dedup_incremental_consistency",
    "dedup_incremental_exact", "dedup_jaccard_prefix", "dedup_keep_one",
    "dedup_minhash_lsh", "dedup_ngram_jaccard", "dedup_paragraph",
    "dedup_simhash", "degree_distribution", "doc_cooccur", "domain_cap",
    "domain_temperature_sample", "dq_rules", "dsir_weights",
    "dup_source_overlap", "dup_span_census", "dup_span_strip",
    "embed_centroid", "embed_outliers", "embed_pca", "embed_quantize",
    "embed_robust_scale", "embed_standardize", "entity_resolution",
    "equidepth_histogram", "etl_clean_columns", "etl_dedup_rows",
    "etl_drop_empty_rows", "etl_enrich_metadata", "etl_file_stats",
    "etl_json_extract", "etl_pattern_route", "etl_processing_stats",
    "etl_quality_profile", "etl_scd2_merge", "etl_snapshot_diff",
    "etl_type_coercion", "etl_validate_rows", "event_streaks",
    "event_transitions", "ewma_halflife", "explode_wordcount", "fd_profile",
    "fingerprint_winnowing", "first_touch_attribution", "funnel",
    "fuzzy_join_parts", "gap_fill_daily", "graph_adamic_adar", "graph_kcore",
    "graph_label_propagation", "graph_triangles", "grouped_ols",
    "grouped_theil_sen", "hash_funcs", "heavy_hitters", "hilbert_zone_prune",
    "hll_grid_estimate", "hll_grid_sketch", "hybrid_rrf_search",
    "impute_forward_fill", "impute_group_mean", "impute_linear_interp",
    "interval_concurrency", "interval_join", "inverted_index", "join_anti",
    "join_incremental_delta", "join_null_safe", "join_semi",
    "journey_trigrams", "js_divergence_types", "kendall_tau_daily",
    "kmeans_inertia_monotone", "kmv_set_cardinality", "kmv_source_overlap",
    "knn_graph", "ks_two_sample", "langid_confusion", "length_histogram_log2",
    "lm_perplexity_filter", "mad_outliers", "mann_whitney_u", "map_funcs",
    "market_basket_lift", "median_polish_anomaly", "minhash_band_containment",
    "mm_audiofp_dedup", "mm_decode_real", "mm_features", "mm_frame_sample",
    "mm_media_meta", "mm_phash_dedup", "mm_resize_real", "ngram_novelty",
    "null_funcs", "ohlc_bars", "pack_sequences", "pagerank_invariants",
    "pagerank_words", "pca_invariants", "pct_change_wow", "percentiles",
    "pivot_wide", "psi_drift", "q10_returned_items", "q11_important_parts",
    "q12_late_priority", "q13_cust_distribution", "q14_promo_effect",
    "q15_top_supplier", "q16_supplier_counts", "q17_small_qty_revenue",
    "q18_large_orders", "q19_discount_revenue", "q1_pricing_summary",
    "q20_promo_suppliers", "q21_waiting_supplier", "q22_sales_opportunity",
    "q2_min_cost_supplier", "q3_shipping_priority", "q4_order_priority",
    "q5_local_supplier", "q6_forecast_revenue", "q7_volume_shipping",
    "q8_market_share", "q9_product_profit", "quality_curriculum_tiers",
    "quality_gopher_rules", "quality_logistic_score", "quantile_bands_daily",
    "range_join", "regex_funcs", "rolling_uniques", "safe_casts",
    "salted_join_agg", "sample_stratified", "seasonality_dft",
    "seasonality_dow", "semdedup_keep", "semdedup_soundness",
    "session_window_agg", "sessionize", "set_ops", "shard_assign",
    "simhash_pigeonhole", "sink_partitioned_roundtrip",
    "sketch_approx_percentile", "sketch_hll_bounds",
    "sketch_hll_merge_consistent", "sketch_hll_mergeable",
    "sketch_pct_bounds", "skew_profile", "skyline_parts", "source_gini",
    "split_leakage_safe", "split_train_test", "src_excel", "src_excel_xls",
    "src_excel_xlsb", "stream_countmin_cert", "stream_dedup",
    "stream_dq_gate_cert", "stream_heavy_hitters_cert",
    "stream_histogram_quantiles", "stream_hll_cert", "stream_ohlc_final",
    "stream_session_window", "stream_stateful", "stream_stateful_final",
    "stream_static_join", "stream_stream_join", "stream_window_agg",
    "string_funcs", "subquery_scalar", "text_bigram_kn", "text_bigram_lm",
    "text_bpe_tokenize", "text_chunk", "text_clean_pii", "text_fingerprint",
    "text_langid", "text_quality", "text_rarity", "text_repetition",
    "text_tfidf", "text_token_count", "text_trigram_kn", "text_word_entropy",
    "theil_u_dow_type", "time_functions", "time_rollup", "time_window_agg",
    "token_budget_mix", "top_movers", "topk_per_group", "unigram_invariants",
    "unigram_lm_learn", "unpivot_long", "user_rfm", "vocab_growth",
    "weighted_sample", "window_lag_delta", "window_moving_avg",
    "window_ntile_firstlast", "window_percent_rank", "window_range_value",
    "window_rolling_time", "window_running", "window_share", "zipf_slope",
    "zonemap_stats", "zorder_optimize_roundtrip", "zorder_write_roundtrip",
    "zorder_zone_prune", "zscore_outliers",
]


# The frozen round-11 population (296 names — the full registry at the
# close of round 11, before round 12's twelve promotions): bench.py's
# suite_r11_subset tripwire for round 12+ (same rationale as every
# earlier freeze — only a frozen whitelist keeps totals comparable as
# rounds add queries).
_R11_POPULATION = [
    "acf_daily", "agg_approx_distinct", "agg_cube",
    "agg_filter", "agg_grouping_sets", "agg_histogram",
    "agg_incremental_merge", "agg_incremental_retract", "agg_median",
    "agg_misc", "agg_rollup", "agg_stats_moments",
    "ams_f2_bounds", "ams_f2_sketch", "ams_skew_by_type",
    "ann_append_cert", "ann_bruteforce", "ann_ivf",
    "ann_ivf_fullprobe_exact", "ann_ivfpq", "ann_ivfpq_fullprobe_exact",
    "ann_ivfpq_recall_floor", "ann_lifecycle_refresh", "ann_lsh",
    "ann_lsh_recall_floor", "ann_pq", "ann_pq_recall_floor",
    "anti_contamination_split", "approx_distinct_bounds", "array_funcs",
    "array_set_ops", "asof_join", "benford_digit_profile",
    "bloom_zone_prune", "bm25_batch_cert", "bm25_search",
    "boilerplate_shingles", "boilerplate_strip", "bpe_apply_large",
    "bpe_fertility_by_lang", "bpe_learn", "bpe_symbol_census",
    "budget_sample_apply", "cc_convergence", "cc_star_components",
    "cdc_apply", "chi2_independence", "cm_join_size",
    "cohort_retention", "compaction_roundtrip", "contamination",
    "corpus_report", "countmin_sketch", "curate_corpus",
    "curate_corpus_v2", "cusum_drift", "daily_anomaly_mad",
    "dedup_blocked_invariance", "dedup_clusters", "dedup_containment_keep",
    "dedup_containment_prefix", "dedup_embedding", "dedup_embedding_blocked",
    "dedup_exact", "dedup_incremental_consistency", "dedup_incremental_exact",
    "dedup_jaccard_prefix", "dedup_keep_one", "dedup_minhash_lsh",
    "dedup_ngram_jaccard", "dedup_paragraph", "dedup_simhash",
    "degree_distribution", "doc_cooccur", "domain_cap",
    "domain_temperature_sample", "dq_rules", "dsir_weights",
    "dup_source_overlap", "dup_span_census", "dup_span_strip",
    "embed_centroid", "embed_outliers", "embed_pca",
    "embed_quantize", "embed_robust_scale", "embed_standardize",
    "entity_resolution", "equidepth_histogram", "etl_clean_columns",
    "etl_dedup_rows", "etl_drop_empty_rows", "etl_enrich_metadata",
    "etl_file_stats", "etl_json_extract", "etl_pattern_route",
    "etl_processing_stats", "etl_quality_profile", "etl_scd2_merge",
    "etl_snapshot_diff", "etl_type_coercion", "etl_validate_rows",
    "event_streaks", "event_transitions", "ewma_halflife",
    "explode_wordcount", "fd_profile", "fingerprint_winnowing",
    "first_touch_attribution", "funnel", "fuzzy_join_parts",
    "gap_fill_daily", "graph_adamic_adar", "graph_clustering_coeff",
    "graph_kcore", "graph_label_propagation", "graph_triangles",
    "grouped_ols", "grouped_theil_sen", "hash_funcs",
    "heavy_hitters", "hilbert_zone_prune", "hll_grid_estimate",
    "hll_grid_sketch", "hll_rolling_uniques", "hybrid_rrf_search",
    "impute_forward_fill", "impute_group_mean", "impute_linear_interp",
    "interval_concurrency", "interval_join", "inverted_index",
    "join_anti", "join_incremental_delta", "join_null_safe",
    "join_semi", "journey_trigrams", "js_divergence_types",
    "kendall_tau_daily", "kmeans_inertia_monotone", "kmv_set_cardinality",
    "kmv_source_overlap", "knn_graph", "ks_two_sample",
    "langid_confusion", "length_histogram_log2", "lm_perplexity_filter",
    "mad_outliers", "mann_kendall_trend", "mann_whitney_u",
    "map_funcs", "market_basket_lift", "median_polish_anomaly",
    "minhash_band_containment", "mm_audiofp_dedup", "mm_decode_real",
    "mm_features", "mm_frame_sample", "mm_media_meta",
    "mm_phash_dedup", "mm_resize_real", "ngram_novelty",
    "null_funcs", "ohlc_bars", "pack_sequences",
    "pagerank_invariants", "pagerank_words", "pca_invariants",
    "pct_change_wow", "percentiles", "pipeline_e2e_cert",
    "pivot_wide", "psi_drift", "q10_returned_items",
    "q11_important_parts", "q12_late_priority", "q13_cust_distribution",
    "q14_promo_effect", "q15_top_supplier", "q16_supplier_counts",
    "q17_small_qty_revenue", "q18_large_orders", "q19_discount_revenue",
    "q1_pricing_summary", "q20_promo_suppliers", "q21_waiting_supplier",
    "q22_sales_opportunity", "q2_min_cost_supplier", "q3_shipping_priority",
    "q4_order_priority", "q5_local_supplier", "q6_forecast_revenue",
    "q7_volume_shipping", "q8_market_share", "q9_product_profit",
    "qsketch_build", "qsketch_by_source", "qsketch_merge_consistent",
    "qsketch_rank_bounds", "quality_curriculum_tiers", "quality_gopher_rules",
    "quality_logistic_score", "quantile_bands_daily", "range_join",
    "regex_funcs", "reservoir_by_source", "rolling_uniques",
    "safe_casts", "salted_join_agg", "salting_advice_cert",
    "sample_stratified", "seasonality_dft", "seasonality_dow",
    "semdedup_keep", "semdedup_soundness", "session_window_agg",
    "sessionize", "set_ops", "shard_assign",
    "simhash_pigeonhole", "sink_partitioned_roundtrip", "sketch_approx_percentile",
    "sketch_hll_bounds", "sketch_hll_merge_consistent", "sketch_hll_mergeable",
    "sketch_pct_bounds", "skew_profile", "skyline_parts",
    "source_gini", "split_leakage_safe", "split_train_test",
    "src_excel", "src_excel_xls", "src_excel_xlsb",
    "stream_ams_cert", "stream_bm25_cert", "stream_countmin_cert",
    "stream_dedup", "stream_dq_gate_cert", "stream_heavy_hitters_cert",
    "stream_histogram_quantiles", "stream_hll_cert", "stream_kmv_cert",
    "stream_ohlc_final", "stream_qsketch_cert", "stream_reservoir_cert",
    "stream_session_window", "stream_stateful", "stream_stateful_final",
    "stream_static_join", "stream_stream_join", "stream_window_agg",
    "string_funcs", "subquery_scalar", "text_bigram_kn",
    "text_bigram_lm", "text_bpe_tokenize", "text_chunk",
    "text_clean_pii", "text_fingerprint", "text_langid",
    "text_quality", "text_rarity", "text_repetition",
    "text_tfidf", "text_token_count", "text_trigram_kn",
    "text_word_entropy", "theil_u_dow_type", "time_functions",
    "time_rollup", "time_window_agg", "token_budget_mix",
    "top_movers", "topk_per_group", "unigram_invariants",
    "unigram_lm_learn", "unpivot_long", "user_rfm",
    "vocab_growth", "weighted_sample", "weighted_sample_merge",
    "window_lag_delta", "window_moving_avg", "window_ntile_firstlast",
    "window_percent_rank", "window_range_value", "window_rolling_time",
    "window_running", "window_share", "zipf_slope",
    "zonemap_stats", "zorder_optimize_roundtrip", "zorder_write_roundtrip",
    "zorder_zone_prune", "zscore_outliers",
]


# The frozen round-12 population (308 names — the full registry at the
# close of round 12, before round 13's trio promotion): bench.py's
# suite_r12_subset tripwire for round 13+ (same rationale as every
# earlier freeze — only a frozen whitelist keeps totals comparable as
# rounds add queries).
_R12_POPULATION = [
    "acf_daily", "agg_approx_distinct", "agg_cube",
    "agg_filter", "agg_grouping_sets", "agg_histogram",
    "agg_incremental_merge", "agg_incremental_retract", "agg_median",
    "agg_misc", "agg_rollup", "agg_stats_moments",
    "ams_f2_bounds", "ams_f2_sketch", "ams_skew_by_type",
    "ann_append_cert", "ann_bruteforce", "ann_dim_truncation_recall",
    "ann_ivf", "ann_ivf_fullprobe_exact", "ann_ivfpq",
    "ann_ivfpq_fullprobe_exact", "ann_ivfpq_recall_floor", "ann_lifecycle_refresh",
    "ann_lsh", "ann_lsh_recall_floor", "ann_pq",
    "ann_pq_recall_floor", "ann_takedown_cert", "anti_contamination_split",
    "approx_distinct_bounds", "array_funcs", "array_set_ops",
    "asof_join", "benford_digit_profile", "bloom_zone_prune",
    "bm25_batch_cert", "bm25_search", "bm25_takedown_cert",
    "boilerplate_shingles", "boilerplate_strip", "bpe_apply_large",
    "bpe_fertility_by_lang", "bpe_learn", "bpe_symbol_census",
    "budget_sample_apply", "cc_convergence", "cc_star_components",
    "cdc_apply", "changepoint_binary_seg", "chi2_independence",
    "cm_join_size", "cohort_retention", "compaction_roundtrip",
    "contamination", "corpus_report", "countmin_sketch",
    "curate_corpus", "curate_corpus_v2", "cusum_drift",
    "daily_anomaly_mad", "dedup_blocked_invariance", "dedup_clusters",
    "dedup_containment_keep", "dedup_containment_prefix", "dedup_embedding",
    "dedup_embedding_blocked", "dedup_exact", "dedup_incremental_consistency",
    "dedup_incremental_exact", "dedup_jaccard_prefix", "dedup_keep_one",
    "dedup_minhash_lsh", "dedup_ngram_jaccard", "dedup_paragraph",
    "dedup_simhash", "dedup_takedown_cert", "degree_distribution",
    "delete_where_cert", "delete_where_versioned_cert", "doc_cooccur",
    "domain_cap", "domain_temperature_sample", "dq_rules",
    "dsir_weights", "dup_source_overlap", "dup_span_census",
    "dup_span_strip", "embed_centroid", "embed_outliers",
    "embed_pca", "embed_quantize", "embed_robust_scale",
    "embed_standardize", "entity_resolution", "equidepth_histogram",
    "etl_clean_columns", "etl_dedup_rows", "etl_drop_empty_rows",
    "etl_enrich_metadata", "etl_file_stats", "etl_json_extract",
    "etl_pattern_route", "etl_processing_stats", "etl_quality_profile",
    "etl_scd2_merge", "etl_snapshot_diff", "etl_type_coercion",
    "etl_validate_rows", "event_streaks", "event_transitions",
    "ewma_halflife", "explode_wordcount", "fd_profile",
    "fingerprint_winnowing", "first_touch_attribution", "funnel",
    "fuzzy_join_parts", "gap_fill_daily", "graph_adamic_adar",
    "graph_clustering_coeff", "graph_jaccard_similarity", "graph_kcore",
    "graph_label_propagation", "graph_triangles", "grouped_ols",
    "grouped_theil_sen", "hash_funcs", "heavy_hitters",
    "hilbert_zone_prune", "hll_grid_estimate", "hll_grid_sketch",
    "hll_rolling_uniques", "hybrid_rrf_search", "impute_forward_fill",
    "impute_group_mean", "impute_linear_interp", "interval_concurrency",
    "interval_join", "inverted_index", "join_anti",
    "join_incremental_delta", "join_null_safe", "join_semi",
    "journey_trigrams", "js_divergence_types", "kendall_tau_daily",
    "kmeans_inertia_monotone", "kmv_set_cardinality", "kmv_source_overlap",
    "knn_graph", "ks_two_sample", "langid_confusion",
    "length_histogram_log2", "lm_perplexity_filter", "mad_outliers",
    "mann_kendall_trend", "mann_whitney_u", "map_funcs",
    "market_basket_lift", "median_polish_anomaly", "minhash_band_containment",
    "mm_audiofp_dedup", "mm_decode_real", "mm_features",
    "mm_frame_sample", "mm_media_meta", "mm_phash_dedup",
    "mm_resize_real", "ngram_novelty", "null_funcs",
    "ohlc_bars", "pack_sequences", "pagerank_invariants",
    "pagerank_words", "pca_invariants", "pct_change_wow",
    "percentiles", "phrase_search_cert", "pipeline_e2e_cert",
    "pipeline_e2e_stream_cert", "pivot_wide", "proximity_search_cert",
    "psi_drift", "q10_returned_items", "q11_important_parts",
    "q12_late_priority", "q13_cust_distribution", "q14_promo_effect",
    "q15_top_supplier", "q16_supplier_counts", "q17_small_qty_revenue",
    "q18_large_orders", "q19_discount_revenue", "q1_pricing_summary",
    "q20_promo_suppliers", "q21_waiting_supplier", "q22_sales_opportunity",
    "q2_min_cost_supplier", "q3_shipping_priority", "q4_order_priority",
    "q5_local_supplier", "q6_forecast_revenue", "q7_volume_shipping",
    "q8_market_share", "q9_product_profit", "qsketch_build",
    "qsketch_by_source", "qsketch_merge_consistent", "qsketch_rank_bounds",
    "quality_curriculum_tiers", "quality_gopher_rules", "quality_logistic_score",
    "quantile_bands_daily", "range_join", "regex_funcs",
    "reservoir_by_source", "rolling_uniques", "safe_casts",
    "salted_join_agg", "salting_advice_cert", "sample_stratified",
    "seasonality_dft", "seasonality_dow", "semdedup_keep",
    "semdedup_soundness", "session_window_agg", "sessionize",
    "set_ops", "shard_assign", "simhash_pigeonhole",
    "sink_partitioned_roundtrip", "sketch_approx_percentile", "sketch_hll_bounds",
    "sketch_hll_merge_consistent", "sketch_hll_mergeable", "sketch_pct_bounds",
    "skew_profile", "skyline_parts", "source_gini",
    "split_leakage_safe", "split_train_test", "src_excel",
    "src_excel_xls", "src_excel_xlsb", "stream_ams_cert",
    "stream_bm25_cert", "stream_countmin_cert", "stream_dedup",
    "stream_dq_gate_cert", "stream_heavy_hitters_cert", "stream_histogram_quantiles",
    "stream_hll_cert", "stream_kmv_cert", "stream_ohlc_final",
    "stream_qsketch_cert", "stream_reservoir_cert", "stream_session_window",
    "stream_stateful", "stream_stateful_final", "stream_static_join",
    "stream_stream_join", "stream_window_agg", "string_funcs",
    "subquery_scalar", "text_bigram_kn", "text_bigram_lm",
    "text_bpe_tokenize", "text_chunk", "text_clean_pii",
    "text_fingerprint", "text_langid", "text_quality",
    "text_rarity", "text_repetition", "text_tfidf",
    "text_token_count", "text_trigram_kn", "text_word_entropy",
    "theil_u_dow_type", "time_functions", "time_rollup",
    "time_window_agg", "token_budget_mix", "top_movers",
    "topk_per_group", "unigram_invariants", "unigram_lm_learn",
    "unpivot_long", "user_rfm", "vocab_growth",
    "weighted_sample", "weighted_sample_merge", "window_lag_delta",
    "window_moving_avg", "window_ntile_firstlast", "window_percent_rank",
    "window_range_value", "window_rolling_time", "window_running",
    "window_share", "wordpiece_tokenize", "zipf_slope",
    "zonemap_stats", "zorder_optimize_roundtrip", "zorder_write_roundtrip",
    "zorder_zone_prune", "zscore_outliers",
]

def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Certify-first ordering under the driver's ~50-query budget: never-
    certified queries first (the round-5 additions), then rows whose code
    changed this round, then previously-certified rows oldest-round-first
    (most-recent certification wins: a row re-certified in r4 sits in the
    r4 tail even if r1 also covered it).
    """
    rounds = [_R01_CERTIFIED, _R02_CERTIFIED, _R03_CERTIFIED,
              _R04_CERTIFIED, _R05_CERTIFIED, _R06_CERTIFIED,
              _R07_CERTIFIED, _R08_CERTIFIED, _R09_CERTIFIED,
              _R10_CERTIFIED, _R11_CERTIFIED, _R12_CERTIFIED,
              _R13_CERTIFIED, _R14_CERTIFIED]
    certified = set().union(*map(set, rounds))
    head = [n for n in QUERIES if n not in certified]
    redo = [n for n in _RECERTIFY if n in QUERIES and n in certified]
    seen = set(head) | set(redo)
    # oldest-round-first, where a query's round is its LATEST green run
    latest: dict[str, int] = {}
    for i, round_list in enumerate(rounds):
        for n in round_list:
            latest[n] = i
    tails: list[list[str]] = [[] for _ in rounds]
    for i, round_list in enumerate(rounds):
        for n in round_list:
            if n in QUERIES and n not in seen and latest[n] == i:
                tails[i].append(n)
                seen.add(n)
    ordered = [*head, *redo, *(n for t in tails for n in t)]
    return {n: QUERIES[n] for n in ordered}


def oracle_sql() -> dict[str, str]:
    """DuckDB-dialect ANSI-SQL twins for every SQL-expressible query."""
    return dict(ORACLES)
