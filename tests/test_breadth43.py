"""Round-12 head candidate pre-certified through the EXACT local-gate
compare (tools/check_oracle's pandas fetch + frame_fingerprint) at
sf0.001 — queries/breadth42.py registers pipeline_e2e_stream_cert in a
later round by adding the @query decorator; the certification evidence
exists NOW (the 0.01/0.1 legs run in the round-close gate sweep)."""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

from check_oracle import (  # noqa: E402
    _pandas_rows,
    frame_fingerprint,
    oracle_type_problems,
)

from light_etl_windows_container_poc_spark.catalog import (  # noqa: E402
    TABLES,
    table_path,
)
from light_etl_windows_container_poc_spark.queries.breadth42 import (  # noqa: E402
    PIPELINE_E2E_STREAM_ORACLE,
    pipeline_e2e_stream_cert,
)


@pytest.fixture()
def con(sf_dir):
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                  f"read_parquet('{table_path(sf_dir, t)}')")
    yield c
    c.close()


def test_pipeline_e2e_stream_cert_gate_green(spark, sf_dir, con):
    assert oracle_type_problems(con, PIPELINE_E2E_STREAM_ORACLE) == []
    sdf = pipeline_e2e_stream_cert(spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    odf = con.execute(PIPELINE_E2E_STREAM_ORACLE).df()
    ocols, orows = list(odf.columns), _pandas_rows(odf)
    assert len(srows) == len(orows) == 2  # one row per routed table
    assert sorted(scols) == sorted(ocols)
    assert frame_fingerprint(scols, srows) == frame_fingerprint(ocols, orows)


def _gate_compare(spark_df, con, oracle_sql):
    assert oracle_type_problems(con, oracle_sql) == []
    scols = spark_df.columns
    srows = [tuple(r) for r in spark_df.collect()]
    odf = con.execute(oracle_sql).df()
    ocols, orows = list(odf.columns), _pandas_rows(odf)
    assert len(srows) == len(orows)
    assert sorted(scols) == sorted(ocols)
    assert frame_fingerprint(scols, srows) == frame_fingerprint(ocols, orows)
    return len(srows)


def test_graph_jaccard_similarity_gate_green(spark, sf_dir, con):
    from light_etl_windows_container_poc_spark.queries.breadth42 import (
        GRAPH_JACCARD_ORACLE,
        graph_jaccard_similarity,
    )

    n = _gate_compare(graph_jaccard_similarity(spark, sf_dir), con,
                      GRAPH_JACCARD_ORACLE)
    assert n > 0


def test_ann_dim_truncation_recall_gate_green(spark, sf_dir, con):
    from light_etl_windows_container_poc_spark.queries.breadth42 import (
        ANN_DIM_TRUNCATION_ORACLE,
        ann_dim_truncation_recall,
    )

    sdf = ann_dim_truncation_recall(spark, sf_dir)
    rows = {r.dim: r for r in sdf.collect()}
    # the identity leg: full-dim search recalls everything
    assert rows[64].n_overlap == 5 * rows[64].n_queries
    assert rows[64].recall_micro == 1_000_000
    # truncation can only lose recall, monotonically in dim
    assert rows[16].n_overlap <= rows[32].n_overlap <= rows[64].n_overlap
    n = _gate_compare(sdf, con, ANN_DIM_TRUNCATION_ORACLE)
    assert n == 3


def test_wordpiece_greedy_reference_cases():
    """Hand-checked greedy longest-match chains under the frozen vocab
    (initial table at pos 0, continuation table after)."""
    from light_etl_windows_container_poc_spark.queries.breadth42 import (
        wordpiece_greedy_lengths,
    )

    # 'window' is an initial vocab entry -> 1 token
    assert wordpiece_greedy_lengths("window") == 1
    # 'windows': 'window'(6) + 's' fallback -> 2
    assert wordpiece_greedy_lengths("windows") == 2
    # 'streaming': 'stream'(6) + 'ing'(3) -> 2
    assert wordpiece_greedy_lengths("streaming") == 2
    # 'queryable': 'query'(5) + 'able'? no -> 'a' fallback? cont has
    # 'an','at','ble' -> pos5 'a' fallback(1), pos6 'ble'(3) -> 3
    assert wordpiece_greedy_lengths("queryable") == 3
    # unmatched word: every char falls back
    assert wordpiece_greedy_lengths("zzz") == 3
    assert wordpiece_greedy_lengths("") == 0


def test_wordpiece_tokenize_gate_green(spark, sf_dir, con):
    from light_etl_windows_container_poc_spark.queries.breadth42 import (
        WORDPIECE_TOKENIZE_ORACLE,
        wordpiece_tokenize,
    )

    n = _gate_compare(wordpiece_tokenize(spark, sf_dir), con,
                      WORDPIECE_TOKENIZE_ORACLE)
    assert n > 0


def test_changepoint_binary_seg_gate_green(spark, sf_dir, con):
    from light_etl_windows_container_poc_spark.queries.breadth42 import (
        CHANGEPOINT_ORACLE,
        changepoint_binary_seg,
    )

    sdf = changepoint_binary_seg(spark, sf_dir)
    rows = sdf.collect()
    # structural invariants: both segments non-empty, sums partition
    for r in rows:
        assert r.n1 >= 1 and r.n2 >= 1
        assert r.gain_micro >= 0  # a split can never fit worse
    n = _gate_compare(sdf, con, CHANGEPOINT_ORACLE)
    assert n > 0


def test_changepoint_finds_a_planted_level_shift(spark):
    """A synthetic series with an obvious level shift must split at the
    shift boundary."""
    import datetime as dt

    from light_etl_windows_container_poc_spark.queries.breadth42 import (
        changepoint_binary_seg,
    )

    rows = []
    for i in range(20):
        day = dt.datetime(2024, 1, 1 + i)
        n = 2 if i < 10 else 40  # shift after day 10
        for k in range(n):
            rows.append(("shifty", day))
    df = spark.createDataFrame(rows, "event_type string, ts timestamp")

    import light_etl_windows_container_poc_spark.queries.breadth42 as b42
    real = b42.load_tables
    b42.load_tables = lambda s, d, names: {"events": df}
    try:
        got = changepoint_binary_seg(spark, "ignored").collect()
    finally:
        b42.load_tables = real
    assert len(got) == 1
    assert got[0].split_day == "2024-01-10"  # last day of the low level
    assert (got[0].n1, got[0].n2) == (10, 10)
    assert (got[0].s1, got[0].s2) == (20, 400)


def test_delete_where_cert_gate_green(spark, sf_dir, con):
    from light_etl_windows_container_poc_spark.queries.breadth42 import (
        DELETE_WHERE_ORACLE,
        delete_where_cert,
    )

    sdf = delete_where_cert(spark, sf_dir)
    row = sdf.collect()[0]
    assert row.n_matching_left == 0 and row.n_deleted > 0
    assert _gate_compare(sdf, con, DELETE_WHERE_ORACLE) == 1


def test_delete_where_versioned_cert_gate_green(spark, sf_dir, con):
    from light_etl_windows_container_poc_spark.queries.breadth42 import (
        DELETE_WHERE_VERSIONED_ORACLE,
        delete_where_versioned_cert,
    )

    sdf = delete_where_versioned_cert(spark, sf_dir)
    rows = sdf.collect()
    assert [r.version for r in rows] == [0, 1]
    assert all(r.n_matching_left == 0 for r in rows)
    assert _gate_compare(sdf, con, DELETE_WHERE_VERSIONED_ORACLE) == 2


def test_breadth42_plans_are_cartesian_free(spark, sf_dir):
    """The r12-queue candidates hold the registered families' plan
    contract: no CartesianProduct; pair relations are equi-joins on
    bounded keys (shared part / day spine / qid)."""
    from light_etl_windows_container_poc_spark.plans import formatted_plan
    from light_etl_windows_container_poc_spark.queries.breadth42 import (
        changepoint_binary_seg,
        graph_jaccard_similarity,
        wordpiece_tokenize,
    )

    for fn in (graph_jaccard_similarity, changepoint_binary_seg,
               wordpiece_tokenize):
        plan = formatted_plan(fn(spark, sf_dir))
        assert "CartesianProduct" not in plan, fn.__name__


def test_proximity_search_cert_gate_green(spark, sf_dir, con):
    from light_etl_windows_container_poc_spark.queries.breadth42 import (
        PROXIMITY_SEARCH_ORACLE,
        proximity_search_cert,
    )

    n = _gate_compare(proximity_search_cert(spark, sf_dir), con,
                      PROXIMITY_SEARCH_ORACLE)
    assert n > 0
