"""Streaming row-level DQ gate (`streaming.quality_gate`): flag →
clean/quarantine split → per-batch audit, over a real availableNow run."""

from __future__ import annotations

from pyspark.sql import functions as F

from light_etl_windows_container_poc_spark.queries.streaming_q import \
    _events_stream
from light_etl_windows_container_poc_spark.streaming.quality_gate import (
    flag_rule_violations, rule_audit, split_on_rules, start_dq_gate_stream)

def _rules():
    # Columns need an active session — build lazily inside the tests
    return {
        "value_nonneg": F.col("value") < 0,
        "user_known": F.col("user_id").isNull(),
    }


def test_flag_split_audit_batch_semantics(spark):
    df = spark.createDataFrame(
        [(1, 5.0), (2, -1.0), (None, -2.0), (3, 0.0)],
        "user_id long, value double")
    flagged = flag_rule_violations(df, _rules())
    clean, bad = split_on_rules(flagged)
    assert clean.count() == 2
    got = {r["user_id"]: r["dq_failed"] for r in bad.collect()}
    assert got[2] == "value_nonneg"
    assert got[None] == "value_nonneg,user_known"  # both rules, rule order
    audit = {r["rule"]: r["n_violations"]
             for r in rule_audit(flagged, _rules(), batch_id=7).collect()}
    assert audit == {"value_nonneg": 2, "user_known": 1, "_rows": 4}


def test_stream_gate_routes_and_audits(spark, sf_dir, tmp_path):
    clean_p = str(tmp_path / "clean")
    quar_p = str(tmp_path / "quarantine")
    audit_p = str(tmp_path / "audit")

    stream = _events_stream(spark, sf_dir).select("user_id", "value")
    q = start_dq_gate_stream(stream, _rules(), clean_p, quar_p, audit_p,
                             checkpoint_dir=str(tmp_path / "ckpt"))
    q.awaitTermination(300)

    from light_etl_windows_container_poc_spark.catalog import load_tables

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    n_total = ev.count()
    n_bad = ev.filter((F.col("value") < 0) |
                      F.col("user_id").isNull()).count()

    clean = spark.read.parquet(clean_p)
    assert clean.count() == n_total - n_bad
    assert "_dq_violations" not in clean.columns

    audit = spark.read.parquet(audit_p)
    totals = (audit.filter(F.col("rule") == "_rows")
              .agg(F.sum("n_violations")).collect()[0][0])
    assert totals == n_total  # every row of every batch was audited

    if n_bad:
        quar = spark.read.parquet(quar_p)
        assert quar.count() == n_bad
        assert "dq_failed" in quar.columns
    # batch ids recorded for downstream replay-dedup
    assert audit.filter(F.col("batch_id") < 0).count() == 0
