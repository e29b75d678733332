"""Plan-shape assertions for the round-6 queries: the scale properties
(broadcast cuts, partitioned windows, no global sorts, no cartesian
blowups) that decide whether they survive 100 TB."""

from __future__ import annotations

from light_etl_windows_container_poc_spark.plans import (
    assert_broadcast_join, assert_no_python_udf, formatted_plan)
from light_etl_windows_container_poc_spark.queries import QUERIES


def test_equidepth_cuts_distributed_and_broadcast(spark, sf_dir):
    """Deciles come from exact_quantile_cuts: the only windows sit ABOVE
    the distinct-value histogram aggregate (within-bucket cumsum + the
    bounded bucket-offset spine) — never over the raw fact rows (no
    ntile, no value-ordered global window on the scan); the 1-row cuts
    relation broadcasts back."""
    import re

    df = QUERIES["equidepth_histogram"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "ntile" not in plan
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs
    for s in specs:
        head = s.split(",")[0].strip()
        if head.endswith(("ASC NULLS FIRST", "DESC NULLS LAST")):
            # the ONLY partition-less window is the bucket-offset spine
            # (≤ max_buckets rows by construction) — never the raw value
            assert head.startswith("bkt"), specs
    assert_broadcast_join(df, min_count=1)
    assert_no_python_udf(df)


def test_benford_output_is_digit_sized(spark, sf_dir):
    df = QUERIES["benford_digit_profile"](spark, sf_dir)
    assert_broadcast_join(df, min_count=1)  # scalar total
    assert_no_python_udf(df)


def test_chi2_totals_broadcast(spark, sf_dir):
    # row totals, column totals, and the grand total all broadcast onto
    # the |types|·7 cell relation
    df = QUERIES["chi2_independence"](spark, sf_dir)
    assert_broadcast_join(df, min_count=3)
    assert_no_python_udf(df)


def test_wow_and_movers_windows_are_partitioned(spark, sf_dir):
    for name in ("pct_change_wow", "top_movers"):
        plan = formatted_plan(QUERIES[name](spark, sf_dir))
        assert "Window" in plan, name
        # every windowspecdefinition carries the event_type partition key
        import re
        specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
        assert specs, name
        assert all("event_type" in s for s in specs), (name, specs)
        assert_no_python_udf(QUERIES[name](spark, sf_dir))


def test_span_strip_and_winnowing_stay_jvm_and_equi(spark, sf_dir):
    for name in ("dup_span_strip", "fingerprint_winnowing"):
        df = QUERIES[name](spark, sf_dir)
        plan = formatted_plan(df)
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name
        assert_no_python_udf(df)


def test_winnowing_window_is_per_doc(spark, sf_dir):
    import re

    plan = formatted_plan(QUERIES["fingerprint_winnowing"](spark, sf_dir))
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs
    assert all("doc_id" in s for s in specs), specs


def test_incremental_exact_joins_on_digest_only(spark, sf_dir):
    df = QUERIES["dedup_incremental_exact"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert_no_python_udf(df)
