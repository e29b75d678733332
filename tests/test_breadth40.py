"""Sketch-application wave: the day-grid MAX-merge window theorem
(merging per-day HLL grids over a window == the one-shot grid of the
window's rows), CM inner-product one-sidedness on an adversarial
all-collision fixture, and plan hygiene."""

from __future__ import annotations

from pyspark.sql import functions as F

from light_etl_windows_container_poc_spark.operators.sketches import cm_build
from light_etl_windows_container_poc_spark.streaming.hll import hll_grid


def test_day_grid_max_merge_equals_window_grid(spark):
    """The rollup's core algebra: max-merging per-day register grids
    over a day window produces exactly the grid of the window's union
    of rows (register max is associative/commutative/idempotent)."""
    rows = [(d, f"u{i % 7}") for d in range(5) for i in range(d + 3)]
    df = spark.createDataFrame(rows, "day int, user string")
    m = 16
    # window = days 1..3
    win_rows = df.filter((F.col("day") >= 1) & (F.col("day") <= 3))
    direct = {(r.bucket, r.reg)
              for r in hll_grid(win_rows, "user", m).collect()}
    per_day = [hll_grid(df.filter(F.col("day") == d), "user", m)
               for d in (1, 2, 3)]
    u = per_day[0]
    for g in per_day[1:]:
        u = u.unionByName(g)
    merged = {(r.bucket, r.reg)
              for r in u.groupBy("bucket")
              .agg(F.max("reg").alias("reg")).collect()}
    assert merged == direct


def test_cm_inner_product_is_one_sided_under_total_collision(spark):
    """Adversarial: width 1 forces EVERY key into one bucket — the
    estimate degrades to n_a·n_b but must still be >= the true join
    size (the deterministic guarantee cm_join_size certifies)."""
    a = spark.createDataFrame([(k,) for k in "xxyyzw"], "k string")
    b = spark.createDataFrame([(k,) for k in "xyqq"], "k string")
    ca = cm_build(a, "k", 2, 1)
    cb = cm_build(b, "k", 2, 1)
    est = (ca.join(cb.withColumnRenamed("cnt", "cnt_b"),
                   ["seed", "bucket"])
           .groupBy("seed")
           .agg(F.sum(F.col("cnt") * F.col("cnt_b")).alias("est")))
    true_j = 2 * 1 + 2 * 1  # x:2*1 + y:2*1
    for r in est.collect():
        assert r.est == 6 * 4 >= true_j


def test_r10_wave4_plans_clean(spark, sf_dir):
    from light_etl_windows_container_poc_spark.plans import formatted_plan
    from light_etl_windows_container_poc_spark.queries import QUERIES

    for name in ("hll_rolling_uniques", "cm_join_size",
                 "ams_skew_by_type"):
        plan = formatted_plan(QUERIES[name](spark, sf_dir))
        assert "CartesianProduct" not in plan, name
