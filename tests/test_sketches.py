"""Mergeable-HLL accuracy: per-day sketch estimates and their union must
track exact distinct counts within HLL's error envelope."""

from pyspark.sql import functions as F

from light_etl_windows_container_poc_spark.catalog import load_tables
from light_etl_windows_container_poc_spark.queries import QUERIES


def test_hll_union_tracks_exact(spark, sf_dir):
    out = {("total" if r.day is None else r.day): r.est_uniques
           for r in QUERIES["sketch_hll_mergeable"](spark, sf_dir).collect()}
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    exact_total = ev.select("user_id").distinct().count()
    # default lgConfigK=12 → rsd ≈ 1.6%; allow 5%
    assert abs(out["total"] - exact_total) <= max(2, 0.05 * exact_total)
    exact_daily = {r.day: r.cnt for r in
                   ev.groupBy(F.col("ts").cast("date").alias("day"))
                   .agg(F.count_distinct("user_id").alias("cnt")).collect()}
    for day, exact in exact_daily.items():
        assert abs(out[day] - exact) <= max(2, 0.05 * exact)
