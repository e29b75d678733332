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


def test_approx_percentile_within_rank_error(spark, sf_dir):
    from pyspark.sql import functions as F

    approx = {r.l_returnflag: (r.p25, r.p50, r.p75) for r in
              QUERIES["sketch_approx_percentile"](spark, sf_dir).collect()}
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    exact = {r.l_returnflag: (r.p25, r.p50, r.p75) for r in
             (li.select("l_returnflag", cents.alias("cents"))
              .groupBy("l_returnflag")
              .agg(F.percentile("cents", F.lit(0.25)).alias("p25"),
                   F.percentile("cents", F.lit(0.5)).alias("p50"),
                   F.percentile("cents", F.lit(0.75)).alias("p75"))
              .collect())}
    for flag, (a25, a50, a75) in approx.items():
        e25, e50, e75 = exact[flag]
        # accuracy=10000 → rank error ≤ 1/10000; values are dense, allow 1%
        for a, e in ((a25, e25), (a50, e50), (a75, e75)):
            assert abs(a - e) <= max(100, 0.01 * abs(e))
