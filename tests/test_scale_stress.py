"""Generated-data stress tests: the skew/AQE machinery exercised at
millions of rows (spark.range — no files), where a wrong plan actually
hurts. Kept to a few tens of seconds total; these are the suite's
closest stand-in for cluster-scale behavior."""

from __future__ import annotations

from pyspark.sql import functions as F

from light_etl_windows_container_poc_spark.operators.scale import salted_join
from light_etl_windows_container_poc_spark.plans import plan_report


def _skewed_facts(spark, n=2_000_000, hot_share=10):
    """~n rows where 1/hot_share of ALL rows share one hot key (key 0) —
    the classic power-user / null-surrogate skew shape."""
    return (spark.range(n)
            .select(F.when(F.col("id") % hot_share == 0, F.lit(0))
                    .otherwise((F.col("id") % 997) + 1).alias("k"),
                    (F.col("id") % 1000).alias("v")))


def test_salted_join_equals_plain_join_under_real_skew(spark):
    facts = _skewed_facts(spark)
    dim = spark.range(0, 998).select(F.col("id").alias("k"),
                                     F.concat(F.lit("d"), F.col("id"))
                                     .alias("label"))
    plain = (facts.join(dim, "k")
             .groupBy("label").agg(F.sum("v").alias("s"),
                                   F.count(F.lit(1)).alias("n")))
    salted = (salted_join(facts, dim, "k", salt=8)
              .groupBy("label").agg(F.sum("v").alias("s"),
                                    F.count(F.lit(1)).alias("n")))
    assert sorted(map(tuple, salted.collect())) == \
        sorted(map(tuple, plain.collect()))


def test_aqe_handles_skewed_aggregation(spark):
    """The hot key's partition is ~200k rows vs ~1.8k for the others;
    the aggregation must still return exact counts (AQE/partial aggs do
    the heavy lifting — this guards against configs that break it)."""
    facts = _skewed_facts(spark)
    counts = {r["k"]: r["n"] for r in
              facts.groupBy("k").agg(F.count(F.lit(1)).alias("n"))
              .collect()}
    assert counts[0] == 200_000
    # every non-hot key: 2M ids, id%10==0 removed, spread over 997 keys
    rest = sum(v for k, v in counts.items() if k != 0)
    assert rest == 1_800_000
    assert len(counts) == 998


def test_broadcast_threshold_respected_on_dim_join(spark):
    """A 998-row dim against 2M facts must broadcast, not sort-merge —
    the single most important join decision at warehouse scale."""
    facts = _skewed_facts(spark)
    dim = spark.range(0, 998).select(F.col("id").alias("k"),
                                     F.lit("x").alias("label"))
    rep = plan_report(facts.join(dim, "k"))
    assert rep["broadcast_joins"] >= 1
    assert rep["sortmerge_joins"] == 0


def test_exact_quantile_cuts_at_2m_rows(spark):
    """The quantile helper's claim — no all-values buffer, data-sized
    work stays distributed — exercised at 2M generated rows with a
    skewed long-tail value distribution; cuts verified against a
    directly computed cume_dist replay."""
    from light_etl_windows_container_poc_spark.operators.scale import \
        exact_quantile_cuts

    df = (spark.range(2_000_000)
          .select(((F.col("id") * F.col("id")) % 100_003).alias("v")))
    probs = {"p25": 0.25, "p50": 0.5, "p75": 0.75, "p99": 0.99}
    got = exact_quantile_cuts(df, "v", probs).first()
    # reference: cume_dist over the DISTINCT histogram (small enough
    # here), computed independently of the helper's bucketing
    from pyspark.sql import Window as W
    h = df.groupBy("v").agg(F.count(F.lit(1)).alias("c"))
    w = W.orderBy("v").rowsBetween(W.unboundedPreceding, 0)
    n = df.count()
    cume = h.withColumn("cd", F.sum("c").over(w) / F.lit(n))
    for alias, p in probs.items():
        want = cume.filter(F.col("cd") >= p).agg(F.min("v")).first()[0]
        assert got[alias] == want, (alias, got[alias], want)
