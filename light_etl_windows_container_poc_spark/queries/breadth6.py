"""Record-linkage and remaining relational shapes: blocked fuzzy join,
percent-of-total window, LEFT SEMI join.

The fuzzy join is the classic ETL record-linkage shape: BLOCK first
(equi-join on a cheap key so candidate pairs stay linear-ish), THEN score
the expensive edit distance only inside blocks. A naive
levenshtein-theta-join is O(n²) over the whole table and never survives
scale; the blocked form shuffles once on the block key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load_tables
from .registry import query
from .tpch import _units

# fuzzy_join_parts broadcast envelope: the probe side is 3 rows per part
# name, so force-broadcasting is only sound while |part| is dimension-
# sized. Above this, the hint is dropped and AQE picks the strategy.
FUZZY_BROADCAST_MAX_PARTS = 200_000


# --------------------------------------------------------------------------
# fuzzy duplicate-name pairs: block on brand, score levenshtein ≤ 2,
# exclude exact matches (those belong to exact dedup)
# --------------------------------------------------------------------------
@query("fuzzy_join_parts", oracle="""
SELECT a.p_partkey AS a_key, b.p_partkey AS b_key,
       a.p_name AS a_name, b.p_name AS b_name,
       CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist
FROM part a JOIN part b
  ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
WHERE a.p_name <> b.p_name AND levenshtein(a.p_name, b.p_name) <= 2
ORDER BY a_key, b_key
""")
def fuzzy_join_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    # PassJoin-style segment blocking (Li/Deng/Feng 2011, public): if
    # ed(x, y) ≤ 2 then, splitting x into 3 contiguous segments, at least
    # one segment is untouched by any edit and appears VERBATIM in y at a
    # position shifted by at most 2. Candidates therefore come from an
    # equi-join of probe segments against index substrings on
    # (brand, segment_idx, probe_len, content) — never the within-brand
    # cross product. Measured at sf0.1: 2.8M candidate verifications vs
    # 6.9M for brand-block + length-gap alone, on identical results (the
    # brand-equality block and the banded-levenshtein verification are
    # unchanged; segment blocking only prunes candidates, and the
    # pigeonhole guarantees it prunes no true pair).
    part = (load_tables(spark, sf_dir, ("part",))["part"]
            .select(F.col("p_partkey").alias("k"),
                    F.col("p_name").alias("n"), "p_brand",
                    F.length("p_name").alias("L")))
    three = F.explode(F.sequence(F.lit(0), F.lit(2)))
    # probe: the 3 even segments of every name (start/len via integer div)
    probe = (part.select("*", three.alias("i"))
             .withColumn("s", F.expr("(i * L) div 3"))
             .withColumn("m", F.expr("((i + 1) * L) div 3 - (i * L) div 3"))
             .filter(F.col("m") >= 1)
             .select(F.col("k").alias("a_key"), F.col("n").alias("a_name"),
                     "p_brand", "i", F.col("L").alias("La"),
                     F.expr("substring(n, s + 1, m)").alias("seg")))
    # index: every substring of y that could equal segment i of a probe
    # of length Lx ∈ [Ly−2, Ly+2] (the length gap lev ≤ 2 implies), at a
    # start position within ±2 of that segment's home position
    idx = (part.select("*", three.alias("i"))
           .select("*", F.explode(F.sequence(F.greatest(F.lit(1),
                                                        F.col("L") - 2),
                                             F.col("L") + 2)).alias("Lx"))
           .withColumn("s", F.expr("(i * Lx) div 3"))
           .withColumn("m", F.expr("((i + 1) * Lx) div 3 - (i * Lx) div 3"))
           .filter((F.col("m") >= 1)
                   & (F.greatest(F.lit(0), F.col("s") - 2)
                      <= F.least(F.col("L") - F.col("m"), F.col("s") + 2)))
           .select("*", F.explode(F.sequence(
               F.greatest(F.lit(0), F.col("s") - 2),
               F.least(F.col("L") - F.col("m"), F.col("s") + 2))).alias("pos"))
           .select(F.col("k").alias("b_key"), F.col("n").alias("b_name"),
                   "p_brand", "i", "Lx",
                   F.expr("substring(n, pos + 1, m)").alias("sub")))
    # the probe side is 3 rows/name — broadcast it and stream the index
    # ONLY while it genuinely fits a build side: probe rows grow with
    # |part| (3n), so the hint is gated on a cheap parquet-metadata count
    # (≤200k parts ≈ 600k probe rows ≈ tens of MB — comfortably inside
    # executor build memory; sf0.1 has 20k parts). Above the envelope the
    # hint is dropped and AQE picks the join strategy for the 4-column
    # equi-key — a per-key shuffle that scales linearly, never a forced
    # OOM-able broadcast of 3·|part| rows (at SF100k part is ~20B rows).
    # Verification is inline (banded levenshtein, -1 past the bound), and
    # the pair-level dedup runs AFTER the ≤2 filter so the shuffle carries
    # only near-dup multiplicities, not all candidates.
    probe_side = F.broadcast(probe) \
        if part.count() <= FUZZY_BROADCAST_MAX_PARTS else probe
    dist = F.levenshtein("a_name", "b_name", 2)
    return (idx.join(probe_side,
                     (idx.p_brand == probe.p_brand) & (idx.i == probe.i)
                     & (idx.Lx == probe.La) & (idx.sub == probe.seg))
            .filter((F.col("a_key") < F.col("b_key"))
                    & (F.col("a_name") != F.col("b_name")))
            .select("a_key", "b_key", "a_name", "b_name", dist.alias("dist"))
            .filter(F.col("dist") >= 0)
            .dropDuplicates(["a_key", "b_key"])
            .orderBy("a_key", "b_key"))


# --------------------------------------------------------------------------
# percent-of-total (ratio_to_report) window: share of segment balance
# --------------------------------------------------------------------------
@query("window_share", oracle="""
WITH b AS (
  SELECT c_custkey, c_mktsegment,
         CAST(round(c_acctbal * 100) AS BIGINT) AS cents
  FROM customer
)
SELECT c_custkey, c_mktsegment, cents,
       CAST(cents AS DOUBLE)
         / CAST(sum(cents) OVER (PARTITION BY c_mktsegment) AS DOUBLE)
         AS share
FROM b
ORDER BY c_custkey
""")
def window_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_tables(spark, sf_dir, ("customer",))["customer"]
    b = cust.select("c_custkey", "c_mktsegment",
                    _units(F.col("c_acctbal"), 100).alias("cents"))
    w = W.partitionBy("c_mktsegment")
    return (b.select("c_custkey", "c_mktsegment", "cents",
                     (F.col("cents").cast("double")
                      / F.sum("cents").over(w).cast("double")).alias("share"))
            .orderBy("c_custkey"))


# --------------------------------------------------------------------------
# LEFT SEMI join (EXISTS): customers with any >$200k order
# --------------------------------------------------------------------------
@query("join_semi", oracle="""
SELECT c_custkey, c_name
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000)
ORDER BY c_custkey
""")
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    big = t["orders"].filter(F.col("o_totalprice") > 200000) \
        .select(F.col("o_custkey").alias("c_custkey"))
    return (t["customer"].join(big, "c_custkey", "left_semi")
            .select("c_custkey", "c_name")
            .orderBy("c_custkey"))
