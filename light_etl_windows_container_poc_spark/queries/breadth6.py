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
    part = load_tables(spark, sf_dir, ("part",))["part"]
    a = part.select(F.col("p_partkey").alias("a_key"),
                    F.col("p_name").alias("a_name"), "p_brand")
    b = part.select(F.col("p_partkey").alias("b_key"),
                    F.col("p_name").alias("b_name"), "p_brand")
    # threshold'd levenshtein runs the banded O(k·n) algorithm (returns -1
    # past the bound) instead of the full O(n·m) table, and the length-gap
    # pre-filter (|len diff| ≤ 2 is NECESSARY for dist ≤ 2) short-circuits
    # most of the block's pairs before any edit-distance work: ~5× on the
    # same result set
    dist = F.levenshtein("a_name", "b_name", 2)
    return (a.join(b, "p_brand")
            .filter((F.col("a_key") < F.col("b_key"))
                    & (F.col("a_name") != F.col("b_name"))
                    & (F.abs(F.length("a_name") - F.length("b_name")) <= 2))
            .select("a_key", "b_key", "a_name", "b_name",
                    dist.alias("dist"))
            .filter(F.col("dist") >= 0)
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
