"""Error-safe casts/arithmetic and array set algebra.

- `safe_casts` is the ANSI-mode survival kit: Spark 4 defaults to ANSI
  (invalid cast = job failure at 100 TB after hours of work); try_cast /
  try_divide turn data errors into NULLs that can be quarantined.
- `array_set_ops` sorts every result list before comparing — set
  operations have engine-specific internal orderings, sorted lists are
  the portable canonical form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_tables
from ..functions.texts import words
from .registry import query


# --------------------------------------------------------------------------
# try_cast / try_divide: malformed values become NULL, never job failures
# --------------------------------------------------------------------------
@query("safe_casts", oracle="""
WITH s AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 3 = 0 THEN c_name
              ELSE CAST(c_custkey AS VARCHAR) END AS maybe_num,
         CASE WHEN c_custkey % 4 = 0 THEN '2024-02-30'
              ELSE '2024-01-15' END AS maybe_date,
         c_custkey % 5 AS denom
  FROM customer
)
SELECT c_custkey,
       TRY_CAST(maybe_num AS BIGINT) AS as_num,
       TRY_CAST(maybe_date AS DATE) AS as_date,
       CASE WHEN denom = 0 THEN NULL
            ELSE CAST(c_custkey AS DOUBLE) / CAST(denom AS DOUBLE)
       END AS safe_ratio
FROM s
ORDER BY c_custkey
""")
def safe_casts(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_tables(spark, sf_dir, ("customer",))["customer"]
    k = F.col("c_custkey")
    maybe_num = F.when(k % 3 == 0, F.col("c_name")) \
        .otherwise(k.cast("string"))
    maybe_date = F.when(k % 4 == 0, F.lit("2024-02-30")) \
        .otherwise(F.lit("2024-01-15"))
    return (cust.select(
        "c_custkey",
        maybe_num.try_cast("bigint").alias("as_num"),
        maybe_date.try_cast("date").alias("as_date"),
        F.try_divide(k.cast("double"), (k % 5).cast("double"))
        .alias("safe_ratio"))
        .orderBy("c_custkey"))


# --------------------------------------------------------------------------
# array set algebra over word arrays (sorted canonical form)
# --------------------------------------------------------------------------
@query("array_set_ops", oracle="""
WITH t AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS w
  FROM documents
), h AS (
  SELECT doc_id, w[1:8] AS head, w[len(w)-7:len(w)] AS tail FROM t
  WHERE len(w) >= 16
)
SELECT doc_id,
       coalesce(array_to_string(
           list_sort(list_distinct(list_cat(head, tail))), ','), '')
         AS union_sorted,
       coalesce(array_to_string(list_sort(list_distinct(
           list_filter(head, x -> list_contains(tail, x)))), ','), '')
         AS intersect_sorted,
       coalesce(array_to_string(list_sort(list_distinct(
           list_filter(head, x -> NOT list_contains(tail, x)))), ','), '')
         AS except_sorted,
       len(list_filter(head, x -> list_contains(tail, x))) > 0 AS overlaps
FROM h
ORDER BY doc_id
""")
def array_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    w = words(F.col("text"))
    h = (docs.select("doc_id", w.alias("w"))
         .filter(F.size("w") >= 16)
         .select("doc_id",
                 F.slice("w", 1, 8).alias("head"),
                 F.slice(F.col("w"), F.size("w") - 7, 8).alias("tail")))
    j = lambda c: F.concat_ws(",", F.array_sort(c))  # noqa: E731
    return (h.select(
        "doc_id",
        j(F.array_union("head", "tail")).alias("union_sorted"),
        j(F.array_intersect("head", "tail")).alias("intersect_sorted"),
        j(F.array_except("head", "tail")).alias("except_sorted"),
        F.arrays_overlap("head", "tail").alias("overlaps"))
        .orderBy("doc_id"))


# --------------------------------------------------------------------------
# join-key skew diagnostics: the pre-flight check that decides between a
# plain shuffle join, salting, and AQE skew handling. Top keys by row
# share — share kept integer-exact (permille via cross-multiplication)
# --------------------------------------------------------------------------
@query("skew_profile", oracle="""
WITH k AS (
  SELECT l_orderkey AS key, count(*) AS cnt FROM lineitem GROUP BY 1
), tot AS (SELECT count(*) AS n, count(DISTINCT l_orderkey) AS n_keys
           FROM lineitem),
top AS (
  SELECT key, cnt FROM k ORDER BY cnt DESC, key LIMIT 20
)
SELECT t.key, t.cnt,
       CAST(t.cnt * 1000 // tot.n AS BIGINT) AS share_permille,
       tot.n AS total_rows, tot.n_keys
FROM top t, tot
ORDER BY t.cnt DESC, t.key
""")
def skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    k = li.groupBy(F.col("l_orderkey").alias("key")) \
        .agg(F.count(F.lit(1)).alias("cnt"))
    tot = li.agg(F.count(F.lit(1)).alias("total_rows"),
                 F.count_distinct("l_orderkey").alias("n_keys"))
    # distributed top-k: |distinct keys| can be billions at 100 TB; a global
    # window would single-partition it. orderBy+limit → TakeOrderedAndProject.
    top = k.orderBy(F.desc("cnt"), "key").limit(20)
    return (top.crossJoin(F.broadcast(tot))
            .select("key", "cnt",
                    F.expr("CAST(cnt * 1000 div total_rows AS BIGINT)")
                    .alias("share_permille"),
                    "total_rows", "n_keys")
            .orderBy(F.desc("cnt"), "key"))
