"""Function-breadth batch: lateral explode, regex, null-handling,
rank-fraction windows, exact-moment statistics, percentile interpolation,
and LLM-pipeline document chunking.

Engine-parity notes (see queries/tpch.py `_units` for the full story):
- Statistics (corr) are computed from exact BIGINT moment sums, converted
  to DOUBLE only in the final expression — both engines then execute the
  identical IEEE tree, so the hash-compare is bit-exact.
- Percentile interpolation at dyadic fractions (.25/.5/.75) over integer
  units is EXACT in double arithmetic (frac is a power of two, values are
  integers), so Spark `percentile`/`median` matches DuckDB
  `percentile_cont` bit-for-bit.
- DuckDB `regexp_replace` needs the 'g' flag to match Spark's
  replace-all semantics; the regex subset used is portable RE2 ∩ Java.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load_tables
from ..functions.texts import words
from .registry import query
from .tpch import _units


# --------------------------------------------------------------------------
# corpus word counts: lateral explode → group → HAVING (classic
# LATERAL VIEW shape; also the "top corpus terms" LLM-dataset report)
# --------------------------------------------------------------------------
@query("explode_wordcount", oracle="""
WITH t AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS w
  FROM documents
), e AS (SELECT doc_id, unnest(w) AS word FROM t)
SELECT word, count(*) AS cnt,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS doc_freq
FROM e
GROUP BY word
HAVING count(*) >= 10
ORDER BY cnt DESC, word
""")
def explode_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return (docs.select("doc_id", F.explode(words(F.col("text"))).alias("word"))
            .groupBy("word")
            .agg(F.count(F.lit(1)).alias("cnt"),
                 F.count_distinct("doc_id").alias("doc_freq"))
            .filter(F.col("cnt") >= 10)
            .orderBy(F.desc("cnt"), "word"))


# --------------------------------------------------------------------------
# regex breadth: extract / extract_all / replace-all / boundary match
# --------------------------------------------------------------------------
@query("regex_funcs", oracle="""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '[0-9]+')) AS INT) AS n_numbers,
       regexp_extract(text, '[0-9]+') AS first_num,
       CAST(length(regexp_replace(text, '[aeiou]', '', 'g')) AS BIGINT)
         AS consonant_len,
       regexp_matches(text, '\\bthe\\b') AS has_the
FROM documents
ORDER BY doc_id
""")
def regex_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.col("text"), F.lit("[0-9]+"))).alias("n_numbers"),
        F.regexp_extract(F.col("text"), "[0-9]+", 0).alias("first_num"),
        F.length(F.regexp_replace(F.col("text"), "[aeiou]", "")).cast("long")
        .alias("consonant_len"),
        F.col("text").rlike(r"\bthe\b").alias("has_the"),
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# null-handling / conditional breadth: coalesce, nullif, greatest/least,
# CASE bucketing
# --------------------------------------------------------------------------
@query("null_funcs", oracle="""
SELECT c_custkey,
       coalesce(nullif(c_mktsegment, 'BUILDING'), '<none>') AS seg_or_none,
       greatest(c_custkey % 7, c_custkey % 5) AS g75,
       least(c_custkey % 7, c_custkey % 5) AS l75,
       CASE WHEN c_acctbal < 0 THEN 'neg'
            WHEN c_acctbal < 5000 THEN 'mid'
            ELSE 'high' END AS bal_bucket
FROM customer
ORDER BY c_custkey
""")
def null_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_tables(spark, sf_dir, ("customer",))["customer"]
    k = F.col("c_custkey")
    return cust.select(
        "c_custkey",
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")),
                   F.lit("<none>")).alias("seg_or_none"),
        F.greatest(k % 7, k % 5).alias("g75"),
        F.least(k % 7, k % 5).alias("l75"),
        F.when(F.col("c_acctbal") < 0, "neg")
         .when(F.col("c_acctbal") < 5000, "mid")
         .otherwise("high").alias("bal_bucket"),
    ).orderBy("c_custkey")


# --------------------------------------------------------------------------
# rank-fraction windows: percent_rank / cume_dist / nth_value
# --------------------------------------------------------------------------
@query("window_percent_rank", oracle="""
SELECT c_custkey,
       percent_rank() OVER w AS pr,
       cume_dist() OVER w AS cd,
       nth_value(c_custkey, 2) OVER
         (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS second_key
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
ORDER BY c_custkey
""")
def window_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_tables(spark, sf_dir, ("customer",))["customer"]
    w = W.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), "c_custkey")
    w_rows = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    return cust.select(
        "c_custkey",
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
        F.nth_value("c_custkey", 2).over(w_rows).alias("second_key"),
    ).orderBy("c_custkey")


# --------------------------------------------------------------------------
# statistics: exact BIGINT moment sums + correlation assembled from them.
# Units: quantity as-is, price in whole dollars — p² sums stay < 2^63 up
# to ~sf1 fact sizes; at larger SF shard the sum (or move to decimal).
# --------------------------------------------------------------------------
@query("agg_stats_moments", oracle="""
WITH b AS (
  SELECT l_returnflag,
         CAST(round(l_quantity) AS BIGINT) AS q,
         CAST(round(l_extendedprice) AS BIGINT) AS p
  FROM lineitem
), m AS (
  SELECT l_returnflag, count(*) AS n,
         CAST(sum(q) AS BIGINT) AS sq, CAST(sum(p) AS BIGINT) AS sp,
         CAST(sum(q * q) AS BIGINT) AS sqq, CAST(sum(p * p) AS BIGINT) AS spp,
         CAST(sum(q * p) AS BIGINT) AS sqp
  FROM b GROUP BY l_returnflag
)
SELECT l_returnflag, n, sq, sp, sqq, spp, sqp,
       (CAST(n AS DOUBLE) * CAST(sqp AS DOUBLE)
          - CAST(sq AS DOUBLE) * CAST(sp AS DOUBLE))
       / (sqrt(CAST(n AS DOUBLE) * CAST(sqq AS DOUBLE)
                 - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE))
          * sqrt(CAST(n AS DOUBLE) * CAST(spp AS DOUBLE)
                 - CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE))) AS corr_qp
FROM m
ORDER BY l_returnflag
""")
def agg_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    q = _units(F.col("l_quantity"), 1)
    p = _units(F.col("l_extendedprice"), 1)
    m = (li.groupBy("l_returnflag")
         .agg(F.count(F.lit(1)).alias("n"),
              F.sum(q).alias("sq"), F.sum(p).alias("sp"),
              F.sum(q * q).alias("sqq"), F.sum(p * p).alias("spp"),
              F.sum(q * p).alias("sqp")))
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    corr = ((d("n") * d("sqp") - d("sq") * d("sp"))
            / (F.sqrt(d("n") * d("sqq") - d("sq") * d("sq"))
               * F.sqrt(d("n") * d("spp") - d("sp") * d("sp"))))
    return (m.select("l_returnflag", "n", "sq", "sp", "sqq", "spp", "sqp",
                     corr.alias("corr_qp"))
            .orderBy("l_returnflag"))


# --------------------------------------------------------------------------
# median + interpolated quartiles over integer cents (dyadic fractions on
# integers → interpolation is exact, so engines agree bit-for-bit)
# --------------------------------------------------------------------------
@query("agg_median", oracle="""
WITH b AS (
  SELECT l_returnflag,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
  FROM lineitem
)
SELECT l_returnflag,
       percentile_cont(0.5)  WITHIN GROUP (ORDER BY cents) AS med_cents,
       percentile_cont(0.25) WITHIN GROUP (ORDER BY cents) AS p25_cents,
       percentile_cont(0.75) WITHIN GROUP (ORDER BY cents) AS p75_cents
FROM b GROUP BY l_returnflag ORDER BY l_returnflag
""")
def agg_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    cents = _units(F.col("l_extendedprice"), 100)
    # ONE percentile aggregate with an array of probabilities: median and
    # both quartiles share a single value buffer per group instead of
    # three independent ones (3x less aggregation state and sort work)
    p = F.percentile("cents", F.array(F.lit(0.5), F.lit(0.25), F.lit(0.75)))
    return (li.select("l_returnflag", cents.alias("cents"))
            .groupBy("l_returnflag")
            .agg(p.alias("p"))
            .select("l_returnflag",
                    F.col("p")[0].alias("med_cents"),
                    F.col("p")[1].alias("p25_cents"),
                    F.col("p")[2].alias("p75_cents"))
            .orderBy("l_returnflag"))


# --------------------------------------------------------------------------
# LLM-pipeline document chunking: fixed 50-word windows, stride 40
# (10-word overlap), sequence+explode — one pass, no shuffle until sort.
# n_chunks = max(1, ceil((nw-50)/40)+1) via the floor identity
# floor((nw-11)/40)+1, evaluated identically in both engines.
# --------------------------------------------------------------------------
@query("text_chunk", oracle="""
WITH t AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS w
  FROM documents
), n AS (
  SELECT doc_id, w,
         GREATEST(1, CAST(floor((len(w) - 11) / 40.0) AS BIGINT) + 1)
           AS n_chunks
  FROM t
), e AS (
  SELECT doc_id, w, unnest(range(0, n_chunks)) AS chunk_id FROM n
)
SELECT doc_id, chunk_id,
       array_to_string(w[chunk_id * 40 + 1 : chunk_id * 40 + 50], ' ')
         AS chunk_text,
       CAST(len(w[chunk_id * 40 + 1 : chunk_id * 40 + 50]) AS INT)
         AS n_chunk_words
FROM e
ORDER BY doc_id, chunk_id
""")
def text_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    n_chunks = F.greatest(
        F.lit(1).cast("long"),
        (F.floor((F.size(F.col("w")) - F.lit(11)) / F.lit(40.0)) + 1)
        .cast("long"))
    e = (docs.select("doc_id", words(F.col("text")).alias("w"))
         .select("doc_id", "w",
                 F.explode(F.sequence(F.lit(0).cast("long"),
                                      n_chunks - 1)).alias("chunk_id")))
    chunk = F.slice(F.col("w"), (F.col("chunk_id") * 40 + 1).cast("int"),
                    F.lit(50))
    return (e.select("doc_id", "chunk_id",
                     F.concat_ws(" ", chunk).alias("chunk_text"),
                     F.size(chunk).alias("n_chunk_words"))
            .orderBy("doc_id", "chunk_id"))
