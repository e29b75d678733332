"""Aggregate/sampling/index breadth batch: FILTER-clause aggregates,
argmin-argmax/listagg/bool/bit aggregates, histogram binning, deterministic
stratified sampling, an inverted index, term co-occurrence PMI, and
element-wise embedding centroids.

Engine-parity notes (see [[spark-oracle-float-parity]] rules encoded in
queries/tpch.py `_units`):
- Money stays in exact BIGINT cents until the final projection.
- argmin/argmax ordering keys are made UNIQUE (cents*1e6 + key) so min_by /
  max_by are deterministic in both engines despite ties in the raw value.
- Embedding units via floor(x*1e6 + 0.5) on DOUBLE-cast values — floor is
  exact in both engines, unlike round() whose half-way rule differs.
- ln() agreed bit-for-bit between Java Math.log and DuckDB in the tfidf
  oracle; PMI feeds both engines the identical double ratio.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_tables
from ..functions.texts import words
from ..functions.vectors import to_double
from .registry import query
from .tpch import _units


# --------------------------------------------------------------------------
# FILTER-clause aggregates (conditional aggregation in one grouped pass)
# --------------------------------------------------------------------------
@query("agg_filter", oracle="""
SELECT o_orderpriority,
       count(*) AS n_orders,
       count(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
       coalesce(CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                     FILTER (WHERE o_orderstatus = 'O') AS BIGINT), 0)
         AS open_cents,
       CAST(count(DISTINCT o_custkey) FILTER (WHERE o_totalprice > 100000)
            AS BIGINT) AS n_big_cust
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""")
def agg_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    cents = _units(F.col("o_totalprice"), 100)
    return (orders.groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n_orders"),
                 F.count(F.when(F.col("o_orderstatus") == "F", 1))
                 .alias("n_finished"),
                 F.coalesce(
                     F.sum(F.when(F.col("o_orderstatus") == "O", cents)),
                     F.lit(0).cast("long")).alias("open_cents"),
                 F.count_distinct(
                     F.when(F.col("o_totalprice") > 100000,
                            F.col("o_custkey"))).alias("n_big_cust"))
            .orderBy("o_orderpriority"))


# --------------------------------------------------------------------------
# aggregate breadth: min_by/max_by (deterministic via unique ordering key),
# ordered listagg over a keyed sample, bool_and/bool_or, bit_or/bit_and/xor
# --------------------------------------------------------------------------
@query("agg_misc", oracle="""
WITH b AS (
  SELECT c_mktsegment, c_name, c_custkey, c_acctbal,
         CAST(round(c_acctbal * 100) AS BIGINT) * 1000000 + c_custkey AS ordkey,
         c_custkey % 256 AS byte
  FROM customer
)
SELECT c_mktsegment,
       min_by(c_name, ordkey) AS poorest_name,
       max_by(c_name, ordkey) AS richest_name,
       coalesce(string_agg(c_name, ',' ORDER BY c_name)
                FILTER (WHERE c_custkey % 97 = 0), '') AS sample_names,
       bool_and(c_acctbal > 0) AS all_positive,
       bool_or(c_acctbal < 0) AS any_negative,
       CAST(bit_or(byte) AS BIGINT) AS byte_or,
       CAST(bit_and(byte) AS BIGINT) AS byte_and,
       CAST(bit_xor(byte) AS BIGINT) AS byte_xor
FROM b
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""")
def agg_misc(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_tables(spark, sf_dir, ("customer",))["customer"]
    ordkey = (_units(F.col("c_acctbal"), 100) * 1000000
              + F.col("c_custkey")).alias("ordkey")
    byte = (F.col("c_custkey") % 256).alias("byte")
    b = cust.select("c_mktsegment", "c_name", "c_custkey", "c_acctbal",
                    ordkey, byte)
    return (b.groupBy("c_mktsegment")
            .agg(F.min_by("c_name", "ordkey").alias("poorest_name"),
                 F.max_by("c_name", "ordkey").alias("richest_name"),
                 F.concat_ws(",", F.array_sort(F.collect_list(
                     F.when(F.col("c_custkey") % 97 == 0, F.col("c_name"))
                 ))).alias("sample_names"),
                 F.bool_and(F.col("c_acctbal") > 0).alias("all_positive"),
                 F.bool_or(F.col("c_acctbal") < 0).alias("any_negative"),
                 F.bit_or("byte").alias("byte_or"),
                 F.bit_and("byte").alias("byte_and"),
                 F.bit_xor("byte").alias("byte_xor"))
            .orderBy("c_mktsegment"))


# --------------------------------------------------------------------------
# histogram: fixed-width $50k bins over order value (integer cents, so the
# bin edges are exact; `div` truncation == floor for the positive domain)
# --------------------------------------------------------------------------
@query("agg_histogram", oracle="""
WITH b AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders
)
SELECT cents // 5000000 AS bucket,
       count(*) AS n,
       CAST(min(cents) AS BIGINT) AS min_cents,
       CAST(max(cents) AS BIGINT) AS max_cents,
       CAST(sum(cents) AS BIGINT) AS sum_cents
FROM b
GROUP BY bucket
ORDER BY bucket
""")
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    cents = _units(F.col("o_totalprice"), 100)
    return (orders.select(cents.alias("cents"))
            .groupBy(F.expr("cents div 5000000").alias("bucket"))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.min("cents").alias("min_cents"),
                 F.max("cents").alias("max_cents"),
                 F.sum("cents").alias("sum_cents"))
            .orderBy("bucket"))


# --------------------------------------------------------------------------
# stratified sampling: per-language keep-rates via the same md5-bucket
# device as split_train_test — deterministic, id-stable, engine-portable,
# and cluster-size independent (unlike rand()/TABLESAMPLE)
# --------------------------------------------------------------------------
@query("sample_stratified", oracle="""
SELECT doc_id, lang
FROM documents
WHERE CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR) || 'strat'), 1, 6))
           AS BIGINT) % 1000
      < CASE WHEN lang = 'en' THEN 200 ELSE 700 END
ORDER BY doc_id
""")
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    bucket = F.conv(F.substring(
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("strat"))),
        1, 6), 16, 10).cast("long") % 1000
    rate = F.when(F.col("lang") == "en", 200).otherwise(700)
    return (docs.filter(bucket < rate)
            .select("doc_id", "lang").orderBy("doc_id"))


# --------------------------------------------------------------------------
# inverted index: word → document frequency + sorted posting list (common
# words only). The posting list is numerically sorted THEN stringified, so
# both engines agree on order.
# --------------------------------------------------------------------------
@query("inverted_index", oracle="""
WITH t AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(trim(text), '\\s+'),
                            x -> x <> '')) AS word
  FROM documents
), d AS (SELECT DISTINCT word, doc_id FROM t)
SELECT word, CAST(count(*) AS BIGINT) AS df,
       string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
FROM d
GROUP BY word
HAVING count(*) >= 20
ORDER BY word
""")
def inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    d = (docs.select("doc_id", F.explode(words(F.col("text"))).alias("word"))
         .distinct())
    return (d.groupBy("word")
            .agg(F.count(F.lit(1)).alias("df"),
                 F.concat_ws(",", F.transform(
                     F.array_sort(F.collect_list("doc_id")),
                     lambda x: x.cast("string"))).alias("postings"))
            .filter(F.col("df") >= 20)
            .orderBy("word"))


# --------------------------------------------------------------------------
# term co-occurrence lift (PMI = ln(lift)) over the top-30 df terms:
# distinct (doc, word) → doc-key self-join (word < word) → pair counts →
# lift. The top-30 side is tiny and broadcast; the self-join shuffles on
# doc_id only once. Output is the exact rational lift, not its ln:
# Java Math.log and DuckDB ln disagree by 1 ulp on some inputs (measured),
# while the int-valued-double division is bit-exact in both.
# --------------------------------------------------------------------------
@query("doc_cooccur", oracle="""
WITH t AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(trim(text), '\\s+'),
                            x -> x <> '')) AS word
  FROM documents
), d AS (SELECT DISTINCT doc_id, word FROM t),
f AS (SELECT word, count(*) AS df FROM d GROUP BY word),
top AS (SELECT word, df FROM f ORDER BY df DESC, word LIMIT 30),
dd AS (SELECT d.doc_id, d.word, top.df FROM d JOIN top USING (word)),
p AS (
  SELECT a.word AS w1, b.word AS w2,
         CAST(a.df AS BIGINT) AS df1, CAST(b.df AS BIGINT) AS df2,
         count(*) AS n_pair
  FROM dd a JOIN dd b ON a.doc_id = b.doc_id AND a.word < b.word
  GROUP BY 1, 2, 3, 4
), n AS (SELECT count(*) AS n_docs FROM documents)
SELECT w1, w2, df1, df2, n_pair,
       CAST(n_pair AS DOUBLE) * CAST(n_docs AS DOUBLE)
          / (CAST(df1 AS DOUBLE) * CAST(df2 AS DOUBLE)) AS lift
FROM p, n
ORDER BY w1, w2
""")
def doc_cooccur(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    # the distinct (doc, word) relation feeds the df-count AND both join
    # sides; without an explicit persist AQE re-derives it from the scan
    # up to 10× (measured: 10 parquet scans, 0 ReusedExchange)
    d = (docs.select("doc_id", F.explode(words(F.col("text"))).alias("word"))
         .distinct().persist())
    f = d.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    # distributed top-k (TakeOrderedAndProject): the vocabulary relation is
    # |vocab| rows — a global row_number() window would drag all of it to one
    # partition. orderBy+limit takes per-partition top-30 then merges.
    top = f.orderBy(F.desc("df"), "word").limit(30)
    dd = d.join(F.broadcast(top), "word")
    a = dd.select(F.col("doc_id"), F.col("word").alias("w1"),
                  F.col("df").alias("df1"))
    b = dd.select(F.col("doc_id"), F.col("word").alias("w2"),
                  F.col("df").alias("df2"))
    p = (a.join(b, ["doc_id"])
         .filter(F.col("w1") < F.col("w2"))
         .groupBy("w1", "w2", "df1", "df2")
         .agg(F.count(F.lit(1)).alias("n_pair")))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    dbl = lambda c: F.col(c).cast("double")  # noqa: E731
    lift = (dbl("n_pair") * dbl("n_docs")) / (dbl("df1") * dbl("df2"))
    return (p.crossJoin(F.broadcast(n_docs))
            .select("w1", "w2", "df1", "df2", "n_pair", lift.alias("lift"))
            .orderBy("w1", "w2"))


# --------------------------------------------------------------------------
# embedding centroids per label: element-wise mean via posexplode → group
# by (label, dim). Units are floor(x*1e6 + 0.5) on the DOUBLE-cast value —
# exact in both engines (round()'s half-way rule is not). One shuffle on
# (label, pos); at scale the same plan partial-aggregates map-side.
# --------------------------------------------------------------------------
@query("embed_centroid", oracle="""
WITH t AS (
  SELECT label,
         unnest(list_transform(CAST(embedding AS DOUBLE[]),
                x -> CAST(floor(x * 1000000 + 0.5) AS BIGINT))) AS u,
         unnest(range(1, len(embedding) + 1)) AS pos
  FROM embeddings
)
SELECT label, CAST(pos AS INT) AS pos, count(*) AS n,
       CAST(sum(u) AS BIGINT) AS sum_units,
       CAST(sum(u) AS DOUBLE) / CAST(count(*) AS DOUBLE) / 1000000.0
         AS centroid
FROM t
GROUP BY label, pos
ORDER BY label, pos
""")
def embed_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    units = F.transform(to_double(F.col("embedding")),
                        lambda x: F.floor(x * 1000000.0 + F.lit(0.5)))
    e = emb.select("label", F.posexplode(units).alias("pos0", "u"))
    return (e.groupBy("label", (F.col("pos0") + 1).cast("int").alias("pos"))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("u").alias("sum_units"))
            .select("label", "pos", "n", "sum_units",
                    (F.col("sum_units").cast("double")
                     / F.col("n").cast("double") / F.lit(1000000.0))
                    .alias("centroid"))
            .orderBy("label", "pos"))
