"""Training-pipeline breadth: test-set contamination detection, scalable
sequence packing (concat-and-chunk), and value-based RANGE windows.

Engine-parity notes:
- Contamination reuses the proven 3-word-shingle definition
  (queries/llm.py `_SHINGLE_CTE`) and the md5-bucket split device
  (operators/text.train_test_split) — both already hash-verified.
- Packing offsets are pure integer arithmetic; the Spark side computes
  them with a TWO-PHASE cumulative sum (per-bucket + bucket bases) that
  equals the oracle's global window exactly but never needs a
  single-partition window over the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load_tables
from ..functions.texts import word_shingles, words
from .registry import query
from .tpch import _units

_SHINGLE_CTE = """
wrds AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS w
  FROM documents
),
idx AS (
  SELECT doc_id, w, unnest(range(1, greatest(len(w) - 1, 1))) AS i FROM wrds
),
sh AS (
  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s FROM idx
)
"""


# --------------------------------------------------------------------------
# test-set contamination: shingle overlap between the md5-bucket test split
# and the train split. The distinct train-shingle set is the big side; the
# join key is the shingle itself (string, to stay oracle-exact).
# --------------------------------------------------------------------------
@query("contamination", oracle=f"""
WITH {_SHINGLE_CTE},
split AS (
  SELECT doc_id,
         CASE WHEN CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)
                                           || 'split'), 1, 6)) AS BIGINT)
                   % 1000 < 200
              THEN 'test' ELSE 'train' END AS split
  FROM documents
),
tr AS (SELECT DISTINCT s FROM sh JOIN split USING (doc_id)
       WHERE split = 'train'),
te AS (SELECT sh.doc_id, sh.s FROM sh JOIN split USING (doc_id)
       WHERE split = 'test'),
tot AS (SELECT doc_id, count(*) AS n_shingles FROM te GROUP BY doc_id),
cont AS (SELECT te.doc_id, count(*) AS n_contaminated
         FROM te JOIN tr ON te.s = tr.s GROUP BY te.doc_id)
SELECT t.doc_id, t.n_shingles,
       coalesce(c.n_contaminated, 0) AS n_contaminated,
       CAST(coalesce(c.n_contaminated, 0) AS DOUBLE)
         / CAST(t.n_shingles AS DOUBLE) AS ratio
FROM tot t LEFT JOIN cont c ON t.doc_id = c.doc_id
WHERE coalesce(c.n_contaminated, 0) > 0
ORDER BY t.doc_id
""")
def contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import train_test_split

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    sp = train_test_split(docs, "doc_id", test_permille=200)
    sh = sp.select("doc_id", "split",
                   F.explode(word_shingles(F.col("text"), 3)).alias("s"))
    tr = sh.filter(F.col("split") == "train").select("s").distinct()
    te = sh.filter(F.col("split") == "test").select("doc_id", "s")
    tot = te.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    cont = (te.join(tr, "s")
            .groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_contaminated")))
    n_cont = F.coalesce(F.col("n_contaminated"), F.lit(0).cast("long"))
    return (tot.join(cont, "doc_id", "left")
            .select("doc_id", "n_shingles",
                    n_cont.alias("n_contaminated"),
                    (n_cont.cast("double")
                     / F.col("n_shingles").cast("double")).alias("ratio"))
            .filter(F.col("n_contaminated") > 0)
            .orderBy("doc_id"))


# --------------------------------------------------------------------------
# sequence packing (concat-and-chunk): docs ordered by id are concatenated
# into a token stream cut every 512 words; each doc reports its stream
# offset / bin. The oracle uses one global window; the Spark side gets the
# IDENTICAL numbers from a THREE-level cumulative sum — within-bucket
# window (corpus rows, partitioned by bucket) + within-superbucket window
# over bucket totals (corpus/1e3 rows, partitioned by superbucket) + one
# global window over superbucket totals (corpus/1e6 rows). Every relation
# a single partition ever sees is ≥1e6× smaller than the corpus: 100B
# docs → 100k superbucket rows through the one global window.
# --------------------------------------------------------------------------
@query("pack_sequences", oracle="""
WITH t AS (
  SELECT doc_id,
         CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
                              x -> x <> '')) AS BIGINT) AS n_words
  FROM documents
), c AS (
  SELECT doc_id, n_words,
         CAST(sum(n_words) OVER (ORDER BY doc_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) - n_words AS BIGINT)
           AS start_off
  FROM t
)
SELECT doc_id, n_words, start_off,
       start_off // 512 AS bin_id,
       start_off % 512 AS off_in_bin
FROM c
ORDER BY doc_id
""")
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    t = docs.select("doc_id",
                    F.size(words(F.col("text"))).cast("long").alias("n_words"),
                    (F.col("doc_id") / 1000).cast("long").alias("bucket"))
    # phase 1: per-bucket totals → cumulative base offset per bucket,
    # computed hierarchically so no window's partition scales with corpus
    bsums = (t.groupBy("bucket").agg(F.sum("n_words").alias("bsum"))
             .withColumn("sb", F.expr("bucket div 1000")))
    sw = W.partitionBy("sb").orderBy("bucket") \
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    within_sb = F.sum("bsum").over(sw) - F.col("bsum")
    ssums = bsums.groupBy("sb").agg(F.sum("bsum").alias("ssum"))
    gw = W.partitionBy().orderBy("sb") \
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    sbases = ssums.withColumn("sbase", F.sum("ssum").over(gw) - F.col("ssum")) \
        .select("sb", "sbase")
    bases = (bsums.withColumn("within", within_sb)
             .join(F.broadcast(sbases), "sb")
             .select("bucket",
                     (F.col("sbase") + F.col("within")).alias("base")))
    # phase 2: within-bucket running sum + broadcast base
    ww = W.partitionBy("bucket").orderBy("doc_id") \
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    c = (t.join(F.broadcast(bases), "bucket")
         .withColumn("start_off",
                     F.col("base") + F.sum("n_words").over(ww)
                     - F.col("n_words")))
    return (c.select("doc_id", "n_words", "start_off",
                     F.expr("start_off div 512").alias("bin_id"),
                     (F.col("start_off") % 512).alias("off_in_bin"))
            .orderBy("doc_id"))


# --------------------------------------------------------------------------
# value-based RANGE window: peers within ±$100 of each customer's balance
# (integer cents so the frame bounds are exact)
# --------------------------------------------------------------------------
@query("window_range_value", oracle="""
WITH b AS (
  SELECT c_custkey, c_mktsegment,
         CAST(round(c_acctbal * 100) AS BIGINT) AS cents
  FROM customer
)
SELECT c_custkey, cents,
       count(*) OVER w AS n_near,
       CAST(sum(cents) OVER w AS BIGINT) AS sum_near
FROM b
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY cents
             RANGE BETWEEN 10000 PRECEDING AND 10000 FOLLOWING)
ORDER BY c_custkey
""")
def window_range_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_tables(spark, sf_dir, ("customer",))["customer"]
    b = cust.select("c_custkey", "c_mktsegment",
                    _units(F.col("c_acctbal"), 100).alias("cents"))
    w = (W.partitionBy("c_mktsegment").orderBy("cents")
         .rangeBetween(-10000, 10000))
    return (b.select("c_custkey", "cents",
                     F.count(F.lit(1)).over(w).alias("n_near"),
                     F.sum("cents").over(w).alias("sum_near"))
            .orderBy("c_custkey"))
