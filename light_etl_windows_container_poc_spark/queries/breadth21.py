"""Round-5 breadth, ninth wave: corpus-shape diagnostics — log2 length
histogram, Heaps-law vocabulary growth, and per-label embedding
outliers via an exact-integer cosine-to-centroid.

Determinism notes:
- floor(log2(n)) on BIGINT is exact in IEEE doubles: powers of two hit
  the integer exactly, and for every other n < 2^53 the distance to the
  nearest integer boundary (~1/(n·ln2)) dwarfs the ~1e-16 log error;
- the centroid cosine is exact-integer end to end: micro-quantized
  cells, truncating-div per-dimension mean, BIGINT dot/norm sums, one
  final sqrt+division on exact integers, micro-rounded (the
  embed_centroid / embed_standardize contracts combined) — no float
  array kernel anywhere, so no summation-order hazard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_tables
from ..functions.texts import words
from .registry import query

_VOCAB_BUCKET = 50  # docs per vocabulary-growth bucket


# --------------------------------------------------------------------------
# log2 length histogram: the doc-length distribution every training-data
# report opens with, in power-of-two buckets.
# --------------------------------------------------------------------------
@query("length_histogram_log2", oracle="""
WITH d AS (
  SELECT CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
                              x -> x <> '')) AS BIGINT) AS n_words
  FROM documents
)
SELECT CAST(CASE WHEN n_words > 0 THEN floor(log2(n_words)) ELSE -1 END
            AS INT) AS bucket_log2,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_words) AS BIGINT) AS n_words_total,
       CAST(min(n_words) AS BIGINT) AS min_words,
       CAST(max(n_words) AS BIGINT) AS max_words
FROM d GROUP BY bucket_log2
ORDER BY bucket_log2
""")
def length_histogram_log2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One map-side-combined aggregation into ≤ ~20 buckets — the
    output is O(log(max_len)) rows at any corpus size."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    n = F.size(words(F.col("text"))).cast("long")
    bucket = F.when(n > 0, F.floor(F.log2(n))).otherwise(F.lit(-1))
    return (docs.select(bucket.cast("int").alias("bucket_log2"),
                        n.alias("n_words"))
            .groupBy("bucket_log2")
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                 F.sum("n_words").cast("long").alias("n_words_total"),
                 F.min("n_words").cast("long").alias("min_words"),
                 F.max("n_words").cast("long").alias("max_words"))
            .orderBy("bucket_log2"))


# --------------------------------------------------------------------------
# Heaps-law vocabulary growth: distinct vocabulary after each bucket of
# 50 documents (in doc_id order) — sublinear growth is the expected
# curve; a kink marks a corpus-composition shift.
# --------------------------------------------------------------------------
@query("vocab_growth", oracle=f"""
WITH toks AS (
  SELECT doc_id, unnest(list_filter(
           string_split_regex(trim(text), '\\s+'), x -> x <> '')) AS tok
  FROM documents
),
fst AS (SELECT tok, min(doc_id) AS first_doc FROM toks GROUP BY tok),
b AS (SELECT first_doc // {_VOCAB_BUCKET} AS bucket,
             CAST(count(*) AS BIGINT) AS new_words
      FROM fst GROUP BY bucket)
SELECT CAST(bucket AS BIGINT) AS bucket,
       new_words,
       CAST(sum(new_words) OVER (ORDER BY bucket) AS BIGINT)
         AS vocab_cumulative
FROM b ORDER BY bucket
""")
def vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-occurrence aggregation on the token key (shuffle ∝ distinct
    vocabulary), reduced to |docs|/{_VOCAB_BUCKET} buckets BEFORE the
    cumulative window — the partition-less cumsum runs over that tiny
    bucket relation only, never corpus-sized data."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    toks = docs.select("doc_id", F.explode(words(F.col("text"))).alias("tok"))
    fst = toks.groupBy("tok").agg(F.min("doc_id").alias("first_doc"))
    b = (fst.groupBy(F.expr(f"first_doc div {_VOCAB_BUCKET}")
                     .cast("long").alias("bucket"))
         .agg(F.count(F.lit(1)).cast("long").alias("new_words")))
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    return (b.select("bucket", "new_words",
                     F.sum("new_words").over(w).cast("long")
                     .alias("vocab_cumulative"))
            .orderBy("bucket"))


# --------------------------------------------------------------------------
# Embedding outliers: cosine of every vector to its label centroid, robust
# MAD flags per label — the "mislabelled / off-cluster" detector.
# --------------------------------------------------------------------------
@query("embed_outliers", oracle="""
WITH xi AS (
  SELECT vec_id, label, CAST(pos AS INT) AS pos,
         CAST(floor(v * 1000000 + 0.5) AS BIGINT) AS u
  FROM (SELECT vec_id, label,
               unnest(CAST(embedding AS DOUBLE[])) AS v,
               unnest(range(1, len(embedding) + 1)) AS pos
        FROM embeddings)
),
cen AS (
  SELECT label, pos, CAST(sum(u) AS BIGINT) // count(*) AS m
  FROM xi GROUP BY label, pos
),
dots AS (
  SELECT xi.vec_id, xi.label,
         CAST(sum(xi.u * cen.m) AS BIGINT) AS dot_s,
         CAST(sum(xi.u * xi.u) AS BIGINT) AS nv2,
         CAST(sum(cen.m * cen.m) AS BIGINT) AS nc2
  FROM xi JOIN cen ON xi.label = cen.label AND xi.pos = cen.pos
  GROUP BY xi.vec_id, xi.label
),
cosd AS (
  SELECT vec_id, label,
         CAST(round(1000000.0 * dot_s
                    / sqrt(CAST(nv2 AS DOUBLE) * CAST(nc2 AS DOUBLE)))
              AS BIGINT) AS cos_micro
  FROM dots
),
med AS (SELECT label, percentile_cont(0.5) WITHIN GROUP (ORDER BY cos_micro)
          AS med FROM cosd GROUP BY label),
dev AS (SELECT c.vec_id, c.label, c.cos_micro, abs(c.cos_micro - med.med)
          AS dev FROM cosd c JOIN med ON c.label = med.label),
mad AS (SELECT label, percentile_cont(0.5) WITHIN GROUP (ORDER BY dev)
          AS mad FROM dev GROUP BY label)
SELECT dev.vec_id, dev.label, dev.cos_micro,
       CAST(CASE WHEN mad.mad > 0
                 THEN round(1000.0 * dev.dev / (1.4826 * mad.mad))
                 ELSE 0 END AS BIGINT) AS robust_z_milli,
       CAST(CASE WHEN mad.mad > 0
                 THEN round(1000.0 * dev.dev / (1.4826 * mad.mad)) > 3000
                 ELSE FALSE END AS INT) AS is_outlier
FROM dev JOIN mad ON dev.label = mad.label
ORDER BY dev.vec_id
""")
def embed_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid-cosine with MAD outlier flags. The centroid
    relation is |labels|·dim rows (broadcast); the per-vector reduction
    carries three BIGINTs. The truncating-div per-dimension mean keeps
    every operand BIGINT-bounded at any corpus size (raw centroid sums
    would overflow the norm product at ~10⁸ rows/label)."""
    from ..functions.vectors import to_double

    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    xi = (emb.select("vec_id", "label",
                     F.posexplode(to_double(F.col("embedding")))
                     .alias("pos0", "v"))
          .select("vec_id", "label",
                  (F.col("pos0") + 1).cast("int").alias("pos"),
                  F.floor(F.col("v") * 1_000_000 + 0.5).cast("long")
                  .alias("u")))
    cen = (xi.groupBy("label", "pos")
           .agg(F.expr("sum(u) div count(1)").alias("m")))
    dots = (xi.join(F.broadcast(cen), ["label", "pos"])
            .groupBy("vec_id", "label")
            .agg(F.sum(F.col("u") * F.col("m")).cast("long").alias("dot_s"),
                 F.sum(F.col("u") * F.col("u")).cast("long").alias("nv2"),
                 F.sum(F.col("m") * F.col("m")).cast("long").alias("nc2")))
    cosd = dots.select(
        "vec_id", "label",
        F.round(1_000_000.0 * F.col("dot_s")
                / F.sqrt(F.col("nv2").cast("double")
                         * F.col("nc2").cast("double")))
        .cast("long").alias("cos_micro"))
    med = (cosd.groupBy("label")
           .agg(F.percentile("cos_micro", F.lit(0.5)).alias("med")))
    dev = (cosd.join(F.broadcast(med), "label")
           .select("vec_id", "label", "cos_micro",
                   F.abs(F.col("cos_micro") - F.col("med")).alias("dev")))
    mad = (dev.groupBy("label")
           .agg(F.percentile("dev", F.lit(0.5)).alias("mad")))
    z = F.when(F.col("mad") > 0,
               F.round(1000.0 * F.col("dev") / (1.4826 * F.col("mad"))))\
         .otherwise(F.lit(0)).cast("long")
    return (dev.join(F.broadcast(mad), "label")
            .select("vec_id", "label", "cos_micro",
                    z.alias("robust_z_milli"),
                    F.when(F.col("mad") > 0, z > 3000)
                    .otherwise(F.lit(False)).cast("int").alias("is_outlier"))
            .orderBy("vec_id"))
