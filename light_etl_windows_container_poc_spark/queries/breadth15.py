"""Round-5 breadth, third wave: robust (median/IQR) embedding scaling
and first-occurrence n-gram novelty — the heavy-tail-safe sibling of
embed_standardize and the dataset-ordering signal dedup pipelines use to
measure how much genuinely new text each document contributes.

Same determinism contracts as breadth14: embeddings are micro-quantized
once per cell before any aggregate; percentiles use the shared
linear-interpolation definition (the agg_median contract); integer
division only ever sees non-negative operands here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_tables
from ..functions.texts import word_ngrams_raw
from .registry import query


# --------------------------------------------------------------------------
# Robust per-dimension scaling: (x - median) / IQR instead of
# (x - mean) / std — immune to the outlier cells that skew a moment-based
# standardization. Median/IQR are computed on exact micro-int cells, so
# both engines interpolate over identical integers.
# --------------------------------------------------------------------------
@query("embed_robust_scale", oracle="""
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
x AS (SELECT vec_id, unnest(range(1, len(v) + 1)) AS pos, v FROM v),
xi AS (SELECT vec_id, CAST(pos AS INT) AS pos,
              CAST(round(v[pos] * 1000000) AS BIGINT) AS xi
       FROM x),
st AS (
  SELECT pos,
         percentile_cont(0.5)  WITHIN GROUP (ORDER BY xi) AS med,
         percentile_cont(0.75) WITHIN GROUP (ORDER BY xi)
           - percentile_cont(0.25) WITHIN GROUP (ORDER BY xi) AS iqr
  FROM xi GROUP BY pos
)
SELECT xi.vec_id, xi.pos AS pos,
       CAST(round(st.med) AS BIGINT) AS med_micro,
       CAST(round(st.iqr) AS BIGINT) AS iqr_micro,
       CAST(CASE WHEN st.iqr > 0
                 THEN round(1000.0 * (xi.xi - st.med) / st.iqr)
                 ELSE 0 END AS BIGINT) AS r_milli
FROM xi JOIN st ON xi.pos = st.pos
WHERE xi.vec_id % 50 = 0
ORDER BY vec_id, pos
""")
def embed_robust_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median/IQR scaling per embedding dimension. Same scale shape as
    embed_standardize: posexplode → groupBy(pos) hits exactly `dim`
    groups (one percentile buffer each), and the dim-row stats relation
    broadcasts back onto the corpus — the cell stream shuffles once for
    the percentile sort and never again. Output sampled to every 50th
    vector (predicate mirrored in the oracle) to bound the certified
    relation."""
    from ..functions.vectors import to_double

    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    xi = (emb.select("vec_id",
                     F.posexplode(to_double(F.col("embedding")))
                     .alias("pos0", "x"))
          .select("vec_id", (F.col("pos0") + 1).cast("int").alias("pos"),
                  F.round(F.col("x") * 1_000_000).cast("long").alias("xi")))
    p = F.percentile("xi", F.array(F.lit(0.5), F.lit(0.25), F.lit(0.75)))
    st = (xi.groupBy("pos").agg(p.alias("p"))
          .select("pos", F.col("p")[0].alias("med"),
                  (F.col("p")[2] - F.col("p")[1]).alias("iqr")))
    r = F.when(F.col("iqr") > 0,
               F.round(1000.0 * (F.col("xi") - F.col("med"))
                       / F.col("iqr"))).otherwise(F.lit(0)).cast("long")
    return (xi.filter(F.col("vec_id") % 50 == 0)
            .join(F.broadcast(st), "pos")
            .select("vec_id", "pos",
                    F.round("med").cast("long").alias("med_micro"),
                    F.round("iqr").cast("long").alias("iqr_micro"),
                    r.alias("r_milli"))
            .orderBy("vec_id", "pos"))


# --------------------------------------------------------------------------
# First-occurrence n-gram novelty: the fraction of a document's distinct
# bigrams not seen in any LOWER-id document — the marginal-contribution
# signal curation uses to order near-duplicate-heavy crawls. Integer
# counts end to end.
# --------------------------------------------------------------------------
@query("ngram_novelty", oracle="""
WITH wrds AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS w
  FROM documents
),
idx AS (SELECT doc_id, w, unnest(range(1, len(w))) AS i FROM wrds),
bg AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] AS bgr FROM idx),
fst AS (SELECT bgr, min(doc_id) AS first_doc FROM bg GROUP BY bgr)
SELECT bg.doc_id,
       CAST(count(*) AS BIGINT) AS n_distinct_bigrams,
       CAST(sum(CASE WHEN fst.first_doc = bg.doc_id THEN 1 ELSE 0 END)
            AS BIGINT) AS n_novel,
       CAST(1000 * sum(CASE WHEN fst.first_doc = bg.doc_id THEN 1 ELSE 0 END)
            // count(*) AS BIGINT) AS novelty_milli
FROM bg JOIN fst ON bg.bgr = fst.bgr
GROUP BY bg.doc_id
ORDER BY bg.doc_id
""")
def ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document novel-bigram ratio against all lower-id documents.
    One distinct-(doc, bigram) relation feeds both the first-occurrence
    aggregation and the per-doc reduction — shuffle ∝ distinct postings
    on the bigram key both times, never doc-pairs (the naive formulation
    is a self-join over documents). The min(doc_id) tie-break makes the
    result a pure function of the data, so the oracle replays it
    exactly."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    bg = (docs.select("doc_id",
                      F.explode(word_ngrams_raw(F.col("text"), 2))
                      .alias("bgr"))
          .distinct())
    fst = bg.groupBy("bgr").agg(F.min("doc_id").alias("first_doc"))
    novel = F.sum(F.when(F.col("first_doc") == F.col("doc_id"), 1)
                  .otherwise(0))
    return (bg.join(fst, "bgr")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).cast("long").alias("n_distinct_bigrams"),
                 novel.cast("long").alias("n_novel"))
            .withColumn("novelty_milli",
                        F.expr("1000 * n_novel div n_distinct_bigrams")
                        .cast("long"))
            .orderBy("doc_id"))
