"""Modern corpus-curation operators beyond the round-3 surface:
semantic dedup (SemDeDup-style), temperature-flattened domain
resampling, and DSIR-style hashed-n-gram importance weighting — the
curation passes a large-scale LLM-data pipeline layers on top of the
exact/near dedup family.

Determinism contract: every sampling/weighting decision is a pure
function of the data (md5 buckets, exact counts), so the SQL oracles
replay them bit-for-bit; only the k-means cluster ASSIGNMENT
(semdedup_keep) is seeded-iterative and therefore rows-only, with its
global soundness certified separately (semdedup_soundness).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_tables
from .registry import query

_SEM_THRESHOLD = 0.45


# --------------------------------------------------------------------------
# SemDeDup: cluster embeddings coarsely, drop within-cluster semantic
# duplicates, keep the min-id representative per duplicate group.
# --------------------------------------------------------------------------
@query("semdedup_keep")
def semdedup_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import semdedup

    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    # n_clusters=None: the operator derives k so the EXPECTED cluster
    # stays ~256 vectors — a pinned k would make the within-cluster
    # self-join quadratic in the corpus (at every test SF the derived k
    # is the same 8-cluster floor, so results are unchanged here)
    return (semdedup(emb, "vec_id", "embedding",
                     threshold=_SEM_THRESHOLD)
            .orderBy("vec_id"))


# --------------------------------------------------------------------------
# SemDeDup soundness vs GLOBAL truth: every vector semdedup removes must
# have at least one exact cosine-≥-threshold partner in the corpus
# (cluster-local decisions can only remove true near-duplicates; the
# documented trade is MISSED cross-cluster dups, never false removals).
# The exact pair set comes from the scale-safe blocked+rescore path —
# an independent plan, not the clustering.
# --------------------------------------------------------------------------
@query("semdedup_soundness", oracle="""
SELECT CAST(count(*) AS BIGINT) AS n_vectors,
       CAST(0 AS BIGINT) AS unjustified_removals
FROM embeddings WHERE vec_id < 1000
""")
def semdedup_soundness(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import cosine_pairs_scaled, semdedup

    # certification harness: population-capped (predicate mirrored in the
    # oracle) so its cost stays fixed at any scale factor — the
    # production op itself runs uncapped in semdedup_keep
    emb = (load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
           .filter(F.col("vec_id") < 1000))
    removed = (semdedup(emb, "vec_id", "embedding",
                        threshold=_SEM_THRESHOLD, n_clusters=8)
               .filter(F.col("keep") == 0).select("vec_id"))
    true_pairs = cosine_pairs_scaled(emb, "vec_id", "embedding",
                                     threshold=_SEM_THRESHOLD)
    dup_members = (true_pairs.select(F.col("a_id").alias("vec_id"))
                   .unionAll(true_pairs.select(F.col("b_id").alias("vec_id")))
                   .distinct())
    unjustified = removed.join(dup_members, "vec_id", "left_anti")
    return (emb.agg(F.count(F.lit(1)).alias("n_vectors"))
            .crossJoin(unjustified.agg(F.count(F.lit(1))
                                       .alias("unjustified_removals"))))


# --------------------------------------------------------------------------
# Temperature-flattened domain resampling (T = 0.5): per-language keep
# probability p_d = sqrt(n_min / n_d) — the smallest domain keeps all its
# docs, larger domains are down-sampled toward balance. The keep decision
# is a deterministic md5 bucket per doc, so both engines select the SAME
# documents: sqrt and the division are correctly-rounded IEEE ops,
# bit-identical across engines.
# --------------------------------------------------------------------------
@query("domain_temperature_sample", oracle="""
WITH n AS (
  SELECT lang, count(*) AS n_docs,
         min(count(*)) OVER () AS n_min
  FROM documents GROUP BY lang
), d AS (
  SELECT doc_id, d.lang, n.n_docs, n.n_min,
         (CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
               AS BIGINT) % 1000000) / 1000000.0 AS frac
  FROM documents d JOIN n USING (lang)
)
SELECT lang,
       CAST(max(n_docs) AS BIGINT) AS n_docs,
       CAST(count(*) FILTER (WHERE frac < sqrt(CAST(n_min AS DOUBLE)
                                               / n_docs)) AS BIGINT)
         AS n_kept
FROM d
GROUP BY lang
ORDER BY lang
""")
def domain_temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    n = (docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs")))
    n_min = n.agg(F.min("n_docs").alias("n_min"))
    frac = (F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8),
                   16, 10).cast("long") % 1_000_000) / 1_000_000.0
    p = F.sqrt(F.col("n_min").cast("double") / F.col("n_docs"))
    return (docs.join(F.broadcast(n), "lang").crossJoin(F.broadcast(n_min))
            .select("lang", "n_docs", frac.alias("frac"), p.alias("p"))
            .groupBy("lang")
            .agg(F.max("n_docs").alias("n_docs"),
                 F.count(F.when(F.col("frac") < F.col("p"), 1))
                 .alias("n_kept"))
            .orderBy("lang"))


# --------------------------------------------------------------------------
# DSIR-style importance weights: hashed-bigram features, per-doc weight =
# Σ_g count_g(d) · (ln P_target(g) − ln P_raw(g)) with +1 smoothing over
# 1024 md5 buckets; target distribution = the English subset. Positive
# weights mark documents bigram-distributionally closer to the target —
# the resampling score of data-selection-via-importance-resampling.
# Micro-unit rounding absorbs cross-engine ln() ulp differences (the
# same contract text_tfidf's oracle uses).
# --------------------------------------------------------------------------
_DSIR_BUCKETS = 1024


@query("dsir_weights", oracle=f"""
WITH tok AS (
  SELECT doc_id, lang,
         list_filter(string_split_regex(trim(text), '\\s+'),
                     x -> x <> '') AS w
  FROM documents
), big AS (
  SELECT doc_id, lang,
         CAST(('0x' || substring(md5(unnest(list_transform(
                  generate_series(1, len(w) - 1),
                  i -> w[i] || ' ' || w[i + 1]))), 1, 8))
              AS BIGINT) % {_DSIR_BUCKETS} AS g
  FROM tok
  WHERE len(w) >= 2
), raw_p AS (
  SELECT g, count(*) AS c_raw,
         sum(count(*)) OVER () AS tot_raw
  FROM big GROUP BY g
), tgt_p AS (
  SELECT g, count(*) AS c_tgt,
         sum(count(*)) OVER () AS tot_tgt
  FROM big WHERE lang = 'en' GROUP BY g
), doc_g AS (
  SELECT doc_id, g, count(*) AS cnt FROM big GROUP BY doc_id, g
), scored AS (
  SELECT d.doc_id,
         sum(d.cnt) AS n_grams,
         sum(d.cnt * (ln((COALESCE(t.c_tgt, 0) + 1.0)
                         / ((SELECT max(tot_tgt) FROM tgt_p)
                            + {_DSIR_BUCKETS}))
                      - ln((r.c_raw + 1.0)
                           / (r.tot_raw + {_DSIR_BUCKETS}))))
           AS weight
  FROM doc_g d
  JOIN raw_p r USING (g)
  LEFT JOIN tgt_p t USING (g)
  GROUP BY d.doc_id
)
SELECT doc_id,
       CAST(n_grams AS BIGINT) AS n_grams,
       CAST(round(weight * 1000000) AS BIGINT) AS weight_micro
FROM scored
ORDER BY doc_id
""")
def dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.texts import words

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    w = words(F.col("text"))
    # adjacent-pair join over a BOUND column (w): sequence-transform, not
    # zip_with-with-shifted-slice — zip_with null-pads the shorter side,
    # which would leak the final unigram as a "bigram"
    bigram = F.expr("transform(sequence(1, size(w) - 1), "
                    "i -> concat_ws(' ', element_at(w, i), "
                    "element_at(w, i + 1)))")
    g = (F.conv(F.substring(F.md5(F.col("gram")), 1, 8), 16, 10)
         .cast("long") % _DSIR_BUCKETS)
    big = (docs.select("doc_id", "lang", w.alias("w"))
           .filter(F.size("w") >= 2)
           .select("doc_id", "lang", F.explode(bigram).alias("gram"))
           .select("doc_id", "lang", g.alias("g")))
    big = big.persist()  # three aggregations share the explode
    raw_p = (big.groupBy("g").agg(F.count(F.lit(1)).alias("c_raw")))
    tot_raw = big.count()
    tgt = big.filter(F.col("lang") == "en")
    tgt_p = tgt.groupBy("g").agg(F.count(F.lit(1)).alias("c_tgt"))
    tot_tgt = tgt.count()
    doc_g = (big.groupBy("doc_id", "g").agg(F.count(F.lit(1)).alias("cnt")))
    term = (F.col("cnt")
            * (F.log((F.coalesce(F.col("c_tgt"), F.lit(0)) + 1.0)
                     / float(tot_tgt + _DSIR_BUCKETS))
               - F.log((F.col("c_raw") + 1.0)
                       / float(tot_raw + _DSIR_BUCKETS))))
    return (doc_g.join(F.broadcast(raw_p), "g")
            .join(F.broadcast(tgt_p), "g", "left")
            .groupBy("doc_id")
            .agg(F.sum("cnt").alias("n_grams"),
                 F.round(F.sum(term) * 1_000_000).cast("long")
                 .alias("weight_micro"))
            .select("doc_id", F.col("n_grams").cast("long").alias("n_grams"),
                    "weight_micro")
            .orderBy("doc_id"))
