"""Round-5 breadth: PCA over the embedding corpus (with a
variance-ordered invariant twin), a logistic quality scorer over the
text-quality signals, and a connected-components convergence
certification.

Determinism contracts: PCA scores depend on LAPACK's eigenvector basis —
rows-only, with `pca_invariants` certifying the spectrum and projection
against exact-integer and relational oracles; the logistic score is a
pure function of integer signals (one exp(), micro-rounded — the same
cross-engine contract dsir_weights uses for ln()); cc_convergence labels
exact-duplicate cliques, which a GROUP BY replays relationally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_tables
from ..operators.text import quality_metrics
from .registry import query

_PCA_K = 8


# --------------------------------------------------------------------------
# PCA projection (rows-only: component sign/basis is eigensolver-defined;
# pca_invariants below is the hash-certified twin). Output is posexploded
# to SCALAR columns (vec_id, pos, score) — the certification harness
# canonicalizes frames by sorting column values, and an array<double>
# column is unsortable/unhashable there (the round-5 red row), while the
# long form carries identical information and sorts fine.
# --------------------------------------------------------------------------
@query("embed_pca")
def embed_pca(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.embeddings import pca_fit, pca_project

    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    model = pca_fit(emb, "embedding", k=_PCA_K)
    return (pca_project(emb, "vec_id", "embedding", model)
            .select(F.col("id").alias("vec_id"),
                    F.posexplode("pc").alias("pos", "score"))
            .select("vec_id", F.col("pos").cast("int").alias("pos"), "score")
            .orderBy("vec_id", "pos"))


# --------------------------------------------------------------------------
# PCA invariants, hash-certified: (a) the trace replayed as EXACT integer
# arithmetic both engines compute identically (micro-quantized xi, the
# same pipeline embed_standardize certifies), (b) eigen-spectrum checks
# whose violation state is integer: variance-ordering, component
# orthonormality, Σλ == trace, projected per-component variance == λ,
# whitened variance == 1. The real operator runs on the real data — a
# broken covariance pass, eigensolver call, or projection flips a flag.
# --------------------------------------------------------------------------
@query("pca_invariants", oracle="""
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
           FROM embeddings WHERE vec_id < 1000),
x AS (SELECT vec_id, unnest(range(1, len(v) + 1)) AS pos, v FROM v),
xi AS (SELECT vec_id, CAST(pos AS INT) AS pos,
              CAST(round(v[pos] * 1000000) AS BIGINT) AS xi
       FROM x),
m AS (SELECT pos, count(*) AS n, CAST(sum(xi) AS BIGINT) AS s FROM xi
      GROUP BY pos),
st AS (SELECT pos, n, s // n AS mean_micro FROM m),
var_ AS (SELECT xi.pos,
                CAST(sum((xi.xi - st.mean_micro) * (xi.xi - st.mean_micro))
                     // max(st.n) AS BIGINT) AS var_micro2
         FROM xi JOIN st ON xi.pos = st.pos GROUP BY xi.pos)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM v) AS n_vectors,
       CAST(sum(var_micro2) AS BIGINT) AS trace_micro2,
       CAST(1 AS INT) AS order_ok,
       CAST(1 AS INT) AS orthonormal_ok,
       CAST(1 AS INT) AS trace_consistent,
       CAST(1 AS INT) AS proj_var_ok,
       CAST(1 AS INT) AS whiten_ok
FROM var_
""")
def pca_invariants(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    from ..functions.vectors import to_double
    from ..operators.embeddings import pca_fit, pca_project

    # certification harness: population-capped (predicate mirrored in the
    # oracle) so the two corpus passes stay cheap at any scale factor
    emb = (load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
           .filter(F.col("vec_id") < 1000))

    # exact-integer trace: micro-quantize once per cell, integer mean and
    # variance per dimension (identical arithmetic to the SQL oracle)
    xi = (emb.select("vec_id",
                     F.posexplode(to_double(F.col("embedding")))
                     .alias("pos", "x"))
          .select("pos", F.round(F.col("x") * 1_000_000).cast("long")
                  .alias("xi")))
    m = xi.groupBy("pos").agg(F.count(F.lit(1)).alias("n"),
                              F.sum("xi").alias("s"))
    st = m.select("pos", "n", F.expr("s div n").alias("mean_micro"))
    var_ = (xi.join(F.broadcast(st), "pos")
            .groupBy("pos")
            .agg(F.expr("sum((xi - mean_micro) * (xi - mean_micro))"
                        " div max(n)").alias("var_micro2")))
    trace_row = var_.agg(F.sum("var_micro2").alias("t")).first()
    trace_micro2 = int(trace_row["t"])

    model = pca_fit(emb, "embedding", k=_PCA_K)
    lam = np.asarray(model.all_eigvals)
    comps = np.asarray(model.components)
    order_ok = int(bool(np.all(lam[:-1] >= lam[1:] - 1e-12)))
    gram = comps @ comps.T
    orthonormal_ok = int(bool(
        np.max(np.abs(gram - np.eye(len(comps)))) < 1e-8))
    # Σλ must equal the covariance trace; the integer replay quantized at
    # micro, so compare at 1e-3 relative — far above quantization noise,
    # far below any real covariance/eig defect
    trace_f = float(lam.sum())
    trace_consistent = int(
        abs(trace_f - trace_micro2 / 1e12) <= 1e-3 * max(trace_f, 1e-9))

    proj = pca_project(emb, "vec_id", "embedding", model).persist()
    pv = (proj.select(F.posexplode("pc").alias("j", "score"))
          .groupBy("j").agg(F.var_pop("score").alias("v")).collect())
    proj.unpersist()
    got = np.zeros(_PCA_K)
    for r in pv:
        got[r["j"]] = r["v"]
    lam_k = np.asarray(model.explained_var)
    proj_var_ok = int(bool(np.all(
        np.abs(got - lam_k) <= 1e-6 * np.maximum(lam_k, 1e-9))))

    wproj = pca_project(emb, "vec_id", "embedding", model, whiten=True)
    wv = (wproj.select(F.posexplode("pc").alias("j", "score"))
          .groupBy("j").agg(F.var_pop("score").alias("v")).collect())
    whiten_ok = int(bool(all(abs(r["v"] - 1.0) <= 1e-6 for r in wv)))

    return spark.createDataFrame(
        [(int(model.n_samples), trace_micro2, order_ok, orthonormal_ok,
          trace_consistent, proj_var_ok, whiten_ok)],
        "n_vectors bigint, trace_micro2 bigint, order_ok int, "
        "orthonormal_ok int, trace_consistent int, proj_var_ok int, "
        "whiten_ok int")


# --------------------------------------------------------------------------
# Logistic quality score: a trained-classifier stand-in with FIXED,
# interpretable weights over the integer quality signals (alpha ratio up,
# stopword ratio up, digit ratio down, saturating length bonus). The
# linear term is exact integer/literal arithmetic in both engines; the
# one transcendental (exp) is micro-rounded — the dsir_weights contract.
# --------------------------------------------------------------------------
@query("quality_logistic_score", oracle="""
WITH t AS (
  SELECT doc_id, text,
         list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS w,
         length(text) AS nc
  FROM documents
), sig AS (
  SELECT doc_id,
         CAST(len(w) AS BIGINT) AS n_words,
         CAST(round(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 1000.0
                    / greatest(nc, 1)) AS BIGINT) AS alpha_milli,
         CAST(round(length(regexp_replace(text, '[^0-9]', '', 'g')) * 1000.0
                    / greatest(nc, 1)) AS BIGINT) AS digit_milli,
         CAST(round(len(list_filter(w, x -> list_contains(
                  ['the','a','and','of','to','in','is','it','that','for'],
                  lower(x)))) * 1000.0 / greatest(len(w), 1)) AS BIGINT)
           AS stopword_milli
  FROM t
), z AS (
  SELECT doc_id, n_words,
         1.5 * (alpha_milli - 600) / 1000.0
           + 4.0 * (stopword_milli - 250) / 1000.0
           - 2.0 * digit_milli / 1000.0
           + least(n_words, 400) / 400.0
           - 1.0 AS z
  FROM sig
)
SELECT doc_id, n_words,
       CAST(round(1000000.0 / (1.0 + exp(-z))) AS BIGINT) AS score_micro,
       CAST(round(1000000.0 / (1.0 + exp(-z))) >= 500000 AS INT) AS keep
FROM z
ORDER BY doc_id
""")
def quality_logistic_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    sig = quality_metrics(docs.select("doc_id", "text"), "text")
    z = (1.5 * (F.col("alpha_milli") - 600) / 1000.0
         + 4.0 * (F.col("stopword_milli") - 250) / 1000.0
         - 2.0 * F.col("digit_milli") / 1000.0
         + F.least(F.col("n_words").cast("bigint"), F.lit(400)) / 400.0
         - 1.0)
    score = F.round(1_000_000.0 / (1.0 + F.exp(-z))).cast("long")
    return (sig.select("doc_id", F.col("n_words").cast("long").alias("n_words"),
                       score.alias("score_micro"),
                       (score >= 500_000).cast("int").alias("keep"))
            .orderBy("doc_id"))


# --------------------------------------------------------------------------
# Connected-components convergence certification: documents sharing a
# 12-char text prefix form disjoint cliques (the warehouse has no full-
# text duplicates but hundreds of shared boilerplate prefixes at every
# SF), so (a) every component label must equal the min doc_id of its
# prefix group — a GROUP BY replays that relationally — and (b) min-label
# propagation must settle in exactly 2 rounds (one hop to the clique
# minimum + the fixpoint-detection round). A diameter bug, a label leak
# across components, or a convergence regression all change hashed
# columns.
# --------------------------------------------------------------------------
@query("cc_convergence", oracle="""
WITH g AS (
  SELECT substring(text, 1, 12) AS h, count(*) AS c, min(doc_id) AS mn
  FROM documents GROUP BY substring(text, 1, 12) HAVING count(*) >= 2
)
SELECT CAST(c AS BIGINT) AS comp_size,
       CAST(count(*) AS BIGINT) AS n_components,
       CAST(2 AS INT) AS n_rounds,
       CAST(0 AS BIGINT) AS label_violations
FROM g GROUP BY c ORDER BY comp_size
""")
def cc_convergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import connected_components_stats

    docs = (load_tables(spark, sf_dir, ("documents",))["documents"]
            .select("doc_id", F.substring("text", 1, 12).alias("h")))
    a = docs.select("h", F.col("doc_id").alias("a_id"))
    b = docs.select("h", F.col("doc_id").alias("b_id"))
    pairs = (a.join(b, "h").filter(F.col("a_id") < F.col("b_id"))
             .select("a_id", "b_id"))
    labels, rounds = connected_components_stats(pairs)
    expected = (docs.join(docs.groupBy("h")
                          .agg(F.min("doc_id").alias("mn"),
                               F.count(F.lit(1)).alias("c")), "h")
                .filter(F.col("c") >= 2)
                .select(F.col("doc_id").alias("node"),
                        F.col("mn").alias("expected")))
    mism = (labels.join(expected, "node", "full")
            .filter(F.col("component").isNull() | F.col("expected").isNull()
                    | (F.col("component") != F.col("expected")))
            .count())
    return (labels.groupBy("component")
            .agg(F.count(F.lit(1)).alias("comp_size"))
            .groupBy("comp_size")
            .agg(F.count(F.lit(1)).alias("n_components"))
            .select("comp_size", "n_components",
                    F.lit(int(rounds)).cast("int").alias("n_rounds"),
                    F.lit(int(mism)).cast("long").alias("label_violations"))
            .orderBy("comp_size"))
