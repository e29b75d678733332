"""Round-5 breadth, sixth wave: hybrid retrieval — reciprocal-rank
fusion (RRF, k=60) of a BM25 text ranking and an embedding cosine
ranking, the standard way production search blends lexical and semantic
signals before a reranker.

Determinism: both input rankings are engine-exact (BM25 ranks on
micro-int scores with doc_id tie-breaks; cosine ranks follow the
ann_bruteforce contract — raw double similarity, bit-identical fold vs
DuckDB's list kernel, n_id tie-break), and each RRF term
round(1e9/(60+rank)) is an integer before the fusion sum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_tables
from ..functions.texts import words
from .registry import query

_TERMS = ("spark", "query", "window")
_K1, _B = 1.2, 0.75
_LIST_DEPTH = 50   # depth of each input ranking
_RRF_K = 60
_TOPK = 20
_QUERY_VEC_ID = 0  # the corpus vector serving as the semantic query


@query("hybrid_rrf_search", oracle=f"""
WITH d AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS w
  FROM documents
),
dl AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS dl FROM d),
stats AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
tf AS (
  SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest(w) AS tok FROM d)
  WHERE tok IN ('spark', 'query', 'window')
  GROUP BY doc_id, tok
),
df AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY tok),
term AS (
  SELECT tf.doc_id,
         CAST(round(1000000.0
                    * ln(1.0 + (stats.n - df.df + 0.5) / (df.df + 0.5))
                    * (tf.tf * ({_K1} + 1.0))
                    / (tf.tf + {_K1} * (1.0 - {_B}
                       + {_B} * dl.dl / stats.avgdl))) AS BIGINT) AS s_micro
  FROM tf
  JOIN df ON tf.tok = df.tok
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats
),
txt AS (
  SELECT doc_id AS id,
         row_number() OVER (ORDER BY sum(s_micro) DESC, doc_id) AS r
  FROM term GROUP BY doc_id
  QUALIFY r <= {_LIST_DEPTH}
),
qv AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings
       WHERE vec_id = {_QUERY_VEC_ID}),
vec AS (
  SELECT vec_id AS id,
         row_number() OVER (
           ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                           qv.v) DESC, vec_id) AS r
  FROM embeddings e CROSS JOIN qv
  WHERE vec_id <> {_QUERY_VEC_ID}
  QUALIFY r <= {_LIST_DEPTH}
),
fused AS (
  SELECT coalesce(txt.id, vec.id) AS id,
         CAST(txt.id IS NOT NULL AS INT) AS in_text,
         CAST(vec.id IS NOT NULL AS INT) AS in_vec,
         CAST(coalesce(CAST(round(1000000000.0 / ({_RRF_K} + txt.r))
                            AS BIGINT), 0)
              + coalesce(CAST(round(1000000000.0 / ({_RRF_K} + vec.r))
                              AS BIGINT), 0) AS BIGINT) AS rrf_nano
  FROM txt FULL OUTER JOIN vec ON txt.id = vec.id
)
SELECT id, in_text, in_vec, rrf_nano,
       CAST(row_number() OVER (ORDER BY rrf_nano DESC, id) AS INT) AS rank
FROM fused
QUALIFY rank <= {_TOPK}
ORDER BY rank
""")
def hybrid_rrf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RRF-fused top-{k}: score(d) = Σ_lists 1/(60 + rank_list(d)).

    Scale shape: the text leg is the bm25_search plan (postings-only
    shuffle, broadcast stats, distributed top-depth); the vector leg is
    one map-only cosine pass against the broadcast query vector followed
    by a distributed top-depth; fusion joins two ≤depth-row relations —
    trivially broadcast. Nothing in the plan scales with corpus² or
    ranks more than `depth` rows on a single partition."""
    from ..operators.similarity import ann_bruteforce_topk

    t = load_tables(spark, sf_dir, ("documents", "embeddings"))
    docs, emb = t["documents"], t["embeddings"]

    # ---- text leg: BM25 at depth 50 (same arithmetic as bm25_search)
    d = docs.select("doc_id", words(F.col("text")).alias("w"))
    dl = d.select("doc_id", F.size("w").cast("long").alias("dl"))
    stats = dl.agg(F.count(F.lit(1)).cast("long").alias("n"),
                   (F.sum("dl").cast("double")
                    / F.count(F.lit(1))).alias("avgdl"))
    tf = (d.select("doc_id", F.explode("w").alias("tok"))
          .filter(F.col("tok").isin(*_TERMS))
          .groupBy("doc_id", "tok")
          .agg(F.count(F.lit(1)).cast("long").alias("tf")))
    df_ = tf.groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("df"))
    idf = F.log(1.0 + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    s_micro = F.round(
        1_000_000.0 * idf * (F.col("tf") * (_K1 + 1.0))
        / (F.col("tf") + _K1 * (1.0 - _B
           + _B * F.col("dl") / F.col("avgdl")))).cast("long")
    scored = (tf.join(F.broadcast(df_), "tok").join(dl, "doc_id")
              .crossJoin(F.broadcast(stats))
              .select("doc_id", s_micro.alias("s_micro"))
              .groupBy("doc_id")
              .agg(F.sum("s_micro").cast("long").alias("score_micro")))
    txt_top = (scored.orderBy(F.col("score_micro").desc(), F.col("doc_id"))
               .limit(_LIST_DEPTH))
    w_t = Window.orderBy(F.col("score_micro").desc(), F.col("doc_id"))
    txt = (txt_top.withColumn("r", F.row_number().over(w_t))
           .select(F.col("doc_id").alias("id"), "r"))

    # ---- vector leg: cosine vs the broadcast query vector, depth 50
    qv = emb.filter(F.col("vec_id") == _QUERY_VEC_ID)
    corpus = emb.filter(F.col("vec_id") != _QUERY_VEC_ID)
    vec_top = ann_bruteforce_topk(corpus, qv, "vec_id", "embedding",
                                  k=_LIST_DEPTH)
    vec = vec_top.select(F.col("n_id").alias("id"),
                         F.col("rank").alias("r"))

    # ---- fusion over two ≤depth-row relations
    rrf = lambda r: F.round(1_000_000_000.0 / (_RRF_K + r)).cast("long")
    fused = (txt.withColumnRenamed("r", "tr")
             .join(vec.withColumnRenamed("r", "vr"), "id", "full")
             .select("id",
                     F.col("tr").isNotNull().cast("int").alias("in_text"),
                     F.col("vr").isNotNull().cast("int").alias("in_vec"),
                     (F.coalesce(rrf(F.col("tr")), F.lit(0))
                      + F.coalesce(rrf(F.col("vr")), F.lit(0)))
                     .cast("long").alias("rrf_nano")))
    top = fused.orderBy(F.col("rrf_nano").desc(), F.col("id")).limit(_TOPK)
    w_f = Window.orderBy(F.col("rrf_nano").desc(), F.col("id"))
    return (top.withColumn("rank", F.row_number().over(w_f).cast("int"))
            .select("id", "in_text", "in_vec", "rrf_nano", "rank")
            .orderBy("rank"))
