"""Round-7 breadth: the composed IVF-PQ ANN tier, certified through
the PERSISTED index (build → PartitionFilters-pruned ADC scan → exact
re-rank), plus its degenerate-exhaustive exactness twin.

Reference capability: the similarity search a 100 TB training corpus
actually serves — the FAISS-standard IVF-PQ layout re-expressed as
cluster-partitioned parquet + Arrow-batched lookup-table scans.
Determinism: seeded k-means, lowest-id PQ training sample, tie-safe
(sim DESC, n_id ASC) selection at every cut — identical results across
runs and partitionings, which is what lets `ann_ivfpq` certify
rows-only and its twin certify by hash.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_tables
from .registry import cert_work_dir, query


def _tmp(tag: str, sf_dir: str) -> str:
    return cert_work_dir(tag, sf_dir)


def _ivfpq_result(spark: SparkSession, sf_dir: str, nprobe: int,
                  rerank: int) -> DataFrame:
    """Build (atomic staging+rename) then query the persisted IVF-PQ
    index — the build is re-run per call so the certified result always
    reflects the current warehouse, and the query path is the REAL
    serving path: probed clusters → PartitionFilters on the codes
    directories → masked ADC scan → exact re-rank."""
    from ..operators.ann_index import build_ivfpq_index, query_ivfpq_index

    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    qs = emb.filter(F.col("vec_id") % 100 == 0)
    idx = _tmp("ivfpq", sf_dir)
    build_ivfpq_index(emb, "vec_id", "embedding", idx,
                      n_clusters=8, m=8, ksub=16)
    return query_ivfpq_index(spark, idx, emb, qs, "vec_id", "embedding",
                             k=5, nprobe=nprobe, rerank=rerank)


@query("ann_ivfpq")
def ann_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ through the persisted index at serving settings
    (nprobe 3/8, rerank 128): query cost is probed-fraction ×
    8 bytes/vector — the product of both tiers' savings. Rows-only
    (codebooks/centroids are sample/Lloyd-defined); the hash-certified
    twin below proves the full path exact in degenerate mode."""
    topk = _ivfpq_result(spark, sf_dir, nprobe=3, rerank=128)
    return (topk.select("q_id", "n_id",
                        F.round(F.col("sim") * 1_000_000).cast("long")
                        .alias("sim_micro"), "rank")
            .orderBy("q_id", "rank"))


@query("ann_ivfpq_fullprobe_exact", oracle="""
SELECT CAST(count(*) AS BIGINT) AS n_queries,
       CAST(0 AS BIGINT) AS mismatched_neighbors
FROM embeddings WHERE vec_id % 100 = 0
""")
def ann_ivfpq_fullprobe_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probing EVERY cluster with rerank ≥ |corpus| degrades IVF-PQ to
    exhaustive search with exact re-scoring, so its top-k (q_id, n_id)
    set must equal brute force's — certifying build, partition layout,
    codes, ADC masking, and re-rank end to end (the
    ann_ivf_fullprobe_exact pattern for the composed tier). Degenerate
    cost by design: candidates = |q|·|corpus| at full probe; serving
    settings are the rows-only query above."""
    from ..operators.similarity import ann_bruteforce_topk
    from .invariants import _sym_diff_count

    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    qs = emb.filter(F.col("vec_id") % 100 == 0)
    ivfpq = (_ivfpq_result(spark, sf_dir, nprobe=8, rerank=1 << 30)
             .select(F.col("q_id").alias("a_id"),
                     F.col("n_id").alias("b_id")))
    bf = (ann_bruteforce_topk(emb, qs, "vec_id", "embedding", k=5)
          .select(F.col("q_id").alias("a_id"), F.col("n_id").alias("b_id")))
    diff = _sym_diff_count(ivfpq, bf)
    return (qs.agg(F.count(F.lit(1)).alias("n_queries"))
            .crossJoin(diff.agg(F.count(F.lit(1))
                                .alias("mismatched_neighbors"))))


# --------------------------------------------------------------------------
# Trigram Kneser-Ney with backoff (D = 0.75), exact integer micro-units:
#   P(w3|w1w2) = (C(w1w2w3)-D)/ctx(w1w2) + lam(w1w2)·Pmid(w3|w2)
#   Pmid(w3|w2) = (N1+(·w2w3)-D)/N1+(·w2·) + lam2(w2)·Pcont(w3)
#   Pcont(w3)  = N1+(·w3 as continuation)/|distinct (w2,w3) types|
# The standard KenLM order for data filtering — the backoff chain is
# what keeps rare-but-fluent continuations from scoring as garbage.
# Count conventions (documented because they make the sum-to-one
# identity EXACT, property-tested with rational arithmetic): every
# quantity derives from the trigram token stream — ctx(w1w2) counts
# trigram tokens by prefix (not standalone bigrams: doc-final bigrams
# have no continuation to distribute mass over), and the continuation
# counts come from distinct trigram TYPES.
# --------------------------------------------------------------------------

def trigram_kn_scores(docs: DataFrame) -> DataFrame:
    """(doc_id, n_trigrams, sum_kn_micro, avg_kn_micro) — factored out
    of the registered query so the property tests can drive it with
    synthetic corpora. Postings-style shapes only: every count relation
    keys on a gram and joins back on that key (vocabulary-sized
    equi-joins); the type-count scalar broadcasts; the per-doc
    reduction keys on doc_id. All-BIGINT arithmetic: C ≥ 1 and
    N1+ ≥ 1 keep every discounted numerator positive, so truncating
    div == floor throughout; 1e6-scaled products stay ≤ 1e12."""
    from ..functions.texts import word_ngrams_raw

    bg = (docs.select("doc_id",
                      F.explode(word_ngrams_raw(F.col("text"), 3))
                      .alias("tg"))
          .withColumn("w1", F.split_part(F.col("tg"), F.lit(" "), F.lit(1)))
          .withColumn("w2", F.split_part(F.col("tg"), F.lit(" "), F.lit(2)))
          .withColumn("w3", F.split_part(F.col("tg"), F.lit(" "), F.lit(3))))
    ty = bg.select("w1", "w2", "w3").distinct()
    c_tri = bg.groupBy("w1", "w2", "w3").agg(
        F.count(F.lit(1)).cast("long").alias("c_tri"))
    c_ctx = bg.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("c_ctx"))
    fan_hi = ty.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("fan_hi"))
    mid_num = ty.groupBy("w2", "w3").agg(
        F.count(F.lit(1)).cast("long").alias("mid_num"))
    mid_den = ty.groupBy("w2").agg(
        F.count(F.lit(1)).cast("long").alias("mid_den"))
    fan_mid = ty.groupBy("w2").agg(
        F.countDistinct("w3").cast("long").alias("fan_mid"))
    cont_num = ty.select("w2", "w3").distinct().groupBy("w3").agg(
        F.count(F.lit(1)).cast("long").alias("cont_num"))
    cont_den = ty.select("w2", "w3").distinct().agg(
        F.count(F.lit(1)).cast("long").alias("cont_den"))
    kn = F.expr(
        "(1000000 * c_tri - 750000) div c_ctx"
        " + ((750000 * fan_hi) div c_ctx)"
        " * ((1000000 * mid_num - 750000) div mid_den"
        "    + ((750000 * fan_mid) div mid_den)"
        "      * ((1000000 * cont_num) div cont_den) div 1000000)"
        " div 1000000")
    scored = (bg.join(c_tri, ["w1", "w2", "w3"])
              .join(c_ctx, ["w1", "w2"]).join(fan_hi, ["w1", "w2"])
              .join(mid_num, ["w2", "w3"]).join(mid_den, "w2")
              .join(fan_mid, "w2").join(cont_num, "w3")
              .crossJoin(F.broadcast(cont_den))
              .select("doc_id", kn.alias("kn_micro")))
    return (scored.groupBy("doc_id")
            .agg(F.count(F.lit(1)).cast("long").alias("n_trigrams"),
                 F.sum("kn_micro").cast("long").alias("sum_kn_micro"))
            .withColumn("avg_kn_micro",
                        F.expr("sum_kn_micro div n_trigrams").cast("long"))
            .orderBy("doc_id"))


@query("text_trigram_kn", oracle="""
WITH wrds AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '')
           AS w
  FROM documents
),
idx AS (SELECT doc_id, w, unnest(range(1, len(w) - 1)) AS i
        FROM wrds WHERE len(w) >= 3),
bg AS (SELECT doc_id, w[i] AS w1, w[i+1] AS w2, w[i+2] AS w3 FROM idx),
ty AS (SELECT DISTINCT w1, w2, w3 FROM bg),
c_tri AS (SELECT w1, w2, w3, CAST(count(*) AS BIGINT) AS c_tri
          FROM bg GROUP BY w1, w2, w3),
c_ctx AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c_ctx
          FROM bg GROUP BY w1, w2),
fan_hi AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS fan_hi
           FROM ty GROUP BY w1, w2),
mid_num AS (SELECT w2, w3, CAST(count(*) AS BIGINT) AS mid_num
            FROM ty GROUP BY w2, w3),
mid_den AS (SELECT w2, CAST(count(*) AS BIGINT) AS mid_den
            FROM ty GROUP BY w2),
fan_mid AS (SELECT w2, CAST(count(DISTINCT w3) AS BIGINT) AS fan_mid
            FROM ty GROUP BY w2),
bity AS (SELECT DISTINCT w2, w3 FROM ty),
cont_num AS (SELECT w3, CAST(count(*) AS BIGINT) AS cont_num
             FROM bity GROUP BY w3),
cont_den AS (SELECT CAST(count(*) AS BIGINT) AS cont_den FROM bity),
scored AS (
  SELECT b.doc_id,
         (1000000 * c_tri.c_tri - 750000) // c_ctx.c_ctx
           + ((750000 * fan_hi.fan_hi) // c_ctx.c_ctx)
             * ((1000000 * mid_num.mid_num - 750000) // mid_den.mid_den
                + ((750000 * fan_mid.fan_mid) // mid_den.mid_den)
                  * ((1000000 * cont_num.cont_num) // cont_den.cont_den)
                  // 1000000)
             // 1000000
           AS kn_micro
  FROM bg b
  JOIN c_tri ON b.w1 = c_tri.w1 AND b.w2 = c_tri.w2 AND b.w3 = c_tri.w3
  JOIN c_ctx ON b.w1 = c_ctx.w1 AND b.w2 = c_ctx.w2
  JOIN fan_hi ON b.w1 = fan_hi.w1 AND b.w2 = fan_hi.w2
  JOIN mid_num ON b.w2 = mid_num.w2 AND b.w3 = mid_num.w3
  JOIN mid_den ON b.w2 = mid_den.w2
  JOIN fan_mid ON b.w2 = fan_mid.w2
  JOIN cont_num ON b.w3 = cont_num.w3
  CROSS JOIN cont_den
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_trigrams,
       CAST(sum(kn_micro) AS BIGINT) AS sum_kn_micro,
       CAST(sum(kn_micro) // count(*) AS BIGINT) AS avg_kn_micro
FROM scored GROUP BY doc_id ORDER BY doc_id
""")
def text_trigram_kn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc trigram KN fluency scores over the documents table —
    the trigram upgrade of `text_bigram_kn` (breadth27.py), same
    BIGINT micro-unit discipline, one backoff level deeper."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return trigram_kn_scores(docs)


# --------------------------------------------------------------------------
# Paragraph-level exact dedup — the CCNet granularity between
# dedup_exact's whole-document hash and dup_span_strip's 5-gram spans:
# hash normalized paragraphs, keep each paragraph's FIRST corpus
# occurrence, drop every other instance, reassemble the documents.
# The synthetic corpus has no newline structure, so "paragraph" here is
# a fixed 10-word chunk; on real corpora the splitter is
# split(text, '\n\n') and the rest of the pipeline — first-occurrence
# keep on the hash, reassembly — is unchanged.
# --------------------------------------------------------------------------
@query("dedup_paragraph", oracle="""
WITH w AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '')
           AS w
  FROM documents
),
ch AS (
  SELECT doc_id, i AS chunk_idx,
         array_to_string(w[(i*10+1):(i*10+10)], ' ') AS chunk
  FROM w, unnest(range(0, CAST(ceil(len(w)/10.0) AS BIGINT))) AS t(i)
  WHERE len(w) > 0
),
first_k AS (
  SELECT chunk,
         CAST(min(doc_id * 1000000 + chunk_idx) AS BIGINT) AS first_key
  FROM ch GROUP BY chunk
),
marked AS (
  SELECT c.doc_id, c.chunk_idx, c.chunk,
         CASE WHEN c.doc_id * 1000000 + c.chunk_idx = f.first_key
              THEN 1 ELSE 0 END AS kept
  FROM ch c JOIN first_k f ON c.chunk = f.chunk
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_paras,
       CAST(sum(kept) AS BIGINT) AS n_kept,
       coalesce(string_agg(chunk, ' ' ORDER BY chunk_idx)
                  FILTER (WHERE kept = 1), '') AS clean_text
FROM marked GROUP BY doc_id ORDER BY doc_id
""")
def dedup_paragraph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide first-occurrence paragraph dedup with relational
    reassembly. Scale shape: paragraphs explode once (map-only array
    slicing — one codegen projection builds all chunks), the
    first-occurrence resolution is ONE groupBy on the paragraph text
    (at corpus scale, group on xxhash64(paragraph) so the shuffle
    carries 8-byte keys; the text key keeps the oracle engine-exact
    here) plus an equi-join back, and reassembly keys on doc_id.
    First occurrence = min (doc_id, chunk_idx), encoded as
    doc_id·1e6 + idx (BIGINT-safe while docs stay under a million
    paragraphs and ids under ~9e12 — far past any real corpus)."""
    from ..functions.texts import words

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    w = docs.select("doc_id", words(F.col("text")).alias("w"))
    n_chunks = F.expr("(size(w) + 9) div 10")
    chunks = F.when(
        F.size("w") > 0,
        F.transform(F.sequence(F.lit(0), n_chunks - 1),
                    lambda i: F.concat_ws(
                        " ", F.slice("w", i * 10 + 1, 10)))
    ).otherwise(F.array().cast("array<string>"))
    ch = (w.select("doc_id", F.posexplode(chunks)
                   .alias("chunk_idx", "chunk")))
    key = (F.col("doc_id") * 1_000_000 + F.col("chunk_idx")).cast("long")
    first_k = (ch.groupBy("chunk")
               .agg(F.min(key).alias("first_key")))
    marked = (ch.join(first_k, "chunk")
              .withColumn("kept", (key == F.col("first_key"))
                          .cast("int")))
    kept_struct = F.when(F.col("kept") == 1,
                         F.struct("chunk_idx", "chunk"))
    return (marked.groupBy("doc_id")
            .agg(F.count(F.lit(1)).cast("long").alias("n_paras"),
                 F.sum("kept").cast("long").alias("n_kept"),
                 F.concat_ws(" ", F.transform(
                     F.array_sort(F.collect_list(kept_struct)),
                     lambda s: s.getField("chunk"))).alias("clean_text"))
            .orderBy("doc_id"))
