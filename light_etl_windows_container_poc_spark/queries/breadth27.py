"""Round-6 breadth, third wave: tokenizer-aware and smoothed-LM text
ops — a deterministic BPE-style subword tokenizer (fixed merge table,
pure regex chain, JVM-side in Spark and replayed verbatim in the
oracle) and Kneser-Ney smoothed bigram probabilities in exact integer
micro-units (the KenLM-grade upgrade of text_bigram_lm's add-nothing
conditional).

Determinism contracts: the BPE chain is the SAME left-to-right
non-overlapping global regex replace in both engines (boundary-padded
literal patterns — no lookahead, which RE2 lacks); KN stays entirely in
BIGINT (discount 0.75 → integer 750000-micro arithmetic, truncating
div on non-negative counts) — no transcendental anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_tables
from ..functions.texts import word_ngrams_raw, words
from .registry import query

# Fixed BPE merge table (applied in order — the artifact a trained
# tokenizer ships; these are high-frequency English pairs). Alpha-only
# symbols keep every pattern regex-literal.
BPE_MERGES = [
    ("t", "h"), ("th", "e"), ("a", "n"), ("an", "d"), ("i", "n"),
    ("in", "g"), ("e", "r"), ("o", "n"), ("r", "e"), ("o", "r"),
    ("e", "n"), ("a", "t"), ("e", "s"), ("o", "u"), ("i", "t"),
    ("i", "s"), ("o", "f"), ("t", "o"), ("e", "d"), ("a", "s"),
    ("h", "e"), ("s", "t"), ("a", "r"), ("l", "e"),
]


def _bpe_oracle() -> str:
    # the symbol string starts as ' c1 c2 ... cn ' (boundary-padded);
    # each merge is one global replace of ' a b ' with ' ab '
    expr = "' ' || regexp_replace(word, '(.)', '\\1 ', 'g')"
    for a, b in BPE_MERGES:
        expr = f"regexp_replace({expr}, ' {a} {b} ', ' {a}{b} ', 'g')"
    return f"""
WITH w AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                            x -> x <> '')) AS word
  FROM documents
),
toks AS (
  SELECT doc_id, len(string_split_regex(trim({expr}), ' +')) AS n_sym
  FROM w
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(n_sym) AS BIGINT) AS n_tokens,
       CAST(1000 * sum(n_sym) // count(*) AS BIGINT)
         AS tokens_per_word_milli
FROM toks GROUP BY doc_id ORDER BY doc_id
"""


@query("text_bpe_tokenize", oracle=_bpe_oracle())
def text_bpe_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subword token counts under a fixed BPE merge table: words explode
    once, the merge chain is 24 chained regexp_replace calls — a single
    codegen'd projection, no Python — and the per-doc reduction keys on
    doc_id. Boundary-padded literal patterns make a merge match only
    whole symbols; one pass per merge is deterministic and IDENTICAL in
    both engines (leftmost, non-overlapping, continue-after-match), so
    adjacent repeated pairs resolve the same way everywhere. Token
    inflation (tokens_per_word) is the quality/cost signal tokenizer-
    aware curation thresholds on."""
    from ..catalog import spread_scan

    # the 24-merge regexp chain below is heavy per-row compute: spread a
    # sub-cores-files scan so it does not run inside one decode task
    # (no-op at warehouse scale); sf0.1 warm: 6.1s -> 1.9s
    docs = spread_scan(
        load_tables(spark, sf_dir, ("documents",))["documents"], "doc_id")
    w = docs.select("doc_id",
                    F.explode(words(F.lower(F.col("text")))).alias("word"))
    cur = F.concat(F.lit(" "),
                   F.regexp_replace(F.col("word"), "(.)", "$1 "))
    for a, b in BPE_MERGES:
        cur = F.regexp_replace(cur, f" {a} {b} ", f" {a}{b} ")
    n_sym = F.size(F.split(F.trim(cur), " +"))
    return (w.select("doc_id", n_sym.alias("n_sym"))
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).cast("long").alias("n_words"),
                 F.sum("n_sym").cast("long").alias("n_tokens"))
            .withColumn("tokens_per_word_milli",
                        F.expr("1000 * n_tokens div n_words").cast("long"))
            .orderBy("doc_id"))


# --------------------------------------------------------------------------
# Kneser-Ney smoothed bigram probabilities (D = 0.75), exact integer
# micro-units end to end:
#   P(w2|w1) = (C(w1w2) - D)/ctx(w1) + D·N1+(w1,·)/ctx(w1) · Pcont(w2)
#   Pcont(w2) = N1+(·,w2) / |distinct bigrams|
# The continuation probability is WHY KN beats raw conditionals as a
# fluency filter: frequent-but-unversatile words ("Francisco") stop
# inflating scores.
# --------------------------------------------------------------------------
@query("text_bigram_kn", oracle="""
WITH wrds AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '')
           AS w
  FROM documents
),
idx AS (SELECT doc_id, w, unnest(range(1, len(w))) AS i FROM wrds),
bg AS (SELECT doc_id, w[i] AS w1, w[i+1] AS w2,
              w[i] || ' ' || w[i+1] AS bgr
       FROM idx),
bc AS (SELECT bgr, CAST(count(*) AS BIGINT) AS c_bi FROM bg GROUP BY bgr),
ctx AS (SELECT w1, CAST(count(*) AS BIGINT) AS c_ctx FROM bg GROUP BY w1),
fan AS (SELECT w1, CAST(count(DISTINCT w2) AS BIGINT) AS n1p_fwd
        FROM bg GROUP BY w1),
prec AS (SELECT w2, CAST(count(DISTINCT w1) AS BIGINT) AS n1p_bwd
         FROM bg GROUP BY w2),
t AS (SELECT CAST(count(DISTINCT bgr) AS BIGINT) AS n_types FROM bg),
scored AS (
  SELECT b.doc_id,
         (1000000 * bc.c_bi - 750000) // ctx.c_ctx
           + ((750000 * fan.n1p_fwd) // ctx.c_ctx)
             * ((1000000 * prec.n1p_bwd) // t.n_types) // 1000000
           AS kn_micro
  FROM bg b
  JOIN bc ON b.bgr = bc.bgr
  JOIN ctx ON b.w1 = ctx.w1
  JOIN fan ON b.w1 = fan.w1
  JOIN prec ON b.w2 = prec.w2
  CROSS JOIN t
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       CAST(sum(kn_micro) AS BIGINT) AS sum_kn_micro,
       CAST(sum(kn_micro) // count(*) AS BIGINT) AS avg_kn_micro
FROM scored GROUP BY doc_id ORDER BY doc_id
""")
def text_bigram_kn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Postings-style shapes only: bigram/context/fan-out/continuation
    count relations key on the gram or word, join back on those keys
    (vocabulary-sized — equi-joins, never broadcast-forced), the type
    count is a broadcast scalar, and the per-doc reduction keys on
    doc_id. Every quantity is a BIGINT count; discount arithmetic stays
    exact: C(w1w2) ≥ 1 keeps the discounted term non-negative, so
    truncating div == floor everywhere. Overflow envelope: 1e6·count and
    lambda·pcont ≤ 1e12 — comfortable at any corpus size whose single
    bigram count stays under ~9e12 (shard the count columns to
    DECIMAL(38) past that, expression tree unchanged)."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    bg = (docs.select("doc_id",
                      F.explode(word_ngrams_raw(F.col("text"), 2))
                      .alias("bgr"))
          .withColumn("w1", F.split_part(F.col("bgr"), F.lit(" "),
                                         F.lit(1)))
          .withColumn("w2", F.split_part(F.col("bgr"), F.lit(" "),
                                         F.lit(2))))
    bc = bg.groupBy("bgr").agg(F.count(F.lit(1)).cast("long")
                               .alias("c_bi"))
    ctx = bg.groupBy("w1").agg(F.count(F.lit(1)).cast("long")
                               .alias("c_ctx"))
    fan = bg.groupBy("w1").agg(F.countDistinct("w2").cast("long")
                               .alias("n1p_fwd"))
    prec = bg.groupBy("w2").agg(F.countDistinct("w1").cast("long")
                                .alias("n1p_bwd"))
    t = bg.agg(F.countDistinct("bgr").cast("long").alias("n_types"))
    kn = F.expr("(1000000 * c_bi - 750000) div c_ctx"
                " + ((750000 * n1p_fwd) div c_ctx)"
                " * ((1000000 * n1p_bwd) div n_types) div 1000000")
    scored = (bg.join(bc, "bgr").join(ctx, "w1").join(fan, "w1")
              .join(prec, "w2").crossJoin(F.broadcast(t))
              .select("doc_id", kn.alias("kn_micro")))
    return (scored.groupBy("doc_id")
            .agg(F.count(F.lit(1)).cast("long").alias("n_bigrams"),
                 F.sum("kn_micro").cast("long").alias("sum_kn_micro"))
            .withColumn("avg_kn_micro",
                        F.expr("sum_kn_micro div n_bigrams").cast("long"))
            .orderBy("doc_id"))


# --------------------------------------------------------------------------
# PQ-ADC approximate nearest neighbors (rows-only: codebooks are
# sample/Lloyd-defined) + its hash-certified recall-floor twin — the
# ann_lsh / ann_lsh_recall_floor pattern for the memory tier of the ANN
# stack (8-byte codes, lookup-table scans, exact re-rank).
# --------------------------------------------------------------------------
@query("ann_pq")
def ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import ann_pq_topk

    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    qs = emb.filter(F.col("vec_id") % 100 == 0)
    topk = ann_pq_topk(emb, qs, "vec_id", "embedding", k=5,
                       m=8, ksub=16, rerank=128)
    return (topk.select("q_id", "n_id",
                        F.round(F.col("sim") * 1_000_000).cast("long")
                        .alias("sim_micro"), "rank")
            .orderBy("q_id", "rank"))


@query("ann_pq_recall_floor", oracle="""
SELECT CAST(count(*) AS BIGINT) AS n_queries,
       CAST(1 AS INT) AS recall_ge_60pct
FROM embeddings WHERE vec_id % 100 = 0
""")
def ann_pq_recall_floor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@5 of the PQ-ADC path vs brute-force truth is
    deterministic at fixed sample/codebooks. The synthetic embeddings
    are near-uniform random — the hostile case for PQ (codebooks can
    capture little structure; real clustered embeddings quantize far
    better) — so the measured recall with rerank=128 is 0.92/0.84/0.81
    at sf0.001/0.01/0.1 and the 60% floor certifies the encode →
    LUT-scan → re-rank chain end to end with real margin."""
    from ..operators.similarity import ann_bruteforce_topk, ann_pq_topk

    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    qs = emb.filter(F.col("vec_id") % 100 == 0)
    truth = (ann_bruteforce_topk(emb, qs, "vec_id", "embedding", k=5)
             .select("q_id", "n_id"))
    approx = (ann_pq_topk(emb, qs, "vec_id", "embedding", k=5,
                          m=8, ksub=16, rerank=128)
              .select("q_id", "n_id"))
    hits = approx.join(truth, ["q_id", "n_id"]).agg(
        F.count(F.lit(1)).alias("hits"))
    total = truth.agg(F.count(F.lit(1)).alias("total"))
    n_q = qs.agg(F.count(F.lit(1)).alias("n_queries"))
    return n_q.crossJoin(hits).crossJoin(total).select(
        "n_queries",
        (F.col("hits") * 100 >= F.col("total") * 60).cast("int")
        .alias("recall_ge_60pct"))
