"""Training-corpus curation breadth: per-domain cap sampling, C4-style
repeated-block stripping, corpus bigram-LM document scoring, int8
embedding quantization, and the full kNN graph.

These are the remaining first-class ops a 100 TB pretraining pipeline
runs between raw crawl and tokenizer:

- `domain_cap` rebalances a crawl dominated by a few hot domains by
  keeping a deterministic priority sample of at most N docs per source.
- `boilerplate_strip` is bulk exact-substring dedup at block granularity
  (the C4 recipe uses 3-sentence spans; word-soup test docs use 3-word
  blocks): a block repeated ≥ K times corpus-wide is template text and is
  removed from every document, preserving the remaining text order.
- `text_bigram_lm` scores documents by mean corpus bigram conditional
  probability — the KenLM-style fluency filter, in exact integer
  micro-units (ln is not engine-portable; the rational is).
- `embed_quantize` is symmetric per-vector int8 quantization: the 4×
  memory cut that makes a 100 TB ANN index fit, with integer-exact
  outputs (quantized norms and a quantized dot product) in both engines.
- `knn_graph` builds top-k cosine neighbors for EVERY row via the
  block-GEMM candidate path (operators/similarity.knn_graph_topk).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load_tables
from ..functions.texts import word_ngrams_raw, words
from ..functions.vectors import dot, to_double
from .registry import query

_BLOCK = 3       # words per block (C4 uses 3 sentences; soup docs → words)
_HOT_DF = 3      # blocks appearing ≥ this many times corpus-wide are boilerplate
_CAP = 15        # max docs kept per source


# --------------------------------------------------------------------------
# per-domain cap: deterministic priority sample of ≤ N docs per source
# --------------------------------------------------------------------------
@query("domain_cap", oracle=f"""
SELECT source, doc_id, CAST(rk AS INT) AS rk
FROM (SELECT source, doc_id,
             row_number() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR) || 'cap'), doc_id) AS rk
      FROM documents)
WHERE rk <= {_CAP}
ORDER BY source, doc_id
""")
def domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cap documents per source at {_CAP} using an md5 priority order:
    id-stable (a doc keeps/loses its slot independent of scan order or
    cluster size) and uniform within each source.

    Runs the SCALE path (operators/scale.capped_priority_sample): an
    order-consistent md5-prefix threshold discards a hot domain's bulk
    map-side, the exact window sorts only ~cap·safety survivors per
    group, and groups where the pre-filter provably cut too deep fall
    back to the full sort — bit-identical to the plain window (asserted
    in tests/test_scale.py) while never sorting a billion-row domain."""
    from ..operators.scale import capped_priority_sample

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return (capped_priority_sample(docs, "doc_id", "source", cap=_CAP)
            .select("source", "doc_id", F.col("rk").cast("int").alias("rk"))
            .orderBy("source", "doc_id"))


# --------------------------------------------------------------------------
# C4-style repeated-block strip: drop every block occurring ≥ K times
# corpus-wide, reassemble the remaining text in order
# --------------------------------------------------------------------------
@query("boilerplate_strip", oracle=f"""
WITH wrds AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS w
  FROM documents
),
idx AS (SELECT doc_id, w,
               unnest(range(0, CAST(ceil(len(w) / {_BLOCK}.0) AS INT))) AS bi
        FROM wrds),
blk AS (SELECT doc_id, bi,
               array_to_string(w[(bi*{_BLOCK}+1):(bi*{_BLOCK}+{_BLOCK})], ' ') AS btext
        FROM idx),
hot AS (SELECT btext FROM blk GROUP BY btext HAVING count(*) >= {_HOT_DF}),
kept AS (SELECT doc_id, bi, btext FROM blk
         WHERE btext NOT IN (SELECT btext FROM hot)),
agg AS (SELECT doc_id, string_agg(btext, ' ' ORDER BY bi) AS kept_text,
               count(*) AS n_kept
        FROM kept GROUP BY doc_id),
nb AS (SELECT doc_id, CAST(ceil(len(w) / {_BLOCK}.0) AS INT) AS n_blocks
       FROM wrds)
SELECT n.doc_id, coalesce(a.kept_text, '') AS kept_text, n.n_blocks,
       CAST(coalesce(a.n_kept, 0) AS BIGINT) AS n_kept
FROM nb n LEFT JOIN agg a USING (doc_id)
ORDER BY doc_id
""")
def boilerplate_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bulk exact-block dedup (C4 recipe): any {_BLOCK}-word block seen
    ≥ {_HOT_DF} times across the corpus is removed from every document.

    One explode + one block-key aggregation + one anti-join — shuffle ∝
    corpus blocks, never doc-pairs. The hot-block relation is the df-skew
    complement of `boilerplate_shingles` (per-source detect); this op
    actually REWRITES the text."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    # materialize the word split ONCE: with `w` inlined, CollapseProject
    # rewrites every slice() in the block lambda to re-split the text —
    # O(tokens × blocks) per doc instead of O(tokens) (measured 4×)
    wtab = docs.select("doc_id", words(F.col("text")).alias("w")).persist()
    nb = F.ceil(F.size("w") / F.lit(_BLOCK)).cast("int")
    blocks = F.when(nb > 0, F.transform(
        F.sequence(F.lit(0), nb - 1),
        lambda i: F.array_join(F.slice(F.col("w"), i * _BLOCK + 1, _BLOCK),
                               " "))) \
        .otherwise(F.array().cast("array<string>"))
    base = wtab.select("doc_id", nb.alias("n_blocks"), blocks.alias("blocks"))
    blk = base.select("doc_id", F.posexplode("blocks").alias("bi", "btext"))
    hot = (blk.groupBy("btext").agg(F.count(F.lit(1)).alias("df_"))
           .filter(F.col("df_") >= _HOT_DF).select("btext"))
    # hot blocks are the df-distribution tail — tiny relative to the block
    # stream; broadcasting the anti-join filters map-side instead of
    # shuffling every block a second time
    kept = blk.join(F.broadcast(hot), "btext", "left_anti")
    agg = (kept.groupBy("doc_id")
           .agg(F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("bi", "btext"))),
                        lambda s: s.getField("btext")), " ").alias("kept_text"),
                F.count(F.lit(1)).alias("n_kept")))
    return (base.select("doc_id", "n_blocks")
            .join(agg, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("kept_text", F.lit("")).alias("kept_text"),
                    "n_blocks",
                    F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"))
            .orderBy("doc_id"))


# --------------------------------------------------------------------------
# corpus bigram-LM document scoring (KenLM-style fluency filter) in exact
# integer micro-units: P(w2|w1) ≈ C(w1 w2) / C(w1), floored to micro
# --------------------------------------------------------------------------
@query("text_bigram_lm", oracle="""
WITH wrds AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS w
  FROM documents
),
toks AS (SELECT doc_id, unnest(w) AS tok FROM wrds),
uc AS (SELECT tok, count(*) AS c_uni FROM toks GROUP BY tok),
idx AS (SELECT doc_id, w, unnest(range(1, len(w))) AS i FROM wrds),
bg AS (SELECT doc_id, w[i] AS w1, w[i] || ' ' || w[i+1] AS bgr FROM idx),
bc AS (SELECT bgr, count(*) AS c_bi FROM bg GROUP BY bgr),
scored AS (
  SELECT b.doc_id, (1000000 * bc.c_bi) // uc.c_uni AS prob_micro
  FROM bg b JOIN bc ON b.bgr = bc.bgr JOIN uc ON b.w1 = uc.tok
)
SELECT doc_id, count(*) AS n_bigrams,
       CAST(sum(prob_micro) AS BIGINT) AS sum_prob_micro,
       CAST(sum(prob_micro) // count(*) AS BIGINT) AS avg_prob_micro
FROM scored GROUP BY doc_id
ORDER BY doc_id
""")
def text_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean corpus bigram conditional probability per document — documents
    whose word transitions are common corpus-wide score high (fluent/
    templated), rare-transition documents score low (noise). The standard
    LM quality filter with the LM replaced by the corpus itself.

    prob_micro = (1e6 · C(w1 w2)) div C(w1) is integer division on BIGINT
    counts: bit-exact in any engine (a float ln/log here is not). Two
    aggregations (unigram, bigram counts) + one doc-keyed aggregation;
    the count relations join back on the bigram/token keys."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    toks = docs.select("doc_id", F.explode(words(F.col("text"))).alias("tok"))
    uc = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c_uni"))
    bg = (docs.select("doc_id",
                      F.explode(word_ngrams_raw(F.col("text"), 2)).alias("bgr"))
          .withColumn("w1", F.split_part(F.col("bgr"), F.lit(" "), F.lit(1))))
    bc = bg.groupBy("bgr").agg(F.count(F.lit(1)).alias("c_bi"))
    scored = (bg.join(bc, "bgr").join(uc, bg.w1 == uc.tok)
              .select("doc_id",
                      F.expr("(1000000 * c_bi) div c_uni").alias("prob_micro")))
    return (scored.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_bigrams"),
                 F.sum("prob_micro").cast("long").alias("sum_prob_micro"))
            .withColumn("avg_prob_micro",
                        F.expr("sum_prob_micro div n_bigrams").cast("long"))
            .orderBy("doc_id"))


# --------------------------------------------------------------------------
# symmetric int8 embedding quantization — integer-exact in both engines
# --------------------------------------------------------------------------
@query("embed_quantize", oracle="""
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
m AS (SELECT vec_id, v,
             list_max(list_transform(v, x -> abs(x))) AS maxabs FROM v),
q AS (SELECT vec_id, maxabs,
             list_transform(v, x -> CAST(floor(x / (maxabs / 127.0) + 0.5)
                                         AS BIGINT)) AS qv
      FROM m),
q0 AS (SELECT qv AS q0 FROM q WHERE vec_id = 0)
SELECT vec_id,
       CAST(floor(maxabs * 1000000 / 127.0 + 0.5) AS BIGINT) AS scale_micro,
       CAST(list_sum(list_transform(qv, x -> x * x)) AS BIGINT) AS q_l2sq,
       CAST(len(list_filter(qv, x -> x <> 0)) AS INT) AS nnz,
       CAST(list_sum(list_transform(range(1, len(qv) + 1),
                                    i -> qv[i] * q0[i])) AS BIGINT) AS qdot0
FROM q, q0
ORDER BY vec_id
""")
def embed_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-vector int8 quantization: scale = max|x|/127,
    q_i = round-half-up(x_i/scale) ∈ [-127, 127]. 4× smaller vectors make
    the difference between an ANN index that fits executor memory at
    100 TB and one that doesn't; int dot products then rank candidates
    before a float re-score of the survivors.

    floor(x/scale + 0.5) is the portable rounding form (both engines'
    round() differ in half-value tie handling across types); every output
    is integer-derived, so parity is exact. The quantized dot against
    vector 0 is computed via a broadcast single-row cross join — map-only
    over the corpus."""
    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    v = to_double(F.col("embedding"))
    base = emb.select(
        "vec_id", v.alias("v"),
        F.array_max(F.transform(v, F.abs)).alias("maxabs"))
    qv = F.transform(
        F.col("v"),
        lambda x: F.floor(x / (F.col("maxabs") / F.lit(127.0)) + F.lit(0.5))
        .cast("long"))
    q = base.select("vec_id", "maxabs", qv.alias("qv"))
    q0 = q.filter(F.col("vec_id") == 0).select(F.col("qv").alias("q0"))
    return (q.crossJoin(F.broadcast(q0))
            .select("vec_id",
                    F.floor(F.col("maxabs") * 1_000_000 / F.lit(127.0)
                            + F.lit(0.5)).cast("long").alias("scale_micro"),
                    F.aggregate(F.col("qv"), F.lit(0).cast("long"),
                                lambda a, x: a + x * x).alias("q_l2sq"),
                    F.size(F.filter(F.col("qv"),
                                    lambda x: x != 0)).alias("nnz"),
                    F.aggregate(F.zip_with(F.col("qv"), F.col("q0"),
                                           lambda x, y: x * y),
                                F.lit(0).cast("long"),
                                lambda a, x: a + x).alias("qdot0"))
            .orderBy("vec_id"))


# --------------------------------------------------------------------------
# full kNN graph: top-k cosine neighbors for every corpus row
# --------------------------------------------------------------------------
@query("knn_graph", oracle="""
WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
s AS (SELECT a.vec_id AS q_id, b.vec_id AS n_id,
             list_cosine_similarity(a.v, b.v) AS sim
      FROM c a JOIN c b ON a.vec_id <> b.vec_id),
r AS (SELECT q_id, n_id, CAST(round(sim * 1000000) AS BIGINT) AS sim_micro,
             row_number() OVER (PARTITION BY q_id
                                ORDER BY sim DESC, n_id) AS rn
      FROM s)
SELECT q_id, n_id, sim_micro, CAST(rn AS INT) AS rank
FROM r WHERE rn <= 3
ORDER BY q_id, rank
""")
def knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 neighbors for EVERY embedding row via the block-GEMM
    candidate path + exact fold re-score (same rows as the naive n² rank;
    see operators/similarity.knn_graph_topk for the scale argument)."""
    from ..operators.similarity import knn_graph_topk

    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    topk = knn_graph_topk(emb, "vec_id", "embedding", k=3)
    return (topk.select("q_id", "n_id",
                        F.round(F.col("sim") * 1_000_000).cast("long")
                        .alias("sim_micro"), "rank")
            .orderBy("q_id", "rank"))


# --------------------------------------------------------------------------
# per-dimension embedding standardization (the PCA/whitening front step):
# corpus mean/variance per dimension, then z-scored vectors for a probe
# set — exact integer micro/milli units end to end
# --------------------------------------------------------------------------
@query("embed_standardize", oracle="""
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
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
         FROM xi JOIN st ON xi.pos = st.pos GROUP BY xi.pos),
stats AS (SELECT st.pos, st.n, CAST(st.mean_micro AS BIGINT) AS mean_micro,
                 var_.var_micro2,
                 CAST(floor(sqrt(CAST(var_.var_micro2 AS DOUBLE))) AS BIGINT)
                   AS std_micro
          FROM st JOIN var_ ON st.pos = var_.pos)
SELECT xi.vec_id, xi.pos AS pos,
       CAST((xi.xi - stats.mean_micro) * 1000 // stats.std_micro AS BIGINT)
         AS z_milli,
       stats.mean_micro, stats.var_micro2
FROM xi JOIN stats ON xi.pos = stats.pos
WHERE xi.vec_id % 50 = 0
ORDER BY vec_id, pos
""")
def embed_standardize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-wise standardization over an embedding corpus: per-dimension
    mean and variance in exact integer units (values quantized to micro
    once per row; every aggregate and the z-score itself is then integer
    arithmetic — floor(sqrt) of an exact integer is the one IEEE op used,
    and sqrt is correctly rounded in every engine).

    Scale shape: posexplode → groupBy(pos) hits exactly `dim` groups with
    map-side partial aggregation (shuffle carries dim × partitions rows);
    z-scoring joins the broadcast 64-row stats relation — map-only over
    the corpus. Truncating `div` matches both engines' toward-zero
    semantics on negative deviations."""
    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    xi = (emb.select("vec_id",
                     F.posexplode(to_double(F.col("embedding")))
                     .alias("pos0", "x"))
          .select("vec_id", (F.col("pos0") + 1).cast("int").alias("pos"),
                  F.round(F.col("x") * 1_000_000).cast("long").alias("xi")))
    m = xi.groupBy("pos").agg(F.count(F.lit(1)).alias("n"),
                              F.sum("xi").alias("s"))
    st = m.select("pos", "n", F.expr("s div n").alias("mean_micro"))
    var_ = (xi.join(F.broadcast(st), "pos")
            .groupBy("pos")
            .agg(F.expr("sum((xi - mean_micro) * (xi - mean_micro))"
                        " div max(n)").alias("var_micro2")))
    stats = (st.join(var_, "pos")
             .select("pos", "n", F.col("mean_micro").cast("long").alias("mean_micro"),
                     F.col("var_micro2").cast("long").alias("var_micro2"),
                     F.floor(F.sqrt(F.col("var_micro2").cast("double")))
                     .cast("long").alias("std_micro")))
    return (xi.filter(F.col("vec_id") % 50 == 0)
            .join(F.broadcast(stats), "pos")
            .select("vec_id", "pos",
                    F.expr("(xi - mean_micro) * 1000 div std_micro")
                    .cast("long").alias("z_milli"),
                    "mean_micro", "var_micro2")
            .orderBy("vec_id", "pos"))


# --------------------------------------------------------------------------
# END-TO-END corpus curation: the composed pipeline a pretraining corpus
# actually runs — Gopher quality gate → exact dedup → near-dup keep-one →
# deterministic split → per-(split, lang) report. Every stage is one of
# this repo's operators; the oracle chains the same stages in SQL.
# --------------------------------------------------------------------------
@query("curate_corpus", oracle="""
WITH RECURSIVE toks AS (
  SELECT doc_id, text, lang,
         list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS t
  FROM documents
),
q AS (
  SELECT doc_id, text, lang, t FROM toks
  WHERE len(t) BETWEEN 20 AND 100000
    AND floor(coalesce(list_sum(list_transform(t, x -> len(x))), 0) * 100.0
              / greatest(len(t), 1)) BETWEEN 300 AND 1000
    AND floor(len(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 1000.0
              / greatest(len(text), 1)) >= 600
    AND len(list_filter(t, x -> list_contains(
          ['the','a','and','of','to','in','is','it','that','for'],
          lower(x)))) >= 2
),
ex AS (SELECT * FROM q
       WHERE doc_id IN (SELECT min(doc_id) FROM q GROUP BY md5(text))),
idx AS (SELECT doc_id, t, unnest(range(1, greatest(len(t) - 1, 1))) AS i
        FROM ex),
sh AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
       FROM idx),
sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
pairs AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS inter
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY a_id, b_id
),
good AS (
  SELECT a_id, b_id FROM pairs
  JOIN sz sa ON sa.doc_id = a_id JOIN sz sb ON sb.doc_id = b_id
  WHERE inter * 1.0 / (sa.n + sb.n - inter) >= 0.8
),
edges AS (SELECT a_id AS src, b_id AS dst FROM good
          UNION ALL SELECT b_id, a_id FROM good),
cc(node, label) AS (
  SELECT DISTINCT src, src FROM edges
  UNION
  SELECT e.dst, cc.label FROM cc JOIN edges e ON cc.node = e.src
),
comp AS (SELECT node, min(label) AS component FROM cc GROUP BY node),
kept AS (SELECT * FROM ex
         WHERE doc_id NOT IN (SELECT node FROM comp
                              WHERE node <> component)),
sp AS (
  SELECT lang, len(t) AS nw,
         CASE WHEN CAST(('0x' || substring(
                    md5(CAST(doc_id AS VARCHAR) || 'split'), 1, 6)) AS BIGINT)
                   % 1000 < 200
              THEN 'test' ELSE 'train' END AS split
  FROM kept
)
SELECT split, lang, count(*) AS n_docs, CAST(sum(nw) AS BIGINT) AS total_tokens
FROM sp GROUP BY split, lang
ORDER BY split, lang
""")
def curate_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed curation pass over `documents`:

    1. Gopher quality rules (operators/text.gopher_quality_rules) —
       one codegen'd scan, each rule attributable.
    2. Exact dedup — md5 content-hash groupBy, keep the min-id copy.
    3. Near-dup keep-one — shingle-Jaccard pairs (equi-join on shingles)
       → connected components → min-id representative per cluster.
    4. Deterministic md5-bucket train/test split (id-stable).
    5. Per-(split, lang) doc/token report.

    Each stage's scale shape is argued at its own operator; composition
    adds no new shuffle beyond the stages themselves."""
    from ..operators.dedup import (dedup_keep_representatives,
                                   ngram_jaccard_pairs)
    from ..operators.text import gopher_quality_rules, train_test_split

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    keep_ids = (gopher_quality_rules(docs, "text", "doc_id")
                .filter(F.col("keep")).select("doc_id"))
    quality = docs.join(keep_ids, "doc_id")
    exact_keep = (quality.groupBy(F.md5("text").alias("h"))
                  .agg(F.min("doc_id").alias("doc_id")).select("doc_id"))
    exact = quality.join(exact_keep, "doc_id")
    pairs = ngram_jaccard_pairs(exact, "doc_id", "text", n=3, threshold=0.8)
    deduped = dedup_keep_representatives(exact, pairs, "doc_id")
    sp = train_test_split(deduped, "doc_id", test_permille=200)
    return (sp.groupBy("split", "lang")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum(F.size(words(F.col("text")))).cast("long")
                 .alias("total_tokens"))
            .orderBy("split", "lang"))


# --------------------------------------------------------------------------
# linear-interpolation imputation: nulls take the time-weighted blend of
# the nearest non-null neighbors per key (the time-series repair that
# forward-fill can't do) — exact integer cents/micros end to end
# --------------------------------------------------------------------------
@query("impute_linear_interp", oracle="""
WITH holey AS (
  SELECT event_id, user_id, ts, epoch_us(ts) AS us,
         CASE WHEN event_id % 5 = 0 THEN NULL
              ELSE CAST(round(value * 100) AS BIGINT) END AS cents
  FROM events
),
marked AS (
  SELECT event_id, user_id, cents, us,
         last_value(CASE WHEN cents IS NOT NULL THEN cents END IGNORE NULLS)
           OVER wp AS pv,
         last_value(CASE WHEN cents IS NOT NULL THEN us END IGNORE NULLS)
           OVER wp AS pu,
         first_value(CASE WHEN cents IS NOT NULL THEN cents END IGNORE NULLS)
           OVER wn AS nv,
         first_value(CASE WHEN cents IS NOT NULL THEN us END IGNORE NULLS)
           OVER wn AS nu
  FROM holey
  WINDOW wp AS (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wn AS (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT event_id, user_id, cents,
       CASE WHEN cents IS NOT NULL THEN cents
            WHEN pv IS NULL THEN nv
            WHEN nv IS NULL THEN pv
            WHEN nu = pu THEN pv
            ELSE pv + (nv - pv) * (us - pu) // (nu - pu) END AS cents_interp
FROM marked
ORDER BY event_id
""")
def impute_linear_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key linear interpolation at null positions: the last and next
    non-null (value, timestamp) pairs come from two ignore-nulls windows
    (the value and its timestamp provably come from the same row — the
    guard nulls both together), endpoints fall back to nearest-known.
    One shuffle on the key; the blend is integer cents·micros arithmetic
    with toward-zero div, bit-equal in both engines (product envelope
    ≤ 2e4 cents × 2.6e12 µs ≈ 5e16 < int64)."""
    from .tpch import _units

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    holey = ev.select(
        "event_id", "user_id", "ts", F.unix_micros("ts").alias("us"),
        F.when(F.col("event_id") % 5 == 0, F.lit(None).cast("long"))
        .otherwise(_units(F.col("value"), 100)).alias("cents"))
    wp = (W.partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(W.unboundedPreceding, W.currentRow))
    wn = (W.partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(W.currentRow, W.unboundedFollowing))
    known_c = F.when(F.col("cents").isNotNull(), F.col("cents"))
    known_u = F.when(F.col("cents").isNotNull(), F.col("us"))
    marked = holey.select(
        "event_id", "user_id", "cents", "us",
        F.last(known_c, ignorenulls=True).over(wp).alias("pv"),
        F.last(known_u, ignorenulls=True).over(wp).alias("pu"),
        F.first(known_c, ignorenulls=True).over(wn).alias("nv"),
        F.first(known_u, ignorenulls=True).over(wn).alias("nu"))
    interp = (F.when(F.col("cents").isNotNull(), F.col("cents"))
              .when(F.col("pv").isNull(), F.col("nv"))
              .when(F.col("nv").isNull(), F.col("pv"))
              .when(F.col("nu") == F.col("pu"), F.col("pv"))
              .otherwise(F.col("pv") + F.expr(
                  "(nv - pv) * (us - pu) div (nu - pu)")))
    return (marked.select("event_id", "user_id", "cents",
                          interp.cast("long").alias("cents_interp"))
            .orderBy("event_id"))


# --------------------------------------------------------------------------
# gaps-and-islands: per-user runs of consecutive same-type events (the
# row_number-difference trick), longest streak + streak count per type
# --------------------------------------------------------------------------
@query("event_streaks", oracle="""
WITH seq AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
         - row_number() OVER (PARTITION BY user_id, event_type
                              ORDER BY ts, event_id) AS grp
  FROM events
),
runs AS (
  SELECT user_id, event_type, grp, count(*) AS streak
  FROM seq GROUP BY user_id, event_type, grp
)
SELECT user_id, event_type,
       CAST(max(streak) AS BIGINT) AS longest_streak,
       count(*) AS n_streaks
FROM runs GROUP BY user_id, event_type
ORDER BY user_id, event_type
""")
def event_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands via the row_number-difference trick: within a
    user's timeline, a run of consecutive same-type events shares
    (global_rn - per-type_rn). Two windows over one user-keyed shuffle
    (same partitioning — a single Exchange feeds both sorts), then two
    small aggregations; nothing scales beyond the per-user timeline."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    w_all = W.partitionBy("user_id").orderBy("ts", "event_id")
    w_typ = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id", "event_type",
        (F.row_number().over(w_all) - F.row_number().over(w_typ))
        .alias("grp"))
    runs = (seq.groupBy("user_id", "event_type", "grp")
            .agg(F.count(F.lit(1)).alias("streak")))
    return (runs.groupBy("user_id", "event_type")
            .agg(F.max("streak").cast("long").alias("longest_streak"),
                 F.count(F.lit(1)).alias("n_streaks"))
            .orderBy("user_id", "event_type"))


# --------------------------------------------------------------------------
# time-hierarchy rollup: week → day → hour subtotals in ONE aggregation
# pass (ROLLUP over derived calendar keys), grouping() disambiguates the
# subtotal levels — the hypertable-style multi-granularity rollup
# --------------------------------------------------------------------------
@query("time_rollup", oracle="""
SELECT strftime(date_trunc('week', ts), '%Y-%m-%d') AS wk,
       CASE WHEN GROUPING(date_trunc('day', ts)) = 0
            THEN strftime(date_trunc('day', ts), '%Y-%m-%d') END AS day,
       CASE WHEN GROUPING(date_trunc('hour', ts)) = 0
            THEN strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') END
         AS hr,
       CAST(GROUPING(date_trunc('day', ts)) * 2
            + GROUPING(date_trunc('hour', ts)) AS INT) AS lvl,
       count(*) AS n,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
FROM events
GROUP BY ROLLUP (date_trunc('week', ts), date_trunc('day', ts),
                 date_trunc('hour', ts))
HAVING GROUPING(date_trunc('week', ts)) = 0
ORDER BY wk, lvl, day NULLS FIRST, hr NULLS FIRST
""")
def time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-hierarchy subtotals (week/day/hour) from one ROLLUP scan:
    Spark expands each input row once per grouping level and partial-
    aggregates map-side, so the shuffle carries only group cardinality ×
    levels — the same single-pass shape TimescaleDB's hierarchical
    continuous aggregates serve. `lvl` encodes the subtotal depth
    (0=hour, 1=day, 3=week); the grand total is excluded so every row
    anchors to a week."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    wk = F.date_trunc("week", F.col("ts"))
    day = F.date_trunc("day", F.col("ts"))
    hr = F.date_trunc("hour", F.col("ts"))
    cents = F.round(F.col("value") * 100).cast("long")
    rolled = (ev.select(wk.alias("wk0"), day.alias("day0"), hr.alias("hr0"),
                        cents.alias("c"))
              .rollup("wk0", "day0", "hr0")
              .agg(F.count(F.lit(1)).alias("n"),
                   F.sum("c").cast("long").alias("cents"),
                   F.grouping("wk0").alias("g_wk"),
                   (F.grouping("day0") * 2
                    + F.grouping("hr0")).cast("int").alias("lvl"))
              .filter(F.col("g_wk") == 0))
    return (rolled.select(
        F.date_format("wk0", "yyyy-MM-dd").alias("wk"),
        F.when(F.col("lvl").isin(0, 1), F.date_format("day0", "yyyy-MM-dd"))
        .alias("day"),
        F.when(F.col("lvl") == 0,
               F.date_format("hr0", "yyyy-MM-dd HH:mm:ss")).alias("hr"),
        "lvl", "n", "cents")
        .orderBy("wk", "lvl", F.col("day").asc_nulls_first(),
                 F.col("hr").asc_nulls_first()))
