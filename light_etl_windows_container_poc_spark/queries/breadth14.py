"""Round-5 breadth, second wave: ranked retrieval (BM25), token-budget
domain mixing, word-entropy scoring, bigram-LM perplexity filtering,
robust (MAD) outlier detection, and zone-map statistics for data
skipping — the retrieval/mixing/quality passes a training-data pipeline
runs after dedup, plus the storage-layout statistics that make 100 TB
scans prunable.

Determinism contracts (all hash-certified):
- transcendental terms (ln/exp) are micro-rounded PER TERM before any
  integer summation — the dsir_weights/quality_logistic_score contract —
  so cross-engine double-sum ordering can never flip a result;
- integer division (``div``/``//``) truncates toward zero in both
  engines; signed averages still go through double division of exact
  integers so no quotient-rounding convention is load-bearing;
- percentiles use the linear-interpolation definition both engines share
  (the agg_median contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_tables
from ..functions.texts import words
from .registry import query

_BM25_TERMS = ("spark", "query", "window")
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TOPK = 20

_MIX_BUDGET_TOKENS = 10_000_000

_PPL_KEEP_MAX_MICRO = 60_000_000  # perplexity <= 60 in micro units

_ZONE_WIDTH = 4096  # l_orderkey rows per zone


# --------------------------------------------------------------------------
# BM25 ranked retrieval over the documents table: the standard inverted-
# index scoring function, evaluated corpus-parallel as two aggregations
# (document frequency, term frequency) + a broadcast of the 3-term query
# statistics. Per-term scores are micro-rounded BEFORE the per-doc sum so
# the ranking integer is engine-exact; ties break on doc_id.
# --------------------------------------------------------------------------
@query("bm25_search", oracle=f"""
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
                    * (tf.tf * ({_BM25_K1} + 1.0))
                    / (tf.tf + {_BM25_K1} * (1.0 - {_BM25_B}
                       + {_BM25_B} * dl.dl / stats.avgdl))) AS BIGINT)
           AS s_micro
  FROM tf
  JOIN df ON tf.tok = df.tok
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats
),
scored AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms,
         CAST(sum(s_micro) AS BIGINT) AS score_micro
  FROM term GROUP BY doc_id
)
SELECT doc_id, n_terms, score_micro,
       CAST(row_number() OVER (ORDER BY score_micro DESC, doc_id)
            AS INT) AS rank
FROM scored
QUALIFY rank <= {_BM25_TOPK}
ORDER BY rank
""")
def bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{k} documents for a fixed 3-term query under BM25
    (k1=1.2, b=0.75, Lucene's +1 idf smoothing).

    Scale shape: the term filter cuts the token explode to query terms
    only BEFORE the (doc, term) aggregation, so shuffle is proportional
    to matching postings, not corpus tokens; corpus stats (N, avgdl) and
    the 3-row df relation ride a broadcast. The final top-k is a single-
    partition window over the already-aggregated per-doc scores — at
    cluster scale that relation is |matching docs|, and the rank filter
    keeps only k rows."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    d = docs.select("doc_id", words(F.col("text")).alias("w"))
    dl = d.select("doc_id", F.size("w").cast("long").alias("dl"))
    stats = dl.agg(F.count(F.lit(1)).cast("long").alias("n"),
                   (F.sum("dl").cast("double")
                    / F.count(F.lit(1))).alias("avgdl"))
    tf = (d.select("doc_id", F.explode("w").alias("tok"))
          .filter(F.col("tok").isin(*_BM25_TERMS))
          .groupBy("doc_id", "tok")
          .agg(F.count(F.lit(1)).cast("long").alias("tf")))
    df_ = tf.groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("df"))
    idf = F.log(1.0 + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    s_micro = F.round(
        1_000_000.0 * idf
        * (F.col("tf") * (_BM25_K1 + 1.0))
        / (F.col("tf") + _BM25_K1 * (1.0 - _BM25_B
           + _BM25_B * F.col("dl") / F.col("avgdl")))).cast("long")
    term = (tf.join(F.broadcast(df_), "tok")
            .join(dl, "doc_id")
            .crossJoin(F.broadcast(stats))
            .select("doc_id", s_micro.alias("s_micro")))
    scored = (term.groupBy("doc_id")
              .agg(F.count(F.lit(1)).cast("long").alias("n_terms"),
                   F.sum("s_micro").cast("long").alias("score_micro")))
    # distributed top-k (TakeOrderedAndProject: per-partition heaps +
    # driver merge), NOT a global row_number window — a rank window with
    # no partition key collapses the whole scored relation onto one
    # partition; ranking the k surviving rows afterwards is free
    top = (scored.orderBy(F.col("score_micro").desc(), F.col("doc_id"))
           .limit(_BM25_TOPK))
    w_rank = Window.orderBy(F.col("score_micro").desc(), F.col("doc_id"))
    return (top.withColumn("rank", F.row_number().over(w_rank).cast("int"))
            .select("doc_id", "n_terms", "score_micro", "rank")
            .orderBy("rank"))


# --------------------------------------------------------------------------
# Token-budget domain mixing: given a global token budget and a uniform
# per-source target, derive each source's sampling fraction / epoch count
# — the allocation step that turns mixing weights into a concrete
# sampling plan. Pure BIGINT arithmetic on exact counts: engine-exact.
# --------------------------------------------------------------------------
@query("token_budget_mix", oracle=f"""
WITH d AS (
  SELECT source,
         CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
                              x -> x <> '')) AS BIGINT) AS n_tok
  FROM documents
),
per AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_tok) AS BIGINT) AS n_tokens
        FROM d GROUP BY source),
g AS (SELECT CAST(count(*) AS BIGINT) AS n_sources FROM per)
SELECT source, n_docs, n_tokens,
       CAST({_MIX_BUDGET_TOKENS} // n_sources AS BIGINT) AS quota_tokens,
       CAST(least(1000000, ({_MIX_BUDGET_TOKENS} // n_sources) * 1000000
                  // greatest(n_tokens, 1)) AS BIGINT) AS fraction_micro,
       CAST(({_MIX_BUDGET_TOKENS} // n_sources) * 1000
            // greatest(n_tokens, 1) AS BIGINT) AS epochs_milli
FROM per CROSS JOIN g
ORDER BY source
""")
def token_budget_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token quota under a uniform mixing target: sources
    smaller than their quota get epochs > 1 (upsampling), larger sources
    get a keep-fraction < 1. One map-side-combined aggregation over the
    corpus plus a broadcast scalar — no per-document state, so the plan
    is identical at 100 TB."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    per = (docs.select("source", F.size(words(F.col("text")))
                       .cast("long").alias("n_tok"))
           .groupBy("source")
           .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                F.sum("n_tok").cast("long").alias("n_tokens")))
    g = per.agg(F.count(F.lit(1)).cast("long").alias("n_sources"))
    quota = F.expr(f"{_MIX_BUDGET_TOKENS} div n_sources")
    return (per.crossJoin(F.broadcast(g))
            .select("source", "n_docs", "n_tokens",
                    quota.cast("long").alias("quota_tokens"),
                    F.least(F.lit(1_000_000).cast("long"),
                            F.expr(f"({_MIX_BUDGET_TOKENS} div n_sources)"
                                   " * 1000000 div greatest(n_tokens, 1)"))
                    .cast("long").alias("fraction_micro"),
                    F.expr(f"({_MIX_BUDGET_TOKENS} div n_sources) * 1000"
                           " div greatest(n_tokens, 1)")
                    .cast("long").alias("epochs_milli"))
            .orderBy("source"))


# --------------------------------------------------------------------------
# Word-distribution entropy per document: H = ln(n) - (Σ c·ln c)/n over
# within-document word frequencies — low-entropy documents are the
# repetitive/templated ones quality filters drop. Each c·ln(c) term is
# micro-rounded before the integer sum (dsir contract), and every
# integer division operand is non-negative.
# --------------------------------------------------------------------------
@query("text_word_entropy", oracle="""
WITH toks AS (
  SELECT doc_id, unnest(list_filter(
           string_split_regex(trim(text), '\\s+'), x -> x <> '')) AS tok
  FROM documents
),
c AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS c
      FROM toks GROUP BY doc_id, tok),
agg AS (
  SELECT doc_id,
         CAST(sum(c) AS BIGINT) AS n_words,
         CAST(count(*) AS BIGINT) AS distinct_words,
         CAST(sum(CAST(round(1000000.0 * c * ln(c)) AS BIGINT))
              AS BIGINT) AS sum_clnc_micro
  FROM c GROUP BY doc_id
)
SELECT doc_id, n_words, distinct_words,
       CAST(CAST(round(1000000.0 * ln(n_words)) AS BIGINT)
            - sum_clnc_micro // n_words AS BIGINT) AS entropy_micro
FROM agg
ORDER BY doc_id
""")
def text_word_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each document's word distribution, exact in
    micro-nats. One explode + two keyed aggregations; the (doc, word)
    shuffle is the same cardinality the tf-idf pass already pays, and
    partial aggregation collapses repeated words map-side."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    c = (docs.select("doc_id", F.explode(words(F.col("text"))).alias("tok"))
         .groupBy("doc_id", "tok")
         .agg(F.count(F.lit(1)).cast("long").alias("c")))
    clnc = F.round(1_000_000.0 * F.col("c") * F.log("c")).cast("long")
    agg = (c.groupBy("doc_id")
           .agg(F.sum("c").cast("long").alias("n_words"),
                F.count(F.lit(1)).cast("long").alias("distinct_words"),
                F.sum(clnc).cast("long").alias("sum_clnc_micro")))
    ent = (F.round(1_000_000.0 * F.log("n_words")).cast("long")
           - F.expr("sum_clnc_micro div n_words"))
    return (agg.select("doc_id", "n_words", "distinct_words",
                       ent.cast("long").alias("entropy_micro"))
            .orderBy("doc_id"))


# --------------------------------------------------------------------------
# Bigram-LM perplexity filter: exp(-mean ln P(w2|w1)) under the corpus
# bigram model (the text_bigram_lm probabilities), the standard KenLM-
# style fluency gate. Per-bigram ln-probabilities are micro-rounded
# integers (summed exactly); the single trailing exp() is evaluated on
# a ratio of exact integers and micro-rounded.
# --------------------------------------------------------------------------
@query("lm_perplexity_filter", oracle=f"""
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
lnp AS (
  SELECT b.doc_id,
         CAST(round(1000000.0 * ln(CAST(bc.c_bi AS DOUBLE) / uc.c_uni))
              AS BIGINT) AS lnp_micro
  FROM bg b JOIN bc ON b.bgr = bc.bgr JOIN uc ON b.w1 = uc.tok
),
agg AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         CAST(sum(lnp_micro) AS BIGINT) AS sum_lnp_micro
  FROM lnp GROUP BY doc_id
)
SELECT doc_id, n_bigrams,
       CAST(round(1000000.0 * exp(-(CAST(sum_lnp_micro AS DOUBLE)
                                    / (1000000.0 * n_bigrams))))
            AS BIGINT) AS ppl_micro,
       CAST(round(1000000.0 * exp(-(CAST(sum_lnp_micro AS DOUBLE)
                                    / (1000000.0 * n_bigrams))))
            <= {_PPL_KEEP_MAX_MICRO} AS INT) AS keep
FROM agg
ORDER BY doc_id
""")
def lm_perplexity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document perplexity under the corpus's own bigram LM, plus the
    keep/drop flag at a fixed ceiling. Same two count-aggregations as
    text_bigram_lm (unigram, bigram) joined back to the bigram stream;
    the per-doc reduction carries two BIGINTs of state. C(w1 w2) ≤ C(w1)
    guarantees ln P ≤ 0; the mean of the (negative) micro-int sum goes
    through exact-integer double division — one double op both engines
    evaluate identically — rather than an integer div, keeping the
    perplexity independent of any quotient-rounding convention."""
    from ..functions.texts import word_ngrams_raw

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    toks = docs.select("doc_id", F.explode(words(F.col("text"))).alias("tok"))
    uc = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c_uni"))
    bg = (docs.select("doc_id",
                      F.explode(word_ngrams_raw(F.col("text"), 2))
                      .alias("bgr"))
          .withColumn("w1", F.split_part(F.col("bgr"), F.lit(" "), F.lit(1))))
    bc = bg.groupBy("bgr").agg(F.count(F.lit(1)).alias("c_bi"))
    lnp_micro = F.round(
        1_000_000.0 * F.log(F.col("c_bi").cast("double")
                            / F.col("c_uni"))).cast("long")
    agg = (bg.join(bc, "bgr").join(uc, bg.w1 == uc.tok)
           .select("doc_id", lnp_micro.alias("lnp_micro"))
           .groupBy("doc_id")
           .agg(F.count(F.lit(1)).cast("long").alias("n_bigrams"),
                F.sum("lnp_micro").cast("long").alias("sum_lnp_micro")))
    ppl = F.round(1_000_000.0 * F.exp(
        -(F.col("sum_lnp_micro").cast("double")
          / (1_000_000.0 * F.col("n_bigrams"))))).cast("long")
    return (agg.select("doc_id", "n_bigrams", ppl.alias("ppl_micro"))
            .withColumn("keep",
                        (F.col("ppl_micro") <= _PPL_KEEP_MAX_MICRO)
                        .cast("int"))
            .orderBy("doc_id"))


# --------------------------------------------------------------------------
# Robust outliers via median/MAD (the z-score family's heavy-tail-safe
# sibling): flag documents whose length deviates > 3 robust-sigma from
# their source's median. Percentiles use the shared linear-interpolation
# definition; the robust z is milli-rounded double arithmetic on exact
# inputs.
# --------------------------------------------------------------------------
@query("mad_outliers", oracle="""
WITH med AS (
  SELECT source,
         percentile_cont(0.5) WITHIN GROUP (ORDER BY n_chars) AS med
  FROM documents GROUP BY source
),
dev AS (
  SELECT d.doc_id, d.source, d.n_chars, abs(d.n_chars - med.med) AS dev
  FROM documents d JOIN med ON d.source = med.source
),
mad AS (
  SELECT source, percentile_cont(0.5) WITHIN GROUP (ORDER BY dev) AS mad
  FROM dev GROUP BY source
)
SELECT dev.doc_id, dev.source, CAST(dev.n_chars AS BIGINT) AS n_chars,
       CAST(CASE WHEN mad.mad > 0
                 THEN round(1000.0 * dev.dev / (1.4826 * mad.mad))
                 ELSE 0 END AS BIGINT) AS robust_z_milli,
       CAST(CASE WHEN mad.mad > 0
                 THEN round(1000.0 * dev.dev / (1.4826 * mad.mad)) > 3000
                 ELSE FALSE END AS INT) AS is_outlier
FROM dev JOIN mad ON dev.source = mad.source
ORDER BY dev.doc_id
""")
def mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median-absolute-deviation outlier flags per source. Two grouped
    percentile aggregations (median, then MAD of deviations) joined back
    broadcast — the per-source relations are |sources| rows, so the doc
    stream is touched twice and shuffled never (broadcast hash joins on
    source). 1.4826 rescales MAD to sigma under normality."""
    docs = (load_tables(spark, sf_dir, ("documents",))["documents"]
            .select("doc_id", "source", "n_chars"))
    med = (docs.groupBy("source")
           .agg(F.percentile("n_chars", F.lit(0.5)).alias("med")))
    dev = (docs.join(F.broadcast(med), "source")
           .select("doc_id", "source", "n_chars",
                   F.abs(F.col("n_chars") - F.col("med")).alias("dev")))
    mad = (dev.groupBy("source")
           .agg(F.percentile("dev", F.lit(0.5)).alias("mad")))
    z = F.when(F.col("mad") > 0,
               F.round(1000.0 * F.col("dev") / (1.4826 * F.col("mad"))))\
         .otherwise(F.lit(0)).cast("long")
    return (dev.join(F.broadcast(mad), "source")
            .select("doc_id", "source",
                    F.col("n_chars").cast("long").alias("n_chars"),
                    z.alias("robust_z_milli"),
                    F.when(F.col("mad") > 0, z > 3000).otherwise(F.lit(False))
                    .cast("int").alias("is_outlier"))
            .orderBy("doc_id"))


# --------------------------------------------------------------------------
# Zone-map statistics: fixed-width key zones with per-zone min/max/count
# — the block-level metadata that lets a 100 TB scan prune zones against
# a predicate (the parquet row-group / ORC stripe index, computed as a
# relation). Min/max/count over BIGINT + timestamp: engine-exact.
# --------------------------------------------------------------------------
@query("zonemap_stats", oracle=f"""
SELECT CAST(l_orderkey // {_ZONE_WIDTH} AS BIGINT) AS zone,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(min(l_orderkey) AS BIGINT) AS min_key,
       CAST(max(l_orderkey) AS BIGINT) AS max_key,
       CAST(min(l_shipdate) AS VARCHAR) AS min_shipdate,
       CAST(max(l_shipdate) AS VARCHAR) AS max_shipdate,
       CAST(round(min(l_extendedprice) * 100) AS BIGINT) AS min_price_cents,
       CAST(round(max(l_extendedprice) * 100) AS BIGINT) AS max_price_cents
FROM lineitem
GROUP BY zone
ORDER BY zone
""")
def zonemap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map (data-skipping) index over lineitem in {width}-key zones:
    per-zone row count and min/max of the sort key, ship date, and
    price. One map-side-combined aggregation whose state is a handful of
    scalars per zone — the output relation is |keyspace|/width rows
    regardless of data volume, which is exactly why zone maps work as a
    pruning index at scale. min/max are taken on raw values; the price
    bounds are converted to cents only for display (round-then-min would
    be a different index)."""
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    return (li.groupBy(F.expr(f"l_orderkey div {_ZONE_WIDTH}")
                       .cast("long").alias("zone"))
            .agg(F.count(F.lit(1)).cast("long").alias("n_rows"),
                 F.min("l_orderkey").cast("long").alias("min_key"),
                 F.max("l_orderkey").cast("long").alias("max_key"),
                 F.date_format(F.min("l_shipdate"), "yyyy-MM-dd HH:mm:ss")
                 .alias("min_shipdate"),
                 F.date_format(F.max("l_shipdate"), "yyyy-MM-dd HH:mm:ss")
                 .alias("max_shipdate"),
                 F.round(F.min("l_extendedprice") * 100).cast("long")
                 .alias("min_price_cents"),
                 F.round(F.max("l_extendedprice") * 100).cast("long")
                 .alias("max_price_cents"))
            .orderBy("zone"))
