"""Corpus-hygiene breadth: per-source boilerplate shingle detection,
token-rarity document scoring, and sliding-frame moving averages.

- `boilerplate_shingles` is the web-pipeline boilerplate detector at
  shingle granularity: a shingle present in most of a source's documents
  is template text, not content. Flagging feeds shingle `max_df` pruning
  in the dedup path (operators/dedup.ngram_jaccard_pairs).
- `text_rarity` ranks documents by mean global token frequency — the
  integer-exact stand-in for unigram-LM scoring (ln is not
  engine-portable; the rational mean is bit-exact).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load_tables
from ..functions.texts import word_shingles, words
from .registry import query
from .tpch import _units


# --------------------------------------------------------------------------
# boilerplate: shingles ≥ 2.5× their source's MEAN shingle doc-frequency
# --------------------------------------------------------------------------
@query("boilerplate_shingles", oracle="""
WITH wrds AS (
  SELECT doc_id, source,
         list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS w
  FROM documents
),
idx AS (
  SELECT doc_id, source, w, unnest(range(1, greatest(len(w) - 1, 1))) AS i
  FROM wrds
),
sh AS (
  SELECT DISTINCT doc_id, source,
         w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
  FROM idx
),
freq AS (SELECT source, s, CAST(count(*) AS BIGINT) AS df_src
         FROM sh GROUP BY source, s),
stats AS (SELECT source, CAST(sum(df_src) AS BIGINT) AS tot,
                 CAST(count(*) AS BIGINT) AS n_sh
          FROM freq GROUP BY source)
SELECT f.source, f.s AS shingle, f.df_src, t.n_sh
FROM freq f JOIN stats t ON f.source = t.source
WHERE 2 * f.df_src * t.n_sh >= 5 * t.tot
ORDER BY f.source, shingle
""")
def boilerplate_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shingles whose per-source document frequency is ≥ 2.5× the
    source's MEAN shingle df. The threshold is relative to the mean,
    not a fixed fraction of documents: on a real web corpus template
    text hits ≥ 60% of a source's pages and an absolute cut is right,
    but this synthetic corpus has no templates — the max df fraction
    is 2.4–16% and SHRINKS with SF, so the old absolute cut certified
    a 0-row match at every SF (the empty-result guard caught it; the
    q11 lesson again). The relative form flags the same boilerplate on
    template-bearing corpora and stays non-empty and selective here
    (14/12/838 rows at the three SFs). Integer-exact both engines:
    2·df·n_sh ≥ 5·tot in BIGINT; envelope df·n_sh ≤ ~4.6e18 — shard
    the cross-multiply past ~1e9 shingles per source."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    sh = docs.select("doc_id", "source",
                     F.explode(word_shingles(F.col("text"), 3)).alias("s"))
    freq = (sh.groupBy("source", "s")
            .agg(F.count(F.lit(1)).cast("long").alias("df_src")))
    stats = (freq.groupBy("source")
             .agg(F.sum("df_src").cast("long").alias("tot"),
                  F.count(F.lit(1)).cast("long").alias("n_sh")))
    return (freq.join(F.broadcast(stats), "source")
            # integer cross-multiplication: df/mean ≥ 2.5 without floats
            .filter(2 * F.col("df_src") * F.col("n_sh")
                    >= 5 * F.col("tot"))
            .select("source", F.col("s").alias("shingle"), "df_src", "n_sh")
            .orderBy("source", "shingle"))


# --------------------------------------------------------------------------
# token rarity: per-document mean global token document-frequency
# (low mean ⇒ rare vocabulary ⇒ candidate for quality review)
# --------------------------------------------------------------------------
@query("text_rarity", oracle="""
WITH t AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(trim(text), '\\s+'),
                            x -> x <> '')) AS word
  FROM documents
),
d AS (SELECT DISTINCT doc_id, word FROM t),
f AS (SELECT word, count(*) AS df FROM d GROUP BY word),
r AS (
  SELECT t.doc_id, CAST(sum(f.df) AS BIGINT) AS sum_df,
         count(*) AS n_tok
  FROM t JOIN f ON t.word = f.word
  GROUP BY t.doc_id
)
SELECT doc_id, sum_df, n_tok,
       CAST(sum_df AS DOUBLE) / CAST(n_tok AS DOUBLE) AS avg_token_df
FROM r
ORDER BY doc_id
""")
def text_rarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    t = docs.select("doc_id", F.explode(words(F.col("text"))).alias("word"))
    f = (t.select("doc_id", "word").distinct()
         .groupBy("word").agg(F.count(F.lit(1)).alias("df")))
    # vocabulary is tiny relative to the token stream → broadcast it onto
    # the token scan (at web scale: broadcast while it fits, else one
    # shuffle on the word key)
    r = (t.join(F.broadcast(f), "word")
         .groupBy("doc_id")
         .agg(F.sum("df").alias("sum_df"),
              F.count(F.lit(1)).alias("n_tok")))
    return (r.select("doc_id", "sum_df", "n_tok",
                     (F.col("sum_df").cast("double")
                      / F.col("n_tok").cast("double")).alias("avg_token_df"))
            .orderBy("doc_id"))


# --------------------------------------------------------------------------
# sliding-frame moving average (trailing 5 rows per user)
# --------------------------------------------------------------------------
@query("window_moving_avg", oracle="""
WITH b AS (
  SELECT event_id, user_id, ts,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
)
SELECT event_id, user_id,
       CAST(sum(cents) OVER w AS BIGINT) AS sum5,
       count(*) OVER w AS cnt5,
       CAST(sum(cents) OVER w AS DOUBLE) / CAST(count(*) OVER w AS DOUBLE)
         AS ma5
FROM b
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
ORDER BY event_id
""")
def window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    b = ev.select("event_id", "user_id", "ts",
                  _units(F.col("value"), 100).alias("cents"))
    w = (W.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(-4, W.currentRow))
    return (b.select("event_id", "user_id",
                     F.sum("cents").over(w).alias("sum5"),
                     F.count(F.lit(1)).over(w).alias("cnt5"),
                     (F.sum("cents").over(w).cast("double")
                      / F.count(F.lit(1)).over(w).cast("double")).alias("ma5"))
            .orderBy("event_id"))
