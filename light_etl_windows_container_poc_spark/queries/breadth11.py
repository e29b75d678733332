"""Round-2 breadth: Gopher-style repetition / quality-rule filters over
the documents table (training-corpus curation signals beyond the
reference's surface, SURVEY §2.3)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_tables
from ..operators.text import gopher_quality_rules, repetition_metrics
from .registry import query

_WORDS_CTE = """
w AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(trim(text), '\\s+'),
                            x -> x <> '')) AS word
  FROM documents
)
"""


# --------------------------------------------------------------------------
# repetition signals (distinct-word fraction, top-word share, duplicate
# bigram fraction) — the Gopher repetition filters, exact milli-units
# --------------------------------------------------------------------------
@query("text_repetition", oracle=f"""
WITH {_WORDS_CTE},
wc AS (
  SELECT doc_id, word, count(*) AS c FROM w GROUP BY doc_id, word
),
ws AS (
  SELECT doc_id, sum(c) AS n_words, count(*) AS n_distinct, max(c) AS top_c
  FROM wc GROUP BY doc_id
),
toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS t
  FROM documents
),
bg_raw AS (
  SELECT doc_id, t[i] || ' ' || t[i+1] AS bg
  FROM (SELECT doc_id, t, unnest(range(1, greatest(len(t), 1))) AS i FROM toks)
),
bgc AS (
  SELECT doc_id, bg, count(*) AS c FROM bg_raw GROUP BY doc_id, bg
),
bgs AS (
  SELECT doc_id, sum(c) AS total2, count(*) AS distinct2
  FROM bgc GROUP BY doc_id
)
SELECT ws.doc_id,
       CAST(ws.n_words AS BIGINT) AS n_words,
       CAST(floor(ws.n_distinct * 1000.0 / ws.n_words) AS BIGINT)
         AS distinct_milli,
       CAST(floor(ws.top_c * 1000.0 / ws.n_words) AS BIGINT)
         AS topword_milli,
       CAST(floor((coalesce(bgs.total2, 0) - coalesce(bgs.distinct2, 0))
                  * 1000.0 / greatest(coalesce(bgs.total2, 0), 1)) AS BIGINT)
         AS dup2gram_milli
FROM ws LEFT JOIN bgs ON ws.doc_id = bgs.doc_id
ORDER BY ws.doc_id
""")
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return repetition_metrics(docs, "text", "doc_id").orderBy("doc_id")


# --------------------------------------------------------------------------
# composite Gopher quality-rules filter with per-rule attribution
# --------------------------------------------------------------------------
@query("quality_gopher_rules", oracle=f"""
WITH toks AS (
  SELECT doc_id, text,
         list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS t
  FROM documents
),
m AS (
  SELECT doc_id,
         len(t) AS n_words,
         floor(coalesce(list_sum(list_transform(t, x -> len(x))), 0) * 100.0
               / greatest(len(t), 1)) AS word_len_centi,
         floor(len(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 1000.0
               / greatest(len(text), 1)) AS alpha_milli,
         len(list_filter(t, x -> list_contains(
             ['the','a','and','of','to','in','is','it','that','for'],
             lower(x)))) AS stop_hits
  FROM toks
)
SELECT doc_id,
       n_words BETWEEN 20 AND 100000 AS pass_word_count,
       word_len_centi BETWEEN 300 AND 1000 AS pass_word_len,
       alpha_milli >= 600 AS pass_alpha,
       stop_hits >= 2 AS pass_stopwords,
       (n_words BETWEEN 20 AND 100000) AND (word_len_centi BETWEEN 300 AND 1000)
         AND alpha_milli >= 600 AND stop_hits >= 2 AS keep
FROM m
ORDER BY doc_id
""")
def quality_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return gopher_quality_rules(docs, "text", "doc_id").orderBy("doc_id")
