"""Round-6 breadth, first wave: incremental (cross-run) dedup certified
end-to-end, repeated-span STRIPPING (the action dup_span_census
motivates), and winnowing document fingerprints.

Determinism contracts: exact incremental dedup is md5-keyed (both
engines compute the same digest and the greedy-vs-kept decision equals
the global min-id-per-hash replay for id-ordered batches); the minhash
consistency twin hashes only relationally-replayable counts plus
integer violation flags computed by running BOTH the batched and the
one-shot incremental paths for real; span stripping and winnowing are
pure integer/string pipelines both engines replay (md5-prefix gram
hashes, window minima over per-doc partitions).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load_tables
from ..functions.texts import word_ngrams_raw, words
from .registry import cert_work_dir, query


def _tmp(tag: str, sf_dir: str) -> str:
    return cert_work_dir(tag, sf_dir)


def _fresh(path: str) -> str:
    shutil.rmtree(path, ignore_errors=True)
    return path


# --------------------------------------------------------------------------
# Incremental EXACT dedup, certified end-to-end: a base corpus seeds a
# REAL parquet hash index; two id-ordered arrival batches (history
# copies, novel "v2"/"v3" docs, within-batch duplicates, and a dup of a
# PREVIOUS batch's kept doc — the index-append case) are processed
# through operators/incremental.py. The oracle replays every decision
# relationally: keep == (doc_id = global min id of its md5 group),
# dup_of_history == (hash present in any earlier batch ∪ base) — the
# theorem that greedy-vs-kept over id-ordered batches equals the
# one-shot answer, checked hash-exact per doc.
# --------------------------------------------------------------------------
@query("dedup_incremental_exact", oracle="""
WITH base AS (SELECT doc_id, text FROM documents),
b2 AS (
  SELECT doc_id + 1000000 AS doc_id, text FROM base WHERE doc_id % 7 = 0
  UNION ALL
  SELECT doc_id + 1200000, text || ' v2' FROM base WHERE doc_id % 9 = 0
  UNION ALL
  SELECT doc_id + 1300000, text || ' v2' FROM base WHERE doc_id % 18 = 0
),
b3 AS (
  SELECT doc_id + 2000000 AS doc_id, text FROM base WHERE doc_id % 13 = 0
  UNION ALL
  SELECT doc_id + 2200000, text || ' v2' FROM base WHERE doc_id % 27 = 0
  UNION ALL
  SELECT doc_id + 2300000, text || ' v3' FROM base WHERE doc_id % 11 = 0
),
f AS (SELECT doc_id, md5(text) AS h FROM base
      UNION ALL SELECT doc_id, md5(text) FROM b2
      UNION ALL SELECT doc_id, md5(text) FROM b3),
mn AS (SELECT h, min(doc_id) AS m FROM f GROUP BY h),
hist2 AS (SELECT DISTINCT md5(text) AS h FROM base),
hist3 AS (SELECT DISTINCT h FROM (
  SELECT md5(text) AS h FROM base
  UNION ALL SELECT md5(text) FROM b2))
SELECT x.doc_id,
       CAST(x.dh AS INT) AS dup_of_history,
       CAST(CASE WHEN x.doc_id = mn.m THEN 1 ELSE 0 END AS INT) AS keep
FROM (
  SELECT doc_id, md5(text) AS h,
         CASE WHEN md5(text) IN (SELECT h FROM hist2) THEN 1 ELSE 0 END AS dh
  FROM b2
  UNION ALL
  SELECT doc_id, md5(text),
         CASE WHEN md5(text) IN (SELECT h FROM hist3) THEN 1 ELSE 0 END
  FROM b3
) x JOIN mn ON x.h = mn.h
ORDER BY doc_id
""")
def dedup_incremental_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.incremental import (build_exact_index,
                                         incremental_exact_dedup)

    base = (load_tables(spark, sf_dir, ("documents",))["documents"]
            .select("doc_id", "text"))

    def shifted(mod: int, off: int, suffix: str = "") -> DataFrame:
        t = F.concat(F.col("text"), F.lit(suffix)) if suffix \
            else F.col("text")
        return (base.filter(F.col("doc_id") % mod == 0)
                .select((F.col("doc_id") + off).alias("doc_id"),
                        t.alias("text")))

    b2 = (shifted(7, 1_000_000)
          .unionByName(shifted(9, 1_200_000, " v2"))
          .unionByName(shifted(18, 1_300_000, " v2")))
    b3 = (shifted(13, 2_000_000)
          .unionByName(shifted(27, 2_200_000, " v2"))
          .unionByName(shifted(11, 2_300_000, " v3")))
    idx = _fresh(_tmp("incexact", sf_dir))
    build_exact_index(base, "doc_id", "text", idx)
    d2 = incremental_exact_dedup(b2, "doc_id", "text", idx)
    d3 = incremental_exact_dedup(b3, "doc_id", "text", idx)
    return (d2.unionByName(d3)
            .select("doc_id", "dup_of_history", "keep")
            .orderBy("doc_id"))


# --------------------------------------------------------------------------
# Incremental MINHASH dedup consistency twin: run the batched path
# (2 id-ordered batches against one persisted index) AND the one-shot
# path (whole corpus in one batch against a second, empty index) for
# real, then hash the violation counts. keep_mismatches == 0 is the
# batch-invariance theorem for greedy-vs-kept semantics; the corpus
# counts are replayed relationally so the row stays data-dependent.
# (Near-dup decisions themselves are minhash/seed-defined → not
# SQL-expressible; this is the hash-certified twin of the tests-only
# index ops, the ann_ivf_fullprobe pattern.)
# --------------------------------------------------------------------------
@query("dedup_incremental_consistency", oracle="""
SELECT CAST((SELECT count(*) FROM documents WHERE doc_id < 300)
            AS BIGINT) AS n_base,
       CAST((SELECT count(*) FROM documents
             WHERE doc_id < 300 AND doc_id % 7 = 0)
            AS BIGINT) AS n_variants,
       CAST(2 AS INT) AS n_batches,
       CAST(0 AS BIGINT) AS keep_mismatches,
       CAST(0 AS BIGINT) AS history_flag_mismatches
""")
def dedup_incremental_consistency(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    from ..operators.incremental import incremental_minhash_dedup

    # certification harness: population-capped (predicate mirrored in
    # the oracle) — the batch-invariance theorem is data-independent, so
    # the cap keeps this 4-pipeline run cheap at any scale factor
    base = (load_tables(spark, sf_dir, ("documents",))["documents"]
            .filter(F.col("doc_id") < 300)
            .select("doc_id", "text"))
    variants = (base.filter(F.col("doc_id") % 7 == 0)
                .select((F.col("doc_id") + 1_000_000).alias("doc_id"),
                        F.concat(F.col("text"), F.lit(" extra tail words"))
                        .alias("text")))
    corpus = base.unionByName(variants)
    batches = [base, variants]
    kw = dict(num_hashes=32, bands=8, threshold=0.8, seed=42,
              num_parts=4)

    idx_b = _fresh(_tmp("incmh_b", sf_dir))
    # the final batch (and the one-shot leg) skip the index append: no
    # later batch reads it, and each append is two parquet write jobs
    parts = [incremental_minhash_dedup(b, "doc_id", "text", idx_b,
                                       update_index=(i < len(batches) - 1),
                                       **kw)
             for i, b in enumerate(batches)]
    batched = parts[0]
    for p in parts[1:]:
        batched = batched.unionByName(p)

    idx_o = _fresh(_tmp("incmh_o", sf_dir))
    oneshot = incremental_minhash_dedup(corpus, "doc_id", "text",
                                        idx_o, update_index=False, **kw)

    j = (batched.select("doc_id", F.col("keep").alias("kb"),
                        F.col("dup_of_history").alias("hb"))
         .join(oneshot.select("doc_id", F.col("keep").alias("ko")),
               "doc_id", "full"))
    keep_mism = j.filter(F.col("kb").isNull() | F.col("ko").isNull()
                         | (F.col("kb") != F.col("ko"))).count()
    # one-shot processes an empty history, so its dup_of_history is all
    # zero; the batched flags must only ever mark CROSS-batch dups —
    # a batch-1 doc flagged dup_of_history would mean the empty index
    # leaked candidates
    hist_mism = (parts[0].filter(F.col("dup_of_history") != 0).count())
    return spark.createDataFrame(
        [(base.count(), variants.count(), 2, keep_mism, hist_mism)],
        "n_base bigint, n_variants bigint, n_batches int, "
        "keep_mismatches bigint, history_flag_mismatches bigint")


# --------------------------------------------------------------------------
# Repeated-span STRIP: remove every word position covered by a 5-gram
# that occurs ≥2 times corpus-wide (the same criterion dup_span_census
# measures), reassemble the surviving words in order. The C4/Gopher
# action for repeated-span mass: within-doc repeats and cross-doc
# boilerplate spans both vanish; novel text is untouched.
# --------------------------------------------------------------------------
@query("dup_span_strip", oracle="""
WITH wrds AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '')
           AS w
  FROM documents
),
tok AS (
  SELECT doc_id, CAST(unnest(range(1, len(w) + 1)) AS INT) - 1 AS pos, w
  FROM wrds
),
tok2 AS (SELECT doc_id, pos, w[pos + 1] AS word FROM tok),
idx AS (
  SELECT doc_id, CAST(unnest(range(1, greatest(len(w) - 3, 1))) AS INT)
           AS i1, w
  FROM wrds
),
g AS (
  SELECT doc_id, i1 - 1 AS i,
         w[i1] || ' ' || w[i1+1] || ' ' || w[i1+2] || ' ' || w[i1+3]
           || ' ' || w[i1+4] AS s
  FROM idx WHERE i1 + 4 <= len(w)
),
occ AS (SELECT s FROM g GROUP BY s HAVING count(*) >= 2),
dup AS (SELECT doc_id, i FROM g JOIN occ USING (s)),
cover AS (
  SELECT DISTINCT doc_id, i + k.k AS pos
  FROM dup CROSS JOIN (SELECT CAST(unnest(range(0, 5)) AS INT) AS k) k
),
kept AS (
  SELECT t.doc_id, t.pos, t.word
  FROM tok2 t LEFT JOIN cover c ON t.doc_id = c.doc_id AND t.pos = c.pos
  WHERE c.doc_id IS NULL
),
agg AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
         string_agg(word, ' ' ORDER BY pos) AS text_kept
  FROM kept GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(len(wr.w) AS BIGINT) AS n_words,
       CAST(coalesce(a.n_kept, 0) AS BIGINT) AS n_kept,
       CAST(len(wr.w) - coalesce(a.n_kept, 0) AS BIGINT) AS n_removed,
       coalesce(a.text_kept, '') AS text_kept
FROM documents d
JOIN wrds wr ON d.doc_id = wr.doc_id
LEFT JOIN agg a ON d.doc_id = a.doc_id
ORDER BY d.doc_id
""")
def dup_span_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale shape mirrors dup_span_census: one shuffle on the gram key
    for the ≥2 census, one join back to per-occurrence rows, coverage
    positions explode 5 rows per duplicated gram, and the word-level
    anti-join + per-doc reassembly shuffle on doc_id — never doc-pairs.
    Reassembly is array_sort(collect_list(struct(pos, word))): positions
    are unique per doc, so the order is total in both engines."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    # no persist: the three consumers below re-derive from the parquet
    # scan (cheap) rather than pinning a tokenized copy of the corpus
    base = docs.select("doc_id", words(F.col("text")).alias("w"))
    tok = base.select("doc_id", F.posexplode("w").alias("pos", "word"))
    g = base.select("doc_id",
                    F.posexplode(word_ngrams_raw_from_words(F.col("w"), 5))
                    .alias("i", "s"))
    occ = (g.groupBy("s").agg(F.count(F.lit(1)).alias("tot"))
           .filter(F.col("tot") >= 2).select("s"))
    dup = g.join(occ, "s").select("doc_id", "i")
    cover = (dup.select("doc_id",
                        F.explode(F.sequence(F.col("i"), F.col("i") + 4))
                        .alias("pos"))
             .dropDuplicates(["doc_id", "pos"]))
    kept = tok.join(cover, ["doc_id", "pos"], "left_anti")
    agg = (kept.groupBy("doc_id")
           .agg(F.count(F.lit(1)).cast("long").alias("n_kept"),
                F.concat_ws(" ", F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "word"))),
                    lambda s: s.getField("word"))).alias("text_kept")))
    out = (base.select("doc_id", F.size("w").cast("long").alias("n_words"))
           .join(agg, "doc_id", "left")
           .select("doc_id", "n_words",
                   F.coalesce("n_kept", F.lit(0)).cast("long")
                   .alias("n_kept"),
                   (F.col("n_words") - F.coalesce("n_kept", F.lit(0)))
                   .cast("long").alias("n_removed"),
                   F.coalesce("text_kept", F.lit("")).alias("text_kept"))
           .orderBy("doc_id"))
    return out


def word_ngrams_raw_from_words(w: "F.Column", n: int) -> "F.Column":
    """`word_ngrams_raw` over an already-split token array (dup_span_strip
    splits once and reuses the array for both the token and gram legs)."""
    sh = w
    for k in range(1, n):
        shifted = F.slice(w, k + 1, F.greatest(F.size(w) - k, F.lit(0)))
        sh = F.zip_with(sh, shifted, lambda a, b: F.concat_ws(" ", a, b))
    out = F.slice(sh, 1, F.greatest(F.size(w) - (n - 1), F.lit(0)))
    return F.when(F.size(w) >= n, out) \
            .otherwise(F.array().cast("array<string>"))


# --------------------------------------------------------------------------
# Winnowing fingerprints (MOSS-style, public algorithm): md5-prefix
# hashes of word 3-grams; every length-4 window of consecutive gram
# hashes contributes its MINIMUM; the distinct selected hashes are the
# document's fingerprint set. Guarantees any shared run of ≥6 words
# yields a shared fingerprint — the content-defined sampling that makes
# fingerprint indexes robust to insertions (unlike fixed-stride chunks).
# --------------------------------------------------------------------------
@query("fingerprint_winnowing", oracle="""
WITH wrds AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '')
           AS w
  FROM documents
),
idx AS (
  SELECT doc_id, CAST(unnest(range(1, greatest(len(w) - 1, 1))) AS INT)
           AS i1, w
  FROM wrds
),
g AS (
  SELECT doc_id, i1 - 1 AS i,
         CAST(('0x' || substring(md5(w[i1] || ' ' || w[i1+1] || ' '
                                      || w[i1+2]), 1, 15)) AS BIGINT) AS h,
         len(w) - 2 AS n_grams
  FROM idx WHERE i1 + 2 <= len(w)
),
sel AS (
  SELECT doc_id, n_grams,
         min(h) OVER (PARTITION BY doc_id ORDER BY i
                      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp,
         i
  FROM g
),
fp AS (
  SELECT DISTINCT doc_id, n_grams, fp
  FROM sel WHERE i <= n_grams - 4
),
agg AS (
  SELECT doc_id, max(n_grams) AS n_grams,
         CAST(count(*) AS BIGINT) AS n_fp,
         CAST(bit_xor(fp) AS BIGINT) AS fp_xor
  FROM fp GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(coalesce(a.n_grams, 0) AS BIGINT) AS n_grams,
       CAST(coalesce(a.n_fp, 0) AS BIGINT) AS n_fp,
       CAST(coalesce(a.fp_xor, 0) AS BIGINT) AS fp_xor
FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
ORDER BY d.doc_id
""")
def fingerprint_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc windows partition on doc_id — scale-safe (state is one
    4-row frame); the md5-prefix hash is the engine-portable idiom
    shard_assign established. Docs with <6 words have no full window
    and report 0 fingerprints. fp_xor is the order-insensitive set
    checksum (bit_xor over DISTINCT selected hashes)."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    g = (docs.select("doc_id",
                     F.posexplode(word_ngrams_raw(F.col("text"), 3))
                     .alias("i", "s"))
         .select("doc_id", "i",
                 F.conv(F.substring(F.md5("s"), 1, 15), 16, 10)
                 .cast("long").alias("h")))
    ng = g.groupBy("doc_id").agg(F.max("i").alias("mx"))
    w = (W.partitionBy("doc_id").orderBy("i").rowsBetween(0, 3))
    sel = (g.join(ng, "doc_id")
           .select("doc_id", "i", (F.col("mx") + 1).alias("n_grams"),
                   F.min("h").over(w).alias("fp"))
           .filter(F.col("i") <= F.col("n_grams") - 4))
    fp = sel.select("doc_id", "n_grams", "fp").dropDuplicates(
        ["doc_id", "fp"])
    agg = (fp.groupBy("doc_id")
           .agg(F.max("n_grams").alias("n_grams"),
                F.count(F.lit(1)).cast("long").alias("n_fp"),
                F.bit_xor("fp").cast("long").alias("fp_xor")))
    return (docs.select("doc_id").join(agg, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("n_grams", F.lit(0)).cast("long")
                    .alias("n_grams"),
                    F.coalesce("n_fp", F.lit(0)).cast("long")
                    .alias("n_fp"),
                    F.coalesce("fp_xor", F.lit(0)).cast("long")
                    .alias("fp_xor"))
            .orderBy("doc_id"))
