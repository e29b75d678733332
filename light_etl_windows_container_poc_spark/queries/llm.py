"""LLM-training-data operator queries (SURVEY.md §2.3) over the
documents / embeddings tables.

Oracle notes:
- cosine oracles CAST embeddings to DOUBLE[] — DuckDB's list kernels
  compute FLOAT[] inputs in float32, which diverges from Spark's double
  fold by ~1e-8; with DOUBLE[] both engines are bit-identical.
- minhash / simhash / hyperplane-LSH depend on engine hash functions →
  rows-only driver check; their RECALL is tested in tests/test_dedup.py
  and tests/test_similarity.py against exact ground truth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_tables
from ..operators.dedup import (exact_dedup, minhash_lsh_pairs,
                               ngram_jaccard_pairs, simhash_pairs)
from ..operators.similarity import (ann_bruteforce_topk, ann_lsh_topk,
                                    embedding_neardup_pairs)
from ..operators.text import fingerprint, language_id, quality_metrics
from .registry import query


def _spread(df):
    """Per-row text ops are CPU-bound: when the source is a single small
    parquet file the scan gives one partition — repartition to use every
    core. At 100 TB the scan split count already provides this."""
    return df.repartition(df.sparkSession.sparkContext.defaultParallelism)

# shared CTE: identical shingle definition on the DuckDB side
_SHINGLE_CTE = """
words AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS w
  FROM documents
),
idx AS (
  SELECT doc_id, w, unnest(range(1, greatest(len(w) - 1, 1))) AS i FROM words
),
sh AS (
  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s FROM idx
)
"""


# --------------------------------------------------------------------------
# exact dedup: content-hash groups
# --------------------------------------------------------------------------
@query("dedup_exact", oracle="""
SELECT md5(text) AS content_hash,
       min(doc_id) AS keep_id,
       count(*) AS dup_count
FROM documents
GROUP BY content_hash
ORDER BY keep_id
""")
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return exact_dedup(docs, "text", "doc_id").orderBy("keep_id")


# --------------------------------------------------------------------------
# n-gram Jaccard near-dup pairs (exact set similarity)
# --------------------------------------------------------------------------
# max_df: the boilerplate-skew guard is ON in the registered path (a
# shingle present in >_MAX_DF docs is dropped before the self-join — on a
# web corpus one hot shingle otherwise creates a quadratic join key). The
# oracle applies the SAME document-frequency cutoff, so parity holds by
# construction at any scale factor, not just ones where no shingle is hot.
_NGRAM_MAX_DF = 500

@query("dedup_ngram_jaccard", oracle=f"""
WITH {_SHINGLE_CTE},
shf AS (
  SELECT * FROM sh
  WHERE s NOT IN (SELECT s FROM sh GROUP BY s HAVING count(*) > {_NGRAM_MAX_DF})
),
sz AS (SELECT doc_id, count(*) AS n FROM shf GROUP BY doc_id),
pairs AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS inter
  FROM shf a JOIN shf b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY a_id, b_id
)
SELECT a_id, b_id,
       inter * 1.0 / (sa.n + sb.n - inter) AS jaccard
FROM pairs
JOIN sz sa ON sa.doc_id = a_id
JOIN sz sb ON sb.doc_id = b_id
WHERE inter * 1.0 / (sa.n + sb.n - inter) >= 0.8
ORDER BY a_id, b_id
""")
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return (ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.8,
                                max_df=_NGRAM_MAX_DF)
            .orderBy("a_id", "b_id"))


# --------------------------------------------------------------------------
# MinHash + LSH banding (hash-dependent → rows-only oracle; recall vs the
# exact jaccard ground truth is asserted in tests/test_dedup.py)
# --------------------------------------------------------------------------
@query("dedup_minhash_lsh")
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return (minhash_lsh_pairs(docs, "doc_id", "text",
                              num_hashes=128, bands=32, threshold=0.7)
            .orderBy("a_id", "b_id"))


# --------------------------------------------------------------------------
# SimHash near-dup (hash-dependent → rows-only oracle)
# --------------------------------------------------------------------------
@query("dedup_simhash")
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return simhash_pairs(docs, "doc_id", "text", max_hamming=3) \
        .orderBy("a_id", "b_id")


# --------------------------------------------------------------------------
# embedding-cosine near-dup pairs — exact RESULT via the scale-safe plan
# (blocked-GEMM candidates + fold re-score); the naive all-pairs theta-join
# remains only as the oracle twin below
# --------------------------------------------------------------------------
@query("dedup_embedding", oracle="""
SELECT a.vec_id AS a_id, b.vec_id AS b_id,
       CAST(round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                         CAST(b.embedding AS DOUBLE[]))
                  * 1000000) AS BIGINT) AS sim_micro
FROM embeddings a
JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                             CAST(b.embedding AS DOUBLE[])) >= 0.45
ORDER BY a_id, b_id
""")
def dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    pairs = embedding_neardup_pairs(emb, "vec_id", "embedding", threshold=0.45)
    return (pairs.select("a_id", "b_id",
                         F.round(F.col("sim") * 1_000_000).cast("long")
                         .alias("sim_micro"))
            .orderBy("a_id", "b_id"))


# --------------------------------------------------------------------------
# exact cosine top-k (brute force, broadcast queries)
# --------------------------------------------------------------------------
@query("ann_bruteforce", oracle="""
WITH q AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qv
           FROM embeddings WHERE vec_id % 100 = 0),
c AS (SELECT vec_id AS n_id, CAST(embedding AS DOUBLE[]) AS nv FROM embeddings),
scored AS (
  SELECT q_id, n_id, list_cosine_similarity(qv, nv) AS sim
  FROM q, c WHERE q_id <> n_id
), r AS (
  SELECT q_id, n_id,
         CAST(round(sim * 1000000) AS BIGINT) AS sim_micro,
         row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rn
  FROM scored
)
SELECT q_id, n_id, sim_micro, CAST(rn AS INT) AS rank
FROM r WHERE rn <= 5
ORDER BY q_id, rank
""")
def ann_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    queries_df = emb.filter(F.col("vec_id") % 100 == 0)
    topk = ann_bruteforce_topk(emb, queries_df, "vec_id", "embedding", k=5)
    return (topk.select("q_id", "n_id",
                        F.round(F.col("sim") * 1_000_000).cast("long")
                        .alias("sim_micro"),
                        "rank")
            .orderBy("q_id", "rank"))


# --------------------------------------------------------------------------
# LSH-bucketed ANN (plane-seed dependent → rows-only; recall vs brute force
# asserted in tests/test_similarity.py)
# --------------------------------------------------------------------------
@query("ann_lsh")
def ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    queries_df = emb.filter(F.col("vec_id") % 100 == 0)
    topk = ann_lsh_topk(emb, queries_df, "vec_id", "embedding",
                        k=5, dim=64, num_planes=10, multiprobe=2)
    return (topk.select("q_id", "n_id",
                        F.round(F.col("sim") * 1_000_000).cast("long")
                        .alias("sim_micro"), "rank")
            .orderBy("q_id", "rank"))


# --------------------------------------------------------------------------
# token counting (whitespace + alphanumeric-run)
# --------------------------------------------------------------------------
@query("text_token_count", oracle="""
SELECT doc_id,
       CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
                            x -> x <> '')) AS BIGINT) AS n_ws_tokens,
       CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT) AS n_re_tokens
FROM documents
ORDER BY doc_id
""")
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import regex_token_count, token_count

    docs = _spread(load_tables(spark, sf_dir, ("documents",))["documents"])
    return docs.select(
        "doc_id",
        token_count(F.col("text")).cast("long").alias("n_ws_tokens"),
        regex_token_count(F.col("text")).cast("long").alias("n_re_tokens"),
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# quality scoring (integer milli/centi units — engine-portable ratios)
# --------------------------------------------------------------------------
@query("text_quality", oracle="""
WITH t AS (
  SELECT doc_id, text,
         list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS w,
         length(text) AS nc
  FROM documents
)
SELECT doc_id,
       CAST(nc AS INT) AS n_chars_q,
       CAST(len(w) AS INT) AS n_words,
       CAST(round(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 1000.0
                  / greatest(nc, 1)) AS BIGINT) AS alpha_milli,
       CAST(round(length(regexp_replace(text, '[^0-9]', '', 'g')) * 1000.0
                  / greatest(nc, 1)) AS BIGINT) AS digit_milli,
       CAST(round(length(regexp_replace(text, '[^ ]', '', 'g')) * 1000.0
                  / greatest(nc, 1)) AS BIGINT) AS space_milli,
       CAST(round(len(list_filter(w, x -> list_contains(
                ['the','a','and','of','to','in','is','it','that','for'],
                lower(x)))) * 1000.0 / greatest(len(w), 1)) AS BIGINT)
         AS stopword_milli,
       CAST(round(list_sum(list_transform(w, x -> length(x))) * 100.0
                  / greatest(len(w), 1)) AS BIGINT) AS word_len_centi
FROM t
ORDER BY doc_id
""")
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _spread(load_tables(spark, sf_dir, ("documents",))["documents"])
    return (quality_metrics(docs.select("doc_id", "text"), "text")
            .select("doc_id", F.col("n_chars_q").cast("int").alias("n_chars_q"),
                    F.col("n_words").cast("int").alias("n_words"),
                    "alpha_milli", "digit_milli", "space_milli",
                    "stopword_milli", "word_len_centi")
            .orderBy("doc_id"))


# --------------------------------------------------------------------------
# language ID (stopword-overlap heuristic, deterministic tie-break)
# --------------------------------------------------------------------------
@query("text_langid", oracle="""
WITH t AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS w
  FROM documents
), s AS (
  SELECT doc_id,
    len(list_filter(w, x -> list_contains(['der','die','das','und','ist','von','zu','mit','den','ein'], lower(x)))) AS s_de,
    len(list_filter(w, x -> list_contains(['the','a','and','of','to','in','is','it','that','for'], lower(x)))) AS s_en,
    len(list_filter(w, x -> list_contains(['el','la','los','las','y','de','un','una','es','para'], lower(x)))) AS s_es,
    len(list_filter(w, x -> list_contains(['le','la','les','et','de','un','une','est','pour','que'], lower(x)))) AS s_fr,
    len(list_filter(w, x -> list_contains(['的','了','是','我','不','在','有','这','他','们'], lower(x)))) AS s_zh
  FROM t
)
SELECT doc_id,
  CASE WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh AND s_de > 0 THEN 'de'
       WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh AND s_en > 0 THEN 'en'
       WHEN s_es >= s_fr AND s_es >= s_zh AND s_es > 0 THEN 'es'
       WHEN s_fr >= s_zh AND s_fr > 0 THEN 'fr'
       WHEN s_zh > 0 THEN 'zh'
       ELSE 'und' END AS lang_pred
FROM s
ORDER BY doc_id
""")
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _spread(load_tables(spark, sf_dir, ("documents",))["documents"])
    return (language_id(docs.select("doc_id", "text"), "text")
            .select("doc_id", "lang_pred")
            .orderBy("doc_id"))


# --------------------------------------------------------------------------
# document fingerprinting (content md5 + min shingle md5)
# --------------------------------------------------------------------------
@query("text_fingerprint", oracle=f"""
WITH {_SHINGLE_CTE},
msh AS (SELECT doc_id, min(md5(s)) AS min_shingle_md5 FROM sh GROUP BY doc_id)
SELECT d.doc_id, md5(d.text) AS content_md5, msh.min_shingle_md5
FROM documents d LEFT JOIN msh ON d.doc_id = msh.doc_id
ORDER BY d.doc_id
""")
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _spread(load_tables(spark, sf_dir, ("documents",))["documents"])
    return fingerprint(docs, "text", "doc_id").orderBy("doc_id")


# --------------------------------------------------------------------------
# near-dup clustering: connected components over the exact-Jaccard pair
# graph (iterative label propagation; recursive-CTE oracle)
# --------------------------------------------------------------------------
@query("dedup_clusters", oracle=f"""
WITH RECURSIVE {_SHINGLE_CTE},
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
)
SELECT node, min(label) AS component FROM cc GROUP BY node
ORDER BY node
""")
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import connected_components

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    pairs = ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.8)
    return connected_components(pairs).orderBy("node")


# --------------------------------------------------------------------------
# IVF-style ANN: kmeans-lite coarse quantization + nprobe cluster search
# (centroid values are iteration-order dependent → rows-only; recall vs
# brute force asserted in tests/test_similarity.py)
# --------------------------------------------------------------------------
@query("ann_ivf")
def ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import ann_ivf_topk

    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    queries_df = emb.filter(F.col("vec_id") % 100 == 0)
    # training on a half-sample: centroid quality needs only a sample and
    # the persisted k-means footprint stays sample-sized at 100 TB; the
    # full-corpus cluster assignment below remains exact
    topk = ann_ivf_topk(emb, queries_df, "vec_id", "embedding",
                        k=5, n_clusters=8, nprobe=3,
                        train_sample_fraction=0.5)
    return (topk.select("q_id", "n_id",
                        F.round(F.col("sim") * 1_000_000).cast("long")
                        .alias("sim_micro"), "rank")
            .orderBy("q_id", "rank"))


# --------------------------------------------------------------------------
# TF-IDF: classic corpus term weighting, top-5 terms per document
# --------------------------------------------------------------------------
@query("text_tfidf", oracle="""
WITH t AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS w
  FROM documents
),
terms AS (SELECT doc_id, unnest(w) AS term FROM t),
tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY doc_id, term),
df AS (SELECT term, count(DISTINCT doc_id) AS df FROM terms GROUP BY term),
n AS (SELECT count(*) AS n_docs FROM t),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, df.df,
         CAST(round(tf.tf * ln((n.n_docs + 1.0) / (df.df + 1.0)) * 1000000)
              AS BIGINT) AS tfidf_micro
  FROM tf JOIN df USING (term) CROSS JOIN n
)
SELECT doc_id, term, tf, df, tfidf_micro
FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY tfidf_micro DESC, term) AS rn
      FROM scored) x
WHERE rn <= 5
ORDER BY doc_id, tfidf_micro DESC, term
""")
def text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from ..functions.texts import words

    docs = _spread(load_tables(spark, sf_dir, ("documents",))["documents"])
    terms = docs.select("doc_id", F.explode(words(F.col("text"))).alias("term"))
    tf = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = terms.groupBy("term").agg(F.count_distinct("doc_id").alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (tf.join(dfreq, "term").crossJoin(F.broadcast(n_docs))
              .withColumn("tfidf_micro",
                          F.round(F.col("tf")
                                  * F.log((F.col("n_docs") + 1.0)
                                          / (F.col("df") + 1.0))
                                  * 1_000_000).cast("long")))
    w = W.partitionBy("doc_id").orderBy(F.desc("tfidf_micro"), "term")
    return (scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 5)
            .select("doc_id", "term", "tf", "df", "tfidf_micro")
            .orderBy("doc_id", F.desc("tfidf_micro"), "term"))


# --------------------------------------------------------------------------
# text normalization + PII masking over a deterministically-dirtied corpus
# --------------------------------------------------------------------------
@query("text_clean_pii", oracle="""
WITH dirty AS (
  SELECT doc_id,
         'User  user' || CAST(doc_id AS VARCHAR)
           || '@example.com  CALL 555 01' || CAST(doc_id % 100 AS VARCHAR)
           || '23 now ' || upper(text[:40]) AS raw
  FROM documents
)
SELECT doc_id,
       trim(regexp_replace(regexp_replace(regexp_replace(lower(raw),
            '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
            '[0-9][0-9 ()+-]{7,}[0-9]', '<PHONE>', 'g'),
            '\\s+', ' ', 'g')) AS cleaned
FROM dirty
ORDER BY doc_id
""")
def text_clean_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import clean_text, mask_pii

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    dirty = docs.select(
        "doc_id",
        F.concat(F.lit("User  user"), F.col("doc_id").cast("string"),
                 F.lit("@example.com  CALL 555 01"),
                 (F.col("doc_id") % 100).cast("string"), F.lit("23 now "),
                 F.upper(F.substring("text", 1, 40))).alias("raw"))
    # clean (lowercase/collapse) FIRST, then mask — so the <EMAIL>/<PHONE>
    # tokens survive in their canonical uppercase form
    out = mask_pii(clean_text(dirty, "raw", out_col="normed"),
                   "normed", out_col="cleaned")
    return out.select("doc_id", "cleaned").orderBy("doc_id")


# --------------------------------------------------------------------------
# corpus report: per-language dataset statistics (the pipeline dashboard)
# --------------------------------------------------------------------------
@query("corpus_report", oracle="""
WITH t AS (
  SELECT lang, n_chars,
         len(list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> ''))
           AS n_words
  FROM documents
)
SELECT lang,
       count(*) AS n_docs,
       CAST(sum(n_words) AS BIGINT) AS total_tokens,
       CAST(round(CAST(sum(n_words) AS BIGINT) * 100.0 / count(*)) AS BIGINT)
         AS avg_tokens_centi,
       count(CASE WHEN n_chars BETWEEN 100 AND 5000 THEN 1 END) AS n_pass_length
FROM t
GROUP BY lang
ORDER BY lang
""")
def corpus_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.texts import words

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    n = F.count(F.lit(1))
    withw = docs.select("lang", "n_chars", F.size(words(F.col("text"))).alias("n_words"))
    return (withw.groupBy("lang")
            .agg(n.alias("n_docs"),
                 F.sum("n_words").cast("long").alias("total_tokens"),
                 F.round(F.sum("n_words") * 100.0 / n).cast("long")
                 .alias("avg_tokens_centi"),
                 F.count(F.when(F.col("n_chars").between(100, 5000), 1))
                 .alias("n_pass_length"))
            .orderBy("lang"))


# --------------------------------------------------------------------------
# deterministic md5-bucket train/test split (id-stable, engine-portable)
# --------------------------------------------------------------------------
@query("split_train_test", oracle="""
SELECT doc_id,
       CASE WHEN CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR) || 'split'), 1, 6))
                      AS BIGINT) % 1000 < 200
            THEN 'test' ELSE 'train' END AS split
FROM documents
ORDER BY doc_id
""")
def split_train_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import train_test_split

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return (train_test_split(docs, "doc_id", test_permille=200)
            .select("doc_id", "split")
            .orderBy("doc_id"))


# --------------------------------------------------------------------------
# full dedup pass: detect → cluster → keep the min-id representative of
# each near-dup component, pass everything unpaired through untouched
# --------------------------------------------------------------------------
@query("dedup_keep_one", oracle=f"""
WITH RECURSIVE {_SHINGLE_CTE},
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
comp AS (SELECT node, min(label) AS component FROM cc GROUP BY node)
SELECT d.doc_id, d.lang
FROM documents d
WHERE d.doc_id NOT IN (SELECT node FROM comp WHERE node <> component)
ORDER BY d.doc_id
""")
def dedup_keep_one(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import dedup_keep_representatives

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    pairs = ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.8)
    return (dedup_keep_representatives(docs, pairs, "doc_id")
            .select("doc_id", "lang")
            .orderBy("doc_id"))
