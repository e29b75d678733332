"""Round-8 breadth, third wave: image near-dup detection — the bridge
between the multimodal stack (real PNG encode/decode,
operators/media_codec) and the dedup stack (banded fingerprint pairing,
operators/dedup.hamming_band_pairs).

The corpus is deterministic 32×32 grayscale PNGs: pixels are md5-chain
noise keyed by base = doc_id // 2, and odd doc_ids carry a small planted
perturbation (+6 on every 97th-stride pixel pair) of their even
partner's image — so each (2i, 2i+1) is a known near-duplicate and
distinct bases are statistically unrelated in hash space. Everything is
md5/zlib/float64-GEMM deterministic, so the measured recall is a
constant of the construction at every SF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_tables
from .llm import _NGRAM_MAX_DF as _JP_MAX_DF
from .llm import _SHINGLE_CTE as _JP_SHINGLES
from .registry import query


def _phash_corpus(docs: DataFrame) -> DataFrame:
    """(doc_id, content): real zlib-compressed PNGs of md5-noise pixels;
    odd doc_ids are perturbed copies of their even partner's image."""
    import pandas as pd

    def build(batches):
        import hashlib

        from ..operators.media_codec import build_png_bytes

        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                d = int(r["doc_id"])
                base = d // 2
                raw = bytearray(b"".join(
                    hashlib.md5(f"{base}:{blk}".encode()).digest()
                    for blk in range(64)))
                if d % 2 == 1:
                    for i in range(1024):
                        if i % 97 < 2:
                            raw[i] = (raw[i] + 6) % 256
                rows.append({"doc_id": d,
                             "content": build_png_bytes(32, 32, bytes(raw))})
            yield pd.DataFrame(rows, columns=["doc_id", "content"])

    # spread the per-clip CPU (md5 chain + zlib encode) over all cores —
    # the documents parquet arrives in 1-2 partitions
    npart = docs.sparkSession.sparkContext.defaultParallelism
    return (docs.select("doc_id").repartition(npart)
            .mapInPandas(build, "doc_id long, content binary"))


# --------------------------------------------------------------------------
# Certification: (a) PIGEONHOLE COMPLETENESS — the banded candidate join
# finds EVERY pair with true hamming <= 3, verified against the
# brute-force all-pairs XOR relation (structural theorem, must hold
# exactly); (b) RECALL FLOOR — >= 60% of the planted near-dup pairs land
# within hamming 3 of their original (measured 0.884/0.884/0.880 at
# sf0.001/0.01/0.1 — deterministic; DCT noise spreads a small pixel
# perturbation across coefficients, so a tail of planted pairs
# legitimately exceeds the radius, the documented pHash trade).
# --------------------------------------------------------------------------
@query("mm_phash_dedup", oracle="""
SELECT CAST(count(*) AS BIGINT) AS n_images,
       CAST(sum(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_planted,
       CAST(1 AS INT) AS pigeonhole_complete,
       CAST(1 AS INT) AS recall_ge_60pct
FROM documents
""")
def mm_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PNG build → real decode → DCT pHash → banded hamming pairs, with
    the banding proved complete against brute force and the planted
    near-dup recall floor hashed."""
    from ..operators.dedup import hamming_band_pairs
    from ..operators.multimodal import phash64_png

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    fps = phash64_png(_phash_corpus(docs), id_col="doc_id").persist()

    banded = hamming_band_pairs(fps, "id", "phash", max_hamming=3)
    # brute-force truth: every pair at hamming <= 3 (certification-only
    # quadratic, like the dedup oracles; the SERVING path is the banded
    # equi-join above)
    a = fps.select(F.col("id").alias("a_id"), F.col("phash").alias("ha"))
    b = fps.select(F.col("id").alias("b_id"), F.col("phash").alias("hb"))
    brute = (a.join(b, F.col("a_id") < F.col("b_id"))
             .filter(F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))) <= 3)
             .select("a_id", "b_id"))
    missing = brute.join(banded.select("a_id", "b_id"),
                         ["a_id", "b_id"], "left_anti")

    planted = (fps.filter(F.col("id") % 2 == 0)
               .select((F.col("id") + 1).alias("id"),
                       F.col("phash").alias("h_even"))
               .join(fps.filter(F.col("id") % 2 == 1), "id")
               .select(F.bit_count(F.col("h_even")
                                   .bitwiseXOR(F.col("phash")))
                       .alias("hamming")))

    n_images = fps.agg(F.count(F.lit(1)).alias("n_images"))
    n_missing = missing.agg(F.count(F.lit(1)).alias("n_missing"))
    pl = planted.agg(
        F.count(F.lit(1)).alias("n_planted"),
        F.sum((F.col("hamming") <= 3).cast("long")).alias("n_recovered"))
    out = (n_images.crossJoin(n_missing).crossJoin(pl)
           .select("n_images", "n_planted",
                   (F.col("n_missing") == 0).cast("int")
                   .alias("pigeonhole_complete"),
                   (F.col("n_recovered") * 100 >= F.col("n_planted") * 60)
                   .cast("int").alias("recall_ge_60pct")))
    out = out.localCheckpoint(eager=True)
    fps.unpersist()
    return out


def _audio_corpus(docs: DataFrame) -> DataFrame:
    """(doc_id, content): real 16-bit PCM WAVs of md5-noise samples
    (clamped to ±20000); odd doc_ids carry a +300 ripple on every
    53rd-stride sample pair of their even partner's clip."""
    import pandas as pd

    def build(batches):
        import hashlib

        import numpy as np

        from ..operators.media_codec import build_wav_bytes

        ripple = np.arange(2048) % 53 < 2
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                d = int(r["doc_id"])
                base = d // 2
                raw = b"".join(
                    hashlib.md5(f"a{base}:{blk}".encode()).digest()
                    for blk in range(256))
                s = (np.frombuffer(raw, dtype="<i2").astype(np.int64)
                     .clip(-20000, 20000))
                if d % 2 == 1:
                    s = s + ripple * 300
                rows.append({"doc_id": d,
                             "content": build_wav_bytes(s.tolist())})
            yield pd.DataFrame(rows, columns=["doc_id", "content"])

    npart = docs.sparkSession.sparkContext.defaultParallelism
    return (docs.select("doc_id").repartition(npart)
            .mapInPandas(build, "doc_id long, content binary"))


# --------------------------------------------------------------------------
# The audio sibling of mm_phash_dedup, with a STRONGER certified recall:
# the +300-on-noise ripple moves frame energies so little that EVERY
# planted pair stays within hamming 3 (measured 100% at all three SFs,
# deterministic) — so the flag is all-planted-recovered, not a floor.
# Pigeonhole completeness vs brute force is certified identically.
# --------------------------------------------------------------------------
@query("mm_audiofp_dedup", oracle="""
SELECT CAST(count(*) AS BIGINT) AS n_clips,
       CAST(sum(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_planted,
       CAST(1 AS INT) AS pigeonhole_complete,
       CAST(1 AS INT) AS all_planted_recovered
FROM documents
""")
def mm_audiofp_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WAV build → real PCM decode → energy-delta fingerprint → banded
    hamming pairs; banding proved complete vs brute force, every
    planted near-dup recovered."""
    from ..operators.dedup import hamming_band_pairs
    from ..operators.multimodal import audiofp64_wav

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    fps = audiofp64_wav(_audio_corpus(docs), id_col="doc_id").persist()

    banded = hamming_band_pairs(fps, "id", "afp", max_hamming=3)
    a = fps.select(F.col("id").alias("a_id"), F.col("afp").alias("ha"))
    b = fps.select(F.col("id").alias("b_id"), F.col("afp").alias("hb"))
    brute = (a.join(b, F.col("a_id") < F.col("b_id"))
             .filter(F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))) <= 3)
             .select("a_id", "b_id"))
    missing = brute.join(banded.select("a_id", "b_id"),
                         ["a_id", "b_id"], "left_anti")
    found = banded.select("a_id", "b_id")

    planted = (fps.filter(F.col("id") % 2 == 0)
               .select(F.col("id").alias("a_id"),
                       (F.col("id") + 1).alias("b_id"))
               .join(fps.select(F.col("id").alias("b_id")), "b_id"))
    unrecovered = planted.join(found, ["a_id", "b_id"], "left_anti")

    n_clips = fps.agg(F.count(F.lit(1)).alias("n_clips"))
    n_missing = missing.agg(F.count(F.lit(1)).alias("n_missing"))
    pl = planted.agg(F.count(F.lit(1)).alias("n_planted"))
    n_unrec = unrecovered.agg(F.count(F.lit(1)).alias("n_unrec"))
    out = (n_clips.crossJoin(n_missing).crossJoin(pl).crossJoin(n_unrec)
           .select("n_clips", "n_planted",
                   (F.col("n_missing") == 0).cast("int")
                   .alias("pigeonhole_complete"),
                   (F.col("n_unrec") == 0).cast("int")
                   .alias("all_planted_recovered")))
    out = out.localCheckpoint(eager=True)
    fps.unpersist()
    return out


# --------------------------------------------------------------------------
# Leakage-safe train/test split: assign WHOLE near-dup clusters to
# splits, so no >= 0.8-Jaccard pair ever straddles the boundary — the
# leakage mode a doc-level random split cannot prevent (a train doc's
# near-duplicate landing in test). Clusters come from the EXACT
# prefix-filtered Jaccard join (no minhash recall gap to excuse), the
# split is the md5(cluster)-uniform rule, and the oracle replays
# shingling, the threshold join, recursive-CTE CC, the split, AND the
# straddling-pair count from scratch — the hash proves zero leakage.
# --------------------------------------------------------------------------
@query("split_leakage_safe", oracle="""
WITH RECURSIVE {shingles},
shf AS (
  SELECT * FROM sh
  WHERE s NOT IN (SELECT s FROM sh GROUP BY s
                  HAVING count(*) > {max_df})
),
sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n
       FROM shf GROUP BY doc_id),
p0 AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         CAST(count(*) AS BIGINT) AS inter
  FROM shf a JOIN shf b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY a_id, b_id
),
good AS (
  SELECT a_id, b_id FROM p0
  JOIN sz sa ON sa.doc_id = a_id JOIN sz sb ON sb.doc_id = b_id
  WHERE inter * 5 >= 4 * (sa.n + sb.n - inter)
),
edges AS (SELECT a_id AS src, b_id AS dst FROM good
          UNION ALL SELECT b_id, a_id FROM good),
cc(node, label) AS (
  SELECT DISTINCT src, src FROM edges
  UNION
  SELECT e.dst, cc.label FROM cc JOIN edges e ON cc.node = e.src
),
comp AS (SELECT node, min(label) AS component FROM cc GROUP BY node),
cl AS (SELECT d.doc_id, coalesce(c.component, d.doc_id) AS cluster_id
       FROM documents d LEFT JOIN comp c ON d.doc_id = c.node),
spl AS (
  SELECT doc_id, cluster_id,
         CASE WHEN CAST(('0x' || substring(
                  md5(CAST(cluster_id AS VARCHAR) || 'cs'), 1, 6))
                AS BIGINT) % 1000 < 200
              THEN 'test' ELSE 'train' END AS split
  FROM cl
),
strad AS (
  SELECT CAST(count(*) AS BIGINT) AS straddling_pairs
  FROM good g JOIN spl a ON g.a_id = a.doc_id
              JOIN spl b ON g.b_id = b.doc_id
  WHERE a.split <> b.split
)
SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT cluster_id) AS BIGINT) AS n_clusters,
       straddling_pairs
FROM spl CROSS JOIN strad
GROUP BY split, straddling_pairs
ORDER BY split
""".format(shingles=_JP_SHINGLES, max_df=_JP_MAX_DF))
def split_leakage_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-granular 80/20 split over exact-Jaccard near-dup
    clusters; straddling_pairs == 0 is the certified leakage theorem."""
    from ..operators.dedup import (connected_components,
                                   jaccard_prefix_pairs)

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    pairs = jaccard_prefix_pairs(docs, "doc_id", "text", n=3,
                                 tau_num=4, tau_den=5,
                                 max_df=_JP_MAX_DF).persist()
    comp = connected_components(pairs.select("a_id", "b_id"))
    cl = (docs.select("doc_id")
          .join(comp.withColumnRenamed("node", "doc_id"), "doc_id", "left")
          .select("doc_id",
                  F.coalesce(F.col("component"), F.col("doc_id"))
                  .alias("cluster_id")))
    u = F.conv(F.substring(
        F.md5(F.concat(F.col("cluster_id").cast("string"), F.lit("cs"))),
        1, 6), 16, 10).cast("long") % 1000
    spl = cl.withColumn(
        "split", F.when(u < 200, F.lit("test")).otherwise(F.lit("train")))
    a = spl.select(F.col("doc_id").alias("a_id"),
                   F.col("split").alias("split_a"))
    b = spl.select(F.col("doc_id").alias("b_id"),
                   F.col("split").alias("split_b"))
    strad = (pairs.join(a, "a_id").join(b, "b_id")
             .filter(F.col("split_a") != F.col("split_b"))
             .agg(F.count(F.lit(1)).alias("straddling_pairs")))
    out = (spl.groupBy("split")
           .agg(F.count(F.lit(1)).alias("n_docs"),
                F.countDistinct("cluster_id").alias("n_clusters"))
           .crossJoin(F.broadcast(strad))
           .select("split", "n_docs", "n_clusters", "straddling_pairs")
           .orderBy("split"))
    out = out.localCheckpoint(eager=True)
    pairs.unpersist()
    return out


# --------------------------------------------------------------------------
# Functional-dependency discovery over a fixed candidate set — the
# schema-profiling pass (PK detection, normalization hints, dq-rule
# synthesis) a warehouse runs before trusting ingested tables. For each
# candidate lhs -> rhs: a VIOLATION is an lhs group with > 1 distinct
# rhs value; the FD holds iff no group violates. One groupBy per lhs
# column serves all its rhs candidates (count_distinct per rhs in the
# same aggregate), so the pass is |lhs-set| shuffles regardless of how
# many dependencies are probed.
# --------------------------------------------------------------------------
_FD_CANDIDATES = [  # (lhs, rhs) over orders ⋈-free single-table probes
    ("o_orderkey", "o_custkey"), ("o_orderkey", "o_orderpriority"),
    ("o_custkey", "o_orderpriority"), ("o_orderpriority", "o_custkey"),
]


@query("fd_profile", oracle="""
WITH g1 AS (
  SELECT o_orderkey AS k, count(DISTINCT o_custkey) AS d1,
         count(DISTINCT o_orderpriority) AS d2
  FROM orders GROUP BY o_orderkey
),
g2 AS (
  SELECT o_custkey AS k, count(DISTINCT o_orderpriority) AS d
  FROM orders GROUP BY o_custkey
),
g3 AS (
  SELECT o_orderpriority AS k, count(DISTINCT o_custkey) AS d
  FROM orders GROUP BY o_orderpriority
),
fd AS (
  SELECT 'o_orderkey' AS lhs, 'o_custkey' AS rhs,
         CAST(sum(CASE WHEN d1 > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_violating_groups FROM g1
  UNION ALL
  SELECT 'o_orderkey', 'o_orderpriority',
         CAST(sum(CASE WHEN d2 > 1 THEN 1 ELSE 0 END) AS BIGINT) FROM g1
  UNION ALL
  SELECT 'o_custkey', 'o_orderpriority',
         CAST(sum(CASE WHEN d > 1 THEN 1 ELSE 0 END) AS BIGINT) FROM g2
  UNION ALL
  SELECT 'o_orderpriority', 'o_custkey',
         CAST(sum(CASE WHEN d > 1 THEN 1 ELSE 0 END) AS BIGINT) FROM g3
)
SELECT lhs, rhs, n_violating_groups,
       CAST(n_violating_groups = 0 AS INT) AS holds
FROM fd ORDER BY lhs, rhs
""")
def fd_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Violating-group census per candidate FD; o_orderkey -> * must
    hold (it is the PK), the reverse directions must not."""
    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    outs = []
    for lhs in {left for left, _ in _FD_CANDIDATES}:
        rhss = [r for le, r in _FD_CANDIDATES if le == lhs]
        g = orders.groupBy(F.col(lhs)).agg(
            *[F.count_distinct(F.col(r)).alias(r) for r in rhss])
        for r in rhss:
            outs.append(g.agg(
                F.lit(lhs).alias("lhs"), F.lit(r).alias("rhs"),
                F.sum((F.col(r) > 1).cast("long"))
                .alias("n_violating_groups")))
    fd = outs[0]
    for o in outs[1:]:
        fd = fd.unionAll(o)
    return (fd.select("lhs", "rhs", "n_violating_groups",
                      (F.col("n_violating_groups") == 0).cast("int")
                      .alias("holds"))
            .orderBy("lhs", "rhs"))


# --------------------------------------------------------------------------
# O(log) connected components at certification scale: the alternating
# large-star/small-star algorithm (operators/graph.py — the
# pointer-doubling CC dedup.connected_components' docstring defers to
# for long-diameter graphs) run over the customer–supplier co-purchase
# graph, with the component-size census hashed against the recursive-
# CTE ground truth. The LPA/CC family thus certifies BOTH propagation
# disciplines: one-hop min-label (cc_convergence) and star rewiring.
# --------------------------------------------------------------------------
@query("cc_star_components", oracle="""
WITH RECURSIVE pairs AS (
  SELECT 'c' || CAST(o_custkey AS VARCHAR) AS u,
         's' || CAST(l_suppkey AS VARCHAR) AS v
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY 1, 2 HAVING count(*) >= 2
),
edges AS (SELECT u AS src, v AS dst FROM pairs
          UNION ALL SELECT v, u FROM pairs),
cc(node, label) AS (
  SELECT DISTINCT src, src FROM edges
  UNION
  SELECT e.dst, cc.label FROM cc JOIN edges e ON cc.node = e.src
),
comp AS (SELECT node, min(label) AS component FROM cc GROUP BY node),
sizes AS (SELECT component, CAST(count(*) AS BIGINT) AS size
          FROM comp GROUP BY component)
SELECT size, CAST(count(*) AS BIGINT) AS n_components
FROM sizes GROUP BY size ORDER BY size
""")
def cc_star_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Component-size histogram from large-star/small-star CC, hashed
    vs the one-hop relational ground truth."""
    from ..operators.graph import connected_components_star

    t = load_tables(spark, sf_dir, ("orders", "lineitem"))
    pairs = (t["lineitem"].join(t["orders"],
                                F.col("l_orderkey") == F.col("o_orderkey"))
             .groupBy(F.concat(F.lit("c"), F.col("o_custkey").cast("string"))
                      .alias("a_id"),
                      F.concat(F.lit("s"), F.col("l_suppkey").cast("string"))
                      .alias("b_id"))
             .agg(F.count(F.lit(1)).alias("n"))
             .filter(F.col("n") >= 2).select("a_id", "b_id"))
    comp, _ = connected_components_star(pairs)
    sizes = comp.groupBy("component").agg(F.count(F.lit(1)).alias("size"))
    return (sizes.groupBy("size")
            .agg(F.count(F.lit(1)).alias("n_components"))
            .orderBy("size"))
