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

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_tables
from .registry import query


def _tmp(tag: str, sf_dir: str) -> str:
    h = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    return os.path.join(tempfile.gettempdir(), f"spark_graft_{tag}_{h}")


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
