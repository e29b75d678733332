"""Dual-path nearest-centroid assignment (operators/similarity.py
`assign_nearest_cluster`): the literal greatest-chain expression (small k,
whole-stage-codegen'd) and the numpy-argmax mapInPandas path (large k)
must produce identical assignments, and the large-k path must actually
build and execute at the k=1024..4096 scale the literal chain cannot
(the 64KB-bytecode / plan-analysis cliff semdedup's auto-k would hit).

Reference capability: corpus curation (SemDeDup) at the 100 TB design
point — semdedup auto-sizes k = n/256 capped at 4096, so a few million
vectors exceed LITERAL_ASSIGN_MAX_K and take the GEMM path.
"""

from __future__ import annotations

import random
import time

from pyspark.sql import functions as F

from light_etl_windows_container_poc_spark.catalog import load_tables
from light_etl_windows_container_poc_spark.operators import similarity
from light_etl_windows_container_poc_spark.operators.similarity import (
    LITERAL_ASSIGN_MAX_K, assign_nearest_cluster, kmeans_lite, semdedup)


def _centroids(k: int, dim: int, seed: int = 11) -> list[tuple[int, list[float]]]:
    rng = random.Random(seed)
    return [(i, [rng.gauss(0.0, 1.0) for _ in range(dim)]) for i in range(k)]


def _vectors_df(spark, n: int, dim: int, seed: int = 23):
    rng = random.Random(seed)
    rows = [(i, [rng.gauss(0.0, 1.0) for _ in range(dim)]) for i in range(n)]
    return spark.createDataFrame(rows, "id long, v array<double>")


def test_paths_agree_at_k80(spark):
    df = _vectors_df(spark, 300, 16)
    cents = _centroids(80, 16)
    lit = {r.id: r.cluster
           for r in assign_nearest_cluster(df, "v", cents,
                                           literal_k_max=10_000).collect()}
    gemm = {r.id: r.cluster
            for r in assign_nearest_cluster(df, "v", cents,
                                            literal_k_max=1).collect()}
    assert lit == gemm and len(lit) == 300


def test_dispatch_boundary(spark):
    """≤ LITERAL_ASSIGN_MAX_K stays a pure-expression plan (no Python
    stage); above it the plan is a mapInPandas scan."""
    df = _vectors_df(spark, 10, 4)
    small = assign_nearest_cluster(df, "v", _centroids(LITERAL_ASSIGN_MAX_K, 4))
    large = assign_nearest_cluster(df, "v",
                                   _centroids(LITERAL_ASSIGN_MAX_K + 1, 4))
    assert "MapInPandas" not in small._jdf.queryExecution().analyzed().toString()
    assert "MapInPandas" in large._jdf.queryExecution().analyzed().toString()


def test_k1024_assignment_builds_and_executes(spark):
    """The exact regime the literal chain cannot survive: k=1024, dim=64.
    Plan construction + execution must complete quickly (the GEMM path is
    one Arrow scan; the literal chain would embed ~65k literals and fall
    off codegen)."""
    df = _vectors_df(spark, 200, 64)
    cents = _centroids(1024, 64)
    t0 = time.monotonic()
    out = assign_nearest_cluster(df, "v", cents)
    rows = out.collect()
    elapsed = time.monotonic() - t0
    assert len(rows) == 200
    assert all(0 <= r.cluster < 1024 for r in rows)
    assert elapsed < 60, f"k=1024 assignment took {elapsed:.1f}s"


def test_kmeans_lite_large_k_runs(spark):
    df = _vectors_df(spark, 400, 8)
    cents = kmeans_lite(df, "id", "v", k=100, iterations=1)
    got = cents.count()
    # empty clusters may drop out of the mean recompute; most must survive
    assert got > 50


def test_semdedup_invariant_across_paths(spark, sf_dir, monkeypatch):
    """semdedup's (id, cluster, keep) must not depend on which assignment
    path ran — forced literal vs forced GEMM at k=72 on the real
    embeddings table."""
    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]

    def run():
        return {(r.vec_id, r.cluster, r.keep)
                for r in semdedup(emb, "vec_id", "embedding",
                                  threshold=0.45, n_clusters=72).collect()}

    monkeypatch.setattr(similarity, "LITERAL_ASSIGN_MAX_K", 10_000)
    lit = run()
    monkeypatch.setattr(similarity, "LITERAL_ASSIGN_MAX_K", 1)
    gemm = run()
    assert lit == gemm and len(lit) == emb.count()
