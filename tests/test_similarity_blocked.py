"""Block-GEMM all-pairs must find exactly the pair set the JVM-fold exact
form finds, with sims equal to ~1 ulp (numpy pairwise summation)."""

from pyspark.sql import functions as F

from light_etl_windows_container_poc_spark.catalog import load_tables
from light_etl_windows_container_poc_spark.operators.similarity import (
    cosine_pairs, cosine_pairs_blocked)


def test_blocked_matches_exact_pairs(spark, sf_dir):
    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    exact = {(r.a_id, r.b_id): r.sim for r in
             cosine_pairs(emb, "vec_id", "embedding", 0.45).collect()}
    blocked = {(r.a_id, r.b_id): r.sim for r in
               cosine_pairs_blocked(emb, "vec_id", "embedding", 0.45,
                                    n_blocks=8).collect()}
    assert set(exact) == set(blocked)
    for k, v in exact.items():
        assert abs(v - blocked[k]) < 1e-9


def test_auto_n_blocks_bounds_block_bytes(spark):
    """The derived block count must keep bytes-per-block ≤ target as the
    corpus grows — the property the static default lacked (block size grew
    linearly with input → eventual executor OOM)."""
    from light_etl_windows_container_poc_spark.operators.similarity import \
        _auto_n_blocks

    dim, target = 64, 64 * 1024
    row_bytes = dim * 8 + 32

    def frame(n):
        return spark.range(n).select(
            F.col("id"), F.array_repeat(F.lit(0.5), dim)
            .cast("array<double>").alias("v"))

    for n in (1_000, 10_000):
        nb = _auto_n_blocks(frame(n), "v", target_block_bytes=target)
        assert n * row_bytes / nb <= target, (n, nb)
    # and it actually scales: 10× the rows → ~10× the blocks
    nb1 = _auto_n_blocks(frame(1_000), "v", target_block_bytes=target)
    nb10 = _auto_n_blocks(frame(10_000), "v", target_block_bytes=target)
    assert nb10 >= 8 * nb1


def test_blocked_result_invariant_to_n_blocks(spark, sf_dir):
    """Candidate generation is exhaustive over the grid, so the pair set
    must not depend on the (now data-derived) block count."""
    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    a = {(r.a_id, r.b_id) for r in
         cosine_pairs_blocked(emb, "vec_id", "embedding", 0.45,
                              n_blocks=3).collect()}
    b = {(r.a_id, r.b_id) for r in
         cosine_pairs_blocked(emb, "vec_id", "embedding", 0.45).collect()}
    assert a == b and a
