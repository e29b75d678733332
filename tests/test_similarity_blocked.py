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
