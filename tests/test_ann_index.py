"""Persistent IVF index (`operators.ann_index`): build once / query
many, with partition-pruned probes and degenerate-exhaustive exactness."""

from __future__ import annotations

from pyspark.sql import functions as F

from light_etl_windows_container_poc_spark.catalog import load_tables
from light_etl_windows_container_poc_spark.operators.ann_index import (
    build_ivf_index, query_ivf_index)
from light_etl_windows_container_poc_spark.operators.similarity import \
    ann_bruteforce_topk
from light_etl_windows_container_poc_spark.plans import formatted_plan


def test_index_build_query_recall_and_pruning(spark, sf_dir, tmp_path):
    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    idx = str(tmp_path / "ivf")
    n = build_ivf_index(emb, "vec_id", "embedding", idx, n_clusters=8)
    assert n == emb.count()

    queries = emb.filter(F.col("vec_id") < 5)
    res = query_ivf_index(spark, idx, queries, "vec_id", "embedding",
                          k=5, nprobe=3)
    # partition pruning: the vectors scan must carry PartitionFilters on
    # the cluster directory column
    plan = formatted_plan(res)
    assert "PartitionFilters" in plan and "cluster" in plan

    rows = res.collect()
    assert {r["q_id"] for r in rows} == {0, 1, 2, 3, 4}
    assert all(1 <= r["rank"] <= 5 for r in rows)

    # recall@5 vs brute force with a sane floor at nprobe=3/8
    exact = ann_bruteforce_topk(emb, queries, "vec_id", "embedding", k=5)
    truth = {(r["q_id"], r["n_id"]) for r in exact.collect()}
    got = {(r["q_id"], r["n_id"]) for r in rows}
    recall = len(got & truth) / len(truth)
    assert recall >= 0.6, f"recall {recall}"


def test_probe_all_clusters_equals_bruteforce(spark, sf_dir, tmp_path):
    emb = (load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
           .filter(F.col("vec_id") < 300))
    idx = str(tmp_path / "ivf_all")
    build_ivf_index(emb, "vec_id", "embedding", idx, n_clusters=4)
    queries = emb.filter(F.col("vec_id") < 3)
    approx = query_ivf_index(spark, idx, queries, "vec_id", "embedding",
                             k=4, nprobe=4)  # nprobe == k_clusters
    exact = ann_bruteforce_topk(emb, queries, "vec_id", "embedding", k=4)
    assert sorted((r["q_id"], r["n_id"], r["rank"])
                  for r in approx.collect()) == \
        sorted((r["q_id"], r["n_id"], r["rank"]) for r in exact.collect())
