"""Cache lifecycle: the iterative/graph operators (pagerank,
triangle_count, connected_components, semdedup) must RELEASE every
DataFrame they persist before returning — a long-lived curation session
must not accumulate pinned corpus-sized caches (round-4 verdict, What's
wrong #2). Their results are materialized via an eager final checkpoint
inside the operator, so unpersisting cannot cause downstream recompute.
"""

from __future__ import annotations

import pytest
from pyspark.sql import DataFrame

from light_etl_windows_container_poc_spark.operators.dedup import \
    connected_components
from light_etl_windows_container_poc_spark.operators.graph import (
    pagerank, triangle_count)
from light_etl_windows_container_poc_spark.operators.similarity import semdedup


@pytest.fixture
def persist_tracker(monkeypatch):
    """Spy on DataFrame.persist/unpersist: every persisted frame must be
    unpersisted (by object identity — the operators keep their handles)."""
    live: list[DataFrame] = []
    orig_persist = DataFrame.persist
    orig_unpersist = DataFrame.unpersist

    def persist(self, *a, **k):
        live.append(self)
        return orig_persist(self, *a, **k)

    def unpersist(self, *a, **k):
        live[:] = [d for d in live if d is not self]
        return orig_unpersist(self, *a, **k)

    monkeypatch.setattr(DataFrame, "persist", persist)
    monkeypatch.setattr(DataFrame, "unpersist", unpersist)
    return live


def _edges(spark):
    return spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (10, 11)],
        "a_id long, b_id long")


def test_triangle_count_releases_caches(spark, persist_tracker):
    out = triangle_count(_edges(spark)).collect()
    assert out[0].n_triangles == 1 and out[0].n_edges == 5
    assert not persist_tracker


def test_pagerank_releases_caches_eager(spark, persist_tracker):
    e = _edges(spark).select("a_id", "b_id")
    directed = e.toDF("src", "dst")
    pr = pagerank(directed, iterations=2, eager_checkpoint=True)
    assert pr.count() > 0
    assert not persist_tracker


def test_pagerank_releases_caches_lazy(spark, persist_tracker):
    directed = _edges(spark).toDF("src", "dst")
    pr = pagerank(directed, iterations=2, eager_checkpoint=False)
    # result is pre-materialized by the operator's final eager checkpoint;
    # a fresh action must not need the released caches
    total = pr.agg({"pr": "sum"}).collect()[0][0]
    assert abs(total - 1.0) < 1e-9
    assert not persist_tracker


def test_connected_components_releases_caches(spark, persist_tracker):
    comp = connected_components(_edges(spark))
    got = {(r.node, r.component) for r in comp.collect()}
    assert (11, 10) in got and (4, 1) in got
    assert not persist_tracker


def test_semdedup_releases_caches(spark, sf_dir, persist_tracker):
    from light_etl_windows_container_poc_spark.catalog import load_tables

    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    out = semdedup(emb, "vec_id", "embedding", threshold=0.45, n_clusters=8)
    assert out.count() == emb.count()
    assert not persist_tracker
