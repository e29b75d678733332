"""PageRank invariants: probability mass conservation, positivity, and a
hand-checkable tiny-graph ranking."""

import math

from pyspark.sql import functions as F

from light_etl_windows_container_poc_spark.operators.graph import pagerank


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def test_pagerank_mass_and_positivity(spark):
    # undirected triangle plus a pendant vertex
    und = [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")]
    edges = _edges(spark, und + [(d, s) for s, d in und])
    pr = pagerank(edges, iterations=12).collect()
    total = sum(r.pr for r in pr)
    assert math.isclose(total, 1.0, rel_tol=1e-9)
    assert all(r.pr > 0 for r in pr)
    by = {r.node: r.pr for r in pr}
    # c has degree 3, d degree 1: c must outrank d
    assert by["c"] > by["d"]


def test_pagerank_dangling_mass_redistributed(spark):
    # b is dangling (no out-edges); mass must still sum to 1
    pr = pagerank(_edges(spark, [("a", "b")]), iterations=6)
    total = pr.agg(F.sum("pr")).collect()[0][0]
    assert math.isclose(total, 1.0, rel_tol=1e-9)
