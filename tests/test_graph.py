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


def test_triangle_count_known_graph(spark):
    from light_etl_windows_container_poc_spark.operators.graph import \
        triangle_count

    # K4 on {1,2,3,4} (4 triangles) plus a pendant edge (adds none)
    edges = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    edges.append((4, 9))
    df = spark.createDataFrame(edges, "a_id long, b_id long")
    row = triangle_count(df).collect()[0]
    assert (row.n_edges, row.n_triangles) == (7, 4)


def test_triangle_count_no_triangles(spark):
    from light_etl_windows_container_poc_spark.operators.graph import \
        triangle_count

    df = spark.createDataFrame([(1, 2), (3, 4)], "a_id long, b_id long")
    row = triangle_count(df).collect()[0]
    assert (row.n_edges, row.n_triangles) == (2, 0)
