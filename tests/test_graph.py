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


def test_star_cc_matches_min_label_cc(spark):
    """Large-star/small-star must produce the identical component map
    to one-hop min-label propagation on a fixed random graph."""
    import random

    from light_etl_windows_container_poc_spark.operators.dedup import (
        connected_components)
    from light_etl_windows_container_poc_spark.operators.graph import (
        connected_components_star)

    random.seed(7)
    edges = [(random.randrange(300), random.randrange(300))
             for _ in range(220)]
    g = spark.createDataFrame([(a, b) for a, b in edges if a != b],
                              "a_id long, b_id long")
    star, _ = connected_components_star(g)
    m1 = {r.node: r.component for r in star.collect()}
    m2 = {r.node: r.component
          for r in connected_components(g, max_iterations=50).collect()}
    assert m1 == m2


def test_star_cc_is_logarithmic_on_paths(spark):
    """A 200-node path needs 100+ one-hop rounds; star rewiring must
    finish in O(log) phases — the whole point of the algorithm."""
    from light_etl_windows_container_poc_spark.operators.graph import (
        connected_components_star)

    path = spark.createDataFrame([(i, i + 1) for i in range(199)],
                                 "a_id long, b_id long")
    comp, phases = connected_components_star(path)
    assert phases <= 12
    assert all(r.component == 0 for r in comp.collect())


def test_star_cc_handles_self_loops_and_isolates(spark):
    from light_etl_windows_container_poc_spark.operators.graph import (
        connected_components_star)

    g = spark.createDataFrame([(10, 11), (11, 12), (20, 21), (5, 5)],
                              "a_id long, b_id long")
    comp, _ = connected_components_star(g)
    got = sorted((r.node, r.component) for r in comp.collect())
    assert got == [(5, 5), (10, 10), (11, 10), (12, 10),
                   (20, 20), (21, 20)]


def test_kcore_peels_trees_keeps_cycles(spark):
    """A triangle with a pendant chain: the 2-core is exactly the
    triangle, however long the chain (multi-round peel)."""
    from light_etl_windows_container_poc_spark.operators.graph import k_core

    tri = [(0, 1), (1, 2), (0, 2)]
    chain = [(2, 10), (10, 11), (11, 12), (12, 13)]
    g = spark.createDataFrame(tri + chain, "a_id long, b_id long")
    core, converged = k_core(g, k=2, rounds=8)
    assert converged
    assert {r.n for r in core.collect()} == {0, 1, 2}


def test_kcore_unconverged_budget_reports_false(spark):
    """A chain needing more peel rounds than the budget must report
    converged=False rather than silently returning a non-fixpoint."""
    from light_etl_windows_container_poc_spark.operators.graph import k_core

    chain = [(i, i + 1) for i in range(10)]
    g = spark.createDataFrame(chain, "a_id long, b_id long")
    core, converged = k_core(g, k=2, rounds=2)
    assert not converged
    assert core.count() > 0  # partial peel state, not the empty core
