"""Iterative graph algorithms as DataFrame join loops (no GraphX needed).

Same execution shape as ``dedup.connected_components``: each round is one
shuffle on the join key; lineage is cut with ``localCheckpoint`` so plans
stay bounded regardless of iteration count — at cluster scale the edge
relation is the only large input and it is persisted once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(edges: DataFrame, damping: float = 0.85,
             iterations: int = 10) -> DataFrame:
    """PageRank over a directed edge list (src, dst) → (node, pr).

    Callers with an undirected graph pass both edge directions. Dangling
    nodes (no out-edges) redistribute uniformly via the standard
    lost-mass correction, keeping Σpr = 1 every round.
    """
    edges = edges.select("src", "dst").persist()
    nodes = (edges.select(F.col("src").alias("node"))
             .union(edges.select(F.col("dst").alias("node")))
             .distinct().persist())
    n = nodes.count()
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    pr = nodes.withColumn("pr", F.lit(1.0 / n))
    for _ in range(iterations):
        contrib = (edges.join(pr.withColumnRenamed("node", "src"), "src")
                   .join(outdeg, "src")
                   .groupBy("dst")
                   .agg(F.sum(F.col("pr") / F.col("outdeg")).alias("mass")))
        # mass that reached any node; the remainder came from dangling
        # nodes and is spread uniformly
        total = contrib.agg(F.sum("mass")).collect()[0][0] or 0.0
        lost = (1.0 - total) / n
        pr = (nodes.join(contrib, nodes.node == contrib.dst, "left")
              .select("node",
                      (F.lit((1.0 - damping) / n)
                       + F.lit(damping)
                       * (F.coalesce(F.col("mass"), F.lit(0.0))
                          + F.lit(lost))).alias("pr"))
              .localCheckpoint(eager=True))
    edges.unpersist()
    return pr
