"""Reaching centralities — bounded multi-source BFS ball sizes.

Reference: /root/reference/src/centrality/other.rs:24-70 —
``local_reaching_centrality(g, distance)``: per node, the number of vertices
reachable within ≤distance hops (self included; directed follows out-edges);
``global_reaching_centrality`` = distance n.

Distributed shape: labeled frontier BFS over (source, id) pairs — every
source expands simultaneously, each round is one join + anti-join + distinct.
State is O(Σ ball sizes): fine for small distances (the operator's intended
regime); the global variant on a well-connected web graph degenerates to
O(n²) pairs and should be used on small/filtered graphs only (documented
non-goal at full scale, SURVEY §2.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphina_spark.graph import LinkGraph
from graphina_spark.plans.materialize import local_materialize as _mat


def local_reaching_centrality(g: LinkGraph, distance: int) -> DataFrame:
    """(id, reaching) — |ball(id, distance)| including the node itself."""
    adj = (
        g.edges.select("src", "dst")
        if g.directed
        else g.edges.select("src", "dst").unionAll(
            g.edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    )
    adj = adj.distinct().repartition("src").cache()
    reached = g.vertices.select(
        F.col("id").alias("source"), F.col("id").alias("id")
    ).transform(_mat)
    frontier = reached
    for _ in range(distance):
        nxt = (
            frontier.join(adj, frontier["id"] == adj["src"])
            .select("source", F.col("dst").alias("id"))
            .distinct()
            .join(reached, ["source", "id"], "left_anti")
            .transform(_mat)
        )
        if nxt.isEmpty():
            break
        reached = reached.unionAll(nxt).transform(_mat)
        frontier = nxt
    adj.unpersist()
    out = reached.groupBy(F.col("source").alias("id")).agg(
        F.count("*").cast("double").alias("reaching")
    )
    return g.vertices.select("id").join(out, "id", "left").select(
        "id", F.coalesce("reaching", F.lit(1.0)).alias("reaching")
    )


def global_reaching_centrality(g: LinkGraph) -> DataFrame:
    """distance = n (other.rs:65-70) — small/filtered graphs only."""
    return local_reaching_centrality(g, g.num_vertices())
