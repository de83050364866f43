"""Approximate local node connectivity — greedy vertex-disjoint BFS paths.

Reference: /root/reference/src/approximation/connectivity.rs:57-102 —
repeatedly BFS from source to target avoiding previously-used interior
vertices; each found path blocks its interior and counts 1; a direct-edge
path counts 1 and terminates (no further disjoint path can exist through
blocked interiors once the only interior-free path is used).  The count
lower-bounds the true vertex connectivity (Menger).

Distributed schedule: the BFS inside each round is the standard frontier
superstep with parent tracking (parent = min-id predecessor at first
discovery — deterministic, so the DuckDB-gated fixtures are reproducible);
path extraction walks parents backward, one metadata-sized driver lookup
per hop.  Rounds = paths found × path length — the operator is a
*pairwise* query (the reference's contract too), not a bulk analytic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphina_spark.graph import LinkGraph
from graphina_spark.plans.materialize import local_materialize as _mat


def _bfs_path(adj: DataFrame, blocked: DataFrame, s: int, t: int, max_depth: int):
    """Shortest s→t path avoiding ``blocked`` interiors, parents = min-id
    predecessor.  Returns the path as a list of vertex ids, or None."""
    spark = adj.sparkSession
    seen = spark.createDataFrame([(s, -1)], "id long, parent long").transform(_mat)
    frontier = seen.select("id")
    for _ in range(max_depth):
        nxt = (
            frontier.join(adj, frontier["id"] == adj["src"])
            .select(F.col("dst").alias("id"), F.col("src").alias("parent"))
            .join(blocked.withColumnRenamed("b", "id"), "id", "left_anti")
            .join(seen.select("id"), "id", "left_anti")
            .groupBy("id")
            .agg(F.min("parent").alias("parent"))
            .transform(_mat)
        )
        if nxt.isEmpty():
            return None
        seen = seen.unionAll(nxt).transform(_mat)
        hit = nxt.where(F.col("id") == t)
        if not hit.isEmpty():
            # walk parents backward — O(path length) 1-row lookups
            path = [t]
            cur = t
            while cur != s:
                cur = seen.where(F.col("id") == cur).first()["parent"]
                path.append(cur)
            return list(reversed(path))
        frontier = nxt.select("id")
    return None


def local_node_connectivity(
    g: LinkGraph, source: int, target: int, max_depth: int = 64
) -> int:
    """Greedy lower bound on the number of vertex-disjoint source→target
    paths (connectivity.rs:57-102 semantics, including the direct-edge
    count-and-stop rule and the source==target → 0 case)."""
    if source == target:
        return 0
    adj = (
        g.symmetric_edges()
        .select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .repartition("src")
        .cache()
    )
    spark = adj.sparkSession
    blocked = spark.createDataFrame([], "b long")
    conn = 0
    n = g.vertices.count()
    for _ in range(n):
        path = _bfs_path(adj, blocked, source, target, max_depth)
        if path is None:
            break
        conn += 1
        if len(path) == 2:
            break  # direct edge: no interior to block, no more disjoint paths
        interior = [(v,) for v in path[1:-1]]
        blocked = blocked.unionAll(
            spark.createDataFrame(interior, "b long")
        ).transform(_mat)
    adj.unpersist()
    return conn
