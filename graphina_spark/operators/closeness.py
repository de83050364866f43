"""Closeness & harmonic centrality over weighted shortest distances.

Reference semantics:
- closeness — Wasserman–Faust improved closeness
  (/root/reference/src/centrality/closeness.rs:14-57):
  ``(reachable / sum_dist) * (reachable / (n - 1))`` over finite positive
  distances from the node, 0.0 when nothing is reachable; distances follow
  out-edges on digraphs (petgraph Dijkstra from the node).
- harmonic — sum of reciprocal distances to every *other* reached node
  (/root/reference/src/centrality/harmonic.rs:23-42).

Oracle corpus: tests/oracle_centrality_tests.rs:50+.

Scale contract: the reference loops Dijkstra over every node — O(V) full
traversals, which no engine survives at 10^12 vertices.  Here the caller
passes ``nodes`` (the subset to score); each returned score is EXACT for
its node (one batched multi-source Bellman–Ford computes all of them
together).  ``nodes=None`` scores every vertex — exact but O(V × reached)
state, for fixtures/subgraphs only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphina_spark.graph import LinkGraph
from graphina_spark.operators.paths import sssp_distances


def _dists(g: LinkGraph, nodes: DataFrame | None, max_iter: int) -> DataFrame:
    srcs = g.vertices.select("id") if nodes is None else nodes.select("id")
    return sssp_distances(g, srcs, max_iter=max_iter)


def closeness_centrality(
    g: LinkGraph, nodes: DataFrame | None = None, max_iter: int = 100
) -> DataFrame:
    """(id, closeness) — Wasserman–Faust closeness, exact per scored node
    (closeness.rs:46-51: reduces to (n-1)/sum_dist when connected)."""
    d = _dists(g, nodes, max_iter)
    n = g.vertices.count()
    agg = (
        d.where((F.col("id") != F.col("source")) & (F.col("dist") > 0))
        .groupBy("source")
        .agg(F.sum("dist").alias("sum_dist"), F.count("*").alias("reachable"))
    )
    scored = agg.select(
        F.col("source").alias("id"),
        F.when(
            F.col("sum_dist") > 0,
            (F.col("reachable") / F.col("sum_dist"))
            * (F.col("reachable") / F.lit(float(n - 1 if n > 1 else 1))),
        )
        .otherwise(0.0)
        .alias("closeness"),
    )
    base = g.vertices.select("id") if nodes is None else nodes.select("id").distinct()
    return base.join(scored, "id", "left").select(
        "id", F.coalesce("closeness", F.lit(0.0)).alias("closeness")
    )


def harmonic_centrality(
    g: LinkGraph, nodes: DataFrame | None = None, max_iter: int = 100
) -> DataFrame:
    """(id, harmonic) — sum of 1/dist over other reached nodes
    (harmonic.rs:33-41)."""
    d = _dists(g, nodes, max_iter)
    scored = (
        d.where((F.col("id") != F.col("source")) & (F.col("dist") > 0))
        .groupBy("source")
        .agg(F.sum(1.0 / F.col("dist")).alias("harmonic"))
        .select(F.col("source").alias("id"), "harmonic")
    )
    base = g.vertices.select("id") if nodes is None else nodes.select("id").distinct()
    return base.join(scored, "id", "left").select(
        "id", F.coalesce("harmonic", F.lit(0.0)).alias("harmonic")
    )
