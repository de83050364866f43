"""Subgraph extraction — pure DataFrame ops (WHERE clauses + semijoins).

Reference surface: the ``SubgraphOps`` trait
(/root/reference/src/subgraphs/operations.rs:18-51): subgraph/
induced_subgraph (same semantics here — both keep edges whose endpoints are
all selected), ego_graph (:167-200), filter_nodes/filter_edges (:224-303),
k_hop_neighbors (:305-356), connected_component / component_subgraph
(:358-410).  The copy-out subgraph of an in-memory store becomes a pair of
filtered DataFrames — lazy, pushed down into the scans by Catalyst.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from graphina_spark.graph import LinkGraph
from graphina_spark.plans.materialize import local_materialize as _mat


def induced_subgraph(g: LinkGraph, nodes: DataFrame) -> LinkGraph:
    """Keep ``nodes`` (id) and every edge with both endpoints selected."""
    ids = nodes.select("id").distinct()
    v = g.vertices.join(ids, "id", "left_semi")
    e = (
        g.edges.join(ids.withColumnRenamed("id", "src"), "src", "left_semi")
        .join(ids.withColumnRenamed("id", "dst"), "dst", "left_semi")
        .select(g.edges.columns)
    )
    return LinkGraph(vertices=v, edges=e, directed=g.directed)


def filter_nodes(g: LinkGraph, predicate: Column) -> LinkGraph:
    """Induced subgraph on vertices satisfying ``predicate`` (a Column over
    the vertex frame, e.g. ``F.col("lang") == "en"``)."""
    return induced_subgraph(g, g.vertices.where(predicate).select("id"))


def filter_edges(g: LinkGraph, predicate: Column) -> LinkGraph:
    """Keep all vertices, drop edges failing ``predicate`` (operations.rs:260:
    node set unchanged)."""
    return LinkGraph(
        vertices=g.vertices, edges=g.edges.where(predicate), directed=g.directed
    )


def k_hop_neighbors(g: LinkGraph, sources: DataFrame, k: int) -> DataFrame:
    """(id, hops): every vertex within ≤k hops of any source, with its
    minimal hop distance (multi-source generalization of
    operations.rs:305-356; direction-respecting on digraphs like the
    reference's BFS over ``neighbors``).  Frontier-superstep BFS: each round
    expands only the newest frontier (delta optimization)."""
    adj = g.edges.select("src", "dst") if g.directed else (
        g.edges.select("src", "dst").unionAll(
            g.edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    )
    adj = adj.distinct().repartition("src").cache()
    seen = sources.select("id").distinct().withColumn("hops", F.lit(0))
    seen = seen.transform(_mat)
    frontier = seen
    for hop in range(1, k + 1):
        nxt = (
            frontier.join(adj, frontier["id"] == adj["src"])
            .select(F.col("dst").alias("id"))
            .distinct()
            .join(seen.select("id"), "id", "left_anti")
            .withColumn("hops", F.lit(hop))
            .transform(_mat)
        )
        if nxt.isEmpty():
            break
        seen = seen.unionAll(nxt).transform(_mat)
        frontier = nxt
    adj.unpersist()
    return seen


def ego_graph(g: LinkGraph, center: int, radius: int) -> LinkGraph:
    """Induced subgraph on the ≤radius-hop ball around ``center``
    (operations.rs:167-200)."""
    spark = g.vertices.sparkSession
    src = spark.createDataFrame([(int(center),)], "id long")
    ball = k_hop_neighbors(g, src, radius).select("id")
    return induced_subgraph(g, ball)


def connected_component_of(g: LinkGraph, start: int) -> DataFrame:
    """(id) members of ``start``'s (weakly) connected component
    (operations.rs:358-399 follows edges both ways even on digraphs)."""
    from graphina_spark.operators.components import weakly_connected_components

    labels = weakly_connected_components(g)
    target = labels.where(F.col("id") == start).select(
        F.col("component").alias("c")
    )
    return labels.join(F.broadcast(target), labels["component"] == target["c"]).select(
        "id"
    )


def component_subgraph(g: LinkGraph, start: int) -> LinkGraph:
    """Induced subgraph of ``start``'s component (operations.rs:400-410)."""
    return induced_subgraph(g, connected_component_of(g, start))
