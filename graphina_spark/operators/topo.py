"""Topological layering: longest-path depth per vertex in a DAG, the
Kahn-style level structure ("how many link hops of strict precedence lead
here?") — crawl-depth / dependency-depth analytics over the condensation
or any acyclic orientation of the link graph.

The reference exposes only sequential DFS visitation orders (a documented
non-goal, COVERAGE.md); the layer decomposition is the Spark-shaped member
of that family: the synchronous DP

    l(v) ← max(0, max_{u→v} l(u) + 1)

converges to the longest-path depth after ``depth(DAG)`` rounds, and after
K rounds equals ``min(longest_path(v), K)`` exactly — every length-m path
has a prefix of every shorter length, so the K-round frontier is a
well-defined partial contract (the Jones-Plassmann / MIS precedent), not
an engine artifact.

Scale shape: one gather shuffle per round (edges join l on src, groupBy
dst with map-side partial max), adjacency repartitioned+cached once,
levels re-materialized per round via plans/materialize.py (the repo-wide
superstep rule). Rounds are bounded by K, not by graph size.

DuckDB twin: oracles.py::topo_layers_sql (K unrolled MATERIALIZED CTEs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphina_spark.graph import LinkGraph
from graphina_spark.plans.materialize import local_materialize


def id_oriented_dag(g: LinkGraph) -> DataFrame:
    """(src, dst) with src < dst — the canonical acyclic orientation of the
    link graph (every edge points id-upward, so no cycle can close)."""
    e = g.edges.select("src", "dst").where(F.col("src") != F.col("dst"))
    return e.select(
        F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
    ).distinct()


def topo_layers(
    g: LinkGraph, rounds: int = 12, edges: DataFrame | None = None
) -> DataFrame:
    """(id, layer): longest-path depth capped at ``rounds``, over the
    given DAG edge set (default: the id-oriented acyclic orientation).
    """
    dag = (edges if edges is not None else id_oriented_dag(g)).repartition(
        "dst"
    )
    dag = dag.persist()
    dag.count()
    lv = g.vertices.select("id", F.lit(0).cast("int").alias("layer"))
    lv = local_materialize(lv)
    for _ in range(rounds):
        gathered = (
            dag.join(lv.select(F.col("id").alias("src"), "layer"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg((F.max("layer") + 1).cast("int").alias("cand"))
        )
        lv = (
            lv.join(gathered, "id", "left")
            .select(
                "id",
                F.greatest(F.col("layer"), F.coalesce("cand", F.lit(0))).alias(
                    "layer"
                ),
            )
        )
        lv = local_materialize(lv)
    dag.unpersist()
    return lv
