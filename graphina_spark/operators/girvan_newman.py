"""Girvan-Newman community detection — bounded-removal distributed form.

Reference: /root/reference/src/community/girvan_newman.rs:22-120 —
canonical-undirected edge set, repeatedly recompute edge betweenness and
remove the maximum edge until the connected-component count reaches
``target_communities``; communities are the final components.

Scale contract: the reference recomputes all-sources edge betweenness per
removal — O(V·E) per round, unbounded rounds.  This form keeps the exact
removal rule but bounds the loop (``max_removals``) and accepts a sampled
source set for the betweenness passes (Brandes-Pich, exact when
sources=None).  Each round = one distributed edge-betweenness (shared
Brandes passes, operators/betweenness.py) + one hash-min components pass;
the only driver-side values are the component count and the 1-row argmax
edge.  GN remains a *small-k* community tool — the per-round cost is what
it is — but the rounds themselves are fully distributed, which is what the
reference cannot do.

Determinism: the removed edge is the argmax by (betweenness rounded to 9dp
desc, src asc, dst asc) over canonical (min, max) edges with both
orientations' scores summed — bit-reproducible, and the DuckDB oracle
(oracles.py::girvan_newman_bridged_sql) replays the identical rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphina_spark.graph import LinkGraph
from graphina_spark.operators.betweenness import edge_betweenness_centrality
from graphina_spark.operators.components import connected_components
from graphina_spark.plans.materialize import local_materialize as _mat


def girvan_newman(
    g: LinkGraph,
    target_communities: int,
    max_removals: int = 16,
    sources: DataFrame | None = None,
) -> DataFrame:
    """(id, community): min-member component labels after Girvan-Newman
    edge removals (girvan_newman.rs contract; the graph is treated as
    undirected like the reference's canonical edge set)."""
    if target_communities <= 0:
        raise ValueError("girvan_newman: target_communities must be >= 1")
    edges = (
        g.edges.select(
            F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .withColumn("weight", F.lit(1.0))
        .transform(_mat)
    )
    for _ in range(max_removals):
        cur = LinkGraph(vertices=g.vertices, edges=edges, directed=False)
        labels = connected_components(cur)
        ncomp = labels.select("component").distinct().count()
        if ncomp >= target_communities:
            break
        eb = edge_betweenness_centrality(cur, sources=sources, normalized=False)
        canon = (
            eb.select(
                F.least("src", "dst").alias("src"),
                F.greatest("src", "dst").alias("dst"),
                "betweenness",
            )
            .groupBy("src", "dst")
            .agg(F.sum("betweenness").alias("bc"))
        )
        top = (
            canon.orderBy(
                F.desc(F.round("bc", 9)), F.asc("src"), F.asc("dst")
            )
            .limit(1)
            .select("src", "dst")
        )
        edges = edges.join(top, ["src", "dst"], "left_anti").transform(_mat)
    final = LinkGraph(vertices=g.vertices, edges=edges, directed=False)
    return connected_components(final).select(
        "id", F.col("component").alias("community")
    )
