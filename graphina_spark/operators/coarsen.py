"""Vertex contraction — quotient/coarsened graphs.

The reference coarsens only *inside* Louvain (louvain.rs:205-229: aggregate
communities into a super-graph between levels).  Here the same primitive is
a public operator, because crawl analytics constantly wants it standalone:
url → host graphs, page → site rollups, community → community flow maps.

One pass, fully declarative: two broadcast-or-shuffle joins to map endpoint
ids through the grouping, then a single partial+final hash aggregation
summing edge weights per (group(src), group(dst)).  Intra-group edges become
self-loops carrying the contracted weight mass — the Louvain convention, so
modularity computed on the quotient equals modularity of the partition on
the original graph.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from graphina_spark.graph import LinkGraph


# canonical url→host key lives in operators/hostgraph.py (try_parse_url,
# NULL on garbage); re-exported here for contraction callers
from graphina_spark.operators.hostgraph import host_of  # noqa: F401,E402


def contract_vertices(
    g: LinkGraph,
    mapping: DataFrame,
    keep_self_loops: bool = True,
) -> LinkGraph:
    """Quotient graph under ``mapping(id, group)``.

    Vertices absent from ``mapping`` keep their own id as group (identity
    contraction), so partial mappings are safe.  Edge weights sum per
    (group(src), group(dst)); ``keep_self_loops=False`` drops intra-group
    edges instead of folding them into self-loops."""
    mp = mapping.select(F.col("id").cast("long"), F.col("group").cast("long"))
    full = (
        g.vertices.select("id")
        .join(mp, "id", "left")
        .select("id", F.coalesce("group", F.col("id")).alias("group"))
    )
    e = (
        g.edges.join(full.withColumnRenamed("id", "src"), "src")
        .withColumnRenamed("group", "gs")
        .join(
            full.select(F.col("id").alias("dst"), F.col("group").alias("gd")), "dst"
        )
        .groupBy(F.col("gs").alias("src"), F.col("gd").alias("dst"))
        .agg(F.sum("weight").alias("weight"))
    )
    if not keep_self_loops:
        e = e.where(F.col("src") != F.col("dst"))
    v = full.select(F.col("group").alias("id")).distinct()
    return LinkGraph(vertices=v, edges=e, directed=g.directed)
