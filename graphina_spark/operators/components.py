"""Connected components — hash-min label exchange with path compression.

Reference: BFS per unvisited node (src/community/connected_components.rs:19-53)
returning components in discovery order; weakly-connected follows directed
edges both ways (:83-117).  The reference's tests compare components as
**sorted partitions**, not label values (:219-230), so our canonical label —
the minimum vertex id in the component — is compared after the same
canonicalization on both sides.

Spark formulation (the scale-out classic, cf. "hash-min" in Rastogi et al.,
Finding Connected Components in MapReduce):

    label(v) := min(label(v), min_{u ∈ N(v)} label(u))     (neighbor exchange)
    label(v) := label(label(v))                            (path compression)

The neighbor exchange is one join + min-aggregation per superstep (map-side
partial agg combines messages before the shuffle); the compression join makes
label trees collapse so rounds ≈ O(log diameter) instead of O(diameter).
Every superstep materializes (localCheckpoint / parquet checkpoint) to keep
lineage flat; convergence = zero changed labels (a single scalar agg).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphina_spark.graph import LinkGraph
from graphina_spark.plans.materialize import local_materialize as _mat
from graphina_spark.plans.checkpoint import CheckpointManager


def connected_components(
    g: LinkGraph,
    max_iter: int = 100,
    checkpoint: CheckpointManager | None = None,
    resume: bool = False,
    compress: bool = True,
) -> DataFrame:
    """(id: long, component: long) — component = min vertex id in the
    component (the canonical relabel both sides of the oracle apply).

    Works for undirected graphs and as **weakly** connected components for
    directed graphs (edges followed both ways, connected_components.rs:83-117).
    """
    spark = g.vertices.sparkSession
    sym = (
        g.undirected_view()
        .select("src", "dst")
        .repartition("src")
        .cache()
    )

    start_iter = 0
    labels = None
    if checkpoint is not None and resume:
        found = checkpoint.latest(spark)
        if found is not None:
            it0, labels, _ = found
            start_iter = it0 + 1
    if labels is None:
        labels = g.vertices.select("id", F.col("id").alias("component"))
    labels = labels.transform(_mat)

    for it in range(start_iter, max_iter):
        nbr_min = (
            labels.alias("l")
            .join(sym.alias("e"), F.col("l.id") == F.col("e.src"))
            .groupBy(F.col("e.dst").alias("id"))
            .agg(F.min("l.component").alias("nbr"))
        )
        new = (
            labels.join(nbr_min, "id", "left")
            .select("id", F.least("component", F.coalesce("nbr", "component")).alias("component"))
        )
        if compress:
            # pointer jump: follow my label's current label
            new = (
                new.alias("a")
                .join(
                    new.select(
                        F.col("id").alias("component"), F.col("component").alias("cc")
                    ).alias("b"),
                    "component",
                    "left",
                )
                .select(F.col("a.id").alias("id"), F.coalesce("cc", "component").alias("component"))
            )
        new = new.transform(_mat)
        changed = (
            new.alias("n")
            .join(labels.alias("o"), "id")
            .where(F.col("n.component") != F.col("o.component"))
            .count()
        )
        if checkpoint is not None:
            new = checkpoint.save(spark, new, it, extra={"changed": changed})
        labels = new
        if changed == 0:
            break
    sym.unpersist()
    return labels


def weakly_connected_components(g: LinkGraph, **kw) -> DataFrame:
    """Directed graph, edges both ways (connected_components.rs:83-117)."""
    return connected_components(g, **kw)


def count_components(g: LinkGraph) -> int:
    """Scalar helper (reference: core/validation.rs count_components)."""
    return connected_components(g).select("component").distinct().count()


def is_connected(g: LinkGraph) -> bool:
    return count_components(g) <= 1


def component_size_histogram(g: LinkGraph) -> DataFrame:
    """(size, n) — number of weakly connected components per size (the
    "one giant component + dust" readout).  WCC labels + two aggregations."""
    return (
        weakly_connected_components(g)
        .groupBy("component")
        .agg(F.count("*").alias("size"))
        .groupBy("size")
        .agg(F.count("*").alias("n"))
    )
