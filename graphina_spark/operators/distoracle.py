"""Landmark distance oracle — constant-time point-to-point distance
estimates over a precomputed landmark index (Potamias et al., CIKM 2009;
Das Sarma et al., WSDM 2010).

The web-scale answer to "how far is u from v" when all-pairs BFS
(paths.rs:724-760) is a non-goal: precompute exact BFS distances from/to a
small landmark set L once, then estimate

    est(u, v) = min_{l ∈ L} d(u → l) + d(l → v)

which is an upper bound on d(u, v) and exact whenever some landmark lies on
a shortest u→v path (triangle inequality both ways).

Scale shape:

- The index build is |L| batched multi-source BFS frontiers — the same
  superstep machinery as operators/paths.py::bfs_distances (one shuffle per
  hop level, frontier-sized state), run once forward and once on the
  reversed edge list for directed graphs.
- A query batch is two keyed joins + one min-agg, all proportional to
  |pairs| × |L| — no graph traversal at query time.  That product is the
  classic oracle trade-off and is why |L| stays O(10–100) at 10¹² vertices.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphina_spark.graph import LinkGraph
from graphina_spark.operators.paths import bfs_distances


def landmark_index(
    g: LinkGraph, landmarks: DataFrame, max_depth: int | None = None
) -> tuple[DataFrame, DataFrame]:
    """(fwd, bwd): exact hop distances d(l → x) and d(x → l) for every
    landmark l (frames keyed (source, id, dist); unreachable pairs absent).
    Undirected graphs reuse one BFS for both directions."""
    fwd = bfs_distances(g, landmarks, max_depth=max_depth)
    if not g.directed:
        return fwd, fwd
    rev = LinkGraph(
        vertices=g.vertices,
        edges=g.edges.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"
        ),
        directed=True,
    )
    bwd = bfs_distances(rev, landmarks, max_depth=max_depth)
    return fwd, bwd


def estimate_distances(
    fwd: DataFrame, bwd: DataFrame, pairs: DataFrame
) -> DataFrame:
    """(src, dst, est) — landmark upper-bound estimate for each query pair
    (``pairs`` has src/dst columns).  Pairs with no landmark reaching both
    endpoints are absent (unknown distance, mirrors the BFS contract)."""
    u_to_l = bwd.select(
        F.col("id").alias("src"),
        F.col("source").alias("lm"),
        F.col("dist").alias("d_ul"),
    )
    l_to_v = fwd.select(
        F.col("source").alias("lm"),
        F.col("id").alias("dst"),
        F.col("dist").alias("d_lv"),
    )
    return (
        pairs.select("src", "dst")
        .join(u_to_l, "src")
        .join(l_to_v, ["lm", "dst"])
        .groupBy("src", "dst")
        .agg(F.min(F.col("d_ul") + F.col("d_lv")).cast("int").alias("est"))
    )


def landmark_distance_estimates(
    g: LinkGraph,
    landmarks: DataFrame,
    pairs: DataFrame,
    max_depth: int | None = None,
) -> DataFrame:
    """Convenience: build the index and answer one batch of pairs."""
    fwd, bwd = landmark_index(g, landmarks, max_depth=max_depth)
    return estimate_distances(fwd, bwd, pairs)
