"""Betweenness centrality — distributed Brandes (level-synchronous).

Reference: /root/reference/src/centrality/betweenness.rs:41-144 —
unweighted BFS Brandes; normalized multiplies by 1/((n-1)(n-2)) (same
constant directed/undirected, :123-133); unnormalized undirected halves.
Oracle corpus: tests/oracle_centrality_tests.rs (raw + normalized).

Distributed schedule (the standard Pregel/level-sync reformulation):

1. **Forward**: multi-source level-synchronous BFS over (source, id)
   pairs.  Because discovery is by level, every shortest-path predecessor
   of ``w`` sits exactly one level up, so path counts are a per-level
   shuffle-reduced sum: ``sigma(w) = Σ sigma(v)`` over frontier in-edges.
2. **DAG**: one join builds the shortest-path DAG edges
   ``(source, v, w)`` with ``dist(w) = dist(v) + 1`` — the only O(S·E)
   object; everything after is per-level slices of it.
3. **Backward**: dependency accumulation level by level (deepest first):
   ``delta(v) = Σ_w sigma(v)/sigma(w) · (1 + delta(w))`` — again one
   shuffle-reduced aggregation per level.

Rounds = 2 × eccentricity bound; every step is a join + map-side-combined
aggregation with per-superstep materialization.

Scale contract: the reference loops over ALL sources — O(V·E) total, out
of reach at web scale.  ``sources`` selects the sampled source set
(Brandes–Pich estimator: accumulated dependencies scaled by n/|S|);
``sources=None`` uses every vertex and the estimator factor is exactly 1,
reproducing the reference bit-for-bit on fixtures.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphina_spark.graph import LinkGraph
from graphina_spark.plans.materialize import local_materialize as _mat


def _forward_and_dag(g: LinkGraph, sources: DataFrame | None, max_depth: int):
    """Shared Brandes phases 1-2: returns (n, n_sources, state, dag, lmax).
    ``dag`` rows are (source, v, w, dw, sigma_v, sigma_w)."""
    n = g.vertices.count()
    adj = (
        g.symmetric_edges().select("src", "dst").distinct()
        .where(F.col("src") != F.col("dst"))
        .repartition("src")
        .cache()
    )
    srcs = (g.vertices if sources is None else sources).select("id").distinct()
    n_sources = srcs.count()

    state = srcs.select(
        F.col("id").alias("source"),
        F.col("id").alias("id"),
        F.lit(0).alias("dist"),
        F.lit(1.0).alias("sigma"),
    ).transform(_mat)
    frontier = state
    lmax = 0
    for depth in range(1, max_depth + 1):
        grouped = (
            frontier.join(adj, frontier["id"] == adj["src"])
            .select("source", F.col("dst").alias("id"), "sigma")
            .groupBy("source", "id")
            .agg(F.sum("sigma").alias("sigma"))
        )
        nxt = (
            grouped.join(state.select("source", "id"), ["source", "id"], "left_anti")
            .withColumn("dist", F.lit(depth))
            .select("source", "id", "dist", "sigma")
            .transform(_mat)
        )
        if nxt.isEmpty():
            break
        state = state.unionAll(nxt).transform(_mat)
        frontier = nxt
        lmax = depth

    # shortest-path DAG: (source, v, w) with dist_w = dist_v + 1
    sv = state.select("source", F.col("id").alias("v"), F.col("dist").alias("dv"),
                      F.col("sigma").alias("sigma_v"))
    sw = state.select("source", F.col("id").alias("w"), F.col("dist").alias("dw"),
                      F.col("sigma").alias("sigma_w"))
    dag = (
        sv.join(adj, sv["v"] == adj["src"])
        .select("source", "v", "dv", "sigma_v", F.col("dst").alias("w"))
        .join(sw, ["source", "w"])
        .where(F.col("dw") == F.col("dv") + 1)
        .select("source", "v", "w", "dw", "sigma_v", "sigma_w")
        .transform(_mat)
    )
    adj.unpersist()
    return n, n_sources, state, dag, lmax


def _backward(state, dag, lmax, collect_edges: bool):
    """Phase 3: dependency accumulation, deepest level first.  Returns
    (node_acc, edge_acc) — edge_acc is None unless ``collect_edges``
    (rows (source, v, w, c), the per-edge pair-dependency terms
    betweenness.rs:160-255 sums)."""
    spark = state.sparkSession
    acc = state.where(F.col("dist") == lmax).select(
        "source", "id", F.lit(0.0).alias("delta")
    ).transform(_mat)
    cur = acc
    edge_acc = (
        spark.createDataFrame([], "source long, v long, w long, c double")
        if collect_edges
        else None
    )
    for level in range(lmax, 0, -1):
        terms = (
            dag.where(F.col("dw") == level)
            .join(
                cur.select("source", F.col("id").alias("w"), "delta"),
                ["source", "w"],
            )
            .select(
                "source",
                "v",
                "w",
                (F.col("sigma_v") / F.col("sigma_w") * (1.0 + F.col("delta"))).alias("c"),
            )
        )
        if collect_edges:
            terms = terms.transform(_mat)
            edge_acc = edge_acc.unionAll(terms).transform(_mat)
        contrib = (
            terms.select("source", F.col("v").alias("id"), "c")
            .groupBy("source", "id")
            .agg(F.sum("c").alias("delta"))
        )
        cur = (
            state.where(F.col("dist") == level - 1)
            .select("source", "id")
            .join(contrib, ["source", "id"], "left")
            .select("source", "id", F.coalesce("delta", F.lit(0.0)).alias("delta"))
            .transform(_mat)
        )
        acc = acc.unionAll(cur).transform(_mat)
    return acc, edge_acc


def betweenness_centrality(
    g: LinkGraph,
    sources: DataFrame | None = None,
    normalized: bool = True,
    max_depth: int = 200,
) -> DataFrame:
    """(id, betweenness) for every vertex (0.0 when off all sampled paths)."""
    n, n_sources, state, dag, lmax = _forward_and_dag(g, sources, max_depth)
    acc, _ = _backward(state, dag, lmax, collect_edges=False)
    raw = (
        acc.where(F.col("id") != F.col("source"))
        .groupBy("id")
        .agg(F.sum("delta").alias("bc"))
    )
    scale = float(n) / float(n_sources) if n_sources else 1.0
    if normalized:
        scale *= 1.0 / ((n - 1) * (n - 2)) if n > 2 else 1.0
    elif not g.directed:
        scale *= 0.5
    return g.vertices.select("id").join(raw, "id", "left").select(
        "id",
        (F.coalesce("bc", F.lit(0.0)) * F.lit(scale)).alias("betweenness"),
    )


def edge_betweenness_centrality(
    g: LinkGraph,
    sources: DataFrame | None = None,
    normalized: bool = True,
    max_depth: int = 200,
) -> DataFrame:
    """(src, dst, betweenness) per edge — the per-edge pair dependencies of
    the same Brandes passes (betweenness.rs:160-255).  Exactly the
    reference's keying: undirected graphs carry BOTH orientations as
    separate rows (centrality map seeded with (u,v) AND (v,u), :178-183),
    each accumulating only its own DAG direction's contributions, and there
    is NO unnormalized halving (unlike the node variant :135-141).
    Normalization: directed 1/((n-1)(n-2)), undirected 2/((n-1)(n-2))
    (:243-252).  Sampled sources scale by n/|S| (Brandes-Pich), exact at
    S=V."""
    n, n_sources, state, dag, lmax = _forward_and_dag(g, sources, max_depth)
    _, edge_acc = _backward(state, dag, lmax, collect_edges=True)
    keyed = edge_acc.select(F.col("v").alias("src"), F.col("w").alias("dst"), "c")
    raw = keyed.groupBy("src", "dst").agg(F.sum("c").alias("bc"))
    scale = float(n) / float(n_sources) if n_sources else 1.0
    if normalized and n > 2:
        scale *= (2.0 if not g.directed else 1.0) / ((n - 1) * (n - 2))
    base = (
        g.symmetric_edges()
        if not g.directed
        else g.edges
    ).select("src", "dst").where(F.col("src") != F.col("dst")).distinct()
    return base.join(raw, ["src", "dst"], "left").select(
        "src",
        "dst",
        (F.coalesce("bc", F.lit(0.0)) * F.lit(scale)).alias("betweenness"),
    )
