"""Deterministic random walks — DeepWalk/node2vec-style corpus generation.

Not in the reference; added because embedding pipelines over link graphs
start with walk corpora (DeepWalk KDD'14, node2vec KDD'16), and a 100 TB
crawl needs walks that are reproducible across reruns, partitionings, and
cluster sizes.  True RNG breaks all three, so the next-hop choice is a pure
hash: at step t, walk w standing on vertex v moves to the neighbor at
position

    H(w, t, v) mod out_degree(v)

in v's dst-sorted adjacency.  H is the repo's portable checked-arithmetic
hash (affine fold of (w, t, v) then two quadratic scrambles mod P = 2^31-1 —
same construction as approximation._priority / distmetrics ANF registers, so
the DuckDB oracle replays it exactly; every intermediate stays < 2^62).

Scale shape: the adjacency is indexed ONCE (one window shuffle: pos =
row_number over dst per src); each step is then a single equi-join of the
frontier on (src, pos) — O(active walks) rows per superstep, never a
neighbor-list scan, so hubs cost the same as leaves.  Walks that reach a
sink (no out-neighbors) terminate early, exactly like the sequential
algorithm.  L steps = L joins, frontier materialized per step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from graphina_spark.graph import LinkGraph
from graphina_spark.operators.approximation import PRI_A1, PRI_A2, PRI_B
from graphina_spark.operators.distmetrics import ANF_P
from graphina_spark.plans.materialize import local_materialize as _mat


def _hop_hash(walk: F.Column, step: int, cur: F.Column) -> F.Column:
    """Portable H(walk, step, cur) in [0, P): affine fold + two quadratic
    scrambles mod P (all intermediates < 2^62 — DuckDB BIGINT is checked)."""
    m1 = (
        (walk + 1) * F.lit(PRI_A1) + F.lit(step * PRI_A2) + (cur + 1) * F.lit(PRI_B)
    ) % F.lit(ANF_P)
    m2 = (m1 * m1 + F.lit(PRI_A1)) % F.lit(ANF_P)
    return (m2 * m2 + F.lit(PRI_A2)) % F.lit(ANF_P)


def indexed_adjacency(g: LinkGraph) -> DataFrame:
    """(src, pos, dst, deg) — each vertex's out-neighbors (symmetrized when
    undirected) numbered 1..deg in dst order.  Built once, one window
    shuffle; multi-edges collapse (a walk chooses among distinct successors,
    weight-blind by contract)."""
    e = (g.edges if g.directed else g.symmetric_edges()).select("src", "dst").distinct()
    w = Window.partitionBy("src").orderBy("dst")
    return e.select(
        "src",
        F.row_number().over(w).alias("pos"),
        "dst",
        F.count("*").over(Window.partitionBy("src")).alias("deg"),
    )


def random_walks(
    g: LinkGraph,
    length: int = 4,
    walks_per_node: int = 1,
    starts: DataFrame | None = None,
) -> DataFrame:
    """(walk, step, id) — one row per visited vertex, step 0 = the start.

    Every vertex starts ``walks_per_node`` walks (walk id = vertex id ×
    walks_per_node + j), or pass ``starts`` (a frame with an ``id`` column)
    to walk from a subset.  Deterministic: same graph → same corpus,
    independent of partitioning and parallelism."""
    if length < 0:
        raise ValueError("length must be >= 0")
    if walks_per_node < 1:
        raise ValueError("walks_per_node must be >= 1")
    adj = indexed_adjacency(g).repartition("src").cache()
    degs = adj.select("src", "deg").distinct().cache()
    base = (starts if starts is not None else g.vertices).select("id")
    frontier = base.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(walks_per_node - 1)),
                lambda j: F.col("id") * walks_per_node + j,
            )
        ).alias("walk"),
        F.col("id").alias("cur"),
    ).transform(_mat)
    out = frontier.select("walk", F.lit(0).alias("step"), F.col("cur").alias("id"))
    for t in range(1, length + 1):
        # degree lookup first so the adjacency probe is a point equi-join on
        # (src, pos) — O(frontier) rows, never a neighbor-list scan
        nxt = (
            frontier.withColumnRenamed("cur", "src")
            .join(degs, "src")
            .withColumn(
                "pos",
                _hop_hash(F.col("walk"), t, F.col("src")) % F.col("deg") + 1,
            )
            .join(adj, ["src", "pos"])
            .select("walk", F.col("dst").alias("cur"))
            .transform(_mat)
        )
        out = out.unionAll(
            nxt.select("walk", F.lit(t).alias("step"), F.col("cur").alias("id"))
        )
        frontier = nxt
    adj.unpersist()
    degs.unpersist()
    return out


def node2vec_walks(
    g: LinkGraph,
    length: int = 4,
    walks_per_node: int = 1,
    w_return: int = 1,
    w_common: int = 2,
    w_far: int = 1,
    starts: DataFrame | None = None,
) -> DataFrame:
    """(walk, step, id) — deterministic node2vec-style second-order walks
    (Grover & Leskovec, KDD 2016).

    Standing at ``cur`` having arrived from ``prev``, each out-neighbor x
    gets an unnormalized integer weight:

    - ``w_return`` if x == prev            (node2vec α = 1/p)
    - ``w_common`` if edge prev→x exists   (α = 1)
    - ``w_far``    otherwise               (α = 1/q)

    Weights are INTEGERS (the α values scaled by lcm(p, q)) so the
    inverse-CDF pick is exact integer arithmetic on both engines: choose the
    first neighbor position where ``cum_weight · P > H(walk, t, cur) · total``
    (H < P = 2³¹−1; ``cum·P`` stays < 2⁶² for weights·degree < 2³¹ — within
    DuckDB's checked BIGINT).  Step 1 has no prev and hops uniformly, same
    rule as :func:`random_walks`.

    Scale shape: unlike the first-order walk's O(frontier) point lookup,
    second-order bias NEEDS the full neighbor list of ``cur`` per step (the
    sequential algorithm's alias tables cost O(Σ_e deg) memory — worse).
    Each step is: frontier ⋈ adjacency on cur (fan-out Σ deg(cur)), a
    LEFT membership probe against the edge set on (prev, dst), and one
    per-walk window for the cumulative pick — 3 keyed shuffles per step,
    all bounded by the frontier's neighborhood size, no driver state.
    """
    if length < 0:
        raise ValueError("length must be >= 0")
    if walks_per_node < 1:
        raise ValueError("walks_per_node must be >= 1")
    for w in (w_return, w_common, w_far):
        if not isinstance(w, int) or w < 1:
            raise ValueError("weights must be positive integers")
    from graphina_spark.operators.distmetrics import ANF_P

    adj = indexed_adjacency(g).repartition("src").cache()
    degs = adj.select("src", "deg").distinct().cache()
    eu = adj.select(F.col("src").alias("pa"), F.col("dst").alias("pb")).cache()
    base = (starts if starts is not None else g.vertices).select("id")
    f0 = base.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(walks_per_node - 1)),
                lambda j: F.col("id") * walks_per_node + j,
            )
        ).alias("walk"),
        F.col("id").alias("cur"),
    ).transform(_mat)
    out = f0.select("walk", F.lit(0).alias("step"), F.col("cur").alias("id"))
    if length == 0:
        adj.unpersist(); degs.unpersist(); eu.unpersist()
        return out
    # step 1: uniform (no prev), but keep prev for step 2
    frontier = (
        f0.withColumnRenamed("cur", "src")
        .join(degs, "src")
        .withColumn(
            "pos", _hop_hash(F.col("walk"), 1, F.col("src")) % F.col("deg") + 1
        )
        .join(adj, ["src", "pos"])
        .select("walk", F.col("src").alias("prev"), F.col("dst").alias("cur"))
        .transform(_mat)
    )
    out = out.unionAll(
        frontier.select("walk", F.lit(1).alias("step"), F.col("cur").alias("id"))
    )
    wwin = Window.partitionBy("walk").orderBy("pos").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    twin = Window.partitionBy("walk")
    for t in range(2, length + 1):
        cand = (
            frontier.join(adj, frontier["cur"] == adj["src"])
            .join(
                eu,
                (F.col("prev") == F.col("pa")) & (adj["dst"] == F.col("pb")),
                "left",
            )
            .select(
                "walk",
                "prev",
                "cur",
                "pos",
                "dst",
                F.when(adj["dst"] == F.col("prev"), F.lit(w_return))
                .when(F.col("pb").isNotNull(), F.lit(w_common))
                .otherwise(F.lit(w_far))
                .alias("w"),
            )
        )
        picked = (
            cand.withColumn("cum", F.sum("w").over(wwin))
            .withColumn("tot", F.sum("w").over(twin))
            .where(
                F.col("cum") * F.lit(ANF_P)
                > _hop_hash(F.col("walk"), t, F.col("cur")) * F.col("tot")
            )
            .withColumn(
                "rn",
                F.row_number().over(Window.partitionBy("walk").orderBy("pos")),
            )
            .where(F.col("rn") == 1)
        )
        frontier = picked.select(
            "walk", F.col("cur").alias("prev"), F.col("dst").alias("cur")
        ).transform(_mat)
        out = out.unionAll(
            frontier.select(
                "walk", F.lit(t).alias("step"), F.col("cur").alias("id")
            )
        )
    adj.unpersist()
    degs.unpersist()
    eu.unpersist()
    return out
