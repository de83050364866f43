"""SimRank similarity via coupled deterministic reverse walks.

SimRank (Jeh & Widom, KDD 2002): two pages are similar when they are
referenced by similar pages —

    s(a, b) = c / (|I(a)||I(b)|) * sum_{i in I(a), j in I(b)} s(i, j)

with s(a, a) = 1 and I = in-neighbours.  The naive fixpoint carries
O(n^2) pair state — a non-starter on a web graph — but SimRank has an
exact random-walk characterization (Jeh & Widom Thm. 2; Fogaras & Rácz,
WWW 2005 "Scaling link-based similarity search"):

    s(a, b) = E[ c^tau(a, b) ]

where tau is the FIRST MEETING TIME of two reverse random walks started
at a and b.  Fogaras-Rácz estimate this with *coupled* walks: one shared
random successor function per (step, replicate) — walks at DIFFERENT
nodes still step independently (distinct arguments of a random function),
so the first-meeting distribution is unchanged, while walks that have met
stay together (irrelevant: after tau nothing is scored).  The coupling is
what makes the estimator storage-friendly: one walk per (vertex,
replicate), not per pair.

This module makes the walks deterministic with the repo's portable
checked-arithmetic hash (walks.py::_hop_hash with the replicate index in
the walk slot — H(r, t, cur), NO walk-id dependence, which is exactly the
coupling), so results are reproducible across runs, partitionings and
engines, and the DuckDB oracle replays them bit-for-bit.

Scale shape: walk table = |endpoints(pairs)| x replicates rows per step,
each step one point equi-join on the pos-indexed reverse adjacency (hubs
cost the same as leaves — the walk picks ONE in-neighbour by position).
Scoring = two keyed joins of the pair list against the walk table + one
groupBy.  Everything is O(|pairs| + |endpoints| * R * K); no n^2 state.

Exactness: with c = c_num/c_den rational and tau <= steps, each meeting
contributes the exact integer c_num^tau * c_den^(steps-tau); the score is
one final integer-sum / integer-constant double division — bit-identical
across engines (no float accumulation order sensitivity).

Candidate pairs: :func:`cocited_pairs` — pairs sharing an in-neighbour
(the natural SimRank candidates; s > 0 requires a common in-cone), built
from the out-adjacency with a fan-out cap (``max_out_degree``) so a
10^6-out-degree hub page cannot emit 10^12 candidate pairs (documented
bias, same trade as the links family's wedge cap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from graphina_spark.graph import LinkGraph
from graphina_spark.operators.walks import _hop_hash
from graphina_spark.plans.materialize import local_materialize as _mat

DEFAULT_MAX_OUT_DEGREE = 256


def _simple_edges(g: LinkGraph) -> DataFrame:
    """Distinct loop-free (src, dst); symmetrized when undirected (SimRank's
    I(v) is the plain neighbourhood there)."""
    e = g.edges if g.directed else g.symmetric_edges()
    return e.select("src", "dst").where(F.col("src") != F.col("dst")).distinct()


def cocited_pairs(
    g: LinkGraph, max_out_degree: int | None = DEFAULT_MAX_OUT_DEGREE
) -> DataFrame:
    """(u, v) distinct pairs with u < v sharing at least one in-neighbour.
    Sources with out-degree > ``max_out_degree`` are skipped (hub cap —
    bounded fan-out per source; pass None to disable)."""
    e = _simple_edges(g)
    if max_out_degree is not None:
        ok = e.groupBy("src").count().where(F.col("count") <= max_out_degree)
        e = e.join(ok.select("src"), "src")
    a = e.select("src", F.col("dst").alias("u"))
    b = e.select("src", F.col("dst").alias("v"))
    return (
        a.join(b, "src")
        .where(F.col("u") < F.col("v"))
        .select("u", "v")
        .distinct()
    )


def _indexed_in_adjacency(g: LinkGraph) -> DataFrame:
    """(node, pos, prev, indeg) — each vertex's in-neighbours numbered
    1..indeg in prev order (the reverse twin of walks.indexed_adjacency)."""
    e = _simple_edges(g)
    w = Window.partitionBy("dst").orderBy("src")
    return e.select(
        F.col("dst").alias("node"),
        F.row_number().over(w).alias("pos"),
        F.col("src").alias("prev"),
        F.count("*").over(Window.partitionBy("dst")).alias("indeg"),
    )


def reverse_walk_table(
    g: LinkGraph, starts: DataFrame, steps: int, replicates: int
) -> DataFrame:
    """(start, r, t, pos) coupled reverse walks: position after t backward
    hops, one walk per (start, replicate).  The hop hash H(r, t, cur)
    depends only on (replicate, step, current node) — walks from different
    starts coalesce permanently once they meet (the Fogaras-Rácz coupling).
    Walks die at in-degree-0 nodes (no row for later t)."""
    radj = _indexed_in_adjacency(g).repartition("node").cache()
    indegs = radj.select("node", "indeg").distinct().cache()
    frontier = (
        starts.select(F.col("id").alias("start"))
        .select(
            "start",
            F.explode(F.sequence(F.lit(0), F.lit(replicates - 1))).alias("r"),
        )
        .withColumn("cur", F.col("start"))
        .transform(_mat)
    )
    out = frontier.select("start", "r", F.lit(0).alias("t"), F.col("cur").alias("pos"))
    for t in range(1, steps + 1):
        frontier = (
            frontier.withColumnRenamed("cur", "node")
            .join(indegs, "node")
            .withColumn(
                "pos", _hop_hash(F.col("r"), t, F.col("node")) % F.col("indeg") + 1
            )
            .join(radj, ["node", "pos"])
            .select("start", "r", F.col("prev").alias("cur"))
            .transform(_mat)
        )
        out = out.unionAll(
            frontier.select("start", "r", F.lit(t).alias("t"), F.col("cur").alias("pos"))
        )
    radj.unpersist()
    indegs.unpersist()
    return out


def simrank_scores(
    g: LinkGraph,
    pairs: DataFrame,
    c_num: int = 4,
    c_den: int = 5,
    steps: int = 5,
    replicates: int = 8,
) -> DataFrame:
    """(u, v, simrank) Monte-Carlo SimRank for the given candidate pairs
    (columns u, v; u != v), decay c = c_num/c_den, walk length ``steps``,
    ``replicates`` coupled walk replicates.

    score(u, v) = (1/R) * sum_r c^tau_r  with tau_r the first step where
    the replicate-r reverse walks from u and v occupy the same node
    (0 when they never meet within ``steps``).  Exact integer scoring:
    each meeting contributes c_num^tau * c_den^(steps - tau); one final
    division by R * c_den^steps."""
    if not (0 < c_num < c_den):
        raise ValueError("need 0 < c_num < c_den (decay c in (0, 1))")
    if steps < 1 or replicates < 1:
        raise ValueError("steps and replicates must be >= 1")
    pairs = pairs.select("u", "v").where(F.col("u") != F.col("v")).distinct()
    starts = (
        pairs.select(F.col("u").alias("id"))
        .unionAll(pairs.select(F.col("v").alias("id")))
        .distinct()
    )
    walks = reverse_walk_table(g, starts, steps, replicates).persist()
    try:
        wa = walks.select(
            F.col("start").alias("u"), "r", "t", F.col("pos").alias("pa")
        )
        wb = walks.select(
            F.col("start").alias("v"), "r", "t", F.col("pos").alias("pb")
        )
        # first meeting per (pair, replicate); t=0 never matches (u != v)
        taus = (
            pairs.join(wa, "u")
            .join(wb, ["v", "r", "t"])
            .where(F.col("pa") == F.col("pb"))
            .groupBy("u", "v", "r")
            .agg(F.min("t").alias("tau"))
        )
        # exact integer contribution c_num^tau * c_den^(steps - tau)
        contrib = F.lit(None).cast("long")
        for tt in range(1, steps + 1):
            contrib = F.when(
                F.col("tau") == tt, F.lit(c_num**tt * c_den ** (steps - tt))
            ).otherwise(contrib)
        denom = float(replicates * c_den**steps)
        scores = (
            taus.select("u", "v", contrib.alias("w"))
            .groupBy("u", "v")
            .agg((F.sum("w") / F.lit(denom)).alias("simrank"))
        )
        out = (
            pairs.join(scores, ["u", "v"], "left")
            .select(
                "u", "v", F.coalesce(F.col("simrank"), F.lit(0.0)).alias("simrank")
            )
        )
        out = _mat(out)
    finally:
        walks.unpersist()
    return out
