"""Deterministic linear-threshold cascade (bootstrap percolation).

The fractional-threshold special case of the Kempe–Kleinberg–Tardos
linear-threshold influence model (KDD 2003) — with uniform edge weights
1/indeg and a single global threshold θ the process is DETERMINISTIC
(no coin flips), which is what makes it gate-able bit-exactly and is
the form studied as bootstrap percolation on graphs:

    active_0 = seeds
    v activates in round k  iff  |active in-neighbors after k-1| ≥ θ·indeg(v)

θ is passed as the integer fraction num/den so the activation compare
is exact integer arithmetic on both engines (count·den ≥ indeg·num —
no float thresholds).  Activation is monotone: once active, always
active; the output records each vertex's activation ROUND (seeds = 0),
the "adoption wave" a crawl analyst reads as influence spread from a
seed set (spam infestation fronts, meme propagation, patch rollout).

Scale shape — delta-frontier accumulate: only NEWLY activated vertices
scatter each round (one join of the delta against in-edges + a
groupBy(dst) count, map-side combinable), and per-vertex counts of
active in-neighbors accumulate in an integer state frame — so total
messages over the whole run are O(Σ outdeg(activated)), each edge fires
exactly once, NOT O(rounds·|E|) like a recompute-every-round design.
Per-round local_materialize on both state frames (lineage/stats rule).

DuckDB twin: oracles.py::cascade_web_sql — the oracle recomputes the
full count against a_{k-1} each round (no delta); cumulative-count and
recompute are arithmetically identical per round, only the plan shape
differs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphina_spark.graph import LinkGraph
from graphina_spark.plans.materialize import local_materialize as _mat


def linear_threshold_cascade(
    g: LinkGraph,
    seeds: DataFrame,
    theta_num: int = 1,
    theta_den: int = 2,
    rounds: int = 8,
) -> DataFrame:
    """(id, r): every vertex activated within ``rounds`` rounds and the
    round it activated (seeds = 0).  A non-seed vertex activates when
    its active in-neighbor count ≥ (theta_num/theta_den)·indeg."""
    if not (0 < theta_num <= theta_den):
        raise ValueError("require 0 < theta_num <= theta_den")
    if rounds < 0:
        raise ValueError("rounds must be >= 0")

    adj = g.edges.select("src", "dst").repartition("src").cache()
    indeg = (
        adj.groupBy(F.col("dst").alias("id"))
        .agg(F.count("*").alias("indeg"))
        .cache()
    )

    acts = seeds.select("id", F.lit(0).alias("r")).distinct().transform(_mat)
    delta = acts
    # cnt: active-in-neighbor counts for vertices touched so far
    cnt = None
    for k in range(1, rounds + 1):
        msg = (
            delta.withColumnRenamed("id", "src")
            .join(adj, "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.count("*").alias("m"))
        )
        if cnt is None:
            cnt = msg.withColumnRenamed("m", "c")
        else:
            cnt = (
                cnt.join(msg, "id", "full_outer")
                .select(
                    "id",
                    (
                        F.coalesce("c", F.lit(0)) + F.coalesce("m", F.lit(0))
                    ).alias("c"),
                )
            )
        cnt = cnt.transform(_mat)
        new = (
            cnt.join(acts.select("id"), "id", "left_anti")
            .join(indeg, "id")
            .where(
                F.col("c") * F.lit(theta_den) >= F.col("indeg") * F.lit(theta_num)
            )
            .select("id", F.lit(k).alias("r"))
            .transform(_mat)
        )
        if new.count() == 0:
            break
        acts = acts.unionByName(new).transform(_mat)
        delta = new
    adj.unpersist()
    indeg.unpersist()
    return acts
