"""Batched forward-push personalized PageRank (Andersen-Chung-Lang 2006).

Power iteration touches the WHOLE graph every superstep; forward push
does work proportional to the PPR mass being materialized — the right
primitive when you want the neighbourhood of a seed set (local cluster
extraction, related-page panels) out of a 10^11-edge graph without a
global pass.  State is a sparse (id, p, r) frame: p the settled
approximation, r the residual.  One batched round:

    active     = r > eps * deg   (every vertex pushes simultaneously)
    p_active  += alpha * r
    r_active  -> 0, each neighbour gains (1-alpha) * r / deg

Mass invariant Σp + Σr = 1 holds exactly; the classic guarantee at the
eps-fixpoint is |ppr(v) - p(v)| <= eps * deg(v) per vertex.  Batched
(all-active, non-lazy) push is the standard distributed variant: the
active-set rule only changes WHICH mass moves in a round, not the
fixpoint.  The push graph is the simple symmetrized adjacency (ACL
clusters undirected structure); degree-0 seeds absorb their residual
outright (the exact PPR of an isolated vertex is a point mass).

Pair with operators/cuts.py::sweep_cut over the degree-normalized score
p/deg for the full ACL local-clustering pipeline (Cheeger-style sweep —
pinned in tests/test_pushppr.py on a planted two-block graph).

DuckDB twin: oracles.py::push_ppr_web_sql (rounds unrolled, identical
active rule and arithmetic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphina_spark.graph import LinkGraph
from graphina_spark.plans.materialize import local_materialize as _mat


def _sym_adj(g: LinkGraph) -> DataFrame:
    """Simple symmetrized adjacency (both directions, loops dropped)."""
    c = g.canonical_undirected_edges()
    return c.unionAll(
        c.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


def forward_push_ppr(
    g: LinkGraph,
    seeds: DataFrame,
    alpha: float = 0.15,
    eps: float = 1e-5,
    rounds: int = 8,
) -> DataFrame:
    """(id, p, r) sparse forward-push state after ``rounds`` batched push
    rounds from ``seeds`` (an (id, mass) frame, L1-normalized internally;
    pass mass 1.0 rows for a uniform seed distribution)."""
    if not (0.0 < alpha < 1.0):
        raise ValueError("alpha must be in (0, 1)")
    if eps < 0 or rounds < 0:
        raise ValueError("eps must be >= 0 and rounds >= 0")
    # eps == 0 is the threshold-free variant (every support vertex pushes
    # every round — residual decays (1-alpha)^k).  It is what the DuckDB
    # gate runs: the active rule degenerates to r > 0, which is identical
    # across engines (residuals are sums of strictly positive terms),
    # whereas a float threshold compare could branch differently within a
    # ulp and diverge.  Production eps > 0 behaviour is pytest-pinned.

    adj = _sym_adj(g).repartition("src").cache()
    # cached: joined against the state frame EVERY round — recomputing the
    # degree aggregation from adj each superstep would re-shuffle the whole
    # adjacency per round
    deg = (
        adj.groupBy(F.col("src").alias("id"))
        .agg(F.count("*").alias("deg"))
        .cache()
    )

    total = seeds.agg(F.sum("mass")).first()[0] or 0.0
    if total <= 0:
        raise ValueError("seed mass must be positive")
    state = seeds.select(
        "id",
        F.lit(0.0).alias("p"),
        (F.col("mass") / F.lit(total)).alias("r"),
    ).where(F.col("r") > 0)

    for _ in range(rounds):
        st = state.join(deg, "id", "left").select(
            "id", "p", "r", F.coalesce("deg", F.lit(0)).alias("deg")
        )
        active = (F.col("r") > F.lit(eps) * F.col("deg")) & (F.col("r") > 0)
        settled = st.select(
            "id",
            F.when(
                active,
                # degree-0 vertices absorb the whole residual (point mass)
                F.col("p")
                + F.when(F.col("deg") == 0, F.col("r")).otherwise(
                    F.lit(alpha) * F.col("r")
                ),
            )
            .otherwise(F.col("p"))
            .alias("p"),
            F.when(active, F.lit(0.0)).otherwise(F.col("r")).alias("r"),
        )
        # rename the adjacency columns: st's deg column already carries adj
        # lineage, so a bare second join would be an ambiguous self-join
        msgs = (
            st.where(active & (F.col("deg") > 0))
            .withColumnRenamed("id", "src")
            .join(adj.withColumnRenamed("dst", "_dst"), "src")
            .select(
                F.col("_dst").alias("id"),
                (F.lit(1.0 - alpha) * F.col("r") / F.col("deg")).alias("m"),
            )
            .groupBy("id")
            .agg(F.sum("m").alias("gain"))
        )
        state = (
            settled.join(msgs, "id", "full_outer")
            .select(
                "id",
                F.coalesce("p", F.lit(0.0)).alias("p"),
                (F.coalesce("r", F.lit(0.0)) + F.coalesce("gain", F.lit(0.0))).alias("r"),
            )
            .where((F.col("p") > 0) | (F.col("r") > 0))
        )
        state = _mat(state)
    deg.unpersist()
    adj.unpersist()
    return state


def local_cluster(
    g: LinkGraph,
    seeds: DataFrame,
    alpha: float = 0.15,
    eps: float = 1e-5,
    rounds: int = 8,
) -> DataFrame:
    """ACL local clustering: forward-push PPR from the seeds, then the
    minimum-conductance sweep over the degree-normalized score p/deg
    (operators/cuts.py::sweep_cut).  Returns sweep_cut's one-row result."""
    from graphina_spark.operators.cuts import sweep_cut

    st = forward_push_ppr(g, seeds, alpha=alpha, eps=eps, rounds=rounds)
    deg = (
        _sym_adj(g)
        .groupBy(F.col("src").alias("id"))
        .agg(F.count("*").alias("deg"))
    )
    # sweep_cut orders ASCENDING; ACL sweeps highest p/deg first -> negate
    # (unreached vertices coalesce to score 0, sorting after every cluster
    # candidate)
    scores = st.join(deg, "id").select(
        "id", (-F.col("p") / F.col("deg")).alias("score")
    )
    return sweep_cut(g, scores, score_col="score")
