"""HITS — hubs and authorities (Kleinberg, JACM 1999).

Not in the reference (graphina has no HITS), added as a first-class web
link-graph kernel: crawl analysis wants "good directories" (hubs) and
"good content" (authorities) alongside PageRank.

Semantics (deterministic, fixed-point):

    a(v) ← Σ_{u→v} w(u,v) · h(u)        (authority = endorsed by good hubs)
    h(u) ← Σ_{u→v} w(u,v) · a(v)        (hub = endorses good authorities)

with an L2 normalization after each half-step, init h = 1/√n.  Undirected
graphs symmetrize (hub == authority at convergence).  Convergence is L1 on
the hub vector; ``fixed_iters`` runs an exact number of (a, h) rounds so the
DuckDB oracle can unroll the identical trajectory.

Scale shape: each half-step is one edge join + one map-side-combined sum
aggregation (the same superstep envelope as PageRank / eigenvector); the two
norms are driver scalars.  Every frame materializes per round via
``local_materialize`` to keep lineage flat.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphina_spark.graph import LinkGraph
from graphina_spark.operators.centrality import ConvergenceError
from graphina_spark.plans.materialize import local_materialize as _mat


def hits(
    g: LinkGraph,
    max_iter: int = 100,
    tol: float = 1e-8,
    fixed_iters: int | None = None,
) -> DataFrame:
    """(id, hub, authority) — L2-normalized HITS scores.

    ``fixed_iters`` disables the convergence check and runs exactly that
    many rounds (oracle-twin mode).  Otherwise iterates until the L1 delta
    of the hub vector drops below ``tol``; raises :class:`ConvergenceError`
    at ``max_iter`` like the reference's own iterative centralities
    (eigenvector.rs:141-146)."""
    n = g.vertices.count()
    if n == 0:
        raise ValueError("empty graph")
    if (fixed_iters is not None and fixed_iters < 1) or max_iter < 1:
        raise ValueError("need at least one iteration")
    edges = (g.edges if g.directed else g.symmetric_edges()).select(
        "src", "dst", "weight"
    )
    edges = edges.repartition("src").cache()
    h = g.vertices.select(
        "id", F.lit(1.0 / math.sqrt(n)).alias("h")
    ).transform(_mat)
    a = None
    iters = fixed_iters if fixed_iters is not None else max_iter
    for it in range(iters):
        a_raw = (
            edges.join(h.withColumnRenamed("id", "src"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum(F.col("h") * F.col("weight")).alias("s"))
        )
        a = g.vertices.select("id").join(a_raw, "id", "left").select(
            "id", F.coalesce("s", F.lit(0.0)).alias("a")
        )
        a_norm = a.agg(F.sqrt(F.sum(F.col("a") * F.col("a")))).first()[0] or 1.0
        a = a.select("id", (F.col("a") / F.lit(a_norm)).alias("a")).transform(_mat)
        h_raw = (
            edges.join(a.withColumnRenamed("id", "dst"), "dst")
            .groupBy(F.col("src").alias("id"))
            .agg(F.sum(F.col("a") * F.col("weight")).alias("s"))
        )
        new_h = g.vertices.select("id").join(h_raw, "id", "left").select(
            "id", F.coalesce("s", F.lit(0.0)).alias("h")
        )
        h_norm = new_h.agg(F.sqrt(F.sum(F.col("h") * F.col("h")))).first()[0] or 1.0
        new_h = new_h.select(
            "id", (F.col("h") / F.lit(h_norm)).alias("h")
        ).transform(_mat)
        if fixed_iters is None:
            delta = (
                new_h.alias("n")
                .join(h.alias("o"), "id")
                .agg(F.sum(F.abs(F.col("n.h") - F.col("o.h"))))
                .first()[0]
            )
            h = new_h
            if delta < tol:
                break
        else:
            h = new_h
    else:
        if fixed_iters is None:
            edges.unpersist()
            raise ConvergenceError(f"HITS did not converge in {max_iter} iterations")
    edges.unpersist()
    return h.join(a, "id").select(
        "id", F.col("h").alias("hub"), F.col("a").alias("authority")
    )
