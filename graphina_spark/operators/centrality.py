"""Spectral & election centralities: eigenvector, Katz, VoteRank, Laplacian.

All iterative kernels are driver-orchestrated matvec supersteps over the edge
DataFrame (contributions flow src→dst; undirected graphs symmetrize), with
per-iteration eager materialization to keep plan depth O(1).

Reference semantics:

- Eigenvector (/root/reference/src/centrality/eigenvector.rs:30-162):
  power iteration on A (directed) or the shifted operator A+I (undirected —
  kills bipartite ±λ oscillation); init 1/√n; L2-normalize each step;
  converge when ‖x'-x‖₂ < tol, or for directed after iter 10 when
  ‖x'+x‖₂ < tol (sign flip); norm < 1e-10 → uniform 1/n fallback; zero edges
  → uniform; non-convergence is an error; final scores are |x|·n/Σ|x|.
  Undirected self-loops enter BOTH orientations (stored twice).

- Katz (katz.rs:29-106): x' = α·(A·x) + β (β per-node or 1.0); init x = 0;
  undirected adds the reverse entry only when src ≠ dst; converge when
  ‖x'-x‖₂ < tol; non-convergence is an error.  NB the reference's directed
  orientation is x_new[u] += α·x[v] for edge u→v (katz.rs:82-84) — scores
  gather AGAINST edge direction (opposite of its eigenvector kernel, which
  gathers along it, eigenvector.rs:74-81); we pin both exactly.

- VoteRank (other.rs:82-164): iterative seed election — score(v) = Σ voting
  ability of its (in-)voters along edges; elected = argmax (ties → lowest
  id); stop when best score ≤ 0; elected ability ← 0; the elected node's
  (out-)neighbors lose 1/avg_degree ability, floored at 0.

- Laplacian (other.rs:175-201, Qi et al.): d² + d + 2·Σ_{w∈N(v)} d(w) over
  simple-graph neighbor counts.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphina_spark.graph import LinkGraph
from graphina_spark.plans.materialize import local_materialize as _mat


class ConvergenceError(RuntimeError):
    """Mirror of GraphinaError::convergence_failed."""


def _matvec_edges(g: LinkGraph, dedup_self_loops: bool) -> DataFrame:
    """Edge entries for y[dst] += w·x[src].  Undirected: both orientations;
    self-loops twice (eigenvector) or once (Katz, katz.rs:66-69)."""
    if g.directed:
        return g.edges
    sw = g.edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
    if dedup_self_loops:
        sw = sw.where(F.col("src") != F.col("dst"))
    return g.edges.unionAll(sw)


def eigenvector_centrality(
    g: LinkGraph, max_iter: int = 100, tol: float = 1e-6, fixed_iters: int | None = None
) -> DataFrame:
    """(id, eigenvector) — see module docstring for the pinned conventions.
    ``fixed_iters`` runs exactly that many supersteps with no convergence
    check or error (oracle-parity mode against unrolled SQL)."""
    n = g.num_vertices()
    spark = g.vertices.sparkSession
    if n == 0:
        return spark.createDataFrame([], "id long, eigenvector double")
    if g.num_edges() == 0:
        return g.vertices.select("id", F.lit(1.0 / n).alias("eigenvector"))

    adj = _matvec_edges(g, dedup_self_loops=False).repartition("src").cache()
    shift = 0.0 if g.directed else 1.0
    x = g.vertices.select("id", F.lit(1.0 / math.sqrt(n)).alias("x")).localCheckpoint(
        eager=True
    )
    converged = fixed_iters is not None
    for it in range(fixed_iters if fixed_iters is not None else max_iter):
        gathered = (
            x.alias("r")
            .join(adj.alias("e"), F.col("r.id") == F.col("e.src"))
            .select(F.col("e.dst").alias("id"), (F.col("r.x") * F.col("e.weight")).alias("c"))
            .groupBy("id")
            .agg(F.sum("c").alias("gather"))
        )
        y = (
            x.join(gathered, "id", "left")
            .select(
                "id",
                (F.lit(shift) * F.col("x") + F.coalesce("gather", F.lit(0.0))).alias("y"),
                "x",
            )
            .transform(_mat)
        )
        norm = y.agg(F.sqrt(F.sum(F.col("y") * F.col("y")))).first()[0] or 0.0
        if norm < 1e-10:
            adj.unpersist()
            return g.vertices.select("id", F.lit(1.0 / n).alias("eigenvector"))
        xn = y.select(
            "id", (F.col("y") / F.lit(norm)).alias("x"), F.col("x").alias("x_prev")
        ).transform(_mat)
        if fixed_iters is None:
            deltas = xn.agg(
                F.sqrt(F.sum(F.pow(F.col("x") - F.col("x_prev"), 2))).alias("dpos"),
                F.sqrt(F.sum(F.pow(F.col("x") + F.col("x_prev"), 2))).alias("dneg"),
            ).first()
            x = xn.select("id", "x")
            if deltas["dpos"] < tol or (
                g.directed and it > 10 and deltas["dneg"] < tol
            ):
                converged = True
                break
        else:
            x = xn.select("id", "x")
    adj.unpersist()
    if not converged:
        raise ConvergenceError(
            f"Eigenvector centrality failed to converge within {max_iter} iterations"
        )
    abssum = x.agg(F.sum(F.abs("x"))).first()[0] or 0.0
    scale = n / abssum if abssum > 0 else 0.0
    return x.select("id", (F.abs("x") * F.lit(scale)).alias("eigenvector"))


def katz_centrality(
    g: LinkGraph,
    alpha: float = 0.1,
    beta: DataFrame | float = 1.0,
    max_iter: int = 1000,
    tol: float = 1e-6,
    fixed_iters: int | None = None,
) -> DataFrame:
    """(id, katz) — x' = α·A·x + β (katz.rs:29-106).  ``beta`` is a scalar or
    an (id, beta) DataFrame (the reference's per-node β callback).
    ``fixed_iters``: oracle-parity mode (no convergence check/error)."""
    n = g.num_vertices()
    spark = g.vertices.sparkSession
    if n == 0:
        return spark.createDataFrame([], "id long, katz double")

    # reversed orientation: edge (u,v) contributes x[v] into x_new[u]
    # (katz.rs:82-84); the gather loop below flows src→dst, so swap
    adj = (
        _matvec_edges(g, dedup_self_loops=True)
        .select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
        .repartition("src")
        .cache()
    )
    if isinstance(beta, DataFrame):
        base = g.vertices.select("id").join(beta, "id", "left").select(
            "id", F.coalesce("beta", F.lit(0.0)).alias("beta")
        )
    else:
        base = g.vertices.select("id", F.lit(float(beta)).alias("beta"))
    base = base.cache()
    x = base.select("id", F.lit(0.0).alias("x")).transform(_mat)
    converged = fixed_iters is not None
    for _ in range(fixed_iters if fixed_iters is not None else max_iter):
        gathered = (
            x.alias("r")
            .join(adj.alias("e"), F.col("r.id") == F.col("e.src"))
            .select(F.col("e.dst").alias("id"), (F.col("r.x") * F.col("e.weight")).alias("c"))
            .groupBy("id")
            .agg(F.sum("c").alias("gather"))
        )
        xn = (
            base.join(gathered, "id", "left")
            .join(x.select("id", F.col("x").alias("x_prev")), "id")
            .select(
                "id",
                (
                    F.lit(alpha) * F.coalesce("gather", F.lit(0.0)) + F.col("beta")
                ).alias("x"),
                "x_prev",
            )
            .transform(_mat)
        )
        if fixed_iters is None:
            delta = xn.agg(
                F.sqrt(F.sum(F.pow(F.col("x") - F.col("x_prev"), 2)))
            ).first()[0]
            x = xn.select("id", "x")
            if delta is not None and delta < tol:
                converged = True
                break
        else:
            x = xn.select("id", "x")
    adj.unpersist()
    base.unpersist()
    if not converged:
        raise ConvergenceError(
            f"Katz centrality failed to converge within {max_iter} iterations"
        )
    return x.select("id", F.col("x").alias("katz"))


def voterank(g: LinkGraph, num_seeds: int) -> list[int]:
    """Ordered list of elected seed ids (other.rs:82-164).  Driver loop of K
    elections; each election is one join+agg job."""
    n = g.num_vertices()
    if n == 0 or num_seeds <= 0:
        return []
    deg = g.degrees()
    avg_degree = (
        deg.agg(F.avg("in_deg" if g.directed else "deg")).first()[0] or 0.0
    )
    decay = 1.0 / avg_degree if avg_degree > 0 else 0.0

    votes = g.symmetric_edges().select("src", "dst").repartition("src").cache()
    # out-neighbors of an elected node lose ability (neighbors() follows
    # outgoing edges on a directed petgraph, other.rs:152-161)
    out_nbrs = (g.edges if g.directed else votes).select("src", "dst")
    ability = g.vertices.select(
        "id", F.lit(1.0).alias("ability"), F.lit(False).alias("selected")
    ).transform(_mat)
    elected: list[int] = []
    for _ in range(min(num_seeds, n)):
        score = (
            ability.alias("a")
            .join(votes.alias("e"), F.col("a.id") == F.col("e.src"))
            .select(F.col("e.dst").alias("id"), F.col("a.ability").alias("ab"))
            .groupBy("id")
            .agg(F.sum("ab").alias("score"))
        )
        best = (
            ability.where(~F.col("selected"))
            .join(score, "id", "left")
            .select("id", F.coalesce("score", F.lit(0.0)).alias("score"))
            .orderBy(F.desc("score"), F.asc("id"))
            .limit(1)
            .first()
        )
        if best is None or best["score"] <= 0.0:
            break
        b = best["id"]
        elected.append(b)
        nbrs = out_nbrs.where(F.col("src") == b).select(F.col("dst").alias("id")).distinct()
        ability = (
            ability.join(nbrs.withColumn("is_nbr", F.lit(True)), "id", "left")
            .select(
                "id",
                F.when(F.col("id") == b, 0.0)
                .when(
                    F.col("is_nbr"), F.greatest(F.col("ability") - decay, F.lit(0.0))
                )
                .otherwise(F.col("ability"))
                .alias("ability"),
                (F.col("selected") | (F.col("id") == b)).alias("selected"),
            )
            .transform(_mat)
        )
    votes.unpersist()
    return elected


def laplacian_centrality(g: LinkGraph) -> DataFrame:
    """(id, laplacian) = d² + d + 2·Σ neighbor degrees over the simple
    undirected neighbor structure (other.rs:175-201).

    DELIBERATE DEVIATION for directed graphs: the reference's petgraph
    ``neighbors()``/degree on a digraph follows out-edges only
    (other.rs:175-201), which makes "Laplacian" centrality depend on edge
    orientation.  Laplacian centrality is defined on the graph Laplacian of
    an *undirected* graph (Qi et al. 2012), so this implementation always
    uses the deduped undirected structure — directed inputs are treated as
    their undirected simple projection.  Documented in COVERAGE.md; the
    DuckDB oracle mirrors this module's convention."""
    canon = g.canonical_undirected_edges(dedup=True)
    adj = canon.unionAll(
        canon.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = adj.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("d"))
    nbr_sum = (
        adj.join(deg.select(F.col("id").alias("dst"), F.col("d").alias("nd")), "dst")
        .groupBy(F.col("src").alias("id"))
        .agg(F.sum("nd").alias("nbr_deg_sum"))
    )
    return (
        g.vertices.select("id")
        .join(deg, "id", "left")
        .join(nbr_sum, "id", "left")
        .select(
            "id",
            (
                F.coalesce("d", F.lit(0)) * F.coalesce("d", F.lit(0))
                + F.coalesce("d", F.lit(0))
                + 2.0 * F.coalesce("nbr_deg_sum", F.lit(0))
            ).cast("double").alias("laplacian"),
        )
    )
