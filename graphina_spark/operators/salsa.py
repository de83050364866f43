"""SALSA — Stochastic Approach for Link-Structure Analysis (Lempel &
Moran, WWW 2000).

Not in the reference (graphina has no SALSA); added as a first-class web
link-graph kernel alongside HITS/PageRank: SALSA's hub/authority chains are
the standard degree-normalized alternative to HITS (used in production link
analysis, e.g. Twitter WTF, Goel et al. 2013) and converge to
degree-proportional stationary mass per component instead of HITS's
principal-eigenvector concentration.

Semantics (weighted, deterministic, fixed-point).  Two Markov chains over
the directed edge set, each step a backward+forward (authority chain) or
forward+backward (hub chain) two-hop with weight-proportional transitions:

    authority chain:  u(h)  = Σ_{i: h→i} a(i)  · w(h,i)/w_in(i)
                      a'(j) = Σ_{h: h→j} u(h)  · w(h,j)/w_out(h)
    hub chain:        x(i)  = Σ_{g: g→i} h(g)  · w(g,i)/w_out(g)
                      h'(f) = Σ_{f: f→i} x(i)  · w(f,i)/w_in(i)

with L1 normalization after every full step and init a = h = 1/n.
Undirected graphs symmetrize first (like HITS).  ``fixed_iters`` runs an
exact number of rounds so the DuckDB oracle (oracles.salsa_web_sql) can
unroll the identical trajectory.

Scale shape: the two backward/forward transition weights are precomputed
ONCE as normalized edge columns (wn_in = w/w_in(dst), wn_out = w/w_out(src))
on a cached, src/dst-partitioned edge frame; each half-step is then one
edge⋈vector join + one map-side-combined sum — the same superstep envelope
as PageRank/HITS/eigenvector, one shuffle per half-step, no Python in the
loop.  Every vector materializes per round via ``local_materialize`` to keep
lineage flat (plans/materialize.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphina_spark.graph import LinkGraph
from graphina_spark.operators.centrality import ConvergenceError
from graphina_spark.plans.materialize import local_materialize as _mat


def salsa(
    g: LinkGraph,
    max_iter: int = 100,
    tol: float = 1e-8,
    fixed_iters: int | None = None,
) -> DataFrame:
    """(id, hub, authority) — L1-normalized SALSA scores.

    ``fixed_iters`` disables the convergence check and runs exactly that
    many rounds (oracle-twin mode).  Otherwise iterates until the L1 delta
    of the authority vector drops below ``tol``; raises
    :class:`ConvergenceError` at ``max_iter`` (the reference's convention
    for its own iterative centralities, eigenvector.rs:141-146)."""
    n = g.vertices.count()
    if n == 0:
        raise ValueError("empty graph")
    if (fixed_iters is not None and fixed_iters < 1) or max_iter < 1:
        raise ValueError("need at least one iteration")
    edges = (g.edges if g.directed else g.symmetric_edges()).select(
        "src", "dst", "weight"
    )
    win = edges.groupBy("dst").agg(F.sum("weight").alias("w_in"))
    wout = edges.groupBy("src").agg(F.sum("weight").alias("w_out"))
    # normalized transition columns, computed once outside the loop
    en = (
        edges.join(win, "dst")
        .join(wout, "src")
        .select(
            "src",
            "dst",
            (F.col("weight") / F.col("w_in")).alias("wn_in"),
            (F.col("weight") / F.col("w_out")).alias("wn_out"),
        )
        .repartition("src")
        .cache()
    )
    en.count()  # materialize the cache before the loop

    verts = g.vertices.select("id")
    a = verts.select("id", F.lit(1.0 / n).alias("a")).transform(_mat)
    h = verts.select("id", F.lit(1.0 / n).alias("h")).transform(_mat)

    def _two_hop(vec: DataFrame, col: str, first: str, second: str) -> DataFrame:
        """One chain step: gather ``vec[col]`` backward/forward per the
        (first, second) normalized-weight pair, L1-normalize over verts."""
        mid_key, mid_w = ("src", "wn_in") if first == "back" else ("dst", "wn_out")
        out_key, out_w = ("dst", "wn_out") if second == "fwd" else ("src", "wn_in")
        join_on = "dst" if first == "back" else "src"
        mid = (
            en.join(vec.withColumnRenamed("id", join_on), join_on)
            .groupBy(F.col(mid_key).alias("id"))
            .agg(F.sum(F.col(col) * F.col(mid_w)).alias("m"))
        )
        join_on2 = "src" if second == "fwd" else "dst"
        raw = (
            en.join(mid.withColumnRenamed("id", join_on2), join_on2)
            .groupBy(F.col(out_key).alias("id"))
            .agg(F.sum(F.col("m") * F.col(out_w)).alias("s"))
        )
        nxt = verts.join(raw, "id", "left").select(
            "id", F.coalesce("s", F.lit(0.0)).alias(col)
        )
        nrm = nxt.agg(F.sum(F.abs(F.col(col)))).first()[0] or 1.0
        return nxt.select("id", (F.col(col) / F.lit(nrm)).alias(col)).transform(
            _mat
        )

    iters = fixed_iters if fixed_iters is not None else max_iter
    for it in range(iters):
        new_a = _two_hop(a, "a", "back", "fwd")
        new_h = _two_hop(h, "h", "fwd", "back")
        if fixed_iters is None:
            delta = (
                new_a.alias("n")
                .join(a.alias("o"), "id")
                .agg(F.sum(F.abs(F.col("n.a") - F.col("o.a"))))
                .first()[0]
            )
            a.unpersist()
            h.unpersist()
            a, h = new_a, new_h
            if delta is not None and delta < tol:
                break
        else:
            a.unpersist()
            h.unpersist()
            a, h = new_a, new_h
    else:
        if fixed_iters is None:
            en.unpersist()
            raise ConvergenceError(f"salsa did not converge in {max_iter} iterations")
    en.unpersist()
    return (
        h.join(a, "id")
        .select("id", "h", "a")
        .withColumnsRenamed({"h": "hub", "a": "authority"})
    )
