"""k-truss decomposition — triangle-support edge peeling.

Not in the reference; added as the standard cohesive-subgraph refinement of
k-core for link graphs (Cohen 2008, "Trusses: cohesive subgraphs for social
network analysis"): the k-truss is the maximal subgraph in which every edge
closes at least k-2 triangles *within the subgraph*.  Communities survive
trussing; tree-like crawl fringe does not.

Kernel (synchronous peeling, exact — peel order does not matter):

    repeat: support(e) = #triangles through e in the surviving subgraph
            drop every edge with support < k-2

Per round the triangle enumeration uses degree-ordered orientation (rank =
(deg, id); every triangle found exactly once at its lowest-ranked wedge) —
the same hub-skew bound as operators/triangles.py: wedge fan-out per vertex
is capped by its oriented out-degree = O(√E) on any graph, so a 10⁶-degree
hub never materializes d² wedges.  Each round is therefore two self-joins +
one explode + one partial-agg count over the *surviving* edge set, which
shrinks monotonically.  ``fixed_rounds`` runs the identical trajectory the
unrolled DuckDB oracle replays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphina_spark.graph import LinkGraph
from graphina_spark.plans.materialize import local_materialize as _mat


def _edge_support(edges: DataFrame, deg: DataFrame | None = None) -> DataFrame:
    """(src, dst, support) for canonical src<dst edges: the number of
    triangles each edge closes, via degree-ordered orientation.

    ``deg`` (id, d) may be passed in (ideally cached) when the caller
    already has the simple-undirected degrees — avoids recomputing the
    union+groupBy once per consumer (the egonet family shares one)."""
    if deg is None:
        deg = (
            edges.select(F.col("src").alias("id"))
            .unionAll(edges.select(F.col("dst").alias("id")))
            .groupBy("id")
            .agg(F.count("*").alias("d"))
        )
    e = (
        edges.join(deg.withColumnRenamed("id", "src"), "src")
        .withColumnRenamed("d", "ds")
        .join(deg.select(F.col("id").alias("dst"), F.col("d").alias("dd")), "dst")
    )
    # orient low rank -> high rank, rank = (deg, id)
    fwd = e.select(
        F.when(
            (F.col("ds") < F.col("dd"))
            | ((F.col("ds") == F.col("dd")) & (F.col("src") < F.col("dst"))),
            F.col("src"),
        ).otherwise(F.col("dst")).alias("lo"),
        F.when(
            (F.col("ds") < F.col("dd"))
            | ((F.col("ds") == F.col("dd")) & (F.col("src") < F.col("dst"))),
            F.col("dst"),
        ).otherwise(F.col("src")).alias("hi"),
    )
    tri = (
        fwd.alias("e1")
        .join(fwd.alias("e2"), F.col("e1.hi") == F.col("e2.lo"))
        .join(
            fwd.alias("e3"),
            (F.col("e3.lo") == F.col("e1.lo")) & (F.col("e3.hi") == F.col("e2.hi")),
        )
        .select(
            F.col("e1.lo").alias("a"), F.col("e1.hi").alias("b"), F.col("e2.hi").alias("c")
        )
    )
    sup = (
        tri.select(
            F.explode(
                F.array(
                    F.struct(
                        F.least("a", "b").alias("src"), F.greatest("a", "b").alias("dst")
                    ),
                    F.struct(
                        F.least("b", "c").alias("src"), F.greatest("b", "c").alias("dst")
                    ),
                    F.struct(
                        F.least("a", "c").alias("src"), F.greatest("a", "c").alias("dst")
                    ),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
        .groupBy("src", "dst")
        .agg(F.count("*").alias("support"))
    )
    return edges.join(sup, ["src", "dst"], "left").select(
        "src", "dst", F.coalesce("support", F.lit(0)).cast("long").alias("support")
    )


def k_truss(
    g: LinkGraph, k: int, fixed_rounds: int | None = None, max_iter: int = 10_000
) -> DataFrame:
    """(src, dst) — canonical edges of the k-truss of the simple undirected
    projection.  k ≥ 2 (the 2-truss is the whole simple graph)."""
    if k < 2:
        raise ValueError("k must be >= 2")
    edges = g.canonical_undirected_edges(dedup=True).transform(_mat)
    n_prev = None
    rounds = fixed_rounds if fixed_rounds is not None else max_iter
    for _ in range(rounds):
        if k == 2:
            break  # every edge trivially has support >= 0
        new = (
            _edge_support(edges)
            .where(F.col("support") >= k - 2)
            .select("src", "dst")
            .transform(_mat)
        )
        n_new = new.count()
        converged = n_prev is not None and n_new == n_prev
        if n_prev is None:
            converged = False
        edges, n_prev = new, n_new
        if fixed_rounds is None and converged:
            break
    return edges


def truss_number(g: LinkGraph, k_max: int = 64) -> DataFrame:
    """(src, dst, truss) — the largest k for which the edge survives in the
    k-truss (trussness).  Computed by successive peeling k = 3, 4, ... until
    the truss empties; O(k_max) full peels, intended for analysis runs, not
    the per-round gate."""
    cur = g.canonical_undirected_edges(dedup=True).transform(_mat)
    spark = cur.sparkSession
    out = spark.createDataFrame([], "src long, dst long, truss long")
    k = 3
    while k <= k_max:
        sub = LinkGraph.from_edges(cur, directed=False)
        nxt = k_truss(sub, k).transform(_mat)
        dropped = cur.join(nxt, ["src", "dst"], "left_anti").select(
            "src", "dst", F.lit(k - 1).cast("long").alias("truss")
        )
        out = out.unionAll(dropped)
        if nxt.isEmpty():
            return out
        cur = nxt
        k += 1
    return out.unionAll(
        cur.select("src", "dst", F.lit(k_max).cast("long").alias("truss"))
    )
