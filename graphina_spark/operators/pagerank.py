"""PageRank — weighted power iteration, reference-exact semantics.

Reference: ``graphina::centrality::pagerank::pagerank``
(/root/reference/src/centrality/pagerank.rs:26-136) and the personalized
variant (personalized_pagerank.rs:24-120).  Pinned conventions:

- out-weight ``w_out[u] = Σ w(u,·)`` over the (symmetrized, if undirected)
  edge set (pagerank.rs:50-65; undirected contributes both directions :61-64)
- init uniform ``1/n``, or ``nstart`` L1-normalized (error if Σ=0, :76-80)
- per iteration: dangling mass ``d·Σ_{w_out=0} pr[u]`` redistributed by the
  teleport vector (uniform ``1/n``, or the personalization vector,
  personalized_pagerank.rs:98-107); teleport ``(1-d)·p_i``; neighbor term
  ``d·Σ_{u→v} pr[u]·w(u,v)/w_out[u]`` (:102-115)
- convergence: **L1** ``Σ|pr_new - pr| < tol`` (:117-127); result sums to 1

Spark execution model (per superstep):

- ``edges_norm(src, dst, w_norm)`` is precomputed once, hash-partitioned by
  ``src`` and cached — the join with the rank vector reuses that partitioning
  so only the (much smaller) rank frame shuffles;
- gather = ``groupBy(dst).sum`` benefits from partial (map-side) aggregation,
  so hub vertices receive pre-combined messages, not one row per in-edge;
- dangling mass and the L1 delta are single-scalar aggregates on the driver;
- every ``lineage_cut`` iterations the rank frame is materialized (parquet
  checkpoint with manifest when a :class:`CheckpointManager` is given, else
  ``localCheckpoint``) so the plan never grows past a few supersteps.

At 100 TB scale the plain join is replaced by the salted CSR adjacency-shard
gather in :mod:`graphina_spark.plans.shards` (same semantics, skew-proof);
this module is the semantic reference implementation and the small/medium
path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphina_spark.graph import LinkGraph
from graphina_spark.plans.materialize import local_materialize as _mat
from graphina_spark.plans.checkpoint import CheckpointManager


def pagerank(
    g: LinkGraph,
    damping: float = 0.85,
    max_iter: int = 100,
    tol: float | None = 1e-6,
    nstart: DataFrame | None = None,
    personalization: DataFrame | None = None,
    fixed_iters: int | None = None,
    checkpoint: CheckpointManager | None = None,
    resume: bool = False,
    lineage_cut: int = 5,
    shards: "AdjShards | None" = None,
) -> DataFrame:
    """Return ``(id: long, rank: double)``, Σ rank = 1.

    ``fixed_iters`` runs exactly that many supersteps with no early exit
    (used by the oracle-parity queries, where the DuckDB side is an unrolled
    fixed-iteration SQL).  ``nstart``/``personalization`` are DataFrames
    ``(id, value)`` / ``(id, p)``.
    """
    if not (0.0 < damping < 1.0):
        raise ValueError("damping must be in (0, 1)")  # personalized_pagerank.rs:41-45
    if fixed_iters is None and max_iter <= 0:
        raise ValueError("max_iter must be positive")  # personalized_pagerank.rs:46-50

    spark = g.vertices.sparkSession
    n = g.num_vertices()
    if n == 0:
        return g.vertices.select(F.col("id"), F.lit(0.0).alias("rank"))
    n_iters = fixed_iters if fixed_iters is not None else max_iter

    if shards is not None:
        # salted CSR adjacency path (plans/shards.py): the join moves one row
        # per (src, salt) instead of one per edge, and hub scatter is spread
        # across salt rows — the 100 TB layout
        wout = shards.wout.select("src", "w_out")
        edges_norm = None
    else:
        sym = g.symmetric_edges()
        wout = sym.groupBy("src").agg(F.sum("weight").alias("w_out"))
        edges_norm = (
            sym.join(wout, "src")
            .select("src", "dst", (F.col("weight") / F.col("w_out")).alias("w_norm"))
            .repartition("src")
            .cache()
        )

    # teleport vector p: personalization L1-normalized (uniform fallback when
    # Σ<=0, personalized_pagerank.rs:51-63) else uniform 1/n
    if personalization is not None:
        psum = personalization.agg(F.sum("p")).first()[0] or 0.0
        if psum <= 0:
            pcol = F.lit(1.0 / n)
            personalization = None
        else:
            pcol = F.coalesce(F.col("p") / F.lit(psum), F.lit(0.0))
    else:
        pcol = F.lit(1.0 / n)

    base = g.vertices.select("id")
    if personalization is not None:
        base = base.join(personalization, "id", "left")
    vinfo = (
        base.join(wout.select(F.col("src").alias("id"), "w_out"), "id", "left")
        .select(
            "id",
            (F.coalesce("w_out", F.lit(0.0)) == 0.0).alias("dangling"),
            pcol.alias("p"),
        )
        .repartition("id")
        .cache()
    )

    start_iter = 0
    ranks = None
    if checkpoint is not None and resume:
        found = checkpoint.latest(spark)
        if found is not None:
            start_iter, ranks, _ = found
            start_iter += 1
    if ranks is None:
        if nstart is not None:
            ssum = nstart.agg(F.sum("value")).first()[0] or 0.0
            if ssum == 0:
                raise ValueError("nstart sums to zero")  # pagerank.rs:76-80
            ranks = g.vertices.select("id").join(nstart, "id", "left").select(
                "id", (F.coalesce("value", F.lit(0.0)) / F.lit(ssum)).alias("rank")
            )
        else:
            ranks = g.vertices.select("id", F.lit(1.0 / n).alias("rank"))
    ranks = ranks.transform(_mat)

    d = damping
    dangling_ids = vinfo.where("dangling").select("id").cache()
    has_dangling = dangling_ids.count() > 0
    check_tol = tol is not None and fixed_iters is None
    for it in range(start_iter, n_iters):
        # dangling mass as a 1-row frame folded into the plan (no driver
        # round-trip; broadcast to every task); skipped entirely when the
        # graph has no dangling vertices
        if has_dangling:
            dang_df = (
                ranks.join(dangling_ids, "id", "left_semi")
                .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dang"))
            )
        if shards is not None:
            gathered = shards.gather(ranks, value="rank")
        else:
            gathered = (
                ranks.alias("r")
                .join(edges_norm.alias("e"), F.col("r.id") == F.col("e.src"))
                .select(
                    F.col("e.dst").alias("id"),
                    (F.col("r.rank") * F.col("e.w_norm")).alias("c"),
                )
                .groupBy("id")
                .agg(F.sum("c").alias("gather"))
            )
        joined = vinfo.join(gathered, "id", "left")
        if has_dangling:
            joined = joined.crossJoin(F.broadcast(dang_df))
            dang_col = F.lit(d) * F.col("dang") * F.col("p")
        else:
            dang_col = F.lit(0.0)
        new_ranks = joined.select(
            "id",
            (
                (1.0 - d) * F.col("p")
                + dang_col
                + F.lit(d) * F.coalesce("gather", F.lit(0.0))
            ).alias("rank"),
        )

        # Materialize every superstep: the rank frame is referenced twice next
        # iteration (dangling agg + gather), so a lazy chain recomputes the
        # whole history ~2^k times; eager materialization keeps work linear
        # AND truncates lineage (plan depth stays O(1) across iterations).
        delta = None
        if checkpoint is not None:
            if check_tol:
                nr = new_ranks.transform(_mat)
                delta = (
                    nr.alias("a")
                    .join(ranks.alias("b"), "id")
                    .agg(F.sum(F.abs(F.col("a.rank") - F.col("b.rank"))))
                    .first()[0]
                )
                new_ranks = checkpoint.save(spark, nr, it, delta=delta)
                nr.unpersist()
            else:
                new_ranks = checkpoint.save(spark, new_ranks, it)
        else:
            new_ranks = new_ranks.transform(_mat)
            if check_tol:
                delta = (
                    new_ranks.alias("a")
                    .join(ranks.alias("b"), "id")
                    .agg(F.sum(F.abs(F.col("a.rank") - F.col("b.rank"))))
                    .first()[0]
                )

        ranks.unpersist()
        ranks = new_ranks
        if delta is not None and delta < tol:
            break

    return ranks.select("id", "rank")


def personalized_pagerank(
    g: LinkGraph,
    personalization: DataFrame | None = None,
    damping: float = 0.85,
    tol: float | None = 1e-6,
    max_iter: int = 100,
    **kw,
) -> DataFrame:
    """Facade matching the reference's argument order
    (src/centrality/personalized.rs:15-37)."""
    return pagerank(
        g,
        damping=damping,
        max_iter=max_iter,
        tol=tol,
        personalization=personalization,
        **kw,
    )
