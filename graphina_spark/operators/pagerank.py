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
- dangling mass rides the SAME message shuffle as the gather: every dangling
  vertex gets one virtual edge to the sink id ``-1`` with weight 1, so
  ``Σ_{dangling} pr[u]`` pops out as the sink's aggregation group — no
  per-superstep semi-join of the rank vector against a dangling-id set (at
  10^12 vertices that join rebuilds a 10^11-row hash table every
  iteration).  The 1-row sink group is broadcast back into the update
  expression; the gathered frame is cached for the superstep since it is
  read twice (sink extraction + vertex join).  Vertex id ``-1`` is reserved;
- the L1 delta (when ``tol`` is active) is a single-scalar driver aggregate;
- every superstep the rank frame is materialized (parquet checkpoint with
  manifest when a :class:`CheckpointManager` is given, else a
  partitioning-preserving ``localCheckpoint``) so the plan never grows and
  the next gather join is exchange-free (see plans/materialize.py).

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

# Symmetrized-edge count below which pagerank(shards=...) falls back to the
# plain per-edge join (measured crossover region: shards lose at 57k edges,
# win at 64.7M — see BENCH/BASELINE.md; 1M sits safely between).
SHARDS_MIN_EDGES = 1_000_000


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
    shards: "AdjShards | None" = None,
    shards_min_edges: int | None = None,
    stats: dict | None = None,
    one_job_supersteps: bool | None = None,
) -> DataFrame:
    """Return ``(id: long, rank: double)``, Σ rank = 1.

    ``fixed_iters`` runs exactly that many supersteps with no early exit
    (used by the oracle-parity queries, where the DuckDB side is an unrolled
    fixed-iteration SQL).  ``nstart``/``personalization`` are DataFrames
    ``(id, value)`` / ``(id, p)``.  Pass a dict as ``stats`` to receive
    ``{"iterations": k, "delta": last L1 delta}`` — the observability hook
    behind warm-start (incremental recrawl) convergence accounting.
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
        # Auto-select the superstep kernel by edge count: below the
        # crossover the salted-CSR gather's fixed overhead (hub-salt
        # replication join + explode) dominates and the plain per-edge join
        # is faster (sf0.1 bench: 7.2 s sharded vs 4.3 s plain at 57k
        # edges); above it the shard join moves ~|V| rows instead of ~|E|
        # and wins (64.7M-edge scaling harness).  Values are identical
        # either way (both paths are oracle-gated).  Pass
        # ``shards_min_edges=0`` to force the shard kernel (tests,
        # scaling harness at known scale).
        threshold = (
            SHARDS_MIN_EDGES if shards_min_edges is None else shards_min_edges
        )
        if threshold > 0:
            n_edges = shards.wout.agg(F.sum("degree")).first()[0] or 0
            if n_edges < threshold:
                shards = None

    if shards is not None:
        # salted CSR adjacency path (plans/shards.py): the join moves one row
        # per (src, salt) instead of one per edge, and hub scatter is spread
        # across salt rows — the 100 TB layout.  Shards built with
        # dangling_sink=True already carry the virtual sink edges.
        wout = shards.wout.select("src", "w_out")
        edges_norm = None
        sink_in_gather = shards.dangling_sink
    else:
        sym = g.symmetric_edges()
        wout = sym.groupBy("src").agg(F.sum("weight").alias("w_out"))
        # virtual sink edges: one (u, -1, 1.0) row per dangling vertex, so the
        # dangling mass is just one more aggregation group in the gather
        sink_edges = (
            g.vertices.select(F.col("id").alias("src"))
            .join(wout.select("src"), "src", "left_anti")
            .select(
                "src",
                F.lit(-1).cast("long").alias("dst"),
                F.lit(1.0).alias("w_norm"),
            )
        )
        edges_norm = (
            sym.join(wout, "src")
            .select("src", "dst", (F.col("weight") / F.col("w_out")).alias("w_norm"))
            .unionByName(sink_edges)
            .repartition("src")
            .cache()
        )
        sink_in_gather = True

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

    has_dangling = vinfo.where("dangling").limit(1).count() > 0

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
    check_tol = tol is not None and fixed_iters is None
    # One-job supersteps (the default fixed-iteration shape): the dangling
    # scalar is pulled to the driver by the SAME action that executes the
    # gather (a 1-row first() — no separate broadcast-build job), and the
    # per-superstep checkpoint is LAZY, so it materializes inside the next
    # superstep's action instead of its own job.  Halves scheduled jobs per
    # superstep; the arithmetic is bit-identical (the scalar is the same
    # double either way).  Requires the rank frame to be single-use per
    # superstep: true on the sink-edge dangling path (and when there are no
    # dangling vertices), NOT on the semi-join fallback (ranks read twice)
    # or when a delta/convergence join re-reads ranks.
    one_job = (
        checkpoint is None
        and not check_tol
        and (not has_dangling or sink_in_gather)
        if one_job_supersteps is None
        else one_job_supersteps
    )
    prev_gathered = None
    for it in range(start_iter, n_iters):
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
        gathered_cached = None
        dang_lit = None
        if has_dangling and sink_in_gather:
            # dangling mass came down the same shuffle as every other message:
            # the sink group is one aggregation row.  gathered is read twice
            # (sink row + vertex join), so cache it for the step.
            gathered = gathered.cache()
            gathered_cached = gathered
            if one_job:
                # THE superstep action: runs the gather (and the previous
                # iteration's deferred checkpoint), fills the cache, and
                # returns the sink scalar to the driver
                dang_lit = (
                    gathered.where(F.col("id") == -1)
                    .agg(F.coalesce(F.sum("gather"), F.lit(0.0)))
                    .first()[0]
                )
                if prev_gathered is not None:
                    prev_gathered.unpersist()
            else:
                dang_df = gathered.where(F.col("id") == -1).agg(
                    F.coalesce(F.sum("gather"), F.lit(0.0)).alias("dang")
                )
        elif has_dangling:
            # shards built without dangling_sink: per-superstep semi-join
            # against the dangling-id set (the pre-sink fallback shape)
            dang_df = (
                ranks.join(vinfo.where("dangling").select("id"), "id", "left_semi")
                .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dang"))
            )
        # the -1 sink row drops out of the left join below (vinfo has no -1)
        joined = vinfo.join(gathered, "id", "left")
        if has_dangling and dang_lit is not None:
            dang_col = F.lit(d) * F.lit(float(dang_lit)) * F.col("p")
        elif has_dangling:
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

        # Materialize every superstep: eager when the rank frame is
        # referenced twice next iteration (dangling semi-join or delta
        # check — a lazy chain would recompute the history ~2^k times);
        # LAZY on the one-job path, where the next superstep's first()
        # action materializes it.  Either way lineage truncates and plan
        # depth stays O(1) across iterations.
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
            new_ranks = _mat(new_ranks, eager=not one_job)
            if check_tol:
                delta = (
                    new_ranks.alias("a")
                    .join(ranks.alias("b"), "id")
                    .agg(F.sum(F.abs(F.col("a.rank") - F.col("b.rank"))))
                    .first()[0]
                )

        if one_job:
            # gathered cache is still needed by the deferred checkpoint;
            # unpersist it when the NEXT superstep's action has run
            prev_gathered = gathered_cached
        elif gathered_cached is not None:
            gathered_cached.unpersist()
        ranks.unpersist()
        if it == n_iters - 1 and edges_norm is not None:
            edges_norm.unpersist()
        ranks = new_ranks
        if stats is not None:
            stats["iterations"] = it + 1
            stats["delta"] = delta
        if delta is not None and delta < tol:
            break

    if one_job and prev_gathered is not None:
        # force the final deferred checkpoint, then drop the last cache
        ranks.count()
        prev_gathered.unpersist()
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
