"""Shortest-path distances — multi-source frontier BFS and weighted
Bellman–Ford relaxation, as public (source, id, dist) APIs.

Reference surface: /root/reference/src/core/paths.rs — Dijkstra
(:201-270), SPFA/Bellman–Ford (:393-444), all-pairs BFS lengths
(:724-760).  Oracle corpus: tests/oracle_tests.rs:70-181.

The reference's priority-queue Dijkstra is inherently sequential; the
distributed reformulation keeps the *result contract* (exact shortest
distances from each source, out-edge direction on digraphs, +∞ →
row-absent for unreachable targets) while swapping the schedule:

``bfs_distances``
    Level-synchronous multi-source BFS over (source, id) pairs.  Each
    superstep expands only the newest frontier (delta optimization) and
    anti-joins the seen set — O(diameter) rounds, each one shuffle keyed
    by vertex id.  State is |sources| × |reached| rows, so at web scale
    callers pass a bounded source set (landmarks, seeds) — the same
    contract as the reference's per-source calls, batched.

``sssp_distances``
    Weighted Bellman–Ford with a *changed-only* frontier (the classic
    SPFA delta schedule, paths.rs:393-444): relax out-edges of vertices
    whose distance improved last round, min-combine map-side, converge
    when no row improves.  Non-negative weights (validated like the
    reference's Dijkstra); O(weighted-hop-diameter) rounds.

Both run to convergence with per-superstep materialization
(plans/materialize.py) so plan depth stays O(1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphina_spark.graph import LinkGraph
from graphina_spark.plans.materialize import local_materialize as _mat


def _adjacency(g: LinkGraph, weighted: bool) -> DataFrame:
    cols = ["src", "dst", "weight"] if weighted else ["src", "dst"]
    adj = g.symmetric_edges().select(*cols)
    if weighted:
        # parallel edges: keep the lightest, like a min-relaxation would
        adj = adj.groupBy("src", "dst").agg(F.min("weight").alias("weight"))
    else:
        adj = adj.distinct()
    return adj.repartition("src")


def bfs_distances(
    g: LinkGraph, sources: DataFrame, max_depth: int | None = None
) -> DataFrame:
    """(source: long, id: long, dist: int) — minimal hop count from each
    source (a 1-column ``id`` frame) to every vertex it reaches within
    ``max_depth`` hops (unbounded when None).  Unreachable pairs are absent
    (the reference returns None there, paths.rs:724-760)."""
    adj = _adjacency(g, weighted=False).cache()
    seen = (
        sources.select(F.col("id").alias("source"))
        .distinct()
        .select("source", F.col("source").alias("id"), F.lit(0).alias("dist"))
        .transform(_mat)
    )
    frontier = seen
    depth = 0
    while max_depth is None or depth < max_depth:
        depth += 1
        nxt = (
            frontier.join(adj, frontier["id"] == adj["src"])
            .select("source", F.col("dst").alias("id"))
            .distinct()
            .join(seen.select("source", "id"), ["source", "id"], "left_anti")
            .withColumn("dist", F.lit(depth))
            .transform(_mat)
        )
        if nxt.isEmpty():
            break
        seen = seen.unionAll(nxt).transform(_mat)
        frontier = nxt
    adj.unpersist()
    return seen


def sssp_distances(
    g: LinkGraph, sources: DataFrame, max_iter: int = 100
) -> DataFrame:
    """(source: long, id: long, dist: double) — exact weighted shortest
    distances from each source along out-edges (Dijkstra contract,
    paths.rs:201-270, delta-frontier schedule).  Raises on negative weights
    (the reference's Dijkstra validation) and on non-convergence."""
    neg = g.edges.where(F.col("weight") < 0).limit(1).count()
    if neg:
        raise ValueError("sssp_distances requires non-negative edge weights")
    adj = _adjacency(g, weighted=True).cache()
    dist = (
        sources.select(F.col("id").alias("source"))
        .distinct()
        .select("source", F.col("source").alias("id"), F.lit(0.0).alias("dist"))
        .transform(_mat)
    )
    frontier = dist
    for _ in range(max_iter):
        cand = (
            frontier.join(adj, frontier["id"] == adj["src"])
            .select(
                "source",
                F.col("dst").alias("id"),
                (F.col("dist") + F.col("weight")).alias("dist"),
            )
            .groupBy("source", "id")
            .agg(F.min("dist").alias("dist"))
        )
        merged = (
            dist.select("source", "id", "dist", F.lit(0).alias("new"))
            .unionAll(cand.select("source", "id", "dist", F.lit(1).alias("new")))
            .groupBy("source", "id")
            .agg(
                F.min_by(F.struct("dist", "new"), F.struct("dist", "new")).alias("m")
            )
            .select("source", "id", F.col("m.dist").alias("dist"), F.col("m.new").alias("new"))
            .transform(_mat)
        )
        frontier = merged.where(F.col("new") == 1).select("source", "id", "dist")
        dist = merged.select("source", "id", "dist")
        if frontier.isEmpty():
            adj.unpersist()
            return dist
    raise RuntimeError(f"sssp_distances did not converge in {max_iter} rounds")


def shortest_path_tree(
    g: LinkGraph,
    sources: DataFrame,
    weighted: bool = True,
    max_depth: int | None = None,
    max_iter: int = 100,
) -> DataFrame:
    """(source, id, dist, pred) — shortest distances PLUS a predecessor
    column giving one shortest path per reached vertex: ``pred`` is the
    minimum vertex id u such that dist(u) + w(u, id) = dist(id) (hop +1 in
    the unweighted case).  Source rows carry ``pred = -1``.

    The reference's Dijkstra/Bellman-Ford return per-source distance maps
    (paths.rs:201-270, :393-444) and its A* returns an actual path
    (paths.rs:465-532); this is the batch contract that serves both — the
    tree is the full "show me the chain of links" answer for every
    destination at once, and :func:`shortest_path` extracts one chain.

    Pred is computed POST-HOC from the converged distances (one equality
    join, one min-agg — no per-round state), so it is deterministic under
    any superstep schedule: the candidate set {u : dist(u)+w = dist(v)} is
    a pure function of the final distances.  Following pred strictly
    decreases dist (weights are validated > 0 in the weighted case), so
    the chain always terminates at the source.  Integer-valued double
    weights keep the equality join bit-exact across engines."""
    if weighted:
        nonpos = g.edges.where(F.col("weight") <= 0).limit(1).count()
        if nonpos:
            raise ValueError(
                "shortest_path_tree(weighted=True) requires strictly "
                "positive edge weights (pred chains must descend)"
            )
        dist = sssp_distances(g, sources, max_iter=max_iter)
        adj = _adjacency(g, weighted=True)
        step = F.col("u.dist") + F.col("e.weight")
    else:
        dist = bfs_distances(g, sources, max_depth=max_depth)
        adj = _adjacency(g, weighted=False)
        step = F.col("u.dist") + F.lit(1)
    dist = dist.transform(_mat)
    preds = (
        dist.alias("u")
        .join(adj.alias("e"), F.col("u.id") == F.col("e.src"))
        .select(
            F.col("u.source").alias("_s"),
            F.col("e.dst").alias("_v"),
            F.col("e.src").alias("cand"),
            step.alias("reach"),
        )
        .join(
            dist.alias("d"),
            (F.col("_s") == F.col("d.source"))
            & (F.col("_v") == F.col("d.id"))
            & (F.col("reach") == F.col("d.dist")),
        )
        .groupBy(F.col("_s").alias("source"), F.col("_v").alias("id"))
        .agg(F.min("cand").alias("pred"))
    )
    return (
        dist.join(preds, ["source", "id"], "left")
        .select(
            "source", "id", "dist",
            F.coalesce("pred", F.lit(-1)).cast("long").alias("pred"),
        )
    )


def shortest_path(
    g: LinkGraph,
    source: int,
    target: int | None = None,
    weighted: bool = True,
    max_depth: int | None = None,
    max_iter: int = 100,
) -> DataFrame:
    """(step, id, dist) — ONE shortest path source→target as an ordered
    vertex chain (step 0 = source); empty frame when target is unreachable.
    ``target=None`` picks the farthest reachable vertex (max dist, max id
    tie-break) — a deterministic "longest interesting chain" probe.

    The chain extraction is a metadata-sized backward walk over the
    shortest-path tree (the connectivity.py:27 pattern): O(path length)
    1-row lookups against the cached tree — the tree computation is the
    distributed work, the walk touches ~diameter rows."""
    spark = g.vertices.sparkSession
    src_df = spark.createDataFrame([(int(source),)], "id long")
    tree = shortest_path_tree(
        g, src_df, weighted=weighted, max_depth=max_depth, max_iter=max_iter
    ).transform(_mat)
    if target is None:
        far = tree.orderBy(F.desc("dist"), F.desc("id")).limit(1).first()
        if far is None:
            return spark.createDataFrame([], "step int, id long, dist double")
        target = far["id"]
    row = tree.where(F.col("id") == int(target)).first()
    if row is None:
        return spark.createDataFrame([], "step int, id long, dist double")
    chain = [(int(row["id"]), float(row["dist"]))]
    cur, pred = int(row["id"]), int(row["pred"])
    while pred != -1:
        r = tree.where(F.col("id") == pred).first()
        cur, pred = int(r["id"]), int(r["pred"])
        chain.append((cur, float(r["dist"])))
    chain.reverse()
    return spark.createDataFrame(
        [(i, vid, d) for i, (vid, d) in enumerate(chain)],
        "step int, id long, dist double",
    )


def all_pairs_bfs_lengths(g: LinkGraph, max_depth: int | None = None) -> DataFrame:
    """All-pairs hop distances (paths.rs:724-760).  State is O(V × reached):
    exact but quadratic — intended for subgraphs/samples; at web scale use
    ``bfs_distances`` with a landmark source set."""
    return bfs_distances(g, g.vertices.select("id"), max_depth=max_depth)


def eccentricity(
    g: LinkGraph, sources: DataFrame, max_depth: int | None = None
) -> DataFrame:
    """(source, n_reached, eccentricity) — per-source BFS eccentricity
    restricted to the reachable set (graph_metrics.rs:40-98 computes the
    same per-vertex max-BFS-depth quantity inside diameter/radius; this is
    the per-source readout for a *sampled* source set, the honest web-scale
    contract — all-sources eccentricity is the documented diameter non-goal,
    served by the ANF sketch in operators/distmetrics.py).

    ``n_reached`` counts the source itself; a source with no out-edges has
    eccentricity 0.  One groupBy over the multi-source BFS frontier table —
    the BFS dominates, the readout is map-side-combinable.  DuckDB twin:
    oracles.py::eccentricity_web_sql.
    """
    d = bfs_distances(g, sources, max_depth=max_depth)
    return d.groupBy("source").agg(
        F.count("*").alias("n_reached"),
        F.max("dist").cast("long").alias("eccentricity"),
    )


def bidirectional_distance(
    g: LinkGraph, pairs: DataFrame, max_rounds: int = 8
) -> DataFrame:
    """(s, t, dist) — exact directed shortest-path length for a batch of
    (s, t) query pairs by meet-in-the-middle BFS (the distributed batch form
    of the reference's bidirectional search, traversal/algorithms.rs:365-509
    ``bidis`` / :511 ``try_bidirectional_search``).  Unreachable pairs (or
    pairs farther than 2·max_rounds) are absent.

    Batch factoring — the part that makes this scale: the two cones are
    keyed by DISTINCT source and DISTINCT target, never by pair.  One
    forward multi-source BFS from the |S| distinct sources (out-edges, depth
    ≤ max_rounds), one backward multi-source BFS from the |T| distinct
    targets (reversed edges — db(v) = dist(v→t)), then one meet join on the
    vertex id with min(df+db) per requested pair.  State is
    (|S| + |T|) × reach rows instead of |S|·|T| × reach (a per-pair frontier
    walks the same cone |T| times and OOMs at sf0.1 — measured, hence this
    shape); the meet join streams through a map-side partial min keyed by
    the ≤ |S|·|T| result pairs.  Any s→t path of length L ≤ 2·max_rounds
    splits as df + db with both halves ≤ max_rounds, so the cap is exact.
    DuckDB twin: oracles.py::st_dist_web_sql (one-sided unroll — semantics,
    not schedule).
    """
    p = pairs.select(
        F.col("s").cast("long").alias("s"), F.col("t").cast("long").alias("t")
    ).distinct().transform(_mat)
    srcs = p.select(F.col("s").alias("id")).distinct()
    tgts = p.select(F.col("t").alias("id")).distinct()
    fwd = bfs_distances(g, srcs, max_depth=max_rounds)
    rev = LinkGraph(
        vertices=g.vertices,
        edges=g.edges.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"
        ),
        directed=g.directed,
    )
    bwd = bfs_distances(rev, tgts, max_depth=max_rounds)
    meet = (
        fwd.select(F.col("source").alias("s"), "id", F.col("dist").alias("df"))
        .join(
            bwd.select(F.col("source").alias("t"), "id", F.col("dist").alias("db")),
            "id",
        )
        .groupBy("s", "t")
        .agg(F.min(F.col("df") + F.col("db")).alias("dist"))
    )
    return (
        meet.join(p, ["s", "t"], "left_semi")
        .select("s", "t", F.col("dist").cast("long").alias("dist"))
    )


def temporal_earliest_arrival(
    tedges: DataFrame,
    sources: DataFrame,
    start_t: int = 0,
    fixed_rounds: int | None = None,
    max_iter: int = 100,
) -> DataFrame:
    """(source, id, arrive) — earliest-arrival TIME-RESPECTING reachability
    (Wu et al., *Path Problems in Temporal Graphs*, VLDB 2014): a path is
    valid iff successive edge times are non-decreasing, an edge (u, v, t)
    is traversable from u iff t ≥ arrival(u), and arrival via that edge is
    t itself.  Answers the crawl-provenance question "given the observed
    crawl timestamps, could content have propagated from A to B?" — plain
    reachability over-counts by ignoring time order.

    ``tedges`` = (src, dst, t) with integer times (all arithmetic integer
    ⇒ bit-exact across engines); sources start at ``start_t`` (their own
    ``arrive`` in the output).  Earliest arrival is optimal to propagate
    (any later-arriving copy can use a subset of the departures), so the
    delta-frontier min-relaxation schedule of :func:`sssp_distances`
    transfers unchanged: one frontier×edges join + two min-aggs per round,
    frontier = improved rows only, O(rounds) shuffles, nothing quadratic.
    ``fixed_rounds=R`` is the unrolled-oracle contract."""
    e = tedges.select(
        F.col("src").cast("long"), F.col("dst").cast("long"),
        F.col("t").cast("long"),
    ).cache()
    arr = (
        sources.select(F.col("id").cast("long").alias("source"))
        .distinct()
        .select(
            "source", F.col("source").alias("id"),
            F.lit(start_t).cast("long").alias("arrive"),
        )
        .transform(_mat)
    )
    frontier = arr
    rounds = fixed_rounds if fixed_rounds is not None else max_iter
    for r in range(rounds):
        cand = (
            frontier.join(e, frontier["id"] == e["src"])
            .where(F.col("t") >= F.col("arrive"))
            .select("source", F.col("dst").alias("id"), F.col("t").alias("arrive"))
            .groupBy("source", "id")
            .agg(F.min("arrive").alias("arrive"))
        )
        merged = (
            arr.select("source", "id", "arrive", F.lit(0).alias("new"))
            .unionAll(cand.select("source", "id", "arrive", F.lit(1).alias("new")))
            .groupBy("source", "id")
            .agg(
                F.min_by(
                    F.struct("arrive", "new"), F.struct("arrive", "new")
                ).alias("m")
            )
            .select(
                "source", "id", F.col("m.arrive").alias("arrive"),
                F.col("m.new").alias("new"),
            )
            .transform(_mat)
        )
        frontier = merged.where(F.col("new") == 1).select("source", "id", "arrive")
        arr = merged.select("source", "id", "arrive")
        if fixed_rounds is None and frontier.isEmpty():
            break
    else:
        if fixed_rounds is None:
            raise RuntimeError(
                f"temporal_earliest_arrival did not converge in {max_iter} rounds"
            )
    e.unpersist()
    return arr
