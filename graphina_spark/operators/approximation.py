"""Approximation family: maximal independent set, maximal matching,
vertex cover, large clique — the distributed members of the reference's
approximation module.

Reference surface: /root/reference/src/approximation/ —
``maximum_independent_set`` (independent_set.rs:7-30, greedy ascending-degree
scan), ``min_maximal_matching`` (matching.rs:7-21, greedy edge scan),
``min_weighted_vertex_cover`` (vertex_cover.rs:22-80, greedy max-degree
heap), ``large_clique_size`` (clique.rs:80+).

Those greedy scans are inherently sequential (each pick depends on every
prior pick), so the distributed re-expressions keep the *problem contract*
(a valid maximal independent set / maximal matching / vertex cover / clique)
while swapping the schedule for the classic parallel algorithms:

``maximal_independent_set``
    Luby's algorithm (Luby 1986): every active vertex draws a deterministic
    per-round priority; a vertex joins the MIS when its priority beats every
    active neighbor's.  Winners' neighborhoods deactivate.  O(log n) rounds
    w.h.p., each round two shuffles (neighbor-min + anti-join).

``maximal_matching``
    Luby on the line graph, computed edge-wise (Israeli-Itai style): an edge
    is matched when its priority is the minimum among all active edges at
    BOTH endpoints; matched endpoints drop out.  O(log n) rounds w.h.p.

``vertex_cover``
    Endpoints of a maximal matching — the textbook distributed 2-approximation
    (Gavril).  Deliberate deviation from the reference's sequential
    max-degree heuristic (ln-degree-factor guarantee): same problem, better
    worst-case ratio, and it parallelizes.  Documented in COVERAGE.md.

``large_clique``
    The reference's greedy shape kept, distributed per round: repeatedly add
    the candidate vertex with the highest candidate-restricted degree
    (deterministic id tie-break), then intersect candidates with its
    neighborhood.  O(clique size) rounds; per round one aggregation over the
    shrinking candidate subgraph — the only driver-side value is the 1-row
    argmax, metadata-scale.

Determinism & gating: priorities come from the same portable
affine+double-quadratic integer hash family as the ANF sketch
(operators/distmetrics.py), so every round is bit-reproducible and the
DuckDB oracles (oracles.py::mis_web_sql etc.) unroll the identical rounds.
``rounds=None`` runs to convergence; the gated queries pass a fixed round
count probed past convergence at gate scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphina_spark.graph import LinkGraph
from graphina_spark.operators.distmetrics import ANF_P
from graphina_spark.plans.materialize import local_materialize as _mat

#: per-round multiplier pair for the priority hash (distinct from ANF_A/B so
#: sketch and MIS priorities are independent streams)
PRI_A1 = 1_000_003
PRI_A2 = 97_561
PRI_B = 7_919


def _priority(id_col: F.Column, r: int) -> F.Column:
    """Deterministic unique per-(vertex, round) priority key.  Affine in
    (id, round) then two quadratic scrambles mod P (breaks the
    arithmetic-progression regularity a pure affine map leaves — see
    distmetrics._init_registers), finally disambiguated by id so no two
    vertices ever tie: key = h * 2^31 + id < 2^62."""
    h1 = (id_col + 1) * F.lit(PRI_A1) + F.lit(r * PRI_A2 + PRI_B)
    h1 = h1 % F.lit(ANF_P)
    h2 = (h1 * h1 + F.lit(PRI_A1)) % F.lit(ANF_P)
    h3 = (h2 * h2 + F.lit(PRI_A2)) % F.lit(ANF_P)
    return h3 * F.lit(2_147_483_648) + id_col


def _undirected_adj(g: LinkGraph) -> DataFrame:
    """Both-direction deduped neighbor pairs, self-loops dropped (a
    self-loop vertex can never enter an independent set's conflict check
    against itself in the reference either — petgraph neighbors() yields it,
    excluding it from MIS; we keep such vertices eligible like isolated
    ones, matching the reference's HashSet-of-neighbors behavior where a
    self-loop marks the vertex 'used' only after it is already chosen)."""
    e = g.edges.select("src", "dst").where(F.col("src") != F.col("dst"))
    return (
        e.unionAll(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .repartition("src")
    )


def _vertex_pri(v: int, r: int) -> int:
    """Python twin of _priority for the MIS local tail finish."""
    h1 = ((v + 1) * PRI_A1 + (r * PRI_A2 + PRI_B)) % ANF_P
    h2 = (h1 * h1 + PRI_A1) % ANF_P
    h3 = (h2 * h2 + PRI_A2) % ANF_P
    return h3 * 2_147_483_648 + v


def _simulate_mis(active: set, adj: dict, r: int) -> list:
    """Synchronous Luby rounds on the driver — same priorities and winner
    rule as the distributed loop, so the hybrid output is identical."""
    mis = []
    while active:
        pri = {v: _vertex_pri(v, r) for v in active}
        winners = [
            v for v in active
            if all(pri[v] < pri[u] for u in adj.get(v, ()) if u in active)
        ]
        mis.extend(winners)
        killed = set(winners)
        for v in winners:
            killed.update(u for u in adj.get(v, ()) if u in active)
        active -= killed
        r += 1
    return mis


#: below this many active vertices the MIS fixpoint finishes on the driver
LOCAL_FINISH_VERTICES = 5_000


def maximal_independent_set(
    g: LinkGraph,
    rounds: int | None = None,
    local_finish: int = LOCAL_FINISH_VERTICES,
) -> DataFrame:
    """(id) rows of a maximal independent set (Luby).  ``rounds=None`` runs
    until no active vertex remains; a fixed ``rounds`` executes exactly that
    many rounds (oracle mode — the result is independent-but-possibly-not-
    maximal if under-provisioned).

    Fixpoint mode hands the tail to a driver-local replay of the identical
    rule below ``local_finish`` active vertices (0 disables); output is
    bit-identical to the pure-distributed run, pinned by tests."""
    adj = _undirected_adj(g).cache()
    active = g.vertices.select("id").transform(_mat)
    spark = active.sparkSession
    mis_rounds: list = []
    r = 0
    while rounds is None or r < rounds:
        if rounds is not None and r >= rounds:
            break
        if rounds is None:
            n_active = active.count()
            if n_active == 0:
                break
            if n_active <= local_finish:
                act = {row["id"] for row in active.collect()}
                nbrs: dict = {}
                for row in (
                    adj.join(active.withColumnRenamed("id", "src"), "src")
                    .join(active.withColumnRenamed("id", "dst"), "dst")
                    .collect()
                ):
                    nbrs.setdefault(row["src"], set()).add(row["dst"])
                local = _simulate_mis(act, nbrs, r)
                if local:
                    mis_rounds.append(
                        spark.createDataFrame([(v,) for v in local], "id long")
                    )
                break
        pri = active.select("id", _priority(F.col("id"), r).alias("pri"))
        nbr_min = (
            adj.join(pri.withColumnRenamed("id", "dst"), "dst")
            .join(active.select(F.col("id").alias("src")), "src")
            .groupBy(F.col("src").alias("id"))
            .agg(F.min("pri").alias("nmin"))
        )
        winners = (
            pri.join(nbr_min, "id", "left")
            .where(F.col("nmin").isNull() | (F.col("pri") < F.col("nmin")))
            .select("id")
            .transform(_mat)
        )
        # winners is already materialized; accumulate frames and union once
        # at the end instead of re-checkpointing the growing set every round
        mis_rounds.append(winners)
        killed = (
            adj.join(winners.withColumnRenamed("id", "src"), "src")
            .select(F.col("dst").alias("id"))
            .unionAll(winners)
            .distinct()
        )
        active = active.join(killed, "id", "left_anti").transform(_mat)
        r += 1
    adj.unpersist()
    mis = spark.createDataFrame([], "id long")
    for w_df in mis_rounds:
        mis = mis.unionAll(w_df)
    return mis


def _matching_pri(src: int, dst: int, r: int) -> int:
    """Python twin of the edge priority (fold + _priority) — used by the
    local tail finish, bit-identical to the distributed expression."""
    folded = (src * 1_000_000_007 + dst) % ANF_P
    h1 = ((folded + 1) * PRI_A1 + (r * PRI_A2 + PRI_B)) % ANF_P
    h2 = (h1 * h1 + PRI_A1) % ANF_P
    h3 = (h2 * h2 + PRI_A2) % ANF_P
    return h3 * 2_147_483_648 + folded


def _simulate_matching(edges: list, r: int) -> list:
    """Synchronous Israeli-Itai rounds on the driver — the exact rule the
    distributed loop applies (same priorities, same (pri, src, dst)
    tie-break), so the hybrid result is identical to the pure-distributed
    trajectory."""
    active = list(edges)
    matched = []
    while active:
        best: dict = {}
        for s, d in active:
            key = (_matching_pri(s, d, r), s, d)
            for v in (s, d):
                if v not in best or key < best[v]:
                    best[v] = key
        winners = [(s, d) for s, d in active
                   if best[s][1:] == (s, d) and best[d][1:] == (s, d)]
        if not winners:
            r += 1
            continue
        hit = {v for e in winners for v in e}
        matched.extend(winners)
        active = [e for e in active if e[0] not in hit and e[1] not in hit]
        r += 1
    return matched


#: below this many active edges the fixpoint loop finishes on the driver —
#: the tail rounds are each a handful of Spark jobs over a few hundred rows,
#: all fixed overhead (same thresholded-local-finish precedent as the
#: Borůvka merge in operators/mst.py).  5k edges is driver-trivial at any
#: scale while leaving the bulk rounds genuinely distributed
LOCAL_FINISH_EDGES = 5_000


def maximal_matching(
    g: LinkGraph, rounds: int | None = None, local_finish: int = LOCAL_FINISH_EDGES
) -> DataFrame:
    """(src, dst) rows of a maximal matching: per round an edge is matched
    iff its priority is the minimum among active edges at both endpoints
    (Israeli-Itai / Luby-on-line-graph).

    In fixpoint mode (``rounds=None``) the loop hands the active set to a
    driver-local replay of the identical rule once it shrinks below
    ``local_finish`` edges (0 disables) — output is bit-identical to the
    pure-distributed run, pinned by tests."""
    canon = (
        g.edges.select(
            F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    active = canon.transform(_mat)
    spark = active.sparkSession
    matched_rounds: list = []
    r = 0
    while True:
        if rounds is not None and r >= rounds:
            break
        if rounds is None:
            n_active = active.count()
            if n_active == 0:
                break
            if n_active <= local_finish:
                local = _simulate_matching(
                    [(row["src"], row["dst"]) for row in active.collect()], r
                )
                if local:
                    matched_rounds.append(
                        spark.createDataFrame(local, "src long, dst long")
                    )
                break
        # edge priority: fold the undirected pair mod P first so no
        # intermediate exceeds 62 bits (DuckDB BIGINT arithmetic is checked).
        # The fold can collide, so the winner rule is NOT raw min-priority:
        # an edge wins when it ranks FIRST at both endpoints under the total
        # order (pri, src, dst) — collision-proof and engine-portable.
        # Physical shape: per-endpoint argmin as min(struct(pri, src, dst))
        # — a map-side-combinable aggregation (one partial+final hash agg)
        # instead of a window row_number, which would full-sort every
        # endpoint partition per round.  The argmin struct carries the
        # winning edge itself, so "first at BOTH endpoints" is a second tiny
        # count-2 aggregation over |V| argmin rows — no join back to edges.
        folded = (F.col("src") * F.lit(1_000_000_007) + F.col("dst")) % F.lit(ANF_P)
        pri = active.select(
            "src", "dst", F.struct(_priority(folded, r).alias("pri"), "src", "dst").alias("key")
        )
        byv = pri.select(F.col("src").alias("v"), "key").unionAll(
            pri.select(F.col("dst").alias("v"), "key")
        )
        bestv = byv.groupBy("v").agg(F.min("key").alias("m"))
        winners = (
            bestv.select(F.col("m.src").alias("src"), F.col("m.dst").alias("dst"))
            .groupBy("src", "dst")
            .agg(F.count("*").alias("c"))
            .where(F.col("c") == 2)
            .select("src", "dst")
            .transform(_mat)
        )
        matched_rounds.append(winners)
        mv = (
            winners.select(F.col("src").alias("v"))
            .unionAll(winners.select(F.col("dst").alias("v")))
            .distinct()
        )
        active = (
            active.join(mv.withColumnRenamed("v", "src"), "src", "left_anti")
            .join(mv.withColumnRenamed("v", "dst"), "dst", "left_anti")
            .select("src", "dst")
            .transform(_mat)
        )
        r += 1
    matched = spark.createDataFrame([], "src long, dst long")
    for w_df in matched_rounds:
        matched = matched.unionAll(w_df)
    return matched


def vertex_cover(g: LinkGraph, rounds: int | None = None) -> DataFrame:
    """(id) rows: both endpoints of a maximal matching — the distributed
    2-approximation of minimum vertex cover (every edge has ≥1 endpoint
    matched by maximality; ≤ 2·OPT since OPT must hit every matched edge)."""
    m = maximal_matching(g, rounds=rounds)
    return (
        m.select(F.col("src").alias("id"))
        .unionAll(m.select(F.col("dst").alias("id")))
        .distinct()
    )


def large_clique(g: LinkGraph, max_rounds: int = 64) -> DataFrame:
    """(id) rows of a greedily-grown clique (clique.rs:80+ contract: a fast
    lower-bound witness, not the maximum).  Each round picks the candidate
    with the highest candidate-restricted degree (ties → smaller id) and
    intersects candidates with its neighborhood."""
    adj = _undirected_adj(g).cache()
    cand = g.vertices.select("id").transform(_mat)
    members: list[int] = []
    for _ in range(max_rounds):
        deg = (
            adj.join(cand.withColumnRenamed("id", "src"), "src")
            .join(cand.withColumnRenamed("id", "dst"), "dst")
            .groupBy(F.col("src").alias("id"))
            .agg(F.count("*").alias("deg"))
        )
        pick = (
            cand.join(deg, "id", "left")
            .select("id", F.coalesce("deg", F.lit(0)).alias("deg"))
            .orderBy(F.desc("deg"), F.asc("id"))
            .limit(1)
            .collect()
        )
        if not pick:
            break
        chosen = pick[0]["id"]
        members.append(chosen)
        cand = (
            adj.where(F.col("src") == chosen)
            .select(F.col("dst").alias("id"))
            .join(cand, "id")
            .where(F.col("id") != chosen)
            .transform(_mat)
        )
    adj.unpersist()
    spark = g.vertices.sparkSession
    return spark.createDataFrame([(int(v),) for v in members], "id long")


def densest_subgraph(
    g: LinkGraph, epsilon: float = 0.1, rounds: int | None = None
) -> DataFrame:
    """(id) rows of a 2(1+ε)-approximate densest subgraph.

    Reference: greedy min-degree peeling (subgraph.rs:8-60) removes ONE
    vertex per step — O(V) sequential rounds.  The distributed counterpart
    (Bahmani-Kumar-Vassilvitskii, VLDB'12) peels EVERY vertex whose
    within-set degree ≤ 2(1+ε)·ρ(S) each round: O(log n / ε) rounds, the
    density trajectory brackets the optimum within 2(1+ε).  Deliberate
    schedule deviation, same problem contract; documented in COVERAGE.md.

    Per round the driver reads two scalars (|E(S)|, |S|) — metadata, not
    data.  ``rounds=None`` peels until empty; a fixed ``rounds`` caps the
    unrolled schedule (oracle mode).  Ties in best density go to the
    earliest round in both engines.
    """
    canon = (
        g.edges.select(
            F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .cache()
    )
    thr_factor = 2.0 * (1.0 + epsilon)
    s = g.vertices.select("id").transform(_mat)
    best_df, best_rho, r = None, -1.0, 0
    while rounds is None or r <= rounds:
        e_in = (
            canon.join(s.withColumnRenamed("id", "src"), "src")
            .join(s.withColumnRenamed("id", "dst"), "dst")
        )
        counts = e_in.agg(F.count("*").alias("m")).crossJoin(
            s.agg(F.count("*").alias("n"))
        ).first()
        m, n = counts["m"], counts["n"]
        if n == 0:
            break
        rho = m / n
        if rho > best_rho:
            best_rho, best_df = rho, s
        if m == 0:
            break
        deg = (
            e_in.select(F.col("src").alias("id"))
            .unionAll(e_in.select(F.col("dst").alias("id")))
            .groupBy("id")
            .agg(F.count("*").alias("deg"))
        )
        s = (
            s.join(deg, "id", "left")
            .where(F.coalesce("deg", F.lit(0)) > F.lit(thr_factor) * F.lit(rho))
            .select("id")
            .transform(_mat)
        )
        r += 1
    canon.unpersist()
    if best_df is None:
        return g.vertices.select("id").limit(0)
    return best_df


def ramsey_r2(g: LinkGraph, rounds: int | None = None) -> DataFrame:
    """(id, kind) rows: the greedy clique witness (kind='clique') and the
    Luby MIS (kind='independent_set') — ramsey.rs:5-12's pairing of its
    clique and independent-set approximations.  ``rounds`` fixes both
    sub-schedules (oracle mode)."""
    cl = large_clique(g, max_rounds=rounds if rounds is not None else 64)
    mis = maximal_independent_set(g, rounds=rounds)
    return cl.select("id", F.lit("clique").alias("kind")).unionAll(
        mis.select("id", F.lit("independent_set").alias("kind"))
    )


def clique_removal(
    g: LinkGraph, max_cliques: int = 8, clique_rounds: int = 64
) -> DataFrame:
    """(round, id) rows: greedily find a large clique, remove its vertices,
    repeat (clique.rs:57-77 contract, bounded to ``max_cliques`` rounds —
    the reference runs to exhaustion, O(V) sequential rounds at web scale).
    Each round is :func:`large_clique` on the induced remaining subgraph;
    rounds after exhaustion are no-ops."""
    remaining = g.vertices.select("id").transform(_mat)
    spark = remaining.sparkSession
    out = spark.createDataFrame([], "round int, id long")
    for r in range(max_cliques):
        if remaining.isEmpty():
            break
        sub = LinkGraph(
            vertices=remaining,
            edges=g.edges.join(remaining.withColumnRenamed("id", "src"), "src")
            .join(remaining.withColumnRenamed("id", "dst"), "dst")
            .select("src", "dst", "weight"),
            directed=g.directed,
        )
        cl = large_clique(sub, max_rounds=clique_rounds)
        if cl.isEmpty():
            break
        out = out.unionAll(
            cl.select(F.lit(r).alias("round"), "id")
        ).transform(_mat)
        remaining = remaining.join(cl, "id", "left_anti").transform(_mat)
    return out
