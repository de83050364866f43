"""Bounded-subgraph EXACT lane — the reference's inherently sequential /
dense algorithms, run driver-local on a size-guarded collected subgraph.

Reference surface re-expressed here:
- DFS / IDDFS visitation orders   /root/reference/src/traversal/algorithms.rs:119-161,200-217
- Floyd–Warshall all-pairs        /root/reference/src/core/paths.rs:548-603
- Johnson all-pairs (neg. edges)  /root/reference/src/core/paths.rs:617-698
- A* single-pair path             /root/reference/src/core/paths.rs:465-532

Why a driver-local lane is the honest 100 TB design: these algorithms are
either inherently sequential (a DFS visitation ORDER is a total order
produced by one stack; A* is one priority queue guided by a heuristic) or
dense O(V²)–O(V³) (FW/Johnson materialize all-pairs output, which at
web scale is 10²⁴ rows — no cluster materializes that).  Every realistic
use runs them on a BOUNDED subgraph (an ego-net, a component, a filtered
slice), so the operators here take a LinkGraph, size-guard it
(:class:`InterchangeSizeError`, the sources/serialization.py:44 pattern —
the error message points to the distributed operators for bigger inputs),
collect it once, run the textbook sequential algorithm, and return a
DataFrame.  The distributed operators (paths.py / distmetrics.py) remain
the scale path for distances; this lane exists for exact parity with the
reference's bounded-graph semantics.

Determinism contract: neighbor iteration is ascending by vertex id
(petgraph visits in insertion order, which is not reproducible from a
DataFrame edge set; ascending id is the canonical deterministic total
order used repo-wide for tie-breaks).
"""

from __future__ import annotations

import heapq

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphina_spark.graph import LinkGraph
from graphina_spark.sources.serialization import InterchangeSizeError

DEFAULT_MAX_VERTICES = 20_000
DENSE_MAX_VERTICES = 4_096  # FW/Johnson: O(V²) output, O(V³) work


def _collect_graph(
    g: LinkGraph, max_vertices: int, op: str
) -> tuple[list[int], list[tuple[int, int, float]]]:
    """(sorted vertex ids, (src, dst, weight) triples) — guarded collect."""
    n = g.vertices.count()
    if n > max_vertices:
        raise InterchangeSizeError(
            f"{op}: {n} vertices exceeds the driver-local bound "
            f"{max_vertices}; run on a bounded subgraph "
            "(operators/subgraphs.py) or use the distributed distance "
            "operators (operators/paths.py)"
        )
    ids = sorted(r["id"] for r in g.vertices.select("id").collect())
    edges = [
        (r["src"], r["dst"], float(r["weight"]))
        for r in g.symmetric_edges().select("src", "dst", "weight").collect()
    ]
    return ids, edges


def _adj_sorted(
    ids: list[int], edges: list[tuple[int, int, float]], weighted: bool
) -> dict[int, list]:
    adj: dict[int, list] = {u: [] for u in ids}
    if weighted:
        best: dict[tuple[int, int], float] = {}
        for u, v, w in edges:
            if u in adj and v in adj:
                k = (u, v)
                if k not in best or w < best[k]:
                    best[k] = w
        for (u, v), w in sorted(best.items()):
            adj[u].append((v, w))
    else:
        seen = set()
        for u, v, _ in edges:
            if u in adj and v in adj and (u, v) not in seen:
                seen.add((u, v))
                adj[u].append(v)
        for u in adj:
            adj[u].sort()
    return adj


def dfs_preorder(
    g: LinkGraph, source: int, max_vertices: int = DEFAULT_MAX_VERTICES
) -> DataFrame:
    """(ord: int, id: long) — DFS first-visit order from ``source``,
    neighbors ascending by id (traversal/algorithms.rs:119-161; petgraph's
    ``Dfs``, with the deterministic neighbor order documented above)."""
    ids, edges = _collect_graph(g, max_vertices, "dfs_preorder")
    adj = _adj_sorted(ids, edges, weighted=False)
    order: list[int] = []
    seen = set()
    stack = [int(source)]
    while stack:
        u = stack.pop()
        if u in seen or u not in adj:
            continue
        seen.add(u)
        order.append(u)
        # push reversed so the smallest neighbor is popped (visited) first
        for v in reversed(adj[u]):
            if v not in seen:
                stack.append(v)
    spark = g.vertices.sparkSession
    return spark.createDataFrame(
        [(i, u) for i, u in enumerate(order)], "ord int, id long"
    )


def iddfs_order(
    g: LinkGraph,
    source: int,
    max_depth: int,
    max_vertices: int = DEFAULT_MAX_VERTICES,
) -> DataFrame:
    """(ord: int, id: long, depth: int) — iterative-deepening DFS
    (traversal/algorithms.rs:200-217): depth-limited DFS at limits
    0..max_depth; a vertex is recorded the first time ANY pass reaches it,
    with the limit of that pass as ``depth`` (= its shortest-path depth,
    the IDDFS guarantee).  ``ord`` is the global first-visit order across
    passes — within a depth ring, DFS visit order of the first pass that
    reached it."""
    ids, edges = _collect_graph(g, max_vertices, "iddfs_order")
    adj = _adj_sorted(ids, edges, weighted=False)
    order: list[tuple[int, int]] = []
    recorded = set()
    src = int(source)
    if src not in adj:
        return g.vertices.sparkSession.createDataFrame(
            [], "ord int, id long, depth int"
        )
    for limit in range(max_depth + 1):
        # depth-limited DFS; re-visits within one pass allowed via shorter
        # depth (textbook DLS), recording only globally-new vertices
        best_depth: dict[int, int] = {}
        stack = [(src, 0)]
        while stack:
            u, d = stack.pop()
            if u in best_depth and best_depth[u] <= d:
                continue
            best_depth[u] = d
            if u not in recorded:
                recorded.add(u)
                order.append((u, limit))
            if d < limit:
                for v in reversed(adj[u]):
                    stack.append((v, d + 1))
        if len(recorded) == len(adj):
            break
    return g.vertices.sparkSession.createDataFrame(
        [(i, u, d) for i, (u, d) in enumerate(order)],
        "ord int, id long, depth int",
    )


def floyd_warshall(
    g: LinkGraph, max_vertices: int = DENSE_MAX_VERTICES
) -> DataFrame:
    """(src, dst, dist) — exact all-pairs shortest distances, Floyd–Warshall
    (paths.rs:548-603).  Handles negative edge weights; raises ValueError on
    a negative cycle (negative diagonal).  Unreachable pairs absent;
    diagonal present at 0.  Vectorized numpy triple loop (one n×n
    broadcast-min per pivot)."""
    import numpy as np

    ids, edges = _collect_graph(g, max_vertices, "floyd_warshall")
    n = len(ids)
    spark = g.vertices.sparkSession
    if n == 0:
        return spark.createDataFrame([], "src long, dst long, dist double")
    pos = {u: i for i, u in enumerate(ids)}
    d = np.full((n, n), np.inf)
    np.fill_diagonal(d, 0.0)
    for u, v, w in edges:
        i, j = pos[u], pos[v]
        if w < d[i, j]:
            d[i, j] = w
    for k in range(n):
        d = np.minimum(d, d[:, k : k + 1] + d[k : k + 1, :])
    if (np.diag(d) < 0).any():
        raise ValueError("floyd_warshall: negative cycle detected")
    out = [
        (ids[i], ids[j], float(d[i, j]))
        for i, j in zip(*np.isfinite(d).nonzero())
    ]
    return spark.createDataFrame(out, "src long, dst long, dist double")


def johnson(
    g: LinkGraph, max_vertices: int = DENSE_MAX_VERTICES
) -> DataFrame:
    """(src, dst, dist) — Johnson all-pairs shortest distances
    (paths.rs:617-698): Bellman–Ford from a virtual source for the h
    potential, re-weight w' = w + h(u) − h(v) ≥ 0, then Dijkstra per
    source, un-reweighted on output.  Supports negative edges; raises
    ValueError on a negative cycle.  Same output contract as
    :func:`floyd_warshall` (the two are cross-checked in tests)."""
    ids, edges = _collect_graph(g, max_vertices, "johnson")
    spark = g.vertices.sparkSession
    if not ids:
        return spark.createDataFrame([], "src long, dst long, dist double")
    # Bellman–Ford h-potential from a virtual source connected to all
    h = {u: 0.0 for u in ids}
    for _ in range(len(ids)):
        changed = False
        for u, v, w in edges:
            if h[u] + w < h[v] - 1e-15:
                h[v] = h[u] + w
                changed = True
        if not changed:
            break
    else:
        raise ValueError("johnson: negative cycle detected")
    adj = _adj_sorted(ids, edges, weighted=True)
    out = []
    for s in ids:
        dist = {s: 0.0}
        pq = [(0.0, s)]
        while pq:
            du, u = heapq.heappop(pq)
            if du > dist.get(u, float("inf")):
                continue
            for v, w in adj[u]:
                nd = du + (w + h[u] - h[v])  # reweighted, ≥ 0
                if nd < dist.get(v, float("inf")) - 1e-15:
                    dist[v] = nd
                    heapq.heappush(pq, (nd, v))
        out.extend(
            (s, v, float(dv - h[s] + h[v])) for v, dv in dist.items()
        )
    return spark.createDataFrame(out, "src long, dst long, dist double")


def ida_star_path(
    g: LinkGraph,
    source: int,
    target: int,
    heuristic=None,
    max_vertices: int = DEFAULT_MAX_VERTICES,
    max_bound: float = 1e18,
) -> DataFrame:
    """(step, id, dist) — iterative-deepening A* (paths.rs' IDA* sibling of
    :func:`astar_path`): depth-first search bounded by an f-threshold,
    threshold raised to the smallest overflowing f each round.  Same
    optimality contract as A* under an admissible heuristic — the two are
    pinned equal in tests; memory is O(path) instead of O(frontier)."""
    ids, edges = _collect_graph(g, max_vertices, "ida_star_path")
    if any(w < 0 for _, _, w in edges):
        raise ValueError("ida_star_path requires non-negative edge weights")
    adj = _adj_sorted(ids, edges, weighted=True)
    spark = g.vertices.sparkSession
    src, tgt = int(source), int(target)
    empty = spark.createDataFrame([], "step int, id long, dist double")
    if src not in adj or tgt not in adj:
        return empty
    h = heuristic if heuristic is not None else (lambda _u: 0.0)

    bound = float(h(src))
    while bound <= max_bound:
        next_bound = float("inf")
        # iterative DFS: stack of (vertex, g-cost, path-so-far)
        stack = [(src, 0.0, [src])]
        while stack:
            u, du, path = stack.pop()
            f = du + float(h(u))
            if f > bound + 1e-12:
                if f < next_bound:
                    next_bound = f
                continue
            if u == tgt:
                cum, acc = 0.0, [(0, path[0], 0.0)]
                wmap = {}
                for a, b, w in edges:
                    k = (a, b)
                    if k not in wmap or w < wmap[k]:
                        wmap[k] = w
                for i, v in enumerate(path[1:], 1):
                    cum += wmap[(path[i - 1], v)]
                    acc.append((i, v, cum))
                return spark.createDataFrame(
                    acc, "step int, id long, dist double"
                )
            for v, w in reversed(adj[u]):
                if v not in path:  # no revisits along one path
                    stack.append((v, du + w, path + [v]))
        if next_bound == float("inf"):
            return empty
        bound = next_bound
    return empty


def astar_path(
    g: LinkGraph,
    source: int,
    target: int,
    heuristic=None,
    max_vertices: int = DEFAULT_MAX_VERTICES,
) -> DataFrame:
    """(step, id, dist) — one optimal source→target path by A*
    (paths.rs:465-532).  ``heuristic`` is a callable id → float; it must be
    admissible (never overestimate) for optimality — the caller's contract,
    exactly as in the reference.  ``None`` means h ≡ 0 (Dijkstra order).
    Empty frame when unreachable.  Requires non-negative weights."""
    ids, edges = _collect_graph(g, max_vertices, "astar_path")
    if any(w < 0 for _, _, w in edges):
        raise ValueError("astar_path requires non-negative edge weights")
    adj = _adj_sorted(ids, edges, weighted=True)
    spark = g.vertices.sparkSession
    src, tgt = int(source), int(target)
    empty = spark.createDataFrame([], "step int, id long, dist double")
    if src not in adj or tgt not in adj:
        return empty
    h = heuristic if heuristic is not None else (lambda _u: 0.0)
    dist = {src: 0.0}
    pred: dict[int, int] = {}
    # tie-break on (f, g-dist, id) for full determinism
    pq = [(float(h(src)), 0.0, src)]
    closed = set()
    while pq:
        _f, du, u = heapq.heappop(pq)
        if u in closed:
            continue
        if u == tgt:
            break
        closed.add(u)
        for v, w in adj[u]:
            nd = du + w
            # equal-distance pred tie-break only while v is open: once v
            # closes its pred freezes, which provably rules out mutual
            # pred cycles via 0-weight edges (the chain loop below would
            # otherwise spin forever on valid input)
            if nd < dist.get(v, float("inf")) - 1e-15 or (
                v not in closed
                and nd == dist.get(v)
                and pred.get(v, v) > u
            ):
                dist[v] = nd
                pred[v] = u
                heapq.heappush(pq, (nd + float(h(v)), nd, v))
    if tgt not in dist:
        return empty
    chain = [tgt]
    while chain[-1] != src:
        chain.append(pred[chain[-1]])
    chain.reverse()
    return spark.createDataFrame(
        [(i, u, float(dist[u])) for i, u in enumerate(chain)],
        "step int, id long, dist double",
    )


def kruskal_msf(
    g: LinkGraph, max_vertices: int = DEFAULT_MAX_VERTICES
) -> DataFrame:
    """(src, dst, weight) — minimum spanning forest by Kruskal
    (mst/algorithms.rs:295-360) under the repo-wide (weight, src, dst)
    total-order tie-break.  A total order makes the MSF UNIQUE, so Kruskal,
    Prim and the distributed Borůvka (operators/mst.py) all return the
    identical edge set (pinned in tests) — the exact-lane mirror of the
    gated msf contract.  Canonical undirected projection: a < b pairs,
    min weight per pair, self-loops dropped."""
    ids, edges = _collect_graph(g, max_vertices, "kruskal_msf")
    best: dict[tuple[int, int], float] = {}
    for u, v, w in edges:
        if u == v:
            continue
        k = (min(u, v), max(u, v))
        if k not in best or w < best[k]:
            best[k] = w
    parent = {u: u for u in ids}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    chosen = []
    for (a, b), w in sorted(best.items(), key=lambda kv: (kv[1], kv[0])):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
            chosen.append((a, b, w))
    return g.vertices.sparkSession.createDataFrame(
        chosen, "src long, dst long, weight double"
    )


def prim_msf(
    g: LinkGraph, max_vertices: int = DEFAULT_MAX_VERTICES
) -> DataFrame:
    """(src, dst, weight) — minimum spanning forest by Prim
    (mst/algorithms.rs:367-440), heap keyed by the same (weight, src, dst)
    total order, run from the min-id vertex of each component: returns the
    same unique forest as :func:`kruskal_msf`."""
    ids, edges = _collect_graph(g, max_vertices, "prim_msf")
    adj: dict[int, list] = {u: [] for u in ids}
    best: dict[tuple[int, int], float] = {}
    for u, v, w in edges:
        if u == v:
            continue
        k = (min(u, v), max(u, v))
        if k not in best or w < best[k]:
            best[k] = w
    for (a, b), w in best.items():
        adj[a].append((b, w))
        adj[b].append((a, w))
    seen: set[int] = set()
    chosen = []
    for root in ids:
        if root in seen:
            continue
        seen.add(root)
        pq = [(w, min(root, v), max(root, v), v) for v, w in adj[root]]
        heapq.heapify(pq)
        while pq:
            w, a, b, v = heapq.heappop(pq)
            if v in seen:
                continue
            seen.add(v)
            chosen.append((a, b, w))
            for x, wx in adj[v]:
                if x not in seen:
                    heapq.heappush(pq, (wx, min(v, x), max(v, x), x))
    chosen.sort(key=lambda t: (t[2], t[0], t[1]))
    return g.vertices.sparkSession.createDataFrame(
        chosen, "src long, dst long, weight double"
    )


def greedy_tsp(
    g: LinkGraph,
    start: int,
    partial: bool = False,
    max_vertices: int = DEFAULT_MAX_VERTICES,
) -> DataFrame:
    """(step, id, leg_dist) — greedy TSP tour (approximation/tsp.rs:10-92):
    from the current vertex, hop to the NEAREST unvisited vertex by
    shortest-path distance (Dijkstra metric, ties broken by min id), repeat.
    ``leg_dist`` is that shortest-path distance (0 for the start row).

    The reference errors when an unvisited vertex is unreachable, and its
    tour_cost closes the loop via shortest-path distance too (tsp.rs
    tour_cost computes every leg, including the closing one, by Dijkstra) —
    so it errors on the close only when no path back to start exists
    (infinite tour cost), which this code matches.  ``partial=True``
    instead stops the tour at the last reachable vertex (the gate contract
    on an arbitrary induced subgraph).  The closing return-to-start leg is
    appended only when every vertex was visited and the start is reachable
    from the last stop."""
    ids, edges = _collect_graph(g, max_vertices, "greedy_tsp")
    if any(w < 0 for _, _, w in edges):
        raise ValueError("greedy_tsp requires non-negative edge weights")
    adj = _adj_sorted(ids, edges, weighted=True)
    spark = g.vertices.sparkSession
    if int(start) not in adj:
        raise ValueError(f"start vertex {start} not in graph")
    if len(ids) < 2:
        raise ValueError("greedy_tsp needs at least two vertices")

    def dij(s: int) -> dict[int, float]:
        dist = {s: 0.0}
        pq = [(0.0, s)]
        while pq:
            du, u = heapq.heappop(pq)
            if du > dist.get(u, float("inf")):
                continue
            for v, w in adj[u]:
                nd = du + w
                if nd < dist.get(v, float("inf")) - 1e-15:
                    dist[v] = nd
                    heapq.heappush(pq, (nd, v))
        return dist

    cur = int(start)
    tour = [(0, cur, 0.0)]
    unvisited = set(ids) - {cur}
    while unvisited:
        dist = dij(cur)
        cand = [(dist[v], v) for v in unvisited if v in dist]
        if not cand:
            if partial:
                break
            raise ValueError("greedy_tsp: unreachable unvisited vertex")
        dmin, nxt = min(cand)
        tour.append((len(tour), nxt, float(dmin)))
        unvisited.discard(nxt)
        cur = nxt
    if not unvisited:
        dist = dij(cur)
        if int(start) in dist:
            tour.append((len(tour), int(start), float(dist[int(start)])))
        elif not partial:
            raise ValueError("greedy_tsp: cannot close the tour")
    return spark.createDataFrame(tour, "step int, id long, leg_dist double")


def treewidth_decomposition(
    g: LinkGraph,
    heuristic: str = "min_degree",
    max_vertices: int = DEFAULT_MAX_VERTICES,
) -> DataFrame:
    """(step, id, deg_at_elim) — elimination order + per-step degree from
    the treewidth elimination game (approximation/treewidth.rs:33-160
    ``min_degree``, :199+ ``min_fill_in``): repeatedly eliminate the vertex
    minimizing the heuristic key (ties by min id), turning its neighborhood
    into a clique (fill-in edges).  The treewidth upper bound is
    ``max(deg_at_elim)``.  Works on the simple undirected projection."""
    if heuristic not in ("min_degree", "min_fill_in"):
        raise ValueError(f"unknown heuristic {heuristic!r}")
    ids, edges = _collect_graph(g, max_vertices, "treewidth_decomposition")
    nbr: dict[int, set] = {u: set() for u in ids}
    for u, v, _ in edges:
        if u != v:
            nbr[u].add(v)
            nbr[v].add(u)

    def fill_in(u: int) -> int:
        ns = list(nbr[u])
        return sum(
            1
            for i in range(len(ns))
            for j in range(i + 1, len(ns))
            if ns[j] not in nbr[ns[i]]
        )

    out = []
    step = 0
    while nbr:
        if heuristic == "min_degree":
            u = min(nbr, key=lambda x: (len(nbr[x]), x))
        else:
            u = min(nbr, key=lambda x: (fill_in(x), x))
        ns = sorted(nbr[u])
        out.append((step, u, len(ns)))
        step += 1
        for i, a in enumerate(ns):
            for b in ns[i + 1 :]:
                nbr[a].add(b)
                nbr[b].add(a)
        for a in ns:
            nbr[a].discard(u)
        del nbr[u]
    return g.vertices.sparkSession.createDataFrame(
        out, "step int, id long, deg_at_elim int"
    )
