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
            if nd < dist.get(v, float("inf")) - 1e-15 or (
                nd == dist.get(v) and pred.get(v, v) > u
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
