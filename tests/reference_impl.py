"""Tiny self-contained numpy reference implementations replicating the
Graphina conventions pinned in SURVEY.md §2.1, used as the oracle for the
random-graph corpus tests (the reference's own oracle design:
/root/reference/tests/oracle_centrality_tests.rs replays NetworkX-computed
corpora; ours replays these).

Semantics sources:
- pagerank: /root/reference/src/centrality/pagerank.rs:26-136 (weighted
  out-degree, uniform dangling redistribution, (1-d)/n teleport, L1 tol)
- components: /root/reference/src/community/connected_components.rs:19-117
  (compared as sorted partitions, :219-230)
- triangles: /root/reference/src/parallel/triangles.rs:32-66
- transitivity: /root/reference/src/metrics/graph_metrics.rs:146-215
"""

from __future__ import annotations

from collections import defaultdict


def ref_pagerank(
    n,
    edges,
    weights=None,
    directed=True,
    damping=0.85,
    max_iter=100,
    tol=1e-6,
    nstart=None,
    personalization=None,
    fixed_iters=None,
):
    """edges: list[(u, v)]; returns list of ranks summing to 1."""
    if weights is None:
        weights = [1.0] * len(edges)
    adj = defaultdict(list)  # u -> [(v, w)]
    w_out = [0.0] * n
    for (u, v), w in zip(edges, weights):
        adj[u].append((v, w))
        w_out[u] += w
        if not directed:
            adj[v].append((u, w))
            w_out[v] += w

    if personalization is not None:
        s = sum(personalization)
        p = [x / s for x in personalization] if s > 0 else [1.0 / n] * n
    else:
        p = [1.0 / n] * n

    if nstart is not None:
        s = sum(nstart)
        if s == 0:
            raise ValueError("nstart sums to zero")
        pr = [x / s for x in nstart]
    else:
        pr = [1.0 / n] * n

    iters = fixed_iters if fixed_iters is not None else max_iter
    d = damping
    for _ in range(iters):
        dang = sum(pr[u] for u in range(n) if w_out[u] == 0.0)
        new = [(1.0 - d) * p[i] + d * dang * p[i] for i in range(n)]
        for u in range(n):
            if w_out[u] > 0:
                for v, w in adj[u]:
                    new[v] += d * pr[u] * w / w_out[u]
        delta = sum(abs(a - b) for a, b in zip(new, pr))
        pr = new
        if fixed_iters is None and delta < tol:
            break
    return pr


def ref_components(n, edges):
    """Undirected/WCC components as a sorted partition (list of sorted lists),
    plus per-node min-member labels."""
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
    groups = defaultdict(list)
    for i in range(n):
        groups[find(i)].append(i)
    partition = sorted([sorted(g) for g in groups.values()])
    labels = [0] * n
    for grp in partition:
        m = min(grp)
        for x in grp:
            labels[x] = m
    return partition, labels


def ref_triangles(n, edges):
    """Per-node triangle counts over the simple undirected graph (self-loops
    dropped, parallel edges collapsed)."""
    nbrs = defaultdict(set)
    for u, v in edges:
        if u != v:
            nbrs[u].add(v)
            nbrs[v].add(u)
    tri = [0] * n
    for v in range(n):
        ns = sorted(nbrs[v])
        for i in range(len(ns)):
            for j in range(i + 1, len(ns)):
                if ns[j] in nbrs[ns[i]]:
                    tri[v] += 1
    return tri


def ref_transitivity(n, edges):
    nbrs = defaultdict(set)
    for u, v in edges:
        if u != v:
            nbrs[u].add(v)
            nbrs[v].add(u)
    tri = sum(ref_triangles(n, edges))  # counts each triangle 3x
    triples = sum(len(nbrs[v]) * (len(nbrs[v]) - 1) // 2 for v in range(n))
    return tri / triples if triples > 0 else 0.0


def ref_sync_lpa(n, edges, max_iter=10, fixed_iters=None):
    """Synchronous label propagation with deterministic
    (count desc, label asc) tie-break — OUR pinned semantics (the reference's
    async/seeded-RNG variant, label_propagation.rs:34-97, is not reproducible
    distributedly; its own test only asserts shape)."""
    nbrs = defaultdict(list)
    for u, v in edges:
        nbrs[u].append(v)
        nbrs[v].append(u)
    labels = list(range(n))
    iters = fixed_iters if fixed_iters is not None else max_iter
    for _ in range(iters):
        new = labels[:]
        for v in range(n):
            if not nbrs[v]:
                continue
            counts = defaultdict(int)
            for u in nbrs[v]:
                counts[labels[u]] += 1
            new[v] = min(counts, key=lambda l: (-counts[l], l))
        if new == labels and fixed_iters is None:
            break
        labels = new
    return labels


def ref_degrees(n, edges, directed=True):
    """Raw degree counts; self-loop counts 2 when undirected."""
    deg = [0] * n
    for u, v in edges:
        deg[u] += 1
        deg[v] += 1
    return deg


def random_graph(rng, n, density, directed=False, max_w=10):
    """Seeded ER-style corpus graph (mirrors scripts/gen_oracle_fixtures.py:38-46)."""
    edges, weights = [], []
    for u in range(n):
        for v in range(n):
            if u == v:
                continue
            if not directed and u > v:
                continue
            if rng.random() < density:
                edges.append((u, v))
                weights.append(float(rng.randint(1, max_w)))
    return edges, weights


def ref_scc(n, edges):
    """Kosaraju SCC (iterative), labels canonicalized to min member id —
    mirrors the reference's Tarjan result up to label canonicalization
    (src/community/connected_components.rs:130-139; partitions compared
    sorted, :219-230)."""
    fwd = [[] for _ in range(n)]
    rev = [[] for _ in range(n)]
    for u, v in edges:
        if u != v:
            fwd[u].append(v)
            rev[v].append(u)
    order, seen = [], [False] * n
    for s in range(n):
        if seen[s]:
            continue
        stack = [(s, iter(fwd[s]))]
        seen[s] = True
        while stack:
            node, it = stack[-1]
            adv = False
            for w in it:
                if not seen[w]:
                    seen[w] = True
                    stack.append((w, iter(fwd[w])))
                    adv = True
                    break
            if not adv:
                order.append(node)
                stack.pop()
    comp = [-1] * n
    for s in reversed(order):
        if comp[s] != -1:
            continue
        members, stack = [], [s]
        comp[s] = s
        while stack:
            u = stack.pop()
            members.append(u)
            for w in rev[u]:
                if comp[w] == -1:
                    comp[w] = s
                    stack.append(w)
        m = min(members)
        for u in members:
            comp[u] = m
    return comp


def ref_dijkstra(n, edges, weights, src, directed=True):
    """Weighted shortest distances from src (None = unreachable) —
    paths.rs:201-270 semantics (out-edges on digraphs)."""
    import heapq

    adj = [[] for _ in range(n)]
    for i, (u, v) in enumerate(edges):
        w = float(weights[i]) if weights else 1.0
        adj[u].append((v, w))
        if not directed:
            adj[v].append((u, w))
    dist = [None] * n
    dist[src] = 0.0
    pq = [(0.0, src)]
    while pq:
        d, u = heapq.heappop(pq)
        if d > dist[u]:
            continue
        for v, w in adj[u]:
            nd = d + w
            if dist[v] is None or nd < dist[v]:
                dist[v] = nd
                heapq.heappush(pq, (nd, v))
    return dist


def ref_closeness(n, edges, weights, directed=True):
    """Wasserman-Faust closeness (closeness.rs:46-51)."""
    out = []
    for s in range(n):
        dist = ref_dijkstra(n, edges, weights, s, directed)
        finite = [d for i, d in enumerate(dist) if i != s and d is not None and d > 0]
        sd, r = sum(finite), len(finite)
        out.append((r / sd) * (r / (n - 1.0)) if sd > 0 and n > 1 else 0.0)
    return out


def ref_harmonic(n, edges, weights, directed=True):
    """Sum of reciprocal distances (harmonic.rs:33-41)."""
    out = []
    for s in range(n):
        dist = ref_dijkstra(n, edges, weights, s, directed)
        out.append(
            sum(1.0 / d for i, d in enumerate(dist) if i != s and d is not None and d > 0)
        )
    return out


def ref_betweenness(n, edges, directed=True, normalized=True):
    """Unweighted Brandes (betweenness.rs:41-144)."""
    from collections import deque

    adj = [[] for _ in range(n)]
    for u, v in edges:
        if u == v:
            continue
        adj[u].append(v)
        if not directed:
            adj[v].append(u)
    bc = [0.0] * n
    for s in range(n):
        preds = [[] for _ in range(n)]
        sigma = [0.0] * n
        dist = [-1] * n
        sigma[s], dist[s] = 1.0, 0
        stack, q = [], deque([s])
        while q:
            v = q.popleft()
            stack.append(v)
            for w in adj[v]:
                if dist[w] < 0:
                    dist[w] = dist[v] + 1
                    q.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] += sigma[v]
                    preds[w].append(v)
        delta = [0.0] * n
        while stack:
            w = stack.pop()
            for v in preds[w]:
                delta[v] += sigma[v] / sigma[w] * (1.0 + delta[w])
            if w != s:
                bc[w] += delta[w]
    if normalized:
        if n > 2:
            norm = 1.0 / ((n - 1) * (n - 2))
            bc = [x * norm for x in bc]
    elif not directed:
        bc = [x * 0.5 for x in bc]
    return bc
