"""Bounded-subgraph exact lane vs pure-Python references.

Reference corpus: /root/reference/src/traversal/algorithms.rs:119-217
(DFS/IDDFS), src/core/paths.rs:548-603 (Floyd–Warshall), :617-698
(Johnson), :465-532 (A*).
"""

import random

import pytest

from tests.conftest import make_graph
from tests.reference_impl import ref_dijkstra


def _rand(seed, n, density, directed=True, wlo=1, whi=9):
    rng = random.Random(seed)
    edges = [
        (u, v)
        for u in range(n)
        for v in range(n)
        if u != v and (directed or u < v) and rng.random() < density
    ]
    weights = [float(rng.randint(wlo, whi)) for _ in edges]
    return edges, weights


def _ref_dfs(n, edges, src):
    adj = [[] for _ in range(n)]
    for u, v in edges:
        adj[u].append(v)
    for a in adj:
        a.sort()
    order, seen = [], set()

    def go(u):
        seen.add(u)
        order.append(u)
        for v in adj[u]:
            if v not in seen:
                go(v)

    go(src)
    return order


def test_dfs_preorder_matches_recursive_reference(spark):
    from graphina_spark.operators.exact import dfs_preorder

    edges, _ = _rand(3, 14, 0.2)
    g = make_graph(spark, edges, n=14, directed=True)
    got = [r["id"] for r in dfs_preorder(g, 0).orderBy("ord").collect()]
    assert got == _ref_dfs(14, edges, 0)


def test_iddfs_depth_equals_bfs_distance(spark):
    from graphina_spark.operators.exact import iddfs_order

    edges = [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4), (1, 0)]
    g = make_graph(spark, edges, n=6, directed=True)
    rows = iddfs_order(g, 0, max_depth=5).collect()
    depth = {r["id"]: r["depth"] for r in rows}
    assert depth == {0: 0, 1: 1, 2: 1, 3: 2, 4: 3}
    # global first-visit order is monotone in depth rings
    ords = sorted(rows, key=lambda r: r["ord"])
    assert [r["depth"] for r in ords] == sorted(r["depth"] for r in rows)


def test_floyd_warshall_matches_dijkstra(spark):
    from graphina_spark.operators.exact import floyd_warshall

    edges, weights = _rand(7, 12, 0.25)
    g = make_graph(spark, edges, n=12, directed=True, weights=weights)
    got = {(r["src"], r["dst"]): r["dist"] for r in floyd_warshall(g).collect()}
    for s in range(12):
        ref = ref_dijkstra(12, edges, weights, s, directed=True)
        for v, d in enumerate(ref):
            if d is None:
                assert (s, v) not in got
            else:
                assert got[(s, v)] == pytest.approx(d)


def test_johnson_negative_weights_matches_floyd_warshall(spark):
    from graphina_spark.operators.exact import floyd_warshall, johnson

    # DAG (u < v edges only) with weights in {-3..4}: negatives, no cycles
    rng = random.Random(11)
    edges = [
        (u, v) for u in range(10) for v in range(u + 1, 10)
        if rng.random() < 0.35
    ]
    weights = [float(rng.randint(-3, 4)) for _ in edges]
    g = make_graph(spark, edges, n=10, directed=True, weights=weights)
    fw = {(r["src"], r["dst"]): r["dist"] for r in floyd_warshall(g).collect()}
    jo = {(r["src"], r["dst"]): r["dist"] for r in johnson(g).collect()}
    assert fw.keys() == jo.keys()
    assert all(fw[k] == pytest.approx(jo[k]) for k in fw)
    assert any(d < 0 for d in fw.values())  # the negatives actually bite


def test_negative_cycle_raises(spark):
    from graphina_spark.operators.exact import floyd_warshall, johnson

    g = make_graph(
        spark, [(0, 1), (1, 2), (2, 0)], n=3, directed=True,
        weights=[1.0, -2.0, -1.0],
    )
    with pytest.raises(ValueError, match="negative cycle"):
        floyd_warshall(g)
    with pytest.raises(ValueError, match="negative cycle"):
        johnson(g)


def test_astar_admissible_heuristic_is_optimal(spark):
    from graphina_spark.operators.exact import astar_path

    # grid-ish line with a shortcut; h = remaining hops (admissible: every
    # edge weight >= 1)
    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (0, 2), (2, 4)]
    weights = [1.0, 1.0, 1.0, 1.0, 3.0, 1.5]
    g = make_graph(spark, edges, n=5, directed=True, weights=weights)
    h = lambda u: float(4 - u) * 0.5
    p = astar_path(g, 0, 4, heuristic=h).orderBy("step").collect()
    assert [r["id"] for r in p][0] == 0 and [r["id"] for r in p][-1] == 4
    assert p[-1]["dist"] == pytest.approx(3.5)  # 0-1-2-4 = 1+1+1.5
    # path edges all exist with the right cumulative cost
    w = {(u, v): weights[i] for i, (u, v) in enumerate(edges)}
    for a, b in zip(p, p[1:]):
        assert (a["id"], b["id"]) in w
        assert b["dist"] == pytest.approx(a["dist"] + w[(a["id"], b["id"])])


def test_astar_unreachable_and_h_zero(spark):
    from graphina_spark.operators.exact import astar_path

    g = make_graph(spark, [(0, 1)], n=3, directed=True, weights=[2.0])
    assert astar_path(g, 0, 2).count() == 0
    p = astar_path(g, 0, 1).collect()
    assert [(r["step"], r["id"], r["dist"]) for r in p] == [(0, 0, 0.0), (1, 1, 2.0)]


def test_size_guard_raises(spark):
    from graphina_spark.operators.exact import dfs_preorder, floyd_warshall
    from graphina_spark.sources.serialization import InterchangeSizeError

    g = make_graph(spark, [(0, 1), (1, 2)], n=5, directed=True)
    with pytest.raises(InterchangeSizeError, match="bound"):
        dfs_preorder(g, 0, max_vertices=3)
    with pytest.raises(InterchangeSizeError, match="bound"):
        floyd_warshall(g, max_vertices=3)


def test_ida_star_matches_astar(spark):
    from graphina_spark.operators.exact import astar_path, ida_star_path

    edges, weights = _rand(19, 10, 0.3)
    g = make_graph(spark, edges, n=10, directed=True, weights=weights)
    for t in (3, 7, 9):
        a = astar_path(g, 0, t).orderBy("step").collect()
        b = ida_star_path(g, 0, t).orderBy("step").collect()
        if not a:
            assert not b
            continue
        # same optimal COST (paths may differ among ties)
        assert b[-1]["dist"] == pytest.approx(a[-1]["dist"])
        assert b[0]["id"] == 0 and b[-1]["id"] == t


def test_kruskal_prim_boruvka_same_forest(spark):
    from graphina_spark.operators.exact import kruskal_msf, prim_msf
    from graphina_spark.operators.mst import boruvka_msf

    edges, weights = _rand(23, 14, 0.25, directed=False)
    g = make_graph(spark, edges, n=14, directed=False, weights=weights)
    k = {(r["src"], r["dst"], r["weight"]) for r in kruskal_msf(g).collect()}
    p = {(r["src"], r["dst"], r["weight"]) for r in prim_msf(g).collect()}
    b = {
        (r["src"], r["dst"], r["weight"]) for r in boruvka_msf(g).collect()
    }
    # total-order tie-break => the forest is unique => all three agree
    assert k == p == b and len(k) > 0
    # forest invariant: |edges| = |vertices in play| - |components|
    verts = {v for e in edges for v in e}
    import collections

    par = {v: v for v in range(14)}

    def find(x):
        while par[x] != x:
            par[x] = par[par[x]]
            x = par[x]
        return x

    for u, v in edges:
        par[find(u)] = find(v)
    ncomp = len({find(v) for v in range(14)})
    assert len(k) == 14 - ncomp


def test_greedy_tsp_visits_all_nearest_first(spark):
    from graphina_spark.operators.exact import greedy_tsp

    # 0-1 (1), 1-2 (1), 0-2 (5), 2-3 (2): from 0 nearest is 1, then 2, then 3
    g = make_graph(
        spark, [(0, 1), (1, 2), (0, 2), (2, 3)], n=4, directed=False,
        weights=[1.0, 1.0, 5.0, 2.0],
    )
    t = greedy_tsp(g, 0).orderBy("step").collect()
    assert [r["id"] for r in t] == [0, 1, 2, 3, 0]
    assert [r["leg_dist"] for r in t] == [0.0, 1.0, 1.0, 2.0, 4.0]


def test_greedy_tsp_partial_and_errors(spark):
    from graphina_spark.operators.exact import greedy_tsp

    g = make_graph(spark, [(0, 1)], n=3, directed=True, weights=[1.0])
    with pytest.raises(ValueError, match="unreachable"):
        greedy_tsp(g, 0)
    t = greedy_tsp(g, 0, partial=True).orderBy("step").collect()
    assert [r["id"] for r in t] == [0, 1]  # vertex 2 unreachable, no close


def test_treewidth_min_degree_known_values(spark):
    from graphina_spark.operators.exact import treewidth_decomposition

    # a 4-cycle has treewidth 2: first elimination (deg 2) fills one chord
    g = make_graph(
        spark, [(0, 1), (1, 2), (2, 3), (3, 0)], n=4, directed=False
    )
    rows = treewidth_decomposition(g, "min_degree").orderBy("step").collect()
    assert [r["id"] for r in rows] == [0, 1, 2, 3]
    assert max(r["deg_at_elim"] for r in rows) == 2
    # a tree has treewidth 1
    g2 = make_graph(spark, [(0, 1), (1, 2), (1, 3)], n=4, directed=False)
    rows2 = treewidth_decomposition(g2, "min_degree").collect()
    assert max(r["deg_at_elim"] for r in rows2) == 1


def test_treewidth_min_fill_in_prefers_chordal_elimination(spark):
    from graphina_spark.operators.exact import treewidth_decomposition

    # K4 minus an edge: min-fill-in eliminates a degree-2 vertex first
    g = make_graph(
        spark, [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3)], n=4, directed=False
    )
    rows = treewidth_decomposition(g, "min_fill_in").orderBy("step").collect()
    assert rows[0]["id"] in (2, 3) and rows[0]["deg_at_elim"] == 2
    assert max(r["deg_at_elim"] for r in rows) == 2


def test_astar_zero_weight_equal_dist_no_pred_cycle(spark):
    # regression: with 0-weight edges both directions between two
    # equal-distance vertices, the equal-dist pred tie-break used to fire
    # for already-closed vertices too, making 2 and 3 each other's
    # predecessor and spinning the chain-reconstruction loop forever
    from graphina_spark.operators.exact import astar_path

    edges = [(10, 2), (10, 3), (2, 3), (3, 2), (3, 7)]
    weights = [1.0, 1.0, 0.0, 0.0, 1.0]
    g = make_graph(spark, edges, weights=weights)
    p = astar_path(g, 10, 7).orderBy("step").collect()
    # deterministic under the (f, g-dist, id) heap + open-only tie-break:
    # 2 closes first, retargets pred[3] to 2 via the 0-weight edge
    assert [r["id"] for r in p] == [10, 2, 3, 7]
    assert [r["dist"] for r in p] == [0.0, 1.0, 1.0, 2.0]
