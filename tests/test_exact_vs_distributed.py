"""Cross-lane consistency: the bounded exact lane (operators/exact.py,
driver-local reference semantics) must agree with the DISTRIBUTED
operators wherever their contracts overlap — on random graphs, not just
fixtures.  Any divergence is a bug in one lane's semantics."""

import random

import pytest

from tests.conftest import make_graph


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


@pytest.mark.parametrize("seed", [5, 17])
def test_fw_matches_distributed_sssp(spark, seed):
    """Floyd–Warshall rows from sources S == sssp_distances from S."""
    from graphina_spark.operators.exact import floyd_warshall
    from graphina_spark.operators.paths import sssp_distances

    edges, weights = _rand(seed, 13, 0.22)
    g = make_graph(spark, edges, n=13, directed=True, weights=weights)
    fw = {
        (r["src"], r["dst"]): r["dist"] for r in floyd_warshall(g).collect()
    }
    srcs = spark.createDataFrame([(0,), (5,), (9,)], "id long")
    dist = {
        (r["source"], r["id"]): r["dist"]
        for r in sssp_distances(g, srcs).collect()
    }
    for s in (0, 5, 9):
        fw_s = {t: d for (a, t), d in fw.items() if a == s}
        ds_s = {t: d for (a, t), d in dist.items() if a == s}
        assert fw_s.keys() == ds_s.keys()
        assert all(fw_s[t] == pytest.approx(ds_s[t]) for t in fw_s)


@pytest.mark.parametrize("seed", [3, 29])
def test_dfs_reach_matches_bfs_reach(spark, seed):
    """DFS preorder visits exactly the BFS-reachable set, source first."""
    from graphina_spark.operators.exact import dfs_preorder
    from graphina_spark.operators.paths import bfs_distances

    edges, _ = _rand(seed, 15, 0.15)
    g = make_graph(spark, edges, n=15, directed=True)
    order = dfs_preorder(g, 0).orderBy("ord").collect()
    srcs = spark.createDataFrame([(0,)], "id long")
    reach = {r["id"] for r in bfs_distances(g, srcs).collect()}
    assert [r["id"] for r in order][0] == 0
    assert {r["id"] for r in order} == reach


@pytest.mark.parametrize("seed", [7, 41])
def test_iddfs_depth_matches_bfs_distance(spark, seed):
    from graphina_spark.operators.exact import iddfs_order
    from graphina_spark.operators.paths import bfs_distances

    edges, _ = _rand(seed, 12, 0.18)
    g = make_graph(spark, edges, n=12, directed=True)
    idd = {r["id"]: r["depth"] for r in iddfs_order(g, 0, 12).collect()}
    srcs = spark.createDataFrame([(0,)], "id long")
    bfs = {r["id"]: r["dist"] for r in bfs_distances(g, srcs).collect()}
    assert idd == bfs


@pytest.mark.parametrize("seed", [11, 31])
def test_astar_cost_matches_shortest_path_tree(spark, seed):
    from graphina_spark.operators.exact import astar_path
    from graphina_spark.operators.paths import shortest_path_tree

    edges, weights = _rand(seed, 12, 0.25)
    g = make_graph(spark, edges, n=12, directed=True, weights=weights)
    srcs = spark.createDataFrame([(0,)], "id long")
    tree = {
        r["id"]: r["dist"]
        for r in shortest_path_tree(g, srcs, weighted=True).collect()
    }
    for t in (3, 7, 11):
        p = astar_path(g, 0, t).orderBy("step").collect()
        if t not in tree:
            assert not p
        else:
            assert p[-1]["dist"] == pytest.approx(tree[t])


@pytest.mark.parametrize("seed", [13, 37])
def test_exact_msf_weight_matches_distributed_boruvka(spark, seed):
    from graphina_spark.operators.exact import kruskal_msf
    from graphina_spark.operators.mst import boruvka_msf

    edges, weights = _rand(seed, 16, 0.2, directed=False)
    g = make_graph(spark, edges, n=16, directed=False, weights=weights)
    k = kruskal_msf(g).collect()
    b = boruvka_msf(g).collect()
    assert {(r["src"], r["dst"]) for r in k} == {
        (r["src"], r["dst"]) for r in b
    }
    assert sum(r["weight"] for r in k) == pytest.approx(
        sum(r["weight"] for r in b)
    )
