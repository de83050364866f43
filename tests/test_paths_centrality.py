"""bfs/sssp distances + closeness/harmonic/betweenness vs pure-Python refs.

Reference corpus: /root/reference/tests/oracle_tests.rs:70-181 (paths),
tests/oracle_centrality_tests.rs:50+ (closeness/harmonic/betweenness).
"""

import random

import pytest

from tests.conftest import make_graph
from tests.reference_impl import (
    ref_betweenness,
    ref_closeness,
    ref_dijkstra,
    ref_harmonic,
)


def _rand(seed, n, density, weighted=False, directed=True):
    # undirected: canonical u<v pairs only (duplicate parallel entries would
    # double-count sigma in the Brandes reference)
    rng = random.Random(seed)
    edges = [
        (u, v)
        for u in range(n)
        for v in range(n)
        if u != v and (directed or u < v) and rng.random() < density
    ]
    weights = [float(rng.randint(1, 9)) for _ in edges] if weighted else None
    return edges, weights


def test_bfs_distances_line(spark):
    from graphina_spark.operators.paths import bfs_distances

    g = make_graph(spark, [(0, 1), (1, 2), (2, 3)], n=5, directed=True)
    srcs = spark.createDataFrame([(0,), (3,)], "id long")
    got = {
        (r["source"], r["id"]): r["dist"] for r in bfs_distances(g, srcs).collect()
    }
    assert got == {(0, 0): 0, (0, 1): 1, (0, 2): 2, (0, 3): 3, (3, 3): 0}


def test_bfs_distances_max_depth(spark):
    from graphina_spark.operators.paths import bfs_distances

    g = make_graph(spark, [(0, 1), (1, 2), (2, 3)], n=4, directed=True)
    srcs = spark.createDataFrame([(0,)], "id long")
    got = {r["id"]: r["dist"] for r in bfs_distances(g, srcs, max_depth=2).collect()}
    assert got == {0: 0, 1: 1, 2: 2}


@pytest.mark.parametrize("seed,n,density,directed", [(11, 25, 0.1, True), (12, 20, 0.15, False)])
def test_sssp_matches_dijkstra(spark, seed, n, density, directed):
    from graphina_spark.operators.paths import sssp_distances

    edges, weights = _rand(seed, n, density, weighted=True)
    g = make_graph(spark, edges, n=n, directed=directed, weights=weights)
    srcs = spark.createDataFrame([(i,) for i in range(0, n, 5)], "id long")
    rows = sssp_distances(g, srcs).collect()
    got = {(r["source"], r["id"]): r["dist"] for r in rows}
    for s in range(0, n, 5):
        want = ref_dijkstra(n, edges, weights, s, directed)
        for i in range(n):
            if want[i] is None:
                assert (s, i) not in got
            else:
                assert got[(s, i)] == pytest.approx(want[i])


def test_sssp_rejects_negative_weights(spark):
    from graphina_spark.operators.paths import sssp_distances

    g = make_graph(spark, [(0, 1)], n=2, weights=[-1.0])
    with pytest.raises(ValueError):
        sssp_distances(g, g.vertices.select("id"))


@pytest.mark.parametrize("seed,n,density,directed", [(21, 22, 0.12, True), (22, 18, 0.2, False)])
def test_closeness_harmonic_exact(spark, seed, n, density, directed):
    from graphina_spark.operators.closeness import (
        closeness_centrality,
        harmonic_centrality,
    )

    edges, weights = _rand(seed, n, density, weighted=True)
    g = make_graph(spark, edges, n=n, directed=directed, weights=weights)
    c = {r["id"]: r["closeness"] for r in closeness_centrality(g).collect()}
    h = {r["id"]: r["harmonic"] for r in harmonic_centrality(g).collect()}
    wc = ref_closeness(n, edges, weights, directed)
    wh = ref_harmonic(n, edges, weights, directed)
    for i in range(n):
        assert c[i] == pytest.approx(wc[i]), f"closeness {i}"
        assert h[i] == pytest.approx(wh[i]), f"harmonic {i}"


def test_closeness_subset_scores_match_full(spark):
    from graphina_spark.operators.closeness import closeness_centrality

    edges, weights = _rand(31, 20, 0.15, weighted=True)
    g = make_graph(spark, edges, n=20, directed=True, weights=weights)
    full = {r["id"]: r["closeness"] for r in closeness_centrality(g).collect()}
    subset = spark.createDataFrame([(0,), (7,), (13,)], "id long")
    part = {r["id"]: r["closeness"] for r in closeness_centrality(g, subset).collect()}
    assert set(part) == {0, 7, 13}
    for i in part:
        assert part[i] == pytest.approx(full[i])


@pytest.mark.parametrize(
    "seed,n,density,directed,normalized",
    [(41, 18, 0.15, True, True), (42, 16, 0.2, False, True), (43, 15, 0.2, False, False)],
)
def test_betweenness_exact_all_sources(spark, seed, n, density, directed, normalized):
    from graphina_spark.operators.betweenness import betweenness_centrality

    edges, _ = _rand(seed, n, density, directed=directed)
    g = make_graph(spark, edges, n=n, directed=directed)
    got = {
        r["id"]: r["betweenness"]
        for r in betweenness_centrality(g, normalized=normalized).collect()
    }
    want = ref_betweenness(n, edges, directed, normalized)
    for i in range(n):
        assert got[i] == pytest.approx(want[i]), f"bc {i}"


def test_betweenness_sampled_estimator_scales(spark):
    # star graph: all mass on the center; Brandes-Pich estimate from 4 of
    # the 9 vertices = (Σ sampled delta) * n/|S| * 1/((n-1)(n-2))
    from graphina_spark.operators.betweenness import betweenness_centrality

    n = 9
    edges = [(0, i) for i in range(1, n)]
    g = make_graph(spark, edges, n=n, directed=False)
    srcs = spark.createDataFrame([(i,) for i in range(1, n, 2)], "id long")
    got = {
        r["id"]: r["betweenness"]
        for r in betweenness_centrality(g, sources=srcs, normalized=True).collect()
    }
    # each sampled leaf source yields delta(center) = 7
    expect_center = (4 * 7) * (n / 4) / ((n - 1) * (n - 2))
    assert got[0] == pytest.approx(expect_center)
    for i in range(1, n):
        assert got[i] == 0.0


def test_edge_betweenness_path_graph(spark):
    """Undirected P4, exact (S=V), unnormalized: the reference keys BOTH
    orientations separately (betweenness.rs:178-183), each accumulating its
    own DAG direction -> (i,i+1) and (i+1,i) both carry (i+1)*(n-i-1)."""
    from graphina_spark.operators.betweenness import edge_betweenness_centrality
    from tests.conftest import make_graph

    g = make_graph(spark, [(0, 1), (1, 2), (2, 3)], directed=False)
    got = {
        (r["src"], r["dst"]): r["betweenness"]
        for r in edge_betweenness_centrality(g, normalized=False).collect()
    }
    assert len(got) == 6  # both orientations of all 3 edges
    for a, b, v in [(0, 1, 3.0), (1, 2, 4.0), (2, 3, 3.0)]:
        assert got[(a, b)] == pytest.approx(v)
        assert got[(b, a)] == pytest.approx(v)


def test_edge_betweenness_directed_cycle(spark):
    """Directed 3-cycle, exact: every ordered pair's unique path uses each
    edge twice total -> raw per-edge 2.0; normalized by 1/((n-1)(n-2))."""
    from graphina_spark.operators.betweenness import edge_betweenness_centrality
    from tests.conftest import make_graph

    g = make_graph(spark, [(0, 1), (1, 2), (2, 0)], directed=True)
    got = {
        (r["src"], r["dst"]): r["betweenness"]
        for r in edge_betweenness_centrality(g, normalized=True).collect()
    }
    # each edge lies on 3 of the 6 ordered shortest paths; norm 1/2
    assert len(got) == 3
    assert all(v == pytest.approx(3.0 / 2.0) for v in got.values())


def test_temporal_earliest_arrival_respects_time_order(spark):
    from graphina_spark.operators.paths import temporal_earliest_arrival

    # 0 -(t=5)-> 1 -(t=3)-> 2 : time-DECREASING, so 2 unreachable from 0
    # 0 -(t=1)-> 3 -(t=4)-> 2 : valid, arrival at 2 = 4
    # 2 -(t=0)-> 4            : 0 < 4, so 4 unreachable from 0
    te = spark.createDataFrame(
        [(0, 1, 5), (1, 2, 3), (0, 3, 1), (3, 2, 4), (2, 4, 0)],
        "src long, dst long, t long",
    )
    src = spark.createDataFrame([(0,)], "id long")
    got = {
        (r["source"], r["id"]): r["arrive"]
        for r in temporal_earliest_arrival(te, src).collect()
    }
    assert got == {(0, 0): 0, (0, 1): 5, (0, 3): 1, (0, 2): 4}


def test_temporal_arrival_improvement_reexpands(spark):
    from graphina_spark.operators.paths import temporal_earliest_arrival

    # first discovery of node 2 arrives late (t=9, via hub 1); a longer path
    # arrives earlier (t=3) and only the EARLY arrival can continue over the
    # t=4 edge — the re-expansion case a naive visited-set BFS gets wrong
    te = spark.createDataFrame(
        [(0, 1, 1), (1, 2, 9), (0, 3, 1), (3, 4, 2), (4, 2, 3), (2, 5, 4)],
        "src long, dst long, t long",
    )
    src = spark.createDataFrame([(0,)], "id long")
    got = {
        r["id"]: r["arrive"]
        for r in temporal_earliest_arrival(te, src).collect()
    }
    assert got[2] == 3
    assert got[5] == 4


def test_shortest_path_tree_pred_validity_weighted(spark):
    """Every pred edge exists with exactly the dist gap; chains terminate
    at the source; distances match the reference Dijkstra."""
    from graphina_spark.operators.paths import shortest_path_tree

    edges, weights = _rand(11, 12, 0.25, weighted=True, directed=True)
    g = make_graph(spark, edges, n=12, directed=True, weights=weights)
    srcs = spark.createDataFrame([(0,), (5,)], "id long")
    tree = shortest_path_tree(g, srcs, weighted=True).collect()
    w = {(u, v): float("inf") for u, v in edges}
    for i, (u, v) in enumerate(edges):
        w[(u, v)] = min(w[(u, v)], weights[i])
    for s in (0, 5):
        ref = ref_dijkstra(12, edges, weights, s, directed=True)
        rows = {r["id"]: r for r in tree if r["source"] == s}
        assert {v for v, d in enumerate(ref) if d is not None} == set(rows)
        for v, r in rows.items():
            assert r["dist"] == pytest.approx(ref[v])
            if v == s:
                assert r["pred"] == -1
            else:
                p = r["pred"]
                assert (p, v) in w
                assert rows[p]["dist"] + w[(p, v)] == pytest.approx(r["dist"])
                assert rows[p]["dist"] < r["dist"]  # chain descends


def test_shortest_path_tree_unweighted_min_pred(spark):
    from graphina_spark.operators.paths import shortest_path_tree

    # 0→1, 0→2, 1→3, 2→3: two shortest 2-hop paths to 3; pred must be the
    # min-id candidate (1)
    g = make_graph(spark, [(0, 1), (0, 2), (1, 3), (2, 3)], n=4, directed=True)
    srcs = spark.createDataFrame([(0,)], "id long")
    rows = {r["id"]: r for r in
            shortest_path_tree(g, srcs, weighted=False).collect()}
    assert rows[3]["dist"] == 2 and rows[3]["pred"] == 1
    assert rows[0]["pred"] == -1


def test_shortest_path_chain_and_unreachable(spark):
    from graphina_spark.operators.paths import shortest_path

    edges = [(0, 1), (1, 2), (2, 3), (0, 3)]
    weights = [1.0, 1.0, 1.0, 5.0]
    g = make_graph(spark, edges, n=6, directed=True, weights=weights)
    p = shortest_path(g, 0, 3, weighted=True).collect()
    assert [(r["step"], r["id"], r["dist"]) for r in p] == [
        (0, 0, 0.0), (1, 1, 1.0), (2, 2, 2.0), (3, 3, 3.0)
    ]
    # unreachable target → empty frame with the contract schema
    q = shortest_path(g, 0, 5, weighted=True)
    assert q.count() == 0 and q.columns == ["step", "id", "dist"]
    # target=None → farthest vertex
    far = shortest_path(g, 0, None, weighted=True).collect()
    assert far[-1]["id"] == 3 and far[-1]["dist"] == 3.0


def test_shortest_path_tree_rejects_nonpositive_weights(spark):
    from graphina_spark.operators.paths import shortest_path_tree

    g = make_graph(spark, [(0, 1)], n=2, directed=True, weights=[0.0])
    srcs = spark.createDataFrame([(0,)], "id long")
    with pytest.raises(ValueError, match="positive"):
        shortest_path_tree(g, srcs, weighted=True)
