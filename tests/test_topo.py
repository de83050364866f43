"""Topological layers: exact longest-path depth, cap contract, orientation."""

from conftest import make_graph

from graphina_spark.operators.topo import id_oriented_dag, topo_layers


def _layers(spark, edges, n, **kw):
    g = make_graph(spark, edges, n=n)
    return {r["id"]: r["layer"] for r in topo_layers(g, **kw).collect()}


def test_path_graph_layers_are_depths(spark):
    # 0→1→2→3: layer = position along the chain
    assert _layers(spark, [(0, 1), (1, 2), (2, 3)], n=4, rounds=10) == {
        0: 0, 1: 1, 2: 2, 3: 3,
    }


def test_longest_path_wins_over_short_cut(spark):
    # 0→3 direct and 0→1→2→3: layer(3) = 3, not 1
    lay = _layers(spark, [(0, 3), (0, 1), (1, 2), (2, 3)], n=4, rounds=10)
    assert lay[3] == 3


def test_cap_contract_min_lp_k(spark):
    # chain of length 6, 3 rounds → layer = min(depth, 3)
    edges = [(i, i + 1) for i in range(6)]
    lay = _layers(spark, edges, n=7, rounds=3)
    assert lay == {i: min(i, 3) for i in range(7)}


def test_orientation_kills_cycles(spark):
    # a directed cycle orients into an acyclic wedge: no infinite depth
    lay = _layers(spark, [(0, 1), (1, 2), (2, 0)], n=3, rounds=8)
    assert lay == {0: 0, 1: 1, 2: 2}


def test_id_oriented_dag_dedups_and_orients(spark):
    g = make_graph(spark, [(2, 1), (1, 2), (1, 1)], n=3)
    rows = sorted(map(tuple, id_oriented_dag(g).collect()))
    assert rows == [(1, 2)]


def test_isolated_vertices_layer_zero(spark):
    lay = _layers(spark, [(0, 1)], n=4, rounds=4)
    assert lay[2] == 0 and lay[3] == 0
