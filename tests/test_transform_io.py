"""Functional transform surface + adjacency-list IO parity.

Reference semantics pinned: types.rs retain/map/contains/edge_weight and
io.rs adjacency-list read/write (both the reader's separator-pair format
and the writer's colon-pair format)."""

import os

from pyspark.sql import functions as F

from graphina_spark.operators import transform as T
from graphina_spark.sources.io import read_adjacency_list, write_adjacency_list
from tests.conftest import make_graph


def _edge_set(g):
    return {
        (r["src"], r["dst"], r["weight"])
        for r in g.edges.select("src", "dst", "weight").collect()
    }


def test_retain_nodes_drops_incident_edges(spark):
    g = make_graph(spark, [(0, 1), (1, 2), (2, 3), (3, 0)], n=4)
    sub = T.retain_nodes(g, F.col("id") != 2)
    assert {r["id"] for r in sub.vertices.collect()} == {0, 1, 3}
    assert _edge_set(sub) == {(0, 1, 1.0), (3, 0, 1.0)}


def test_retain_edges_keeps_all_vertices(spark):
    g = make_graph(spark, [(0, 1), (1, 2)], n=3, weights=[5.0, 1.0])
    sub = T.retain_edges(g, F.col("weight") > 2.0)
    assert sub.vertices.count() == 3
    assert _edge_set(sub) == {(0, 1, 5.0)}


def test_map_edge_weights_and_node_attrs(spark):
    g = make_graph(spark, [(0, 1), (1, 2)], n=3, weights=[2.0, 3.0])
    doubled = T.map_edge_weights(g, F.col("weight") * 2)
    assert {w for _, _, w in _edge_set(doubled)} == {4.0, 6.0}
    attred = T.map_node_attrs(g, "flag", F.col("id") % 2 == 0)
    assert dict(
        (r["id"], r["flag"]) for r in attred.vertices.collect()
    ) == {0: True, 1: False, 2: True}


def test_contains_and_edge_weight(spark):
    g = make_graph(spark, [(0, 1)], n=3, weights=[2.5])
    assert T.contains_node(g, 2) and not T.contains_node(g, 9)
    assert T.contains_edge(g, 0, 1) and not T.contains_edge(g, 1, 0)
    u = make_graph(spark, [(0, 1)], n=2, directed=False, weights=[2.5])
    assert T.contains_edge(u, 1, 0)  # undirected matches either orientation
    assert T.edge_weight(g, 0, 1) == 2.5
    assert T.edge_weight(g, 1, 0) is None


def test_sparse_adjacency_roundtrip_directed(spark):
    # non-contiguous vertex ids: dense index = rank by id (10→0, 20→1, 30→2)
    edges = spark.createDataFrame(
        [(10, 20, 1.0), (20, 30, 2.0), (30, 30, 3.0)],
        "src long, dst long, weight double",
    )
    from graphina_spark.graph import LinkGraph

    g = LinkGraph.from_edges(edges, directed=True)
    coo = {(r["row"], r["col"], r["weight"]) for r in T.to_sparse_adjacency(g).collect()}
    assert coo == {(0, 1, 1.0), (1, 2, 2.0), (2, 2, 3.0)}
    back = T.from_sparse_adjacency(
        spark.createDataFrame(sorted(coo), "row long, col long, weight double")
    )
    assert _edge_set(back) == coo


def test_sparse_adjacency_undirected_mirrors_offdiagonal(spark):
    g = make_graph(spark, [(0, 1), (2, 2)], n=3, directed=False, weights=[1.5, 9.0])
    coo = {(r["row"], r["col"], r["weight"]) for r in T.to_sparse_adjacency(g).collect()}
    # off-diagonal mirrored, self-loop once (types.rs:584-586)
    assert coo == {(0, 1, 1.5), (1, 0, 1.5), (2, 2, 9.0)}
    back = T.from_sparse_adjacency(
        spark.createDataFrame(sorted(coo), "row long, col long, weight double"),
        directed=False,
    )
    assert _edge_set(back) == {(0, 1, 1.5), (2, 2, 9.0)}


def test_adjacency_list_read_pair_format(spark, tmp_path):
    p = tmp_path / "adj.txt"
    p.write_text(
        "0 1 2.5 2\n"  # trailing neighbor without weight -> default 1.0
        "1 2 0.5  # comment after data\n"
        "# full comment line\n"
        "3\n"  # isolated vertex
        "\n"
    )
    g = read_adjacency_list(spark, str(p), sep=" ")
    assert _edge_set(g) == {(0, 1, 2.5), (0, 2, 1.0), (1, 2, 0.5)}
    assert {r["id"] for r in g.vertices.collect()} == {0, 1, 2, 3}


def test_adjacency_list_read_colon_format(spark, tmp_path):
    p = tmp_path / "adj_colon.txt"
    p.write_text("0 1:2.5 2:1\n1 2:0.5\n")
    g = read_adjacency_list(spark, str(p), sep=" ")
    assert _edge_set(g) == {(0, 1, 2.5), (0, 2, 1.0), (1, 2, 0.5)}


def test_adjacency_list_write_read_roundtrip(spark, tmp_path):
    g = make_graph(
        spark, [(0, 1), (0, 2), (1, 2)], n=4, weights=[2.5, 1.0, 0.5]
    )  # vertex 3 isolated
    out = os.path.join(str(tmp_path), "adj_out")
    write_adjacency_list(g, out)
    back = read_adjacency_list(spark, out, sep=" ")
    assert _edge_set(back) == _edge_set(g)
    assert {r["id"] for r in back.vertices.collect()} == {0, 1, 2, 3}
