"""Reciprocity and degree histogram (operators/metrics.py additions)."""

from tests.conftest import make_graph


def test_reciprocity_values(spark):
    from graphina_spark.operators.metrics import reciprocity

    # 0<->1 reciprocal, 1->2 and 2->3 not: 2 of 4 directed edges
    g = make_graph(spark, [(0, 1), (1, 0), (1, 2), (2, 3)], directed=True)
    assert reciprocity(g) == 0.5
    g2 = make_graph(spark, [(0, 1), (1, 2)], directed=True)
    assert reciprocity(g2) == 0.0
    g3 = make_graph(spark, [(0, 1)], directed=False)
    assert reciprocity(g3) == 1.0


def test_degree_histogram(spark):
    from graphina_spark.operators.metrics import degree_histogram

    # star: center 0 with 3 out-edges
    g = make_graph(spark, [(0, 1), (0, 2), (0, 3)], n=5, directed=True)
    got = {r["deg"]: r["n"] for r in degree_histogram(g, "total").collect()}
    assert got == {3: 1, 1: 3, 0: 1}
    got_in = {r["deg"]: r["n"] for r in degree_histogram(g, "in").collect()}
    assert got_in == {0: 2, 1: 3}


def test_deterministic_graph_sampling(spark):
    from graphina_spark.operators.sampling import (
        induced_sample_subgraph,
        sample_edges,
        sample_vertices,
    )

    g = make_graph(
        spark, [(i, (i + 1) % 50) for i in range(50)], n=50, directed=True
    )
    v1 = sorted(r["id"] for r in sample_vertices(g, 0.4).collect())
    v2 = sorted(r["id"] for r in sample_vertices(g, 0.4).collect())
    assert v1 == v2 and 0 < len(v1) < 50
    # monotone: a larger fraction keeps a superset
    v3 = sorted(r["id"] for r in sample_vertices(g, 0.8).collect())
    assert set(v1) <= set(v3)
    e1 = sorted((r["src"], r["dst"]) for r in sample_edges(g, 0.4).collect())
    e2 = sorted((r["src"], r["dst"]) for r in sample_edges(g, 0.4).collect())
    assert e1 == e2 and 0 < len(e1) < 50
    sub = induced_sample_subgraph(g, 0.5)
    keep = set(r["id"] for r in sub.vertices.collect())
    for r in sub.edges.collect():
        assert r["src"] in keep and r["dst"] in keep
