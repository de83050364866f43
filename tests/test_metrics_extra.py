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
