"""Jones-Plassmann greedy coloring: properness, Delta+1 bound, hybrid tail
equality, fixed-round determinism."""

import random

import pytest
from pyspark.sql import functions as F

from tests.conftest import make_graph


def _color_map(df):
    return {r["id"]: r["color"] for r in df.collect()}


@pytest.fixture(scope="module")
def rand_graph_edges():
    rng = random.Random(11)
    return list({(rng.randrange(40), rng.randrange(40)) for _ in range(120)})


def test_coloring_proper_and_bounded(spark, rand_graph_edges):
    from graphina_spark.operators.coloring import greedy_coloring

    g = make_graph(spark, rand_graph_edges, n=40, directed=False)
    col = _color_map(greedy_coloring(g, local_finish=0))
    assert len(col) == 40  # fixpoint colors everything, isolated included
    for s, d in rand_graph_edges:
        if s != d:
            assert col[s] != col[d], f"edge ({s},{d}) monochromatic"
    deg = {}
    for s, d in rand_graph_edges:
        if s != d:
            deg[s] = deg.get(s, 0) + 1
            deg[d] = deg.get(d, 0) + 1
    assert len(set(col.values())) <= max(deg.values()) + 1
    # colors are exactly 0..max (greedy mex never skips a color globally...
    # per-vertex mex can skip, but color 0 must exist)
    assert min(col.values()) == 0


def test_coloring_hybrid_tail_bit_identical(spark, rand_graph_edges):
    """The driver-local tail replay must reproduce the pure-distributed
    fixpoint bit-for-bit (the approximation.py local-finish contract)."""
    from graphina_spark.operators.coloring import greedy_coloring

    g = make_graph(spark, rand_graph_edges, n=40, directed=False)
    dist = _color_map(greedy_coloring(g, local_finish=0))
    hybrid = _color_map(greedy_coloring(g, local_finish=5000))
    assert dist == hybrid


def test_coloring_fixed_rounds_prefix(spark, rand_graph_edges):
    """Fixed-round output is a subset of the fixpoint with equal colors
    (rounds only extend the coloring, never revise it)."""
    from graphina_spark.operators.coloring import greedy_coloring

    g = make_graph(spark, rand_graph_edges, n=40, directed=False)
    full = _color_map(greedy_coloring(g, local_finish=0))
    part = _color_map(greedy_coloring(g, rounds=2))
    assert 0 < len(part) <= len(full)
    assert all(full[v] == c for v, c in part.items())


def test_coloring_directed_input_uses_undirected_view(spark):
    """A directed 2-cycle is one undirected edge: two colors."""
    from graphina_spark.operators.coloring import greedy_coloring

    g = make_graph(spark, [(0, 1), (1, 0)], n=2, directed=True)
    col = _color_map(greedy_coloring(g, local_finish=0))
    assert sorted(col.values()) == [0, 1]


def test_approx_distance_metrics_path_graph(spark):
    """On a short path the ANF estimate's effective diameter must land in
    the right regime (positive, <= true diameter) and APL must be positive
    — sketch sanity, exactness is not the contract."""
    from graphina_spark.operators.distmetrics import approx_distance_metrics

    edges = [(i, i + 1) for i in range(9)]
    g = make_graph(spark, edges, n=10, directed=False)
    row = approx_distance_metrics(g, k=8, fixed_rounds=10, round_to=4).first()
    assert 0.0 < row["effective_diameter"] <= 10.0
    assert 0.0 < row["avg_path_length"] <= 9.0
