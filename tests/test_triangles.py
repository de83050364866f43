"""Triangle counts / clustering / transitivity vs reference fixtures
(parallel/triangles.rs:73-91, graph_metrics.rs:407-463)."""

import random

import pytest

from conftest import make_graph
from reference_impl import random_graph, ref_transitivity, ref_triangles

from graphina_spark.operators.triangles import (
    clustering_coefficients,
    transitivity,
    triangles,
)


def tri_dict(df):
    return {r["id"]: r["triangles"] for r in df.collect()}


def test_triangle_pendant(spark):
    # triangle 0-1-2 + edge 2-3: [1,1,1,0]; transitivity 0.6
    edges = [(0, 1), (1, 2), (0, 2), (2, 3)]
    g = make_graph(spark, edges, n=4, directed=False)
    assert tri_dict(triangles(g)) == {0: 1, 1: 1, 2: 1, 3: 0}
    assert abs(transitivity(g) - 0.6) < 1e-12  # graph_metrics.rs:421-440


def test_two_tri_shared_edge(spark):
    # triangles {0,1,2},{1,2,3}: transitivity 0.75 (graph_metrics.rs:442-463)
    edges = [(0, 1), (1, 2), (0, 2), (1, 3), (2, 3)]
    g = make_graph(spark, edges, n=4, directed=False)
    assert tri_dict(triangles(g)) == {0: 1, 1: 2, 2: 2, 3: 1}
    assert abs(transitivity(g) - 0.75) < 1e-12


def test_k4(spark):
    edges = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    g = make_graph(spark, edges, n=4, directed=False)
    assert tri_dict(triangles(g)) == {i: 3 for i in range(4)}
    assert abs(transitivity(g) - 1.0) < 1e-12


def test_clustering_coefficients(spark):
    edges = [(0, 1), (1, 2), (0, 2), (2, 3)]
    g = make_graph(spark, edges, n=4, directed=False)
    got = {r["id"]: r["clustering"] for r in clustering_coefficients(g).collect()}
    assert abs(got[0] - 1.0) < 1e-12
    assert abs(got[2] - 1 / 3) < 1e-12
    assert got[3] == 0.0  # deg < 2 → 0 (node_metrics.rs:35-59)


def test_directed_edges_treated_undirected(spark):
    # parallel/duplicate directed edges collapse to the simple graph
    edges = [(0, 1), (1, 0), (1, 2), (0, 2)]
    g = make_graph(spark, edges, n=3, directed=True)
    assert tri_dict(triangles(g)) == {0: 1, 1: 1, 2: 1}


@pytest.mark.parametrize("seed,n,density", [(21, 10, 0.35), (22, 12, 0.5), (23, 8, 0.7)])
def test_random_corpus(spark, seed, n, density):
    rng = random.Random(seed)
    edges, _ = random_graph(rng, n, density)
    g = make_graph(spark, edges, n=n, directed=False)
    exp = ref_triangles(n, edges)
    assert tri_dict(triangles(g)) == {i: exp[i] for i in range(n)}
    assert abs(transitivity(g) - ref_transitivity(n, edges)) < 1e-12
