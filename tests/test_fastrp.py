"""FastRP structural embeddings (operators/fastrp.py)."""

import math

from graphina_spark.operators.fastrp import fastrp_embedding, projection_rows

from conftest import make_graph


def collect_map(df):
    return {(r["id"], r["pos"]): r["v"] for r in df.collect()}


def test_projection_cells_deterministic_and_sparse(spark):
    g = make_graph(spark, [(0, 1)], n=50, directed=False)
    a = {(r["id"], r["pos"]): r["x"] for r in projection_rows(g.vertices, dims=16).collect()}
    b = {(r["id"], r["pos"]): r["x"] for r in projection_rows(g.vertices, dims=16).collect()}
    assert a == b
    # sparsity s=3 → E[nonzero] = n*d/3; allow a generous band
    assert 0.15 * 50 * 16 < len(a) < 0.55 * 50 * 16
    root = math.sqrt(3.0)
    assert set(a.values()) <= {root, -root}


def test_fastrp_shape_and_isolated_zero(spark):
    # path 0-1-2 plus isolated vertex 3
    g = make_graph(spark, [(0, 1), (1, 2)], n=4, directed=False)
    emb = collect_map(fastrp_embedding(g, dims=4, iters=2, weights=(1.0, 1.0)))
    assert len(emb) == 4 * 4  # dense grid
    assert all(emb[(3, p)] == 0.0 for p in range(4))  # isolated → zero vector


def test_fastrp_weighted_sum_of_normalized_iterates(spark):
    # on a clique every vertex has the same neighborhood-mean trajectory up
    # to its own projection row; check per-iterate L2 norms fold in: with a
    # single iteration and weight w, every embedded vertex row has L2 = w.
    g = make_graph(
        spark, [(a, b) for a in range(5) for b in range(a + 1, 5)], n=5,
        directed=False,
    )
    emb = collect_map(fastrp_embedding(g, dims=8, iters=1, weights=(2.5,)))
    for i in range(5):
        l2 = math.sqrt(sum(emb[(i, p)] ** 2 for p in range(8)))
        assert abs(l2 - 2.5) < 1e-4


def test_fastrp_partitioning_independent(spark):
    edges = [(i, (i * 7 + 3) % 23) for i in range(23)]
    g1 = make_graph(spark, edges, n=23, directed=False)
    e1 = collect_map(fastrp_embedding(g1, dims=8, iters=3, weights=(0.5, 1.0, 2.0)))
    g2 = make_graph(spark, edges, n=23, directed=False)
    g2.edges = g2.edges.repartition(7)
    e2 = collect_map(fastrp_embedding(g2, dims=8, iters=3, weights=(0.5, 1.0, 2.0)))
    assert e1 == e2
