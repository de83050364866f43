"""Neighborhood mean embeddings — closed-form aggregation on a tiny graph."""

import pytest

from graphina_spark.operators.smoothing import neighborhood_mean_embedding
from tests.conftest import make_graph


def _vecs(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["id"], {})[r["pos"]] = r["v"]
    return {i: [d[p] for p in sorted(d)] for i, d in out.items()}


@pytest.fixture(scope="module")
def emb(spark):
    return spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [3.0, 2.0]), (2, [5.0, 4.0])],
        "vec_id long, embedding array<double>",
    )


def test_mean_over_embedded_neighbors(spark, emb):
    # undirected star centered at 3 (no embedding of its own): neighbors
    # 0,1,2 all embedded → mean [3, 2]; leaves see only 3 (unembedded) → no rows
    g = make_graph(spark, [(3, 0), (3, 1), (3, 2)], n=4, directed=False)
    out = _vecs(neighborhood_mean_embedding(g, emb))
    assert out[3] == [3.0, 2.0]
    assert 0 not in out and 1 not in out and 2 not in out


def test_include_self(spark, emb):
    g = make_graph(spark, [(0, 1)], n=2, directed=False)
    out = _vecs(neighborhood_mean_embedding(g, emb, include_self=True))
    # 0: mean of self [1,0] and neighbor [3,2] → [2,1]
    assert out[0] == [2.0, 1.0]
    assert out[1] == [2.0, 1.0]


def test_directed_edges_are_symmetrized(spark, emb):
    g = make_graph(spark, [(0, 1)], n=2, directed=True)
    out = _vecs(neighborhood_mean_embedding(g, emb))
    # both endpoints see each other despite the single direction
    assert out[0] == [3.0, 2.0]
    assert out[1] == [1.0, 0.0]
