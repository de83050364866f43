"""ReFeX recursive structural features (operators/refex.py)."""

from conftest import make_graph
from graphina_spark.operators.refex import refex_features


def fmap(df):
    return {(r["id"], r["fi"]): r["v"] for r in df.collect()}


def test_refex_star_known_values(spark):
    # directed star 0 -> 1,2,3
    g = make_graph(spark, [(0, 1), (0, 2), (0, 3)], n=4, directed=True)
    f = fmap(refex_features(g, rounds=1))
    # base: deg(0)=3 (undirected view), in(0)=0, out(0)=3; leaves 1,0,... wait
    assert f[(0, 0)] == 3.0 and f[(0, 1)] == 0.0 and f[(0, 2)] == 3.0
    assert f[(1, 0)] == 1.0 and f[(1, 1)] == 1.0 and f[(1, 2)] == 0.0
    # round 1: center's neighbor-degree sum = 3 leaves x deg 1 = 3; mean 1
    assert f[(0, 3)] == 3.0 and f[(0, 4)] == 1.0
    # leaf's neighbor-degree sum = center's 3; mean 3
    assert f[(1, 3)] == 3.0 and f[(1, 4)] == 3.0
    # in-degree aggregates: center's neighbors have in-degree 1 each
    assert f[(0, 5)] == 3.0 and f[(0, 6)] == 1.0
    # out-degree aggregates: neighbors of leaf = {center}, out 3
    assert f[(1, 7)] == 3.0 and f[(1, 8)] == 3.0


def test_refex_role_equivalence(spark):
    # two disjoint identical stars: structurally equivalent vertices must
    # get identical feature vectors despite different identities/components
    edges = [(0, 1), (0, 2), (0, 3), (10, 11), (10, 12), (10, 13)]
    g = make_graph(spark, edges, n=14, directed=True)
    f = fmap(refex_features(g, rounds=2))
    nf = max(fi for (_, fi) in f) + 1
    assert nf == 21
    vec = lambda i: tuple(f[(i, k)] for k in range(nf))
    assert vec(0) == vec(10)
    assert vec(1) == vec(11) == vec(3) == vec(13)
    assert vec(0) != vec(1)


def test_refex_isolated_vertex_zeros(spark):
    g = make_graph(spark, [(0, 1)], n=3, directed=False)
    f = fmap(refex_features(g, rounds=2))
    assert all(f[(2, k)] == 0.0 for k in range(21))
