"""Ego-network analytics vs a brute-force neighbor-set reference.

Semantics: Forman curvature (Samal et al. 2018 augmented form), edge
embeddedness / neighborhood overlap (Onnela et al. 2007), scan-1 statistic
(Priebe et al. 2005), Burt effective size + constraint (unweighted Borgatti
simplification), disparity-filter backbone (Serrano et al. 2009).
"""

import math
from itertools import combinations

import pytest

from graphina_spark.operators import egonet as E
from tests.conftest import make_graph

# two triangles joined by a bridge, a pendant, a self-loop, an isolate
EDGES = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 5), (5, 3), (6, 0), (7, 7)]
N = 9  # 8 isolated; 7 only a self-loop


def _nbrs():
    nb = {i: set() for i in range(N)}
    for s, d in EDGES:
        if s != d:
            nb[s].add(d)
            nb[d].add(s)
    return nb


@pytest.fixture(scope="module")
def g(spark):
    return make_graph(spark, EDGES, n=N, directed=False)


def test_forman_curvature(spark, g):
    nb = _nbrs()
    got = {(r["src"], r["dst"]): r["curvature"] for r in E.forman_curvature(g).collect()}
    exp = {}
    for u, v in {(min(s, d), max(s, d)) for s, d in EDGES if s != d}:
        sup = len(nb[u] & nb[v])
        exp[(u, v)] = 4 - len(nb[u]) - len(nb[v]) + 3 * sup
    assert got == exp


def test_edge_embeddedness(spark, g):
    nb = _nbrs()
    rows = {(r["src"], r["dst"]): (r["cn"], r["overlap"]) for r in E.edge_embeddedness(g).collect()}
    for u, v in {(min(s, d), max(s, d)) for s, d in EDGES if s != d}:
        cn = len(nb[u] & nb[v])
        den = len(nb[u]) + len(nb[v]) - 2 - cn
        exp = cn / den if den > 0 else 0.0
        assert rows[(u, v)][0] == cn
        assert rows[(u, v)][1] == pytest.approx(exp)
    # pendant edge (0,6): deg6 = 1 — check the zero-denominator convention path
    assert rows[(0, 6)] == (0, 0.0)


def test_ego_stats(spark, g):
    nb = _nbrs()
    got = {r["id"]: r for r in E.ego_stats(g).collect()}
    assert set(got) == {i for i in range(N) if nb[i]}  # isolates/self-loop-only omitted
    for i, r in got.items():
        deg = len(nb[i])
        tri = sum(1 for a, b in combinations(sorted(nb[i]), 2) if b in nb[a])
        assert (r["deg"], r["tri"], r["scan1"]) == (deg, tri, deg + tri)
        assert r["effective_size"] == pytest.approx(deg - 2.0 * tri / deg)
        assert r["efficiency"] == pytest.approx((deg - 2.0 * tri / deg) / deg)


def test_burt_constraint(spark, g):
    nb = _nbrs()
    got = {r["id"]: r["constraint"] for r in E.burt_constraint(g).collect()}
    for i in range(N):
        if not nb[i]:
            assert i not in got
            continue
        c = 0.0
        for j in nb[i]:
            ind = sum(
                (1.0 / len(nb[i])) * (1.0 / len(nb[q])) for q in nb[i] & nb[j]
            )
            c += (1.0 / len(nb[i]) + ind) ** 2
        assert got[i] == pytest.approx(c), f"vertex {i}"


def test_burt_pendant_is_one(spark, g):
    # a degree-1 vertex attached to one alter has constraint exactly 1
    got = {r["id"]: r["constraint"] for r in E.burt_constraint(g).collect()}
    assert got[6] == pytest.approx(1.0)


def test_disparity_backbone(spark):
    # star out of 0 with skewed weights: s=10, k=3
    # alpha(w) = (1 - w/10)^2 -> w=7: 0.09 keep; w=2: 0.64 drop; w=1: 0.81 drop
    # vertex 1 has out-degree 1 -> dropped regardless of weight
    g = make_graph(
        spark,
        [(0, 1), (0, 2), (0, 3), (1, 4)],
        n=5,
        directed=True,
        weights=[7.0, 2.0, 1.0, 9.0],
    )
    rows = {(r["src"], r["dst"]): r["alpha"] for r in E.disparity_backbone(g, 0.5).collect()}
    assert set(rows) == {(0, 1)}
    assert rows[(0, 1)] == pytest.approx((1 - 0.7) ** 2)


def test_disparity_alpha_values(spark):
    g = make_graph(
        spark,
        [(0, 1), (0, 2), (0, 3)],
        n=4,
        directed=True,
        weights=[5.0, 3.0, 2.0],
    )
    rows = {(r["src"], r["dst"]): r["alpha"] for r in E.disparity_backbone(g, 1.1).collect()}
    for dst, w in [(1, 5.0), (2, 3.0), (3, 2.0)]:
        assert rows[(0, dst)] == pytest.approx((1 - w / 10.0) ** 2)


def test_forman_matches_support_identity(spark, g):
    # embeddedness cn and forman support agree edge-by-edge:
    # curvature + du + dv - 4 == 3*cn
    nb = _nbrs()
    f = {(r["src"], r["dst"]): r["curvature"] for r in E.forman_curvature(g).collect()}
    e = {(r["src"], r["dst"]): r["cn"] for r in E.edge_embeddedness(g).collect()}
    assert set(f) == set(e)
    for k, curv in f.items():
        u, v = k
        assert curv + len(nb[u]) + len(nb[v]) - 4 == 3 * e[k]
