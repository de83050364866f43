"""HITS hubs/authorities tests (numpy twin + structural sanity)."""

import math

import numpy as np
import pytest

from tests.conftest import make_graph


def _hits_np(n, edges, iters, directed=True):
    A = np.zeros((n, n))
    for s, d in edges:
        A[s, d] += 1.0
        if not directed:
            A[d, s] += 1.0
    h = np.ones(n) / math.sqrt(n)
    a = np.zeros(n)
    for _ in range(iters):
        a = A.T @ h
        na = np.linalg.norm(a)
        a = a / (na if na > 0 else 1.0)
        h = A @ a
        nh = np.linalg.norm(h)
        h = h / (nh if nh > 0 else 1.0)
    return h, a


_EDGES = [(0, 2), (1, 2), (3, 2), (2, 4), (0, 4), (4, 1), (3, 0)]


def test_hits_fixed_iters_matches_numpy(spark):
    from graphina_spark.operators.hits import hits

    g = make_graph(spark, _EDGES, n=5, directed=True)
    got = {r["id"]: (r["hub"], r["authority"]) for r in
           hits(g, fixed_iters=4).collect()}
    h, a = _hits_np(5, _EDGES, 4)
    for i in range(5):
        assert got[i][0] == pytest.approx(h[i], abs=1e-9)
        assert got[i][1] == pytest.approx(a[i], abs=1e-9)


def test_hits_converged_star(spark):
    from graphina_spark.operators.hits import hits

    # star pointing in: 1..4 -> 0.  0 is the pure authority, 1..4 equal hubs.
    edges = [(i, 0) for i in range(1, 5)]
    g = make_graph(spark, edges, n=5, directed=True)
    got = {r["id"]: (r["hub"], r["authority"]) for r in hits(g).collect()}
    assert got[0][1] == pytest.approx(1.0)
    assert got[0][0] == pytest.approx(0.0)
    for i in range(1, 5):
        assert got[i][0] == pytest.approx(0.5)
        assert got[i][1] == pytest.approx(0.0)


def test_hits_undirected_hub_equals_authority(spark):
    from graphina_spark.operators.hits import hits

    # hub and authority converge to the same principal eigenvector on a
    # symmetric adjacency (they differ at any finite iterate by one
    # half-step, so compare at convergence with a matching tolerance)
    g = make_graph(spark, [(0, 1), (1, 2), (2, 0), (2, 3)], n=4, directed=False)
    for r in hits(g, tol=1e-10).collect():
        assert r["hub"] == pytest.approx(r["authority"], abs=1e-6)


def test_hits_validates_iterations(spark):
    from graphina_spark.operators.hits import hits

    g = make_graph(spark, _EDGES, n=5, directed=True)
    with pytest.raises(ValueError):
        hits(g, fixed_iters=0)
