"""Weighted s-core (strength peeling) vs a brute-force synchronous peel."""

import pytest

from graphina_spark.operators.kcore import s_core
from tests.conftest import make_graph


def _brute_s_core(edges, weights, n, s, rounds=None):
    # merge parallel/antiparallel weights per undirected pair
    pair_w = {}
    for (a, b), w in zip(edges, weights):
        if a == b:
            continue
        k = (min(a, b), max(a, b))
        pair_w[k] = pair_w.get(k, 0.0) + w
    alive = set(range(n))
    r = 0
    while True:
        st = {v: 0.0 for v in alive}
        for (a, b), w in pair_w.items():
            if a in alive and b in alive:
                st[a] += w
                st[b] += w
        new = {v for v in alive if st[v] >= s}
        r += 1
        if rounds is not None and r >= rounds:
            return new
        if new == alive:
            return new
        alive = new


# a weighted core (0-1-2-3 clique-ish, heavy) + a light tail (4-5-6)
EDGES = [(0, 1), (1, 2), (2, 0), (0, 3), (1, 3), (2, 3), (3, 4), (4, 5), (5, 6)]
WEIGHTS = [5.0, 5.0, 5.0, 4.0, 4.0, 4.0, 2.0, 1.0, 1.0]
N = 7


@pytest.fixture(scope="module")
def g(spark):
    return make_graph(spark, EDGES, n=N, directed=True, weights=WEIGHTS)


def test_s_core_fixpoint_matches_bruteforce(spark, g):
    for s in [3.0, 8.0, 12.0, 14.0]:
        got = {r["id"] for r in s_core(g, s=s).collect()}
        assert got == _brute_s_core(EDGES, WEIGHTS, N, s), f"s={s}"


def test_s_core_cascade(spark, g):
    # s=3: vertex 6 (strength 1) and 5 (strength 2) peel, which drops 4 to
    # strength 2 -> also peels; the heavy quad survives
    got = {r["id"] for r in s_core(g, s=3.0).collect()}
    assert got == {0, 1, 2, 3}


def test_s_core_fixed_rounds_trajectory(spark, g):
    for rounds in [1, 2, 3]:
        got = {r["id"] for r in s_core(g, s=3.0, fixed_rounds=rounds).collect()}
        assert got == _brute_s_core(EDGES, WEIGHTS, N, 3.0, rounds=rounds), rounds


def test_s_core_merges_parallel_edge_weights(spark):
    # antiparallel pair (0,1)+(1,0) merges to weight 4 -> both survive s=4;
    # at s=5 everything peels
    g = make_graph(spark, [(0, 1), (1, 0)], n=2, directed=True, weights=[3.0, 1.0])
    assert {r["id"] for r in s_core(g, s=4.0).collect()} == {0, 1}
    assert s_core(g, s=5.0).count() == 0


def test_s_core_zero_threshold_keeps_strength_positive_only(spark, g):
    # s=0: every vertex with at least one (non-self-loop) incident edge
    # has strength >= 0 and survives; the loop never drops isolates that
    # carry no edge rows -- they are absent from the strength frame
    got = {r["id"] for r in s_core(g, s=0.0).collect()}
    assert got == set(range(N))
