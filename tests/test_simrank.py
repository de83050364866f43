"""SimRank coupled reverse walks: analytic fixtures + Python replay parity."""

import pytest

from graphina_spark.graph import LinkGraph
from graphina_spark.operators.approximation import PRI_A1, PRI_A2, PRI_B
from graphina_spark.operators.distmetrics import ANF_P
from graphina_spark.operators.simrank import (
    cocited_pairs,
    reverse_walk_table,
    simrank_scores,
)


def _graph(spark, edges, n):
    vdf = spark.createDataFrame([(i,) for i in range(n)], "id long")
    edf = spark.createDataFrame(edges, "src long, dst long")
    return LinkGraph.from_edges(edf, directed=True, vertices=vdf)


def _pairs(spark, pl):
    return spark.createDataFrame(pl, "u long, v long")


def _scores(g, pairs, **kw):
    return {
        (r["u"], r["v"]): r["simrank"]
        for r in simrank_scores(g, pairs, **kw).collect()
    }


# ------------------------------------------------------------------ analytic
def test_single_shared_inneighbor_meets_at_one(spark):
    # I(1) = I(2) = {0}: both walks must be at 0 after one hop -> tau = 1
    # in every replicate -> score = c = 4/5 exactly
    g = _graph(spark, [(0, 1), (0, 2)], 3)
    s = _scores(g, _pairs(spark, [(1, 2)]), steps=3, replicates=4)
    assert s[(1, 2)] == pytest.approx(0.8, abs=1e-12)


def test_disjoint_incones_score_zero(spark):
    # two separate chains: walks can never meet
    g = _graph(spark, [(0, 1), (2, 3)], 4)
    s = _scores(g, _pairs(spark, [(1, 3)]), steps=4, replicates=4)
    assert s[(1, 3)] == 0.0


def test_dead_walk_scores_zero(spark):
    # vertex 0 has no in-neighbours: its walk dies at t=1
    g = _graph(spark, [(0, 1)], 2)
    s = _scores(g, _pairs(spark, [(0, 1)]), steps=4, replicates=4)
    assert s[(0, 1)] == 0.0


def test_two_step_meeting(spark):
    # 0 -> 1 -> 3, 0 -> 2 -> 4; I(3)={1}, I(4)={2}, I(1)=I(2)={0}:
    # walks from 3 and 4 are forced to 1 and 2 (different) then both to 0
    # -> tau = 2 always -> score = c^2 = 0.64
    g = _graph(spark, [(0, 1), (0, 2), (1, 3), (2, 4)], 5)
    s = _scores(g, _pairs(spark, [(3, 4)]), steps=3, replicates=4)
    assert s[(3, 4)] == pytest.approx(0.64, abs=1e-12)


# ------------------------------------------------------------- python replay
def _py_hash(r, t, cur):
    m1 = ((r + 1) * PRI_A1 + t * PRI_A2 + (cur + 1) * PRI_B) % ANF_P
    m2 = (m1 * m1 + PRI_A1) % ANF_P
    return (m2 * m2 + PRI_A2) % ANF_P


def _py_simrank(edges, pairs, steps, replicates, c_num=4, c_den=5):
    inn = {}
    for s, d in sorted(set(edges)):
        if s != d:
            inn.setdefault(d, []).append(s)
    for v in inn:
        inn[v] = sorted(set(inn[v]))

    def walk(v, r):
        pos = [v]
        for t in range(1, steps + 1):
            nb = inn.get(pos[-1])
            if not nb:
                return pos
            pos.append(nb[_py_hash(r, t, pos[-1]) % len(nb)])
        return pos

    out = {}
    for u, v in pairs:
        tot = 0
        for r in range(replicates):
            wu, wv = walk(u, r), walk(v, r)
            for t in range(1, min(len(wu), len(wv))):
                if wu[t] == wv[t]:
                    tot += c_num**t * c_den ** (steps - t)
                    break
        out[(u, v)] = tot / (replicates * c_den**steps)
    return out


def test_random_digraph_matches_python_replay(spark):
    import random

    rng = random.Random(23)
    n = 30
    edges = [
        (u, v) for u in range(n) for v in range(n) if u != v and rng.random() < 0.12
    ]
    g = _graph(spark, edges, n)
    pl = [(u, v) for u in range(0, n, 3) for v in range(u + 1, n, 4)]
    got = _scores(g, _pairs(spark, pl), steps=4, replicates=6)
    want = _py_simrank(edges, pl, steps=4, replicates=6)
    assert got.keys() == want.keys()
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-12), k


# ---------------------------------------------------------------- coalescence
def test_walks_coalesce_permanently(spark):
    # once two replicate-r walks share a position they stay together:
    # H(r, t, cur) has no start dependence
    import random

    rng = random.Random(5)
    n = 20
    edges = [
        (u, v) for u in range(n) for v in range(n) if u != v and rng.random() < 0.3
    ]
    g = _graph(spark, edges, n)
    starts = g.vertices.select("id")
    rows = reverse_walk_table(g, starts, steps=6, replicates=2).collect()
    pos = {(r["start"], r["r"], r["t"]): r["pos"] for r in rows}
    for (s1, r1, t1), p1 in pos.items():
        for s2 in range(n):
            if s2 == s1:
                continue
            if pos.get((s2, r1, t1)) == p1:
                nxt1, nxt2 = pos.get((s1, r1, t1 + 1)), pos.get((s2, r1, t1 + 1))
                assert nxt1 == nxt2


# ------------------------------------------------------------------ cocited
def test_cocited_pairs_and_hub_cap(spark):
    g = _graph(spark, [(0, 1), (0, 2), (3, 2), (3, 4)], 5)
    got = {(r["u"], r["v"]) for r in cocited_pairs(g).collect()}
    assert got == {(1, 2), (2, 4)}
    # cap 1 removes both sources (out-degree 2)
    assert cocited_pairs(g, max_out_degree=1).count() == 0
