"""Multilevel partitioner vs a brute-force Python twin of the full pipeline
(heavy-edge handshake matching → weighted coarse rounds → projection →
unweighted refine rounds, same hash, same tie-breaks), plus the contract
invariants: the matching is a valid matching, capacity in fine-vertex units
is never exceeded, and the multilevel cut beats flat balanced LPA on a
blob fixture whose structure one coarsening level exposes."""

import pytest

from graphina_spark.operators.approximation import PRI_A1, PRI_A2, PRI_B
from graphina_spark.operators.balance import balanced_partition, partition_quality
from graphina_spark.operators.distmetrics import ANF_P
from graphina_spark.operators.multilevel import (
    heavy_edge_matching,
    multilevel_partition,
)
from tests.conftest import make_graph

# four dense blobs of 4 (natural 4-partition / pairable by matching) plus a
# sparse cross-ring; id % k scrambles the blobs completely
BLOB = 4
N = 16
EDGES = [
    (b * BLOB + a, b * BLOB + c)
    for b in range(4)
    for a in range(BLOB)
    for c in range(a + 1, BLOB)
] + [(i, (i + BLOB) % N) for i in range(0, N, 2)]
WEIGHTS = [3.0] * (4 * BLOB * (BLOB - 1) // 2) + [1.0] * (N // 2)


def _pri(v, r):
    h1 = (v * PRI_A1 + (r * PRI_A2 + PRI_B)) % ANF_P
    h2 = (h1 * h1 + PRI_A1) % ANF_P
    return (h2 * h2 + PRI_A2) % ANF_P


def _pair_weights():
    pw = {}
    for (s, d), w in zip(EDGES, WEIGHTS):
        key = (min(s, d), max(s, d))
        pw[key] = pw.get(key, 0) + int(w)
    return pw


def _twin_matching():
    pw = _pair_weights()
    nbrs = {v: {} for v in range(N)}
    for (s, d), w in pw.items():
        nbrs[s][d] = w
        nbrs[d][s] = w
    pick = {}
    for v in range(N):
        if nbrs[v]:
            pick[v] = min(nbrs[v], key=lambda u: (-nbrs[v][u], u))
    group = {v: v for v in range(N)}
    for v, u in pick.items():
        if v < u and pick.get(u) == v:
            group[u] = v
    return group


def _twin_rounds(part, nbrs, nw, k, cap, rounds, off):
    for j in range(rounds):
        r = off + j
        cnt = {v: {} for v in part}
        for v, nb in nbrs.items():
            for u, w in nb.items():
                cnt[v][part[u]] = cnt[v].get(part[u], 0) + w
        cand = []
        for v in part:
            if not cnt.get(v):
                continue
            best = min(cnt[v], key=lambda p: (-cnt[v][p], p))
            ccur = cnt[v].get(part[v], 0)
            if best != part[v] and cnt[v][best] > ccur:
                cand.append((best, cnt[v][best] - ccur, _pri(v, r), v))
        sizes = {}
        for v in part:
            sizes[part[v]] = sizes.get(part[v], 0) + nw[v]
        by_target = {}
        for best, gain, pri, v in cand:
            by_target.setdefault(best, []).append((-gain, pri, v))
        for best, movers in by_target.items():
            q = max(0, cap - sizes.get(best, 0))
            run = 0
            for _, _, v in sorted(movers):
                run += nw[v]
                if run > q:
                    break
                part[v] = best
    return part


def _twin_multilevel(k, coarse_rounds, refine_rounds, slack_pct=10):
    cap = (N * (100 + slack_pct) + 100 * k - 1) // (100 * k)
    group = _twin_matching()
    pw = _pair_weights()
    nw = {}
    for v, g in group.items():
        nw[g] = nw.get(g, 0) + 1
    cnbrs = {g: {} for g in nw}
    for (s, d), w in pw.items():
        gs, gd = group[s], group[d]
        if gs != gd:
            cnbrs[gs][gd] = cnbrs[gs].get(gd, 0) + w
            cnbrs[gd][gs] = cnbrs[gd].get(gs, 0) + w
    order = sorted(nw, key=lambda g: (-nw[g], g))
    cpart = _twin_rounds(
        {g: i % k for i, g in enumerate(order)}, cnbrs, nw, k, cap, coarse_rounds, 0
    )
    part = {v: cpart[group[v]] for v in range(N)}
    fnbrs = {v: {} for v in range(N)}
    for s, d in pw:
        fnbrs[s][d] = 1
        fnbrs[d][s] = 1
    ones = {v: 1 for v in range(N)}
    return _twin_rounds(part, fnbrs, ones, k, cap, refine_rounds, coarse_rounds)


@pytest.fixture(scope="module")
def g(spark):
    return make_graph(spark, EDGES, n=N, directed=False, weights=WEIGHTS)


def test_matching_valid_and_matches_twin(spark, g):
    got = {r["id"]: r["group"] for r in heavy_edge_matching(g).collect()}
    assert got == _twin_matching()
    # valid matching: every group has 1 or 2 members, group id = min member
    members = {}
    for v, grp in got.items():
        members.setdefault(grp, []).append(v)
    for grp, vs in members.items():
        assert len(vs) <= 2
        assert grp == min(vs)


@pytest.mark.parametrize("k,cr,rr", [(2, 2, 1), (4, 3, 2), (4, 2, 0)])
def test_matches_python_twin(spark, g, k, cr, rr):
    got = {
        r["id"]: r["part"]
        for r in multilevel_partition(
            g, k=k, coarse_rounds=cr, refine_rounds=rr
        ).collect()
    }
    assert got == _twin_multilevel(k, cr, rr)


def test_capacity_and_quality(spark, g):
    k = 4
    cap = (N * 110 + 100 * k - 1) // (100 * k)
    a = multilevel_partition(g, k=k, coarse_rounds=3, refine_rounds=2)
    q = partition_quality(g, a).first()
    assert q["max_size"] <= cap
    assert q["total_edges"] == len(set((min(s, d), max(s, d)) for s, d in EDGES))
    flat = partition_quality(g, balanced_partition(g, k=k, fixed_rounds=5)).first()
    # blobs of 4 with k=4: multilevel should cut only ring edges
    assert q["cut_frac"] <= flat["cut_frac"]
    assert q["cut_edges"] <= N // 2
