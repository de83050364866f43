"""Balanced-LPA partitioner vs a brute-force Python twin of the exact round
semantics (same hash, same tie-breaks), plus the two contract invariants:
capacity is never exceeded and the cut improves on the initial id % k."""

import pytest

from graphina_spark.operators.approximation import PRI_A1, PRI_A2, PRI_B
from graphina_spark.operators.balance import balanced_partition, partition_quality
from graphina_spark.operators.distmetrics import ANF_P
from tests.conftest import make_graph

# two dense blobs {0..4} and {5..9} plus a couple of cross edges — the
# natural 2-partition is the blobs, which id % 2 scrambles completely
EDGES = (
    [(a, b) for a in range(5) for b in range(a + 1, 5)]
    + [(a, b) for a in range(5, 10) for b in range(a + 1, 10)]
    + [(0, 5), (1, 6)]
)
N = 10


def _pri(v, r):
    h1 = (v * PRI_A1 + (r * PRI_A2 + PRI_B)) % ANF_P
    h2 = (h1 * h1 + PRI_A1) % ANF_P
    return (h2 * h2 + PRI_A2) % ANF_P


def _twin(k, rounds, slack_pct=10):
    nb = {i: set() for i in range(N)}
    for s, d in EDGES:
        nb[s].add(d)
        nb[d].add(s)
    cap = (N * (100 + slack_pct) + 100 * k - 1) // (100 * k)
    part = {v: v % k for v in range(N)}
    for r in range(rounds):
        cnt = {v: {} for v in range(N)}
        for v in range(N):
            for u in nb[v]:
                cnt[v][part[u]] = cnt[v].get(part[u], 0) + 1
        cand = []
        for v in range(N):
            if not cnt[v]:
                continue
            best = min(cnt[v], key=lambda p: (-cnt[v][p], p))
            ccur = cnt[v].get(part[v], 0)
            if best != part[v] and cnt[v][best] > ccur:
                cand.append((best, cnt[v][best] - ccur, _pri(v, r), v))
        sizes = {}
        for v in range(N):
            sizes[part[v]] = sizes.get(part[v], 0) + 1
        by_target = {}
        for best, gain, pri, v in cand:
            by_target.setdefault(best, []).append((-gain, pri, v))
        for best, movers in by_target.items():
            q = max(0, cap - sizes.get(best, 0))
            for _, _, v in sorted(movers)[:q]:
                part[v] = best
    return part


@pytest.fixture(scope="module")
def g(spark):
    return make_graph(spark, EDGES, n=N, directed=False)


@pytest.mark.parametrize("k,rounds", [(2, 1), (2, 3), (4, 2)])
def test_matches_python_twin(spark, g, k, rounds):
    got = {r["id"]: r["part"] for r in balanced_partition(g, k=k, fixed_rounds=rounds).collect()}
    assert got == _twin(k, rounds)


def test_capacity_respected(spark, g):
    for k in (2, 4):
        cap = (N * 110 + 100 * k - 1) // (100 * k)
        got = {}
        for r in balanced_partition(g, k=k, fixed_rounds=4).collect():
            got[r["part"]] = got.get(r["part"], 0) + 1
        assert max(got.values()) <= cap, (k, got)


def test_cut_improves_on_initial(spark, g):
    a = balanced_partition(g, k=2, fixed_rounds=3)
    q = partition_quality(g, a).first()
    # initial id % 2 cuts most blob edges; the blobs are the 2-partition
    init_cut = sum(1 for s, d in EDGES if s % 2 != d % 2)
    assert q["cut_edges"] < init_cut
    assert q["total_edges"] == len(EDGES)
    assert q["max_size"] <= (N * 110 + 199) // 200


def test_blobs_found_with_slack(spark, g):
    # with k=2 and 3 rounds the assignment should settle on the two blobs
    # (cut = only the 2 bridge edges) or at least something close
    a = balanced_partition(g, k=2, fixed_rounds=3)
    q = partition_quality(g, a).first()
    assert q["cut_edges"] <= 4
