"""Triad census: hand-pinned fixtures + brute-force parity on random digraphs."""

import random
from itertools import combinations

import pytest

from graphina_spark.graph import LinkGraph
from graphina_spark.operators.triads import (
    TRIAD_NAMES,
    TRICODE_CLASS,
    _classify_bits,
    triad_census,
)


def _census_dict(g):
    return {r["triad"]: r["count"] for r in triad_census(g).collect()}


def _brute(edges, n):
    """Brute-force census: classify every C(n,3) triple via the 6-bit code.
    Independent of the Spark complement math (but shares _classify_bits,
    whose convention the hand-pinned fixtures below pin independently)."""
    eset = {(s, d) for s, d in edges if s != d}
    out = {name: 0 for name in TRIAD_NAMES}
    for a, b, c in combinations(range(n), 3):
        bits = 0
        for bit, (s, d) in zip(
            (1, 2, 4, 8, 16, 32),
            ((a, b), (b, a), (a, c), (c, a), (b, c), (c, b)),
        ):
            if (s, d) in eset:
                bits |= bit
        out[_classify_bits(bits)] += 1
    return out


def _graph(spark, edges, n):
    vdf = spark.createDataFrame([(i,) for i in range(n)], "id long")
    edf = spark.createDataFrame(edges, "src long, dst long")
    return LinkGraph.from_edges(edf, directed=True, vertices=vdf)


# ---------------------------------------------------------------- conventions
def test_classifier_conventions():
    """Pin the published variant letters by explicit edge pictures
    (independent of any derived table)."""

    def bits(*es):
        table = {(0, 1): 1, (1, 0): 2, (0, 2): 4, (2, 0): 8, (1, 2): 16, (2, 1): 32}
        b = 0
        for e in es:
            b |= table[e]
        return b

    assert _classify_bits(0) == "003"
    assert _classify_bits(bits((0, 1))) == "012"
    assert _classify_bits(bits((0, 1), (1, 0))) == "102"
    # 021D: A<-B->C  (B sends to both)
    assert _classify_bits(bits((1, 0), (1, 2))) == "021D"
    # 021U: A->B<-C
    assert _classify_bits(bits((0, 1), (2, 1))) == "021U"
    # 021C: A->B->C
    assert _classify_bits(bits((0, 1), (1, 2))) == "021C"
    # 111D: A<->B<-C
    assert _classify_bits(bits((0, 1), (1, 0), (2, 1))) == "111D"
    # 111U: A<->B->C
    assert _classify_bits(bits((0, 1), (1, 0), (1, 2))) == "111U"
    # 030T: A->B, A->C, B->C (transitive)
    assert _classify_bits(bits((0, 1), (0, 2), (1, 2))) == "030T"
    # 030C: A->B->C->A
    assert _classify_bits(bits((0, 1), (1, 2), (2, 0))) == "030C"
    assert _classify_bits(bits((0, 1), (1, 0), (0, 2), (2, 0))) == "201"
    # 120D: A<-B->C, A<->C (B = non-mutual corner, sends both)
    assert _classify_bits(bits((1, 0), (1, 2), (0, 2), (2, 0))) == "120D"
    # 120U: A->B<-C, A<->C
    assert _classify_bits(bits((0, 1), (2, 1), (0, 2), (2, 0))) == "120U"
    # 120C: A->B->C, A<->C
    assert _classify_bits(bits((0, 1), (1, 2), (0, 2), (2, 0))) == "120C"
    assert _classify_bits(bits((0, 1), (1, 0), (0, 2), (2, 0), (1, 2))) == "210"
    assert _classify_bits(bits((0, 1), (1, 0), (0, 2), (2, 0), (1, 2), (2, 1))) == "300"
    # every code classifies, table covers all 16 names
    assert set(TRICODE_CLASS) == set(TRIAD_NAMES)


# ---------------------------------------------------------------- tiny pinned
def test_cycle_triangle(spark):
    g = _graph(spark, [(0, 1), (1, 2), (2, 0)], 3)
    c = _census_dict(g)
    assert c["030C"] == 1
    assert sum(c.values()) == 1


def test_single_edge_complement(spark):
    g = _graph(spark, [(0, 1)], 5)
    c = _census_dict(g)
    assert c["012"] == 3  # {0,1,x} for x in {2,3,4}
    assert c["003"] == 7  # C(5,3)=10 minus the three 012s
    assert sum(c.values()) == 10


def test_mutual_star(spark):
    # hub 0 mutual with 1,2,3 -> every {i,j,0} is 201; {1,2,3} is 003
    edges = [(0, i) for i in (1, 2, 3)] + [(i, 0) for i in (1, 2, 3)]
    c = _census_dict(_graph(spark, edges, 4))
    assert c["201"] == 3
    assert c["003"] == 1
    assert c["102"] == 0
    assert sum(c.values()) == 4


# ------------------------------------------------------------- random parity
@pytest.mark.parametrize("seed,n,p", [(7, 12, 0.25), (11, 10, 0.45), (13, 14, 0.12)])
def test_random_digraph_matches_brute_force(spark, seed, n, p):
    rng = random.Random(seed)
    edges = [
        (u, v)
        for u in range(n)
        for v in range(n)
        if u != v and rng.random() < p
    ]
    got = _census_dict(_graph(spark, edges, n))
    want = _brute(edges, n)
    assert got == want
    assert sum(got.values()) == n * (n - 1) * (n - 2) // 6


def test_parallel_edges_and_loops_collapse(spark):
    # duplicates and self-loops must not perturb the census
    g = _graph(spark, [(0, 1), (0, 1), (1, 1), (1, 2), (2, 0)], 3)
    c = _census_dict(g)
    assert c["030C"] == 1
    assert sum(c.values()) == 1
