"""Co-purchase graph derivation vs brute-force basket pair counting."""

from itertools import combinations

import pytest

from graphina_spark.operators.copurchase import copurchase_graph, copurchase_pairs

# baskets: order -> parts (order 4 is a mega-order for the cap test;
# duplicate lines in order 1 must collapse via the distinct incidence)
BASKETS = {
    1: [10, 11, 12, 10],
    2: [10, 11],
    3: [11, 12, 13],
    4: list(range(100, 120)),
}


@pytest.fixture(scope="module")
def li(spark):
    rows = [(ok, pk) for ok, pks in BASKETS.items() for pk in pks]
    return spark.createDataFrame(rows, "l_orderkey long, l_partkey long")


def _brute(min_count, cap):
    cnt = {}
    for ok, pks in BASKETS.items():
        pks = sorted(set(pks))
        if len(pks) > cap:
            continue
        for a, b in combinations(pks, 2):
            cnt[(a, b)] = cnt.get((a, b), 0) + 1
    return {k: v for k, v in cnt.items() if v >= min_count}


def test_pairs_match_bruteforce(spark, li):
    got = {
        (r["src"], r["dst"]): r["cnt"]
        for r in copurchase_pairs(li, min_count=1, max_items_per_order=50).collect()
    }
    assert got == _brute(1, 50)


def test_min_count_filter(spark, li):
    got = {
        (r["src"], r["dst"]): r["cnt"]
        for r in copurchase_pairs(li, min_count=2, max_items_per_order=50).collect()
    }
    assert got == _brute(2, 50) == {(10, 11): 2, (11, 12): 2}


def test_mega_order_cap(spark, li):
    got = {
        (r["src"], r["dst"])
        for r in copurchase_pairs(li, min_count=1, max_items_per_order=10).collect()
    }
    assert got == set(_brute(1, 10))
    assert not any(a >= 100 for a, _ in got)  # the 20-item order is excluded


def test_graph_shape(spark, li):
    g = copurchase_graph(li, min_count=2, max_items_per_order=50)
    assert g.vertices.count() == len({p for pks in BASKETS.values() for p in pks})
    edges = {(r["src"], r["dst"]): r["weight"] for r in g.edges.collect()}
    # symmetrized: both orientations with the shared-order count as weight
    assert edges[(10, 11)] == edges[(11, 10)] == 2.0
    assert (13, 11) not in edges  # below min_count
