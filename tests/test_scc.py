"""Strongly connected components — distributed coloring vs Kosaraju oracle.

Reference corpus: /root/reference/tests/oracle_directed_tests.rs:104-233
(WCC/SCC block); semantics src/community/connected_components.rs:130-139.
"""

import random

import pytest

from tests.conftest import make_graph
from tests.reference_impl import ref_scc


def _run(spark, n, edges, directed=True):
    from graphina_spark.operators.scc import strongly_connected_components

    g = make_graph(spark, edges, n=n, directed=directed)
    rows = strongly_connected_components(g).collect()
    return {r["id"]: r["component"] for r in rows}


def test_two_cycles_bridge(spark):
    # 0→1→2→0 and 3→4→3, bridged 2→3: two SCCs, bridge not merged
    edges = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 3), (2, 3)]
    got = _run(spark, 5, edges)
    assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 3}


def test_dag_all_singletons(spark):
    edges = [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4)]
    got = _run(spark, 5, edges)
    assert got == {i: i for i in range(5)}


def test_bowtie(spark):
    # IN (5→core), core SCC {0,1,2}, OUT (core→6), tendril 7 isolated
    edges = [(0, 1), (1, 2), (2, 0), (5, 0), (1, 6)]
    got = _run(spark, 8, edges)
    assert got[0] == got[1] == got[2] == 0
    assert got[5] == 5 and got[6] == 6 and got[7] == 7


def test_undirected_defers_to_cc(spark):
    edges = [(0, 1), (1, 2), (4, 5)]
    got = _run(spark, 6, edges, directed=False)
    assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 4, 5: 4}


def test_condensation_edges(spark):
    from graphina_spark.operators.scc import condensation_edges

    edges = [(0, 1), (1, 0), (2, 3), (3, 2), (1, 2), (0, 3)]
    g = make_graph(spark, edges, n=4, directed=True)
    got = {(r["src"], r["dst"]) for r in condensation_edges(g).collect()}
    assert got == {(0, 2)}


@pytest.mark.parametrize("seed,n,density", [(1, 30, 0.05), (2, 40, 0.08), (3, 25, 0.15)])
def test_random_digraphs_match_kosaraju(spark, seed, n, density):
    rng = random.Random(seed)
    edges = [
        (u, v)
        for u in range(n)
        for v in range(n)
        if u != v and rng.random() < density
    ]
    want = ref_scc(n, edges)
    got = _run(spark, n, edges)
    assert got == {i: want[i] for i in range(n)}
