"""k-truss decomposition tests."""

import itertools

import pytest

from tests.conftest import make_graph


def _brute_k_truss(n, edges, k):
    """Reference peeling: iterate support counting + filtering to fixpoint."""
    es = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    while True:
        adj = {}
        for a, b in es:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        keep = {
            (a, b)
            for a, b in es
            if len(adj[a] & adj[b]) >= k - 2
        }
        if keep == es:
            return es
        es = keep


# two 4-cliques sharing vertex 3, plus a tail 8-9 and a triangle 10-11-12
_EDGES = (
    [e for e in itertools.combinations([0, 1, 2, 3], 2)]
    + [e for e in itertools.combinations([3, 4, 5, 6], 2)]
    + [(7, 8), (8, 9), (10, 11), (11, 12), (10, 12), (0, 10)]
)


def test_k_truss_matches_bruteforce(spark):
    from graphina_spark.operators.truss import k_truss

    g = make_graph(spark, _EDGES, n=13, directed=False)
    for k in (3, 4, 5):
        got = {(r["src"], r["dst"]) for r in k_truss(g, k).collect()}
        assert got == _brute_k_truss(13, _EDGES, k), f"k={k}"


def test_k_truss_2_is_whole_simple_graph(spark):
    from graphina_spark.operators.truss import k_truss

    g = make_graph(spark, _EDGES, n=13, directed=False)
    got = {(r["src"], r["dst"]) for r in k_truss(g, 2).collect()}
    assert got == {tuple(sorted(e)) for e in _EDGES}


def test_k_truss_validates_k(spark):
    from graphina_spark.operators.truss import k_truss

    g = make_graph(spark, _EDGES, n=13, directed=False)
    with pytest.raises(ValueError):
        k_truss(g, 1)


def test_truss_number(spark):
    from graphina_spark.operators.truss import truss_number

    g = make_graph(spark, _EDGES, n=13, directed=False)
    got = {(r["src"], r["dst"]): r["truss"] for r in truss_number(g).collect()}
    # clique edges have trussness 4, triangle edges 3, bridges/tails 2
    assert got[(0, 1)] == 4 and got[(3, 4)] == 4
    assert got[(10, 11)] == 3
    assert got[(7, 8)] == 2 and got[(0, 10)] == 2
    assert len(got) == len({tuple(sorted(e)) for e in _EDGES})
