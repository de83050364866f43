from tests.conftest import make_graph


def test_co_citation_counts(spark):
    from graphina_spark.operators.cocitation import co_citation

    # 0 and 1 both cite {3,4}; 2 cites only 4
    g = make_graph(spark, [(0, 3), (0, 4), (1, 3), (1, 4), (2, 4)], n=5)
    got = {(r["u"], r["v"]): r["n_common"] for r in co_citation(g).collect()}
    assert got == {(3, 4): 2}  # 3,4 co-cited by 0 and 1


def test_bibliographic_coupling_counts(spark):
    from graphina_spark.operators.cocitation import bibliographic_coupling

    g = make_graph(spark, [(0, 3), (0, 4), (1, 3), (1, 4), (2, 4)], n=5)
    got = {
        (r["u"], r["v"]): r["n_common"]
        for r in bibliographic_coupling(g).collect()
    }
    # 0-1 share {3,4}; 0-2 and 1-2 share {4}
    assert got == {(0, 1): 2, (0, 2): 1, (1, 2): 1}


def test_max_degree_drops_hub_centers(spark):
    from graphina_spark.operators.cocitation import co_citation

    # hub 0 cites everyone; 1 and 2 both cite {5,6}
    edges = [(0, t) for t in range(3, 7)] + [(1, 5), (1, 6), (2, 5), (2, 6)]
    g = make_graph(spark, edges, n=7)
    # cap excludes hub 0 (out-degree 4) as a wedge center
    got = {
        (r["u"], r["v"]): r["n_common"]
        for r in co_citation(g, max_degree=3).collect()
    }
    assert got == {(5, 6): 2}  # via 1 and 2 only; hub-0-only pairs gone
    # uncapped: hub 0 contributes all 6 pairs over {3,4,5,6}
    got_full = {
        (r["u"], r["v"]): r["n_common"]
        for r in co_citation(g, max_degree=None).collect()
    }
    assert got_full[(5, 6)] == 3 and len(got_full) == 6


# --- hypothesis: brute-force cross-check on random small digraphs ----------
from collections import Counter

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_edge_lists = st.lists(
    st.tuples(st.integers(0, 7), st.integers(0, 7)), min_size=1, max_size=16
)


def _brute(edges, shared_idx, other_idx, min_count):
    adj = set(edges)
    byk = {}
    for e in adj:
        byk.setdefault(e[shared_idx], set()).add(e[other_idx])
    c = Counter()
    for members in byk.values():
        ms = sorted(members)
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                c[(ms[i], ms[j])] += 1
    return {p: n for p, n in c.items() if n >= min_count}


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edges=_edge_lists)
def test_cocitation_matches_bruteforce(spark, edges):
    from graphina_spark.operators.cocitation import (
        bibliographic_coupling,
        co_citation,
    )

    g = make_graph(spark, edges, n=8, directed=True)
    got = {
        (r["u"], r["v"]): r["n_common"]
        for r in co_citation(g, max_degree=None).collect()
    }
    assert got == _brute(edges, 0, 1, 1)
    got2 = {
        (r["u"], r["v"]): r["n_common"]
        for r in bibliographic_coupling(g, max_degree=None).collect()
    }
    assert got2 == _brute(edges, 1, 0, 1)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edges=_edge_lists)
def test_salsa_mass_conservation(spark, edges):
    """Both SALSA vectors stay L1-normalized on any digraph with edges."""
    from pyspark.sql import functions as F

    from graphina_spark.operators.salsa import salsa

    edges = [(u, v) for u, v in edges if u != v]
    if not edges:
        edges = [(0, 1)]
    g = make_graph(spark, edges, n=8, directed=True)
    sums = salsa(g, fixed_iters=2).agg(
        F.sum(F.abs(F.col("hub"))), F.sum(F.abs(F.col("authority")))
    ).first()
    assert sums[0] == pytest.approx(1.0, abs=1e-9)
    assert sums[1] == pytest.approx(1.0, abs=1e-9)
