"""Configuration-model null graph: the degree sequence is preserved exactly
(the defining invariant of stub matching), draws are deterministic per seed,
and distinct seeds give different pairings."""

import pytest
from pyspark.sql import functions as F

from graphina_spark.operators.nullmodel import configuration_model
from tests.conftest import make_graph

EDGES = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 5), (5, 3), (0, 3), (6, 0)]
N = 7


def _deg():
    deg = {}
    for s, d in EDGES:
        if s == d:
            continue
        deg[s] = deg.get(s, 0) + 1
        deg[d] = deg.get(d, 0) + 1
    return deg


@pytest.fixture(scope="module")
def g(spark):
    return make_graph(spark, EDGES, n=N, directed=False)


def _stub_degrees(rows):
    out = {}
    for r in rows:
        out[r["src"]] = out.get(r["src"], 0) + r["multiplicity"]
        out[r["dst"]] = out.get(r["dst"], 0) + r["multiplicity"]
        if r["src"] == r["dst"]:
            pass  # self-loop already counted twice by the two lines above
    return out


def test_degree_sequence_preserved(spark, g):
    rows = configuration_model(g, seed=0).collect()
    assert _stub_degrees(rows) == _deg()
    assert sum(r["multiplicity"] for r in rows) == len(EDGES)


def test_deterministic_per_seed(spark, g):
    a = sorted(map(tuple, configuration_model(g, seed=0).collect()))
    b = sorted(map(tuple, configuration_model(g, seed=0).collect()))
    assert a == b


def test_seeds_give_distinct_draws(spark, g):
    draws = {
        s: sorted(map(tuple, configuration_model(g, seed=s).collect()))
        for s in range(4)
    }
    assert len({tuple(v) for v in draws.values()}) >= 2
    for v in draws.values():  # every draw preserves degrees
        assert _stub_degrees([dict(zip(("src", "dst", "multiplicity"), r)) for r in v]) == _deg()


def test_canonical_edges(spark, g):
    rows = configuration_model(g, seed=1).collect()
    assert all(r["src"] <= r["dst"] for r in rows)


def _pearson(pairs):
    n = len(pairs)
    sx = sum(j for j, _ in pairs)
    sxx = sum(j * j for j, _ in pairs)
    sxy = sum(j * k for j, k in pairs)
    mx = sx / n
    den = sxx / n - mx * mx
    return 0.0 if den == 0 else (sxy / n - mx * mx) / den


def test_null_delta_real_r_matches_bruteforce(spark, g):
    from graphina_spark.operators.nullmodel import assortativity_null_delta

    row = assortativity_null_delta(g, seed=0).first()
    deg = _deg()
    pairs = []
    for s, d in EDGES:
        if s == d:
            continue
        pairs.append((deg[s], deg[d]))
        pairs.append((deg[d], deg[s]))
    assert row["real_r"] == pytest.approx(_pearson(pairs))
    assert row["delta"] == pytest.approx(row["real_r"] - row["null_r"])


def test_null_r_uses_null_pairing(spark, g):
    # the null draw has the same degree MARGINALS but different pairing;
    # recompute its Pearson from the drawn edges directly
    from graphina_spark.operators.nullmodel import (
        assortativity_null_delta,
        configuration_model,
    )

    row = assortativity_null_delta(g, seed=0).first()
    deg = _deg()
    pairs = []
    for r in configuration_model(g, seed=0).collect():
        for _ in range(r["multiplicity"]):
            pairs.append((deg[r["src"]], deg[r["dst"]]))
            pairs.append((deg[r["dst"]], deg[r["src"]]))
    assert row["null_r"] == pytest.approx(_pearson(pairs))
