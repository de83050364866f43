"""GNN-prep operators vs a brute-force Python twin of the portable
edge-hash sampler and an exact float mean."""

import pytest
from pyspark.sql import functions as F

from graphina_spark.operators.approximation import PRI_A1, PRI_A2, PRI_B
from graphina_spark.operators.distmetrics import ANF_P
from graphina_spark.operators.gnnprep import sage_neighbor_mean, sample_neighbors
from tests.conftest import make_graph

EDGES = [(0, 1), (0, 2), (0, 3), (0, 4), (1, 2), (2, 3), (5, 0), (6, 6)]
N = 8


def _hash(src, dst):
    h1 = (src * PRI_A1 + dst + PRI_B) % ANF_P
    h2 = (h1 * h1 + PRI_A1) % ANF_P
    return (h2 * h2 + PRI_A2) % ANF_P


def _expected_sample(k, directed=False):
    nb = {}
    for s, d in EDGES:
        if s == d:
            continue
        nb.setdefault(s, set()).add(d)
        if not directed:
            nb.setdefault(d, set()).add(s)
    out = {}
    for v, ns in nb.items():
        ranked = sorted(ns, key=lambda u: (_hash(v, u), u))
        out[v] = set(ranked[:k])
    return out


@pytest.fixture(scope="module")
def g(spark):
    return make_graph(spark, EDGES, n=N, directed=True)


def test_sample_matches_python_twin(spark, g):
    got = {}
    for r in sample_neighbors(g, k=2, directed=False).collect():
        got.setdefault(r["src"], set()).add(r["dst"])
    assert got == _expected_sample(2)


def test_sample_caps_at_degree(spark, g):
    exp = _expected_sample(10)
    got = {}
    for r in sample_neighbors(g, k=10, directed=False).collect():
        got.setdefault(r["src"], set()).add(r["dst"])
    assert got == exp  # every neighbor kept when k >= degree


def test_sample_directed_view(spark, g):
    got = {}
    for r in sample_neighbors(g, k=10, directed=True).collect():
        got.setdefault(r["src"], set()).add(r["dst"])
    assert got == _expected_sample(10, directed=True)
    assert 4 not in got  # sink vertex: no out-neighbors in the directed view


def test_two_phase_equals_single_window(spark, g):
    # salt_buckets=1 collapses phase 1 into the plain single-window top-k;
    # selection under a total order must be identical for any bucketing
    a = sorted(map(tuple, sample_neighbors(g, k=2, salt_buckets=1).collect()))
    b = sorted(map(tuple, sample_neighbors(g, k=2, salt_buckets=64).collect()))
    assert a == b


def test_sage_mean_exact(spark, g):
    feats = spark.createDataFrame(
        [(i, [float(i), float(10 * i)]) for i in range(4)],
        "vec_id long, embedding array<float>",
    )
    out = {
        (r["id"], r["pos"]): (r["mean_val"], r["n_sampled"])
        for r in sage_neighbor_mean(g, feats, k=2, directed=False).collect()
    }
    exp_sample = _expected_sample(2)
    for v, ns in exp_sample.items():
        vecs = [[float(u % 4), float(10 * (u % 4))] for u in sorted(ns)]
        for pos in range(2):
            mean = sum(x[pos] for x in vecs) / len(vecs)
            assert out[(v, pos)] == (pytest.approx(mean, abs=0), len(vecs)), (v, pos)


def test_sage_self_loop_and_isolate_excluded(spark, g):
    feats = spark.createDataFrame(
        [(i, [1.0]) for i in range(4)], "vec_id long, embedding array<float>"
    )
    ids = {r["id"] for r in sage_neighbor_mean(g, feats, k=2, directed=False).collect()}
    assert 6 not in ids  # self-loop only
    assert 7 not in ids  # isolate


def test_khop_frontier_structure(spark, g):
    from graphina_spark.operators.gnnprep import sample_khop_frontier

    rows = sample_khop_frontier(g, k1=2, k2=1, directed=False).collect()
    s1 = _expected_sample(2)
    s2 = _expected_sample(1)
    hop1 = {(r["root"], r["src"], r["dst"]) for r in rows if r["hop"] == 1}
    hop2 = {(r["root"], r["src"], r["dst"]) for r in rows if r["hop"] == 2}
    exp1 = {(v, v, u) for v, ns in s1.items() for u in ns}
    exp2 = {(v, u, w) for v, ns in s1.items() for u in ns for w in s2.get(u, ())}
    assert hop1 == exp1
    assert hop2 == exp2


def test_khop_hop2_sample_is_root_independent(spark, g):
    # the same frontier vertex must carry the identical hop-2 fanout for
    # every root that reaches it (sampled once, joined, never re-sampled)
    from graphina_spark.operators.gnnprep import sample_khop_frontier

    rows = sample_khop_frontier(g, k1=3, k2=2, directed=False).collect()
    per_root = {}
    for r in rows:
        if r["hop"] == 2:
            per_root.setdefault((r["root"], r["src"]), set()).add(r["dst"])
    by_vertex = {}
    for (root, u), ws in per_root.items():
        assert by_vertex.setdefault(u, ws) == ws, u
