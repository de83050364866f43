"""Determinism probes: identical results across reruns, partitionings and
parallelism levels (the north rule's reproducibility requirements), plus
hypothesis property tests in the spirit of the reference's proptest suite
(/root/reference/tests/property_based_tests.rs:417-460)."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from graphina_spark.operators.components import connected_components
from graphina_spark.operators.lpa import label_propagation
from graphina_spark.operators.pagerank import pagerank
from graphina_spark.operators.triangles import triangles, transitivity
from tests.conftest import make_graph


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_pagerank_partitioning_independent(spark, sf_dir):
    from graphina_spark.sources.derived import web_graph

    g1 = web_graph(spark, sf_dir)
    r1 = _rows(pagerank(g1, fixed_iters=4, tol=None).select("id", F.round("rank", 12)))
    g2 = web_graph(spark, sf_dir)
    g2.edges = g2.edges.repartition(13)
    g2.vertices = g2.vertices.repartition(3)
    r2 = _rows(pagerank(g2, fixed_iters=4, tol=None).select("id", F.round("rank", 12)))
    assert r1 == r2


def test_lpa_rerun_identical(spark, sf_dir):
    from graphina_spark.sources.derived import block_graph

    g = block_graph(spark, sf_dir)
    assert _rows(label_propagation(g, fixed_iters=3)) == _rows(
        label_propagation(g, fixed_iters=3)
    )


# --- hypothesis: random small graphs --------------------------------------
edge_lists = st.lists(
    st.tuples(st.integers(0, 7), st.integers(0, 7)), min_size=1, max_size=14
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edges=edge_lists)
def test_pagerank_sums_to_one(spark, edges):
    g = make_graph(spark, edges, n=8, directed=True)
    total = pagerank(g, fixed_iters=4, tol=None).agg(F.sum("rank")).first()[0]
    assert total == pytest.approx(1.0, abs=1e-9)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edges=edge_lists)
def test_components_labels_are_members(spark, edges):
    """Canonical label = min member id ⇒ every label is a member of its own
    component and labels are idempotent under relabeling."""
    g = make_graph(spark, edges, n=8, directed=False)
    labels = {r["id"]: r["component"] for r in connected_components(g).collect()}
    for v, c in labels.items():
        assert labels[c] == c  # label points to a canonical representative
        assert c <= v


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edges=edge_lists)
def test_triangles_match_bruteforce(spark, edges):
    g = make_graph(spark, edges, n=8, directed=False)
    got = {r["id"]: r["triangles"] for r in triangles(g).collect()}
    nb = {i: set() for i in range(8)}
    for u, v in edges:
        if u != v:
            nb[u].add(v)
            nb[v].add(u)
    for v in range(8):
        ns = sorted(nb[v])
        want = sum(
            1
            for i in range(len(ns))
            for j in range(i + 1, len(ns))
            if ns[j] in nb[ns[i]]
        )
        assert got[v] == want, (v, edges)
    t = transitivity(g)
    assert 0.0 <= t <= 1.0


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edges=edge_lists)
def test_mis_independent_and_maximal_random(spark, edges):
    """Luby MIS invariants hold on arbitrary small graphs: no adjacent
    winners, every loser dominated (independent_set.rs contract)."""
    from graphina_spark.operators.approximation import maximal_independent_set

    g = make_graph(spark, edges, n=8, directed=False)
    mis = {r["id"] for r in maximal_independent_set(g).collect()}
    pairs = {
        frozenset((r["src"], r["dst"]))
        for r in g.edges.collect()
        if r["src"] != r["dst"]
    }
    assert not any(p <= mis for p in pairs)
    nbrs = {}
    for p in pairs:
        a, b = tuple(p)
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    for v in {x for p in pairs for x in p} | mis:
        if v not in mis:
            assert nbrs.get(v, set()) & mis


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edges=edge_lists)
def test_matching_and_cover_random(spark, edges):
    """Matching is vertex-disjoint+maximal; its endpoints cover every edge
    (matching.rs / vertex_cover.rs contracts)."""
    from graphina_spark.operators.approximation import maximal_matching

    g = make_graph(spark, edges, n=8, directed=False)
    m = [(r["src"], r["dst"]) for r in maximal_matching(g).collect()]
    used = [v for e in m for v in e]
    assert len(used) == len(set(used))
    pairs = {
        frozenset((r["src"], r["dst"]))
        for r in g.edges.collect()
        if r["src"] != r["dst"]
    }
    assert all(p & set(used) for p in pairs)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edges=edge_lists)
def test_anf_curve_monotone_random(spark, edges):
    """NF(r) never decreases: registers only absorb bits."""
    from graphina_spark.operators.distmetrics import anf_neighborhood_function

    g = make_graph(spark, edges, n=8, directed=False)
    vals = [
        r["nf"]
        for r in sorted(
            anf_neighborhood_function(g, k=4, max_depth=8).collect(),
            key=lambda r: r["r"],
        )
    ]
    # registers only absorb bits, so the estimate is mathematically
    # monotone; allow ulp-level jitter from cross-round float summation
    # order at plateaus
    assert all(b >= a - 1e-9 * max(1.0, abs(a)) for a, b in zip(vals, vals[1:]))
