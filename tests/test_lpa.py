"""Synchronous LPA vs the pinned deterministic semantics; partition-equality
on unambiguous community fixtures (the reference's own test strategy for
async-divergent algorithms, label_propagation.rs:101-126)."""

import pytest

from conftest import make_graph
from reference_impl import ref_sync_lpa

from graphina_spark.operators.lpa import label_propagation


def labels_dict(df):
    return {r["id"]: r["label"] for r in df.collect()}


def partition_of(labels):
    inv = {}
    for k, v in labels.items():
        inv.setdefault(v, set()).add(k)
    return sorted(tuple(sorted(s)) for s in inv.values())


def clique(nodes):
    return [(a, b) for i, a in enumerate(nodes) for b in nodes[i + 1 :]]


def test_two_cliques_bridge(spark):
    # two K5s + one bridge → 2 communities (label_propagation.rs:101-126)
    k1, k2 = list(range(5)), list(range(5, 10))
    edges = clique(k1) + clique(k2) + [(4, 5)]
    g = make_graph(spark, edges, n=10, directed=False)
    got = labels_dict(label_propagation(g, max_iter=20))
    assert partition_of(got) == [tuple(k1), tuple(k2)]


def test_trajectory_matches_reference_impl(spark):
    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 0), (5, 6)]
    g = make_graph(spark, edges, n=7, directed=False)
    got = labels_dict(label_propagation(g, fixed_iters=4))
    exp = ref_sync_lpa(7, edges, fixed_iters=4)
    assert got == {i: exp[i] for i in range(7)}


def test_isolated_keeps_own_label(spark):
    g = make_graph(spark, [(0, 1)], n=3, directed=False)
    got = labels_dict(label_propagation(g, max_iter=5))
    assert got[2] == 2


def test_empty_graph_errors(spark):
    from graphina_spark.graph import LinkGraph

    e = spark.createDataFrame([], "src long, dst long, weight double")
    v = spark.createDataFrame([], "id long")
    g = LinkGraph(vertices=v, edges=e, directed=False)
    with pytest.raises(ValueError):
        label_propagation(g)  # label_propagation.rs:44-51


def test_max_iter_zero_errors(spark):
    g = make_graph(spark, [(0, 1)], n=2, directed=False)
    with pytest.raises(ValueError):
        label_propagation(g, max_iter=0)
