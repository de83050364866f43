"""Bow-tie decomposition (operators/bowtie.py) on hand-built fixtures."""

import pytest

from tests.conftest import make_graph


def test_bowtie_all_classes(spark):
    from graphina_spark.operators.bowtie import bowtie_classification

    # core: 0<->1; in: 2->0; out: 1->3; tube: 2->4->3; tendril: 2->5; disc: 6
    edges = [(0, 1), (1, 0), (2, 0), (1, 3), (2, 4), (4, 3), (2, 5)]
    g = make_graph(spark, edges, n=7, directed=True)
    got = {r["id"]: r["cls"] for r in bowtie_classification(g).collect()}
    assert got == {
        0: "CORE",
        1: "CORE",
        2: "IN",
        3: "OUT",
        4: "TUBE",
        5: "TENDRIL",
        6: "DISC",
    }


def test_bowtie_largest_scc_wins(spark):
    from graphina_spark.operators.bowtie import bowtie_classification

    # two SCCs: {0,1} and {2,3,4} (larger) — larger one must be the core,
    # and {0,1} then reaches it, so it becomes IN
    edges = [(0, 1), (1, 0), (2, 3), (3, 4), (4, 2), (1, 2)]
    g = make_graph(spark, edges, n=5, directed=True)
    got = {r["id"]: r["cls"] for r in bowtie_classification(g).collect()}
    assert got == {0: "IN", 1: "IN", 2: "CORE", 3: "CORE", 4: "CORE"}


def test_bowtie_summary_counts(spark):
    from graphina_spark.operators.bowtie import bowtie_summary

    edges = [(0, 1), (1, 0), (2, 0), (1, 3), (2, 4), (4, 3), (2, 5)]
    g = make_graph(spark, edges, n=7, directed=True)
    got = {r["cls"]: r["n"] for r in bowtie_summary(g).collect()}
    assert got == {
        "CORE": 2,
        "IN": 1,
        "OUT": 1,
        "TUBE": 1,
        "TENDRIL": 1,
        "DISC": 1,
    }


def test_bowtie_rejects_undirected(spark):
    from graphina_spark.operators.bowtie import bowtie_classification

    g = make_graph(spark, [(0, 1)], n=2, directed=False)
    with pytest.raises(ValueError):
        bowtie_classification(g)


def test_planted_bowtie_graph_matches_closed_form(spark):
    """The derived fixture's classes are a closed-form function of id —
    run the full operator over it and check the arithmetic ground truth
    (mirrors the bowtie_planted gate at sf0.01)."""
    from graphina_spark.operators.bowtie import bowtie_classification
    from graphina_spark.sources.derived import bowtie_graph
    from pyspark.sql import functions as F

    # shrink: derive from a 40-id "customer" table registered as parquet is
    # overkill here; build the same shape inline
    n = 40
    ids = spark.range(n).select(F.col("id").cast("long"))
    import graphina_spark.sources.derived as D

    orig = D._customer_ids
    D._customer_ids = lambda _s, _d: ids
    try:
        g = bowtie_graph(spark, "ignored")
        got = {r["id"]: r["cls"] for r in bowtie_classification(g).collect()}
    finally:
        D._customer_ids = orig
    c1 = n // 4
    for i in range(n):
        if i < c1:
            want = "CORE"
        elif i < 2 * c1:
            want = "IN"
        elif i < 3 * c1:
            want = "OUT"
        elif (i - 3 * c1) % 3 == 0:
            want = "TENDRIL"
        elif (i - 3 * c1) % 3 == 1:
            want = "TUBE"
        else:
            want = "DISC"
        assert got[i] == want, f"id {i}: got {got[i]}, want {want}"
