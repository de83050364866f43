"""Seeded (hard-clamp) label propagation — semantics on planted fixtures."""

import pytest
from pyspark.sql import functions as F

from graphina_spark.operators.lpa import seeded_label_propagation
from tests.conftest import make_graph


def _labels(df):
    return {r["id"]: r["label"] for r in df.collect()}


def test_two_seed_territories(spark):
    # path 0-1-2-3-4-5: seeds at the ends → territory split at the middle;
    # vertex 2 hears label(1)=0's label... after enough rounds labels from
    # both ends meet; tie at equidistant vertices resolves by (count, label)
    g = make_graph(spark, [(i, i + 1) for i in range(5)], n=6, directed=False)
    seeds = spark.createDataFrame([(0, 100), (5, 200)], "id long, label long")
    out = _labels(seeded_label_propagation(g, seeds, fixed_iters=3))
    assert out[0] == 100 and out[5] == 200  # clamped
    assert out[1] == 100 and out[2] == 100
    assert out[4] == 200
    # vertex 3 sees a 100/200 tie in round 3 → (count desc, label asc) → 100
    assert out[3] == 100


def test_unreached_stay_null(spark):
    # two components; seed only one
    g = make_graph(spark, [(0, 1), (2, 3)], n=4, directed=False)
    seeds = spark.createDataFrame([(0, 7)], "id long, label long")
    out = _labels(seeded_label_propagation(g, seeds, fixed_iters=2))
    assert out[0] == 7 and out[1] == 7
    assert out[2] is None and out[3] is None


def test_khop_reach(spark):
    # a chain: after k rounds exactly k hops are labeled
    g = make_graph(spark, [(i, i + 1) for i in range(6)], n=7, directed=False)
    seeds = spark.createDataFrame([(0, 1)], "id long, label long")
    out = _labels(seeded_label_propagation(g, seeds, fixed_iters=2))
    assert out[1] == 1 and out[2] == 1
    assert out[3] is None


def test_seed_clamp_beats_neighbors(spark):
    # seed surrounded by opposite labels keeps its own
    g = make_graph(
        spark, [(0, 1), (0, 2), (0, 3)], n=4, directed=False
    )
    seeds = spark.createDataFrame(
        [(0, 5), (1, 9), (2, 9), (3, 9)], "id long, label long"
    )
    out = _labels(seeded_label_propagation(g, seeds, fixed_iters=3))
    assert out[0] == 5
    assert out[1] == 9 and out[2] == 9 and out[3] == 9


def test_errors(spark):
    g = make_graph(spark, [(0, 1)], n=2)
    seeds = spark.createDataFrame([(0, 1)], "id long, label long")
    with pytest.raises(ValueError):
        seeded_label_propagation(g, seeds, fixed_iters=0)
