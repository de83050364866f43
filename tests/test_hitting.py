"""Truncated hitting time: hand-computed chain, horizon cap,
unreachable/dangling vertices, target zeroing."""

import pytest
from pyspark.sql import functions as F

from graphina_spark.graph import LinkGraph
from graphina_spark.operators.hitting import truncated_hitting_time


def _graph(spark, edges, n):
    vdf = spark.createDataFrame([(i,) for i in range(n)], "id long")
    edf = spark.createDataFrame(edges, "src long, dst long")
    return LinkGraph.from_edges(edf, directed=True, vertices=vdf)


def _h(spark, g, targets, horizon):
    t = spark.createDataFrame([(i,) for i in targets], "id long")
    return {
        r["id"]: r["h"]
        for r in truncated_hitting_time(g, t, horizon=horizon).collect()
    }


def test_directed_chain_exact(spark):
    # 3 -> 2 -> 1 -> 0 (target): deterministic walk, h = graph distance
    g = _graph(spark, [(3, 2), (2, 1), (1, 0)], 4)
    got = _h(spark, g, [0], horizon=8)
    assert got == {0: 0.0, 1: 1.0, 2: 2.0, 3: 3.0}


def test_branching_average(spark):
    # 2 -> {0, 1}; 0 is target, 1 is absorbing non-target (no out-edges)
    # h(2) with horizon T: 1 + (h(0) + h(1))/2 = 1 + T/2
    T = 6
    g = _graph(spark, [(2, 0), (2, 1)], 3)
    got = _h(spark, g, [0], horizon=T)
    assert got[0] == 0.0
    assert got[1] == float(T)  # dangling never reaches
    assert got[2] == pytest.approx(1 + T / 2, abs=1e-12)


def test_horizon_caps_unreachable(spark):
    # 1 -> 2 -> 1 cycle never reaches target 0
    g = _graph(spark, [(1, 2), (2, 1)], 3)
    got = _h(spark, g, [0], horizon=5)
    assert got == {0: 0.0, 1: 5.0, 2: 5.0}


def test_targets_zero_even_with_outedges(spark):
    g = _graph(spark, [(0, 1), (1, 0)], 2)
    got = _h(spark, g, [0], horizon=4)
    assert got[0] == 0.0 and got[1] == 1.0


def test_horizon_validation(spark):
    g = _graph(spark, [(0, 1)], 2)
    t = spark.createDataFrame([(0,)], "id long")
    with pytest.raises(ValueError):
        truncated_hitting_time(g, t, horizon=0)
