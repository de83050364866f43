"""Linear-threshold cascade: wave rounds, threshold arithmetic,
monotonicity, early exit, delta-accumulate = recompute equivalence."""

import pytest
from pyspark.sql import functions as F

from graphina_spark.graph import LinkGraph
from graphina_spark.operators.cascade import linear_threshold_cascade


def _graph(spark, edges, n):
    vdf = spark.createDataFrame([(i,) for i in range(n)], "id long")
    edf = spark.createDataFrame(edges, "src long, dst long")
    return LinkGraph.from_edges(edf, directed=True, vertices=vdf)


def _run(spark, g, seeds, **kw):
    s = spark.createDataFrame([(i,) for i in seeds], "id long")
    return {
        r["id"]: r["r"]
        for r in linear_threshold_cascade(g, s, **kw).collect()
    }


def test_chain_wave(spark):
    # 0 -> 1 -> 2 -> 3, theta 1/2: each vertex has indeg 1, activates
    # one round after its predecessor
    g = _graph(spark, [(0, 1), (1, 2), (2, 3)], 4)
    got = _run(spark, g, [0], theta_num=1, theta_den=2, rounds=8)
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}


def test_threshold_blocks_minority(spark):
    # 3 has in-edges from {0, 1, 2}; only 0 is seeded.
    # theta 1/2: 1/3 < 1/2 -> never activates. theta 1/3: 1/3 >= 1/3 -> r1.
    edges = [(0, 3), (1, 3), (2, 3)]
    g = _graph(spark, edges, 4)
    assert 3 not in _run(spark, g, [0], theta_num=1, theta_den=2, rounds=5)
    assert _run(spark, g, [0], theta_num=1, theta_den=3, rounds=5)[3] == 1


def test_cumulative_counts_across_rounds(spark):
    # 4 needs 2 of its 2 in-neighbors {1, 2} (theta 1). 1 activates in r1
    # (from seed 0), 2 in r2 (chain 0 -> 3 -> 2). 4 must fire in r3 from
    # counts accumulated across DIFFERENT rounds.
    edges = [(0, 1), (0, 3), (3, 2), (1, 4), (2, 4)]
    g = _graph(spark, edges, 5)
    got = _run(spark, g, [0], theta_num=1, theta_den=1, rounds=6)
    assert got[1] == 1 and got[3] == 1 and got[2] == 2 and got[4] == 3


def test_early_exit_and_round_cap(spark):
    g = _graph(spark, [(0, 1), (1, 2), (2, 3)], 4)
    got = _run(spark, g, [0], theta_num=1, theta_den=2, rounds=2)
    assert got == {0: 0, 1: 1, 2: 2}  # 3 not reached within cap
    # isolated extra vertices: cascade stops silently (early exit)
    g2 = _graph(spark, [(0, 1)], 5)
    got2 = _run(spark, g2, [0], theta_num=1, theta_den=2, rounds=8)
    assert got2 == {0: 0, 1: 1}


def test_parameter_validation(spark):
    g = _graph(spark, [(0, 1)], 2)
    s = spark.createDataFrame([(0,)], "id long")
    with pytest.raises(ValueError):
        linear_threshold_cascade(g, s, theta_num=0, theta_den=2)
    with pytest.raises(ValueError):
        linear_threshold_cascade(g, s, theta_num=3, theta_den=2)
