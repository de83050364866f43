"""Community cut metrics (volume / cut / conductance) — hand-checked values."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import make_graph

from graphina_spark.graph import LinkGraph
from graphina_spark.operators.cuts import community_cut_metrics


def test_two_triangles_bridge(spark):
    # two unit-weight triangles joined by one bridge edge 2-3
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)],
        "src long, dst long",
    ).withColumn("weight", F.lit(1.0))
    g = LinkGraph.from_edges(edges, directed=False)
    lab = spark.createDataFrame(
        [(i, i // 3) for i in range(6)], "id long, community long"
    )
    got = {r["community"]: r for r in community_cut_metrics(g, lab).collect()}
    # vol = degree sum: each triangle 2+2+3 = 7; total vol = 14
    assert got[0]["volume"] == 7.0 and got[1]["volume"] == 7.0
    # one bridge edge leaves each side once
    assert got[0]["cut"] == 1.0 and got[1]["cut"] == 1.0
    assert got[0]["internal"] == 6.0  # 3 internal edges, each seen twice
    assert abs(got[0]["conductance"] - 1.0 / 7.0) < 1e-6


def test_whole_graph_is_zero_conductance(spark):
    edges = spark.createDataFrame(
        [(0, 1, 2.0), (1, 2, 3.0)], "src long, dst long, weight double"
    )
    g = LinkGraph.from_edges(edges, directed=False)
    lab = spark.createDataFrame([(i, 0) for i in range(3)], "id long, community long")
    got = community_cut_metrics(g, lab).collect()
    assert len(got) == 1
    r = got[0]
    # single community: cut 0, conductance 0 (denominator guard)
    assert r["cut"] == 0.0 and r["conductance"] == 0.0
    assert r["volume"] == 10.0  # 2*(2+3)


def test_sweep_cut_barbell(spark):
    from graphina_spark.operators.cuts import sweep_cut
    import pyspark.sql.functions as F

    # two triangles bridged by one edge; ordering by id puts each triangle
    # in its own prefix -> best cut is the bridge: cut=1, vol=7, cond=1/7
    g = make_graph(
        spark,
        [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)],
        n=6,
        directed=False,
    )
    scores = g.vertices.select("id", F.col("id").alias("score"))
    row = sweep_cut(g, scores).collect()[0]
    assert row["n_side"] == 3
    assert row["cut_edges"] == 1
    assert row["volume"] == 7
    assert row["conductance"] == pytest.approx(1.0 / 7.0, abs=1e-6)
