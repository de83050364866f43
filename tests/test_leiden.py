"""Leiden refinement: splits disconnected communities, identity on
connected ones, modularity never drops, canonical min-id labels."""

import pytest
from pyspark.sql import functions as F

from graphina_spark.graph import LinkGraph
from graphina_spark.operators.leiden import (
    community_parts,
    leiden,
    refine_connected,
)


def _graph(spark, edges, n):
    vdf = spark.createDataFrame([(i,) for i in range(n)], "id long")
    edf = spark.createDataFrame(edges, "src long, dst long")
    return LinkGraph.from_edges(edf, directed=False, vertices=vdf)


def _labels(spark, pairs):
    return spark.createDataFrame(pairs, "id long, community long")


def test_splits_disconnected_community(spark):
    # two triangles, NO edge between them, both labeled community 0
    edges = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5)]
    g = _graph(spark, edges, 6)
    lab = _labels(spark, [(i, 0) for i in range(6)])
    got = {r["id"]: r["community"] for r in refine_connected(g, lab).collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 3, 5: 3}
    parts = {r["community"]: r["n_parts"] for r in community_parts(g, lab).collect()}
    assert parts == {0: 2}


def test_identity_on_connected_partition(spark):
    edges = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (4, 5), (3, 5)]
    g = _graph(spark, edges, 6)
    lab = _labels(spark, [(0, 0), (1, 0), (2, 0), (3, 3), (4, 3), (5, 3)])
    got = {(r["id"], r["community"]) for r in refine_connected(g, lab).collect()}
    assert got == {(0, 0), (1, 0), (2, 0), (3, 3), (4, 3), (5, 3)}


def test_refinement_never_lowers_modularity(spark):
    from graphina_spark.operators.metrics import modularity

    edges = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]
    g = _graph(spark, edges, 6)
    # a deliberately bad partition whose community 0 = {0,1,2,4,5} is
    # disconnected (4,5 reach 0-2 only through 3, which is outside)
    lab = _labels(spark, [(0, 0), (1, 0), (2, 0), (3, 3), (4, 0), (5, 0)])
    q_before = modularity(g, lab)
    ref = refine_connected(g, lab)
    q_after = modularity(g, ref)
    assert q_after >= q_before - 1e-12


def test_leiden_all_communities_connected(spark):
    # two dense blocks + bridge: leiden labels must all be single-part
    e = []
    for lo, hi in [(0, 6), (6, 12)]:
        ids = list(range(lo, hi))
        e += [(a, b) for a in ids for b in ids if a < b]
    e.append((5, 6))
    g = _graph(spark, e, 12)
    com = leiden(g, max_levels=4, max_rounds=8)
    parts = community_parts(g, com)
    assert parts.where(F.col("n_parts") != 1).count() == 0
    # canonical: community label is the min member id
    bad = (
        com.groupBy("community")
        .agg(F.min("id").alias("lo"))
        .where(F.col("community") != F.col("lo"))
        .count()
    )
    assert bad == 0
