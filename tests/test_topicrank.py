"""Batched topic-sensitive PageRank: convergence vs PPR, batching, mass."""

import pytest
from pyspark.sql import functions as F

from graphina_spark.graph import LinkGraph
from graphina_spark.operators.pagerank import personalized_pagerank
from graphina_spark.operators.topicrank import topic_sensitive_pagerank


def _graph(spark, edges, n):
    vdf = spark.createDataFrame([(i,) for i in range(n)], "id long")
    edf = spark.createDataFrame(edges, "src long, dst long")
    return LinkGraph.from_edges(edf, directed=True, vertices=vdf)


EDGES = [
    (0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 2), (5, 0), (5, 6),
    (6, 5), (7, 8),  # 8 dangling; 9 isolated
]


def test_converges_to_personalized_pagerank(spark):
    g = _graph(spark, EDGES, 10)
    seeds = spark.createDataFrame([(0, 0, 1.0), (0, 5, 1.0)], "topic int, id long, p double")
    # damping 0.5: the geometric convergence tail 0.5^40 ~ 1e-12 puts both
    # runs at the shared fixpoint well inside the assertion tolerance
    got = {
        r["id"]: r["rank"]
        for r in topic_sensitive_pagerank(
            g, seeds, damping=0.5, fixed_iters=40
        ).collect()
    }
    pers = spark.createDataFrame([(0, 1.0), (5, 1.0)], "id long, p double")
    want = {
        r["id"]: r["rank"]
        for r in personalized_pagerank(
            g, pers, damping=0.5, tol=1e-14, max_iter=500
        ).collect()
    }
    for vid, w in want.items():
        assert got.get(vid, 0.0) == pytest.approx(w, abs=1e-10), vid


def test_mass_conserved_per_topic(spark):
    g = _graph(spark, EDGES, 10)
    seeds = spark.createDataFrame(
        [(0, 0, 1.0), (1, 7, 2.0), (1, 3, 2.0)], "topic int, id long, p double"
    )
    out = topic_sensitive_pagerank(g, seeds, fixed_iters=6)
    sums = {r["topic"]: r["s"] for r in out.groupBy("topic").agg(F.sum("rank").alias("s")).collect()}
    assert sums[0] == pytest.approx(1.0, abs=1e-12)
    assert sums[1] == pytest.approx(1.0, abs=1e-12)


def test_batch_equals_single_topic_runs(spark):
    g = _graph(spark, EDGES, 10)
    both = spark.createDataFrame(
        [(0, 0, 1.0), (1, 4, 1.0)], "topic int, id long, p double"
    )
    batch = {
        (r["topic"], r["id"]): r["rank"]
        for r in topic_sensitive_pagerank(g, both, fixed_iters=7).collect()
    }
    for t, seed in [(0, 0), (1, 4)]:
        solo = spark.createDataFrame([(t, seed, 1.0)], "topic int, id long, p double")
        one = {
            (r["topic"], r["id"]): r["rank"]
            for r in topic_sensitive_pagerank(g, solo, fixed_iters=7).collect()
        }
        for k, v in one.items():
            assert batch[k] == pytest.approx(v, abs=1e-15), k


def test_sparse_support_only(spark):
    # seeds in the 7->8 appendage: support never leaves {7, 8}
    g = _graph(spark, EDGES, 10)
    seeds = spark.createDataFrame([(0, 7, 1.0)], "topic int, id long, p double")
    out = topic_sensitive_pagerank(g, seeds, fixed_iters=10)
    ids = {r["id"] for r in out.collect()}
    assert ids == {7, 8}


def test_zero_mass_topic_raises(spark):
    g = _graph(spark, EDGES, 10)
    seeds = spark.createDataFrame([(0, 1, 0.0)], "topic int, id long, p double")
    with pytest.raises(ValueError, match="non-positive seed mass"):
        topic_sensitive_pagerank(g, seeds, fixed_iters=2)
