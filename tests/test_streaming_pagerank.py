"""Incremental warm-started PageRank over an edge stream: the warm-started
result must converge to the same fixpoint a cold batch run reaches (unique
fixpoint of the damped contraction), with the iteration count shrinking."""

import pytest
from pyspark.sql import functions as F

from graphina_spark.graph import LinkGraph
from graphina_spark.operators.pagerank import pagerank
from graphina_spark.streaming.graphkernels import (
    advance_pagerank,
    latest_pagerank,
    run_incremental_pagerank,
    stream_edge_files,
)

# three crawl batches over one growing graph (weights default 1.0)
F1 = [(0, 1), (1, 2), (2, 0), (2, 3)]
F2 = [(3, 4), (4, 0), (5, 3), (5, 4)]
F3 = [(6, 0), (6, 5), (1, 6)]

TOL = 1e-8


def _batch_ranks(spark, edge_lists):
    rows = [e for f in edge_lists for e in f]
    g = LinkGraph.from_edges(
        spark.createDataFrame(rows, "src long, dst long"), directed=True
    )
    return {
        r["id"]: r["rank"] for r in pagerank(g, tol=TOL, max_iter=300).collect()
    }


def _close(a, b, atol=1e-6):
    assert set(a) == set(b)
    for k in a:
        assert abs(a[k] - b[k]) <= atol, (k, a[k], b[k])


def test_advance_matches_cold_fixpoint(spark):
    store = spark.createDataFrame([], "src long, dst long, weight double")
    ranks = None
    acc = []
    for f in (F1, F2, F3):
        acc.append(f)
        stats = {}
        store, pr = advance_pagerank(
            store, ranks, spark.createDataFrame(f, "src long, dst long"),
            tol=TOL, max_iter=300, stats=stats,
        )
        ranks = pr
    got = {r["id"]: r["rank"] for r in ranks.collect()}
    _close(got, _batch_ranks(spark, acc))


def test_warm_start_iterates_less_on_small_batch(spark):
    store = spark.createDataFrame([], "src long, dst long, weight double")
    s1, s2 = {}, {}
    store, pr = advance_pagerank(
        store, None, spark.createDataFrame(F1 + F2, "src long, dst long"),
        tol=TOL, max_iter=300, stats=s1,
    )
    # tiny incremental batch: one new edge between existing vertices
    _, _ = advance_pagerank(
        store, pr, spark.createDataFrame([(4, 2)], "src long, dst long"),
        tol=TOL, max_iter=300, stats=s2,
    )
    assert s2["iterations"] < s1["iterations"]


def test_incremental_stream_matches_batch(spark, tmp_path):
    edges_dir = str(tmp_path / "edges")
    for f in (F1, F2, F3):
        spark.createDataFrame(f, "src long, dst long").coalesce(1).write.parquet(
            edges_dir, mode="append"
        )
    q = run_incremental_pagerank(
        stream_edge_files(spark, edges_dir, max_files=1),
        state_base=str(tmp_path / "state"),
        stream_checkpoint=str(tmp_path / "ckpt"),
        tol=TOL,
        max_iter=300,
    )
    q.processAllAvailable()
    q.stop()
    found = latest_pagerank(spark, str(tmp_path / "state"))
    assert found is not None
    ranks, manifest = found
    got = {r["id"]: r["rank"] for r in ranks.collect()}
    _close(got, _batch_ranks(spark, [F1, F2, F3]))
    assert manifest.get("iterations") is not None
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_latest_pagerank_none_before_first_batch(spark, tmp_path):
    assert latest_pagerank(spark, str(tmp_path / "nothing")) is None
