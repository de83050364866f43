"""Incremental triangle counts over an edge stream: every fold must stay
bit-identical to the gated batch kernel on the full accumulated edges."""

import time

import pytest

from graphina_spark.graph import LinkGraph
from graphina_spark.operators.triangles import triangles
from graphina_spark.streaming.triangles import (
    empty_state,
    latest_triangles,
    merge_triangles,
    run_incremental_triangles,
    state_counts,
)

# f1: triangle 0-1-2 plus dangling edge 2-3
# f2: edge 1-3 closes triangle 1-2-3; new clique seed 10-11, 11-12
# f3: edge 10-12 closes 10-11-12; duplicate+reversed replays of old edges;
#     edge 0-3 closes 0-1-3 AND 0-2-3 simultaneously (two triangles, one edge)
F1 = [(0, 1), (1, 2), (0, 2), (2, 3)]
F2 = [(1, 3), (10, 11), (11, 12)]
F3 = [(10, 12), (1, 0), (2, 1), (0, 3)]


def _batch_counts(spark, edge_lists):
    rows = [e for f in edge_lists for e in f]
    g = LinkGraph.from_edges(
        spark.createDataFrame(rows, "src long, dst long"), directed=False
    )
    return {(r["id"], r["triangles"]) for r in triangles(g).collect()}


def _fold_counts(spark, state):
    return {(r["id"], r["triangles"]) for r in state_counts(state).collect()}


def test_merge_triangles_stepwise_equivalence(spark):
    state = empty_state(spark)
    for step in range(1, 4):
        batch = spark.createDataFrame([F1, F2, F3][step - 1], "src long, dst long")
        state = merge_triangles(state, batch)
        assert _fold_counts(spark, state) == _batch_counts(
            spark, [F1, F2, F3][:step]
        )


def test_replayed_batch_is_noop(spark):
    state = merge_triangles(empty_state(spark), spark.createDataFrame(F1, "src long, dst long"))
    replay = merge_triangles(state, spark.createDataFrame(F1, "src long, dst long"))
    assert _fold_counts(spark, state) == _fold_counts(spark, replay)


def test_streaming_sink_and_resume(spark, tmp_path):
    edges_dir = str(tmp_path / "edges")
    for rows in (F1, F2, F3):
        spark.createDataFrame(rows, "src long, dst long").coalesce(1).write.parquet(
            edges_dir, mode="append"
        )
    src = (
        spark.readStream.schema("src long, dst long")
        .option("maxFilesPerTrigger", 1)
        .parquet(edges_dir)
    )
    q = run_incremental_triangles(
        src, str(tmp_path / "state"), str(tmp_path / "ckpt")
    )
    t0 = time.time()
    want = _batch_counts(spark, [F1, F2, F3])
    got = None
    while time.time() - t0 < 120:
        time.sleep(2)
        assert q.exception() is None, q.exception()
        cur = latest_triangles(spark, str(tmp_path / "state"))
        if cur is not None:
            got = {(r["id"], r["triangles"]) for r in cur.collect()}
            if got == want:
                break
    q.stop()
    assert got == want
