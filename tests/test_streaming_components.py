"""Incremental connected components over an edge stream: per-batch
contraction must stay bit-identical to the batch hash-min kernel run on
the full accumulated edge set."""

import pytest

from graphina_spark.graph import LinkGraph
from graphina_spark.operators.components import connected_components
from graphina_spark.streaming.graphkernels import (
    latest_components,
    merge_components,
    run_incremental_components,
    stream_edge_files,
)

# three files → three micro-batches at maxFilesPerTrigger=1:
#   f1: path 0-1-2-3-4            (component 0)
#   f2: path 10-11-12-13, pair 20-21   (components 10 and 20)
#   f3: bridge 4-10 merges the two paths; new singleton pair 30-31
F1 = [(0, 1), (1, 2), (2, 3), (3, 4)]
F2 = [(10, 11), (11, 12), (12, 13), (20, 21)]
F3 = [(4, 10), (30, 31)]


def _batch_labels(spark, edge_lists):
    rows = [e for f in edge_lists for e in f]
    g = LinkGraph.from_edges(
        spark.createDataFrame(rows, "src long, dst long"), directed=False
    )
    return {(r["id"], r["component"]) for r in connected_components(g).collect()}


def test_merge_components_pure_batch(spark):
    empty = spark.createDataFrame([], "id long, component long")
    l1 = merge_components(empty, spark.createDataFrame(F1, "src long, dst long"))
    assert {(r["id"], r["component"]) for r in l1.collect()} == _batch_labels(
        spark, [F1]
    )
    # fold f2 then the bridging f3; equivalence must hold at every step
    l2 = merge_components(l1, spark.createDataFrame(F2, "src long, dst long"))
    assert {(r["id"], r["component"]) for r in l2.collect()} == _batch_labels(
        spark, [F1, F2]
    )
    l3 = merge_components(l2, spark.createDataFrame(F3, "src long, dst long"))
    got = {(r["id"], r["component"]) for r in l3.collect()}
    assert got == _batch_labels(spark, [F1, F2, F3])
    # the bridge really merged: 13 now labeled 0
    assert (13, 0) in got and (31, 30) in got


def test_merge_idempotent_replay(spark):
    """Replaying an already-folded batch (at-least-once delivery) is a
    label no-op — the crash-recovery contract."""
    empty = spark.createDataFrame([], "id long, component long")
    e1 = spark.createDataFrame(F1, "src long, dst long")
    l1 = merge_components(empty, e1)
    l1r = merge_components(l1, e1)
    assert sorted(map(tuple, l1.collect())) == sorted(map(tuple, l1r.collect()))


def test_incremental_stream_matches_batch(spark, tmp_path):
    edges_dir = str(tmp_path / "edges")
    for f in (F1, F2, F3):
        spark.createDataFrame(f, "src long, dst long").coalesce(1).write.parquet(
            edges_dir, mode="append"
        )
    q = run_incremental_components(
        stream_edge_files(spark, edges_dir, max_files=1),
        state_base=str(tmp_path / "state"),
        stream_checkpoint=str(tmp_path / "ckpt"),
    )
    q.processAllAvailable()
    q.stop()
    labels = latest_components(spark, str(tmp_path / "state"))
    assert labels is not None
    got = {(r["id"], r["component"]) for r in labels.collect()}
    assert got == _batch_labels(spark, [F1, F2, F3])


def test_latest_components_none_before_first_batch(spark, tmp_path):
    assert latest_components(spark, str(tmp_path / "nostate")) is None
