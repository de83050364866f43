"""Iceberg-style snapshot table (sources/snapshots.py)."""

import json
import os

import pytest
from pyspark.sql import functions as F

from graphina_spark.sources.snapshots import SnapshotTable


@pytest.fixture()
def table(tmp_path):
    return SnapshotTable(str(tmp_path / "t"), stats_cols=("k",))


def frame(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )


def test_append_and_time_travel(spark, table):
    table.append(frame(spark, 0, 10))
    table.append(frame(spark, 10, 30))
    table.append(frame(spark, 30, 35))
    assert table.current_snapshot() == 3
    # time travel: historical snapshots are unchanged by later appends
    assert table.read(spark, snapshot_id=1).count() == 10
    assert table.read(spark, snapshot_id=2).count() == 30
    assert table.read(spark).count() == 35
    sums = {s["snapshot_id"]: s["n_rows"] for s in table.snapshots()}
    assert sums == {1: 10, 2: 30, 3: 35}


def test_incremental_scan(spark, table):
    table.append(frame(spark, 0, 10))
    table.append(frame(spark, 10, 30))
    table.append(frame(spark, 30, 35))
    inc = table.incremental(spark, 1, 3)
    got = sorted(r["k"] for r in inc.collect())
    assert got == list(range(10, 35))
    assert table.incremental(spark, 3, 3).count() == 0


def test_prune_is_superset_and_exact_after_filter(spark, table):
    for lo, hi in [(0, 100), (100, 200), (200, 300)]:
        table.append(frame(spark, lo, hi))
    pruned = table.read(spark, prune=("k", 120, 180))
    # pruning drops at least the files that cannot overlap
    assert pruned.count() <= 200
    exact = pruned.where((F.col("k") >= 120) & (F.col("k") <= 180))
    assert exact.count() == 61


def test_orphan_data_files_are_invisible(spark, table):
    """A crashed append (data written, metadata not committed) must not leak."""
    table.append(frame(spark, 0, 10))
    orphan = os.path.join(table.path, "data", "snap-99999-deadbeef.parquet")
    frame(spark, 500, 600).toPandas().to_parquet(orphan)
    assert table.read(spark).count() == 10
    assert table.current_snapshot() == 1


def test_metadata_commit_is_atomic(spark, table):
    """A *.tmp metadata file (mid-crash state) is never read as current."""
    table.append(frame(spark, 0, 10))
    bogus = table._meta_path(2) + ".tmp"
    with open(bogus, "w") as f:
        json.dump({"snapshot_id": 2, "files": [], "schema": None}, f)
    assert table.current_snapshot() == 1
    assert table.read(spark).count() == 10


def test_empty_table_reads_empty(spark, table):
    assert table.current_snapshot() == 0
    assert table.read(spark, snapshot_id=0).count() == 0


def test_streaming_append_sink_exactly_once(spark, tmp_path):
    import time

    from graphina_spark.sources.snapshots import streaming_append_sink

    src_dir = str(tmp_path / "src")
    for lo, hi in ((0, 10), (10, 25)):
        frame(spark, lo, hi).coalesce(1).write.parquet(src_dir, mode="append")
    t = SnapshotTable(str(tmp_path / "tbl"), stats_cols=("k",))
    sink = streaming_append_sink(t)
    stream = (
        spark.readStream.schema("k long, v long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    t0 = time.time()
    while time.time() - t0 < 120:
        time.sleep(2)
        assert q.exception() is None, q.exception()
        if t.current_snapshot() >= 2 and t.read(spark).count() == 25:
            break
    q.stop()
    assert t.read(spark).count() == 25
    # crash-replay simulation: re-deliver the last micro-batch -> skipped
    last_meta = t._load_meta(t.current_snapshot())
    sink(frame(spark, 10, 25), last_meta["stream_batch_id"])
    assert t.read(spark).count() == 25
    # a genuinely NEW batch id still commits
    sink(frame(spark, 25, 30), last_meta["stream_batch_id"] + 1)
    assert t.read(spark).count() == 30
    # historical snapshots remain time-travel readable under the stream
    assert t.read(spark, snapshot_id=1).count() == 10


def test_compaction_replace_semantics(spark, table):
    from graphina_spark.sources.snapshots import TableMaintenance

    for lo, hi in ((0, 300), (300, 600), (600, 900)):
        table.append(frame(spark, lo, hi).repartition(4))
    pre = table.current_snapshot()
    n_files_pre = len(table._load_meta(pre)["files"])
    maint = TableMaintenance(table)
    snap = maint.compact(spark, target_rows=1000)
    # identical rows, fewer files
    assert sorted(r["k"] for r in table.read(spark).collect()) == list(range(900))
    assert len(table._load_meta(snap)["files"]) == 1 < n_files_pre
    # time travel across the rewrite still works
    assert table.read(spark, snapshot_id=2).count() == 600
    # incremental scans skip the replace commit (no rows were "added")
    assert table.incremental(spark, pre, snap).count() == 0
    # appends after the rewrite show up incrementally as usual
    table.append(frame(spark, 900, 950))
    assert table.incremental(spark, pre).count() == 50


def test_expire_snapshots_gc(spark, table):
    import os

    from graphina_spark.sources.snapshots import TableMaintenance

    for lo, hi in ((0, 100), (100, 200), (200, 300)):
        table.append(frame(spark, lo, hi))
    maint = TableMaintenance(table)
    maint.compact(spark, target_rows=10_000)  # snapshot 4, replaces all
    removed = maint.expire_snapshots(keep_from=4)
    assert removed, "pre-compaction data files should be GC'd"
    # the current snapshot is intact after GC
    assert table.read(spark).count() == 300
    # expired snapshots are gone
    assert not os.path.exists(table._meta_path(1))
