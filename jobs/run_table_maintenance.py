#!/usr/bin/env python
"""spark-submit entrypoint: snapshot-table maintenance cycle.

The nightly job a 100 TB snapshot table needs: OPTIMIZE-style compaction
(rewrite the current snapshot into ~target-row files as a
operation='replace' commit — incremental consumers are undisturbed) and
retention enforcement (expire snapshots below the floor, GC data files no
surviving snapshot references).

Cluster:
    spark-submit --py-files dist/graphina_spark.zip \\
        jobs/run_table_maintenance.py --table s3://.../tbl \\
        --target-rows 20000000 --retain 10

Sandbox smoke (builds a throwaway table from testdata events first):
    python jobs/run_table_maintenance.py --demo-sf-dir /root/testdata/sf0.001 \\
        --table /tmp/maint_demo --target-rows 5000 --retain 1
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--table", required=True)
    ap.add_argument("--target-rows", type=int, default=1_000_000)
    ap.add_argument("--retain", type=int, default=1,
                    help="keep this many snapshots back from current")
    ap.add_argument("--demo-sf-dir", help="seed the table from testdata events")
    a = ap.parse_args()

    from pyspark.sql import functions as F

    from graphina_spark.session import get_spark
    from graphina_spark.sources.snapshots import SnapshotTable, TableMaintenance

    t0 = time.time()
    spark = get_spark("table_maintenance")
    table = SnapshotTable(a.table, stats_cols=("event_id",))
    if a.demo_sf_dir and table.current_snapshot() == 0:
        ev = spark.read.parquet(os.path.join(a.demo_sf_dir, "events.parquet"))
        for k in range(3):
            table.append(ev.where(F.col("event_id") % 3 == k).repartition(4))
    pre = table.current_snapshot()
    pre_files = len(table._load_meta(pre)["files"]) if pre else 0
    maint = TableMaintenance(table)
    snap = maint.compact(spark, target_rows=a.target_rows)
    removed = maint.expire_snapshots(keep_from=max(1, snap - a.retain))
    summary = {
        "snapshot_before": pre,
        "snapshot_after": snap,
        "files_before": pre_files,
        "files_after": len(table._load_meta(snap)["files"]),
        "rows": table.read(spark).count(),
        "gc_files": len(removed),
        "wall_sec": round(time.time() - t0, 2),
    }
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
