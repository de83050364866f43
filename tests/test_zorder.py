"""Z-order layout (operators/zorder.py) + the file-pruning win through
the snapshot table's stats pruning."""

from pyspark.sql import functions as F

from graphina_spark.operators.zorder import z_value, zorder_layout
from graphina_spark.sources.snapshots import SnapshotTable


def brute_z(x, y, bits=16):
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_z_value_matches_bruteforce(spark):
    pts = [(0, 0), (1, 0), (0, 1), (3, 5), (255, 1), (65535, 65535), (70000, -3)]
    df = spark.createDataFrame(pts, "x long, y long")
    got = {(r["x"], r["y"]): r["z"]
           for r in df.select("x", "y", z_value(F.col("x"), F.col("y")).alias("z")).collect()}
    for x, y in pts:
        xc, yc = min(max(x, 0), 65535), min(max(y, 0), 65535)
        assert got[(x, y)] == brute_z(xc, yc)
    # locality: interleaving means nearby points share high bits
    assert got[(0, 0)] == 0 and got[(1, 0)] == 1 and got[(0, 1)] == 2


def test_zorder_prunes_both_dimensions(spark, tmp_path):
    """Write the same points z-sorted vs x-sorted through the snapshot
    table; a box probe on y prunes files only under the z layout."""
    n = 4096
    pts = spark.range(n).select(
        (F.col("id") % 64).alias("x"), (F.col("id") / 64).cast("long").alias("y")
    )

    def file_stats(table):
        m = table._load_meta(table.current_snapshot())
        return [f["stats"] for f in m["files"]]

    # layout A: sorted by x only (16 files of 256 rows)
    ta = SnapshotTable(str(tmp_path / "byx"), stats_cols=("x", "y"))
    ta.append(pts.sort("x").repartitionByRange(16, "x"))
    # layout B: z-ordered
    tb = SnapshotTable(str(tmp_path / "byz"), stats_cols=("x", "y"))
    tb.append(zorder_layout(pts, "x", "y").repartitionByRange(16, "z"))

    def files_overlapping_y(stats, lo, hi):
        hit = 0
        for st in stats:
            if "y" not in st or not (st["y"][0] > hi or st["y"][1] < lo):
                hit += 1
        return hit

    a_hits = files_overlapping_y(file_stats(ta), 10, 12)
    b_hits = files_overlapping_y(file_stats(tb), 10, 12)
    # x-sorted files all span the full y range; z-ordered files are
    # rectangles, so the y probe skips most of them
    assert a_hits >= 12
    assert b_hits < a_hits / 2
    # and correctness: pruned read + residual filter returns exact rows
    got = (
        tb.read(spark, prune=("y", 10, 12))
        .where((F.col("y") >= 10) & (F.col("y") <= 12))
        .count()
    )
    assert got == 3 * 64
