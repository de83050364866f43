"""Partition tracking: overlap/jaccard arithmetic and lifecycle events
on hand-built snapshot pairs."""

from pyspark.sql import functions as F

from graphina_spark.operators.tracking import partition_events, track_partitions


def _lab(spark, pairs):
    return spark.createDataFrame(pairs, "id long, community long")


def test_overlap_table(spark):
    a = _lab(spark, [(1, 10), (2, 10), (3, 10), (4, 40)])
    b = _lab(spark, [(1, 11), (2, 11), (3, 33), (5, 55)])  # 4 vanished, 5 new
    got = {
        (r["c0"], r["c1"]): (r["overlap"], r["size0"], r["size1"], r["jaccard"])
        for r in track_partitions(a, b).collect()
    }
    assert got == {
        (10, 11): (2, 3, 2, round(2 / 3, 6)),
        (10, 33): (1, 3, 1, round(1 / 3, 6)),
    }


def test_events_continuation_split_merge_birth_death(spark):
    # c0=10 continues as c1=11 (identical); c0=20 splits into 21/22;
    # c0=30,31 merge into 32; c0=40 dissolves (vertices vanish);
    # c1=50 is born from new vertices
    a = _lab(
        spark,
        [(1, 10), (2, 10), (3, 20), (4, 20), (5, 30), (6, 30), (7, 31), (8, 31), (9, 40)],
    )
    b = _lab(
        spark,
        [(1, 11), (2, 11), (3, 21), (4, 22), (5, 32), (6, 32), (7, 32), (8, 32),
         (100, 50), (101, 50)],
    )
    got = {
        (r["community"], r["snapshot"]): r["event"]
        for r in partition_events(a, b).collect()
    }
    assert got[(10, 0)] == "continued"
    assert got[(20, 0)] == "split"
    assert got[(30, 0)] == "dissolved"  # absorbed, not mutual-majority
    assert got[(31, 0)] == "dissolved"
    assert got[(40, 0)] == "dissolved"
    assert got[(32, 1)] == "merged"
    assert got[(50, 1)] == "born"
    # continued targets are not re-emitted on the new side
    assert (11, 1) not in got
    # split pieces each fed by exactly one old community -> offshoot
    assert got[(21, 1)] == "offshoot"
    assert got[(22, 1)] == "offshoot"


def test_custom_label_column(spark):
    a = spark.createDataFrame([(1, 5)], "id long, core long")
    b = spark.createDataFrame([(1, 6)], "id long, core long")
    row = track_partitions(a, b, label_col="core").collect()[0]
    assert (row["c0"], row["c1"], row["overlap"]) == (5, 6, 1)
