"""Bucketized point-in-interval join: exactness vs a brute-force predicate
join, left-outer semantics, bucket-width independence, span guard."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from graphina_spark.operators.rangejoin import point_in_interval_join


def _data(spark, seed=11, npts=300, niv=50, keys=4, tmax=1000, span=60):
    import random

    rng = random.Random(seed)
    pts = spark.createDataFrame(
        [(rng.randint(1, keys), float(rng.randint(0, tmax)), i) for i in range(npts)],
        "k long, t double, pid long",
    )
    ivs = spark.createDataFrame(
        [
            (rng.randint(1, keys), float(lo := rng.randint(0, tmax)), float(lo + rng.randint(0, span)), i)
            for i in range(niv)
        ],
        "k long, lo double, hi double, iid long",
    )
    return pts, ivs


def _brute(pts, ivs):
    return sorted(
        (r["iid"], r["pid"])
        for r in ivs.join(pts, "k")
        .where((F.col("t") >= F.col("lo")) & (F.col("t") <= F.col("hi")))
        .collect()
    )


def test_matches_bruteforce_inner(spark):
    pts, ivs = _data(spark)
    got = sorted(
        (r["iid"], r["pid"])
        for r in point_in_interval_join(pts, ivs, "k", "t", "lo", "hi", bucket=30).collect()
    )
    assert got == _brute(pts, ivs)
    assert len(got) > 0


def test_bucket_width_independent(spark):
    pts, ivs = _data(spark, seed=23)
    runs = [
        sorted(
            (r["iid"], r["pid"])
            for r in point_in_interval_join(
                pts, ivs, "k", "t", "lo", "hi", bucket=w
            ).collect()
        )
        for w in (7, 61, 500)
    ]
    assert runs[0] == runs[1] == runs[2] == _brute(pts, ivs)


def test_no_duplicate_pairs_when_interval_spans_buckets(spark):
    pts = spark.createDataFrame([(1, 50.0, 0)], "k long, t double, pid long")
    ivs = spark.createDataFrame([(1, 0.0, 100.0, 0)], "k long, lo double, hi double, iid long")
    rows = point_in_interval_join(pts, ivs, "k", "t", "lo", "hi", bucket=10).collect()
    assert len(rows) == 1  # interval spans 11 buckets, pair emitted once


def test_left_outer_keeps_empty_intervals(spark):
    pts = spark.createDataFrame([(1, 5.0, 0)], "k long, t double, pid long")
    ivs = spark.createDataFrame(
        [(1, 0.0, 10.0, 0), (1, 20.0, 30.0, 1), (2, 0.0, 10.0, 2)],
        "k long, lo double, hi double, iid long",
    )
    out = point_in_interval_join(pts, ivs, "k", "t", "lo", "hi", bucket=8, how="left")
    got = {(r["iid"], r["pid"]) for r in out.collect()}
    assert got == {(0, 0), (1, None), (2, None)}
    # count(point col) per interval gives 0 for unmatched, like SQL LEFT JOIN
    cnt = {
        r["iid"]: r["n"]
        for r in out.groupBy("iid").agg(F.count("pid").alias("n")).collect()
    }
    assert cnt == {0: 1, 1: 0, 2: 0}


def test_span_guard_raises(spark):
    pts = spark.createDataFrame([(1, 5.0, 0)], "k long, t double, pid long")
    ivs = spark.createDataFrame(
        [(1, 0.0, 1e9, 0)], "k long, lo double, hi double, iid long"
    )
    with pytest.raises(Exception) as ei:
        point_in_interval_join(
            pts, ivs, "k", "t", "lo", "hi", bucket=1.0, max_span_buckets=100
        ).collect()
    assert "spans" in str(ei.value)


def test_inverted_interval_dropped(spark):
    pts = spark.createDataFrame([(1, 5.0, 0)], "k long, t double, pid long")
    ivs = spark.createDataFrame(
        [(1, 10.0, 0.0, 0)], "k long, lo double, hi double, iid long"
    )
    assert (
        point_in_interval_join(pts, ivs, "k", "t", "lo", "hi", bucket=5).count() == 0
    )
