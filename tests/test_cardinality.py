"""Keyed FM distinct sketches — accuracy and merge semantics."""

import pytest

from graphina_spark.operators.cardinality import approx_distinct_by_key


def test_estimate_tracks_distinct_counts(spark):
    # key 0 → 1000 distinct values, key 1 → 10 distinct values (each seen 3x)
    rows = [(0, v) for v in range(1000)]
    rows += [(1, v) for v in range(10)] * 3
    df = spark.createDataFrame(rows, "k long, v long")
    out = {r["key"]: r["approx_distinct"] for r in approx_distinct_by_key(df, "k", "v").collect()}
    # FM with k=8 registers: expect well within 2.5x either way
    assert 400 < out[0] < 2500
    assert 4 < out[1] < 25


def test_duplicates_do_not_move_registers(spark):
    a = spark.createDataFrame([(0, v) for v in range(50)], "k long, v long")
    b = spark.createDataFrame([(0, v) for v in range(50)] * 4, "k long, v long")
    ra = approx_distinct_by_key(a, "k", "v").collect()[0]
    rb = approx_distinct_by_key(b, "k", "v").collect()[0]
    assert ra["register_mass"] == rb["register_mass"]
    assert ra["approx_distinct"] == rb["approx_distinct"]


def test_union_is_register_or(spark):
    # sketch(A ∪ B) == sketch over the concatenation — merge = bit_or means
    # the operator distributes over unions (the property that makes the
    # one-pass groupBy correct)
    a = [(0, v) for v in range(0, 60)]
    b = [(0, v) for v in range(30, 90)]
    both = spark.createDataFrame(a + b, "k long, v long")
    union = spark.createDataFrame(list(set(a + b)), "k long, v long")
    rx = approx_distinct_by_key(both, "k", "v").collect()[0]
    ry = approx_distinct_by_key(union, "k", "v").collect()[0]
    assert rx["register_mass"] == ry["register_mass"]


def test_hash_family_bound(spark):
    df = spark.createDataFrame([(0, 1)], "k long, v long")
    with pytest.raises(ValueError):
        approx_distinct_by_key(df, "k", "v", k=99)
