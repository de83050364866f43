"""Bloom filter: no false negatives, monotone config, portable hash."""

from pyspark.sql import functions as F

from graphina_spark.operators.bloom import (
    bloom_build,
    bloom_membership,
    bloom_probe,
)


def test_no_false_negatives_ever(spark):
    ids = spark.range(1000)
    out = bloom_membership(ids, seen_mod=3, m_bits=512, k=3).collect()
    assert all(r["hit"] for r in out if r["member"])


def test_superset_semantics_and_some_false_positives(spark):
    # tiny filter: hits must strictly contain members, and at this load
    # factor false positives must actually occur
    ids = spark.range(1000)
    out = bloom_membership(ids, seen_mod=2, m_bits=256, k=2).collect()
    assert all(r["hit"] for r in out if r["member"])
    assert any(r["hit"] and not r["member"] for r in out)


def test_bigger_filter_fewer_false_positives(spark):
    ids = spark.range(2000)
    def fp(m):
        rows = bloom_membership(ids, seen_mod=2, m_bits=m, k=4).collect()
        return sum(1 for r in rows if r["hit"] and not r["member"])
    small, big = fp(1024), fp(1 << 16)
    assert big <= small
    assert big == 0  # 1000 keys in 65536 bits: FP ~ 4e-6, none expected


def test_probe_unseen_universe(spark):
    # probing ids far outside the build set: filter still answers (mostly no)
    words = bloom_build(spark.range(100))
    probes = spark.range(1_000_000, 1_000_050).select(F.col("id"))
    hits = bloom_probe(probes, words).collect()
    assert len(hits) == 50
    assert sum(1 for r in hits if r["hit"]) <= 5  # generous FP slack


def test_empty_build_rejects_everything(spark):
    words = bloom_build(spark.range(0))
    out = bloom_probe(spark.range(10), words).collect()
    assert all(not r["hit"] for r in out)
