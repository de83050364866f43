"""Streaming Misra–Gries: state accumulates across batches, O(k) bound,
guarantee (planted heavy token survives, estimate within n/(k+1))."""

import time

import pytest

from graphina_spark.streaming.heavyhitters import streaming_heavy_hitters


@pytest.fixture()
def tokens_dir(spark, tmp_path):
    d = str(tmp_path / "toks")
    # two files -> two micro-batches (maxFilesPerTrigger=1).
    # batch 1: 30x hot + 20 distinct; batch 2: 20x hot + 30 distinct.
    b1 = [("h", "hot")] * 30 + [("h", f"u{i}") for i in range(20)]
    b2 = [("h", "hot")] * 20 + [("h", f"v{i}") for i in range(30)]
    for rows in (b1, b2):
        spark.createDataFrame(rows, "key string, token string").coalesce(
            1
        ).write.parquet(d, mode="append")
    return d


def test_state_accumulates_and_guarantee_holds(spark, tokens_dir):
    src = (
        spark.readStream.schema("key string, token string")
        .option("maxFilesPerTrigger", 1)
        .parquet(tokens_dir)
    )
    hh = streaming_heavy_hitters(src, k=8)
    q = (
        hh.writeStream.format("memory")
        .queryName("hh")
        .outputMode("update")
        .start()
    )
    t0 = time.time()
    while time.time() - t0 < 120:
        time.sleep(2)
        assert q.exception() is None, q.exception()
        prog = q.recentProgress
        if sum(p["numInputRows"] > 0 for p in prog) >= 2:
            break
    q.stop()
    rows = spark.sql("SELECT * FROM hh").collect()
    assert rows, "no output"
    by_n = {}
    for r in rows:
        by_n.setdefault(r["n"], []).append(r)
    # state carried across both batches: n reaches the full 100 items
    assert max(by_n) == 100
    final = {r["token"]: r for r in by_n[100]}
    assert len(final) <= 8  # O(k) summary
    # MG guarantee: true count 50 > 100/9 -> present; 50 - n/(k+1) <= est <= 50
    hot = final["hot"]
    assert hot["err_bound"] == 100 // 9
    assert 50 - hot["err_bound"] <= hot["est"] <= 50


def test_k_validation(spark, tmp_path):
    src = spark.readStream.schema("key string, token string").parquet(
        str(tmp_path)
    )
    with pytest.raises(ValueError):
        streaming_heavy_hitters(src, k=0)
