"""Streaming CMS: native streaming aggregation carries the cell matrix
across micro-batches; final sketch bit-identical to the batch operator."""

import time

import pytest
from pyspark.sql import functions as F

from graphina_spark.streaming.cms import cms_point_estimates, streaming_cms_cells

DEPTH, WIDTH = 4, 32


@pytest.fixture()
def tok_dir(spark, tmp_path):
    d = str(tmp_path / "toks")
    b1 = [(f"w{i % 7}",) for i in range(40)]
    b2 = [(f"w{i % 11}",) for i in range(60)]
    for rows in (b1, b2):
        spark.createDataFrame(rows, "token string").coalesce(1).write.parquet(
            d, mode="append"
        )
    return d


def test_streamed_sketch_equals_batch_sketch(spark, tok_dir):
    src = (
        spark.readStream.schema("token string")
        .option("maxFilesPerTrigger", 1)
        .parquet(tok_dir)
    )
    cells = streaming_cms_cells(src, depth=DEPTH, width=WIDTH)
    q = (
        cells.writeStream.format("memory")
        .queryName("cms_stream")
        .outputMode("complete")
        .start()
    )
    t0 = time.time()
    while time.time() - t0 < 120:
        time.sleep(2)
        assert q.exception() is None, q.exception()
        if sum(p["numInputRows"] > 0 for p in q.recentProgress) >= 2:
            break
    q.stop()
    streamed = {
        (r["r"], r["c"]): r["cnt"]
        for r in spark.sql("SELECT * FROM cms_stream").collect()
    }
    # batch sketch over the union of both files (same cells, same counts)
    batch_tokens = spark.read.parquet(tok_dir)
    batch = {
        (r["r"], r["c"]): r["cnt"]
        for r in streaming_cms_cells(batch_tokens, depth=DEPTH, width=WIDTH).collect()
    }
    assert streamed == batch
    assert sum(streamed.values()) == 100 * DEPTH  # every token hits every row
    # point estimates from the snapshotted stream sketch: est >= true count
    cells_df = spark.createDataFrame(
        [(r, c, n) for (r, c), n in streamed.items()], "r int, c int, cnt long"
    )
    probes = spark.createDataFrame([("w0",), ("w1",), ("zzz",)], "token string")
    est = {
        r["token"]: r["est"]
        for r in cms_point_estimates(cells_df, probes, depth=DEPTH, width=WIDTH).collect()
    }
    true = {
        r["token"]: r["n"]
        for r in batch_tokens.groupBy("token").agg(F.count("*").alias("n")).collect()
    }
    assert est["w0"] >= true["w0"] and est["w1"] >= true["w1"]
    assert est["zzz"] >= 0
