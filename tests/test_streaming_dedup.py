"""Streaming dedup: watermark-horizon exact suppression + stateless
sketches matching their batch twins."""

import pytest
from pyspark.sql import functions as F

from graphina_spark.streaming.dedup import stream_exact_dedup, stream_sketches

DOCS_DDL = "doc_id long, warc_ts timestamp, text string"


def _write_docs(spark, path, rows):
    spark.createDataFrame(rows, DOCS_DDL).coalesce(1).write.parquet(
        path, mode="append"
    )


@pytest.fixture()
def docs_dir(spark, tmp_path):
    import datetime as dt

    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    d = str(tmp_path / "docs")
    # batch 1: two distinct texts, one exact dup
    _write_docs(
        spark,
        d,
        [
            (0, t0, "the cat sat"),
            (1, t0, "the cat sat"),
            (2, t0, "a different doc"),
        ],
    )
    # batch 2: re-crawl of doc 0's text within the watermark + a new text
    _write_docs(
        spark,
        d,
        [
            (3, t0 + dt.timedelta(minutes=5), "the cat sat"),
            (4, t0 + dt.timedelta(minutes=5), "fresh content here"),
        ],
    )
    return d


def test_stream_exact_dedup_first_arrival_wins(spark, tmp_path, docs_dir):
    stream = (
        spark.readStream.schema(DOCS_DDL)
        .option("maxFilesPerTrigger", 1)
        .parquet(docs_dir)
    )
    out = stream_exact_dedup(stream, watermark="1 hour")
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_out")
        .option(
            "checkpointLocation", str(tmp_path / "ckpt")
        )
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = spark.sql("SELECT * FROM dedup_out").collect()
    texts = sorted(r["text"] for r in rows)
    # one survivor per distinct text across both micro-batches
    assert texts == ["a different doc", "fresh content here", "the cat sat"]
    assert all(r["content_hash"] is not None for r in rows)


def test_stream_sketches_match_batch(spark, tmp_path, docs_dir):
    stream = (
        spark.readStream.schema(DOCS_DDL)
        .option("maxFilesPerTrigger", 1)
        .parquet(docs_dir)
    )
    q = (
        stream_sketches(stream)
        .writeStream.format("memory")
        .queryName("sk_out")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        r["id"]: (r["content_hash"], tuple(r["minhash"]), r["simhash"])
        for r in spark.sql("SELECT * FROM sk_out").collect()
    }
    batch = {
        r["id"]: (r["content_hash"], tuple(r["minhash"]), r["simhash"])
        for r in stream_sketches(spark.read.parquet(docs_dir)).collect()
    }
    assert got == batch and len(got) == 5
    # identical texts → identical sketches
    assert got[0] == got[1] == got[3]
