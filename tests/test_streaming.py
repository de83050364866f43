"""Streaming ingestion: file-source pages stream → Arrow-UDF edge parsing →
windowed in-degree with watermark; append edge sink with exactly-once resume."""

import os

import pytest

from graphina_spark.sources.pages import pages_from_ids
from graphina_spark.streaming.ingest import (
    run_edge_sink,
    stream_edges,
    stream_pages,
    windowed_indegree,
)


@pytest.fixture()
def pages_dir(spark, tmp_path):
    d = str(tmp_path / "pages")
    # two files → two micro-batches (maxFilesPerTrigger=1)
    pages = pages_from_ids(spark.range(30), n=30).cache()
    pages.where("url < 'https://ex.com/p00000015'").coalesce(1).write.parquet(
        d, mode="append"
    )
    pages.where("url >= 'https://ex.com/p00000015'").coalesce(1).write.parquet(
        d, mode="append"
    )
    pages.unpersist()
    return d


def test_stream_edges_match_batch(spark, tmp_path, pages_dir):
    out = str(tmp_path / "edges_out")
    ckpt = str(tmp_path / "ckpt")
    edges = stream_edges(stream_pages(spark, pages_dir, max_files=1))
    q = run_edge_sink(edges, out, ckpt)
    q.processAllAvailable()
    q.stop()
    got = {
        (r["src_url"], r["dst_url"])
        for r in spark.read.parquet(out).collect()
    }
    # batch twin over the same files
    from graphina_spark.functions.extract import parse_links_pd
    import pandas as pd

    pdf = spark.read.parquet(pages_dir).toPandas()
    want = set()
    for url, links in zip(
        pdf["url"], parse_links_pd(pd.Series(list(pdf["html"])), pdf["url"])
    ):
        for l in links:
            want.add((url, l))
    assert got == want and len(got) > 0


def test_windowed_indegree_memory_sink(spark, pages_dir):
    edges = stream_edges(stream_pages(spark, pages_dir, max_files=1))
    agg = windowed_indegree(edges, window="1 day", watermark="1 day")
    q = (
        agg.writeStream.format("memory")
        .queryName("indeg_test")
        .outputMode("complete")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = spark.sql("SELECT * FROM indeg_test").collect()
    assert len(rows) > 0
    # hub url p00000000 (dst of id%16==0 rule) collects many in-links
    by_url: dict[str, int] = {}
    for r in rows:
        by_url[r["dst_url"]] = by_url.get(r["dst_url"], 0) + r["in_links"]
    assert max(by_url.values()) >= 2
    assert all(r["window_start"] is not None for r in rows)


def test_edge_sink_resume_is_exactly_once(spark, tmp_path, pages_dir):
    out = str(tmp_path / "edges_out2")
    ckpt = str(tmp_path / "ckpt2")
    edges = stream_edges(stream_pages(spark, pages_dir, max_files=1))
    q = run_edge_sink(edges, out, ckpt)
    q.processAllAvailable()
    q.stop()
    n1 = spark.read.parquet(out).count()
    # restart against the same checkpoint: no new input → no duplicate rows
    q2 = run_edge_sink(
        stream_edges(stream_pages(spark, pages_dir, max_files=1)), out, ckpt
    )
    q2.processAllAvailable()
    q2.stop()
    assert spark.read.parquet(out).count() == n1
    assert os.path.isdir(ckpt)
