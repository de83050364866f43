"""Structured Streaming ingestion: a continuously-arriving crawl → edges.

The reference is batch-only (no streaming exists in graphina); this module is
the Spark-native extension for the production shape of the north star's
input: WARC pages landing continuously.  Three composable pieces:

- :func:`stream_pages` — ``readStream`` over a pages directory (the
  input_hint schema), one micro-batch per new file;
- :func:`stream_edges` — the SAME Arrow link-parsing UDF as batch
  (functions/extract.py) applied to the stream: url → parsed dst urls;
- :func:`windowed_indegree` — event-time windowed in-link counts with a
  watermark for late data (the streaming twin of degree centrality);
- :func:`run_edge_sink` — append-mode parquet sink + checkpointing, i.e. the
  incremental edge table a downstream batch PageRank run picks up.

Late-data semantics: events later than ``watermark`` past the max seen
``warc_ts`` are dropped from windowed aggregates (standard Spark watermark
contract); the raw edge sink is append-only and keeps everything.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

PAGES_DDL = "url string, warc_ts timestamp, html binary, text string, lang string"


def stream_pages(spark: SparkSession, pages_dir: str, max_files: int = 16) -> DataFrame:
    return (
        spark.readStream.schema(PAGES_DDL)
        .option("maxFilesPerTrigger", max_files)
        .parquet(pages_dir)
    )


def stream_edges(pages: DataFrame) -> DataFrame:
    """(src_url, dst_url, warc_ts) — link parsing on the stream via the same
    vectorized Arrow UDF as batch ingestion."""
    from graphina_spark.functions.extract import parse_links_udf

    return pages.select(
        F.col("url").alias("src_url"),
        F.explode(parse_links_udf(F.col("html"), F.col("url"))).alias("dst_url"),
        "warc_ts",
    )


def windowed_indegree(
    edges: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Per-window in-link counts with late-data watermark — streaming
    aggregation state is bounded by the watermark horizon."""
    return (
        edges.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), F.col("dst_url"))
        .agg(F.count("*").alias("in_links"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "dst_url",
            "in_links",
        )
    )


def run_edge_sink(
    edges: DataFrame, out_dir: str, checkpoint_dir: str, query_name: str = "edge_sink"
) -> StreamingQuery:
    """Append the parsed edge stream to a parquet table; exactly-once via the
    streaming checkpoint (file-source offsets + sink commit log)."""
    return (
        edges.writeStream.queryName(query_name)
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .start()
    )
