"""Streaming deduplication: exact-dup suppression and near-dup sketching on
a continuously-arriving document stream.

The reference is batch-only; this is the Spark-native extension for the
training-data-pipeline shape: documents land continuously, byte-identical
re-crawls must be suppressed online, and near-dup *sketches* (MinHash bands,
SimHash) are computed in-stream so the expensive candidate joins run
downstream in batch over the sketch sink instead of re-reading text.

Design notes for scale:

- Exact dedup uses ``dropDuplicatesWithinWatermark`` keyed on the md5 of the
  text (the same canonical key as batch ``operators/dedup.py::exact_dedup``)
  — state is one row per distinct hash within the watermark horizon, evicted
  by event time, so state size is bounded by arrival rate × watermark, not
  corpus size.  A re-crawl later than the watermark re-admits the document
  (documented semantics — online dedup is horizon-bounded; the batch pass is
  the exactness backstop).
- Sketching is stateless (pure column expressions from
  functions/textstats.py — identical code path as batch, so stream and batch
  sketches are directly comparable), hence safe at any rate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphina_spark.functions.textstats import (
    minhash_signature,
    shingles_col,
    simhash32,
)


def stream_exact_dedup(
    docs: DataFrame,
    watermark: str = "1 day",
    ts_col: str = "warc_ts",
    text_col: str = "text",
) -> DataFrame:
    """First-arrival-wins suppression of byte-identical texts within the
    watermark horizon.  Adds ``content_hash``; emits only rows whose hash
    was not seen in-horizon before (streaming twin of exact_dedup's
    keep=true rows)."""
    hashed = docs.withColumn("content_hash", F.md5(F.col(text_col)))
    return hashed.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["content_hash"]
    )


def stream_sketches(
    docs: DataFrame,
    num_hashes: int = 12,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, content_hash, minhash: array<int>, simhash: int) — stateless
    per-document sketches on the stream, same expressions as the batch
    dedup operators so downstream batch LSH banding consumes either."""
    sh = shingles_col(F.col(text_col), k=n)
    return docs.select(
        F.col(id_col).alias("id"),
        F.md5(F.col(text_col)).alias("content_hash"),
        minhash_signature(sh, num_hashes=num_hashes).alias("minhash"),
        simhash32(F.col(text_col)).alias("simhash"),
    )
