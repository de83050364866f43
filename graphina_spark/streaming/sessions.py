"""Streaming sessionization — the Structured Streaming twin of
operators/sessions.py, built on Spark's native event-time session windows.

``F.session_window(ts, gap)`` merges events whose timestamps are within
``gap`` of each other into one growing window; the watermark closes a
session once event time has moved ``watermark`` past its end, bounding
state (standard Spark session-window contract).

Boundary semantics vs batch: session windows are half-open
``[first, last + gap)``, so an event arriving at exactly ``last + gap``
starts a NEW session, while the batch rule (``delta > gap_s`` starts a new
session) keeps it in the old one.  The two agree everywhere except that
measure-zero boundary; tests compare on fixtures that avoid exact-gap
deltas.

Scale shape: one shuffle on ``user_id``; session-merge state is per-key and
watermark-bounded — no global state, late events beyond the watermark are
dropped (counted in the streaming progress metrics, not silently).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_DDL = (
    "event_id long, ts timestamp, user_id long, event_type string,"
    " value double, props string"
)


def stream_events(
    spark: SparkSession, events_dir: str, max_files: int = 16
) -> DataFrame:
    """``readStream`` over an events directory (driver testdata schema),
    one micro-batch per ``max_files`` new files."""
    return (
        spark.readStream.schema(EVENTS_DDL)
        .option("maxFilesPerTrigger", max_files)
        .parquet(events_dir)
    )


def streaming_session_stats(
    events: DataFrame, gap: str = "4 hours", watermark: str = "1 day"
) -> DataFrame:
    """(user_id, session_start, session_end, n_events, duration_s) per
    closed-or-open session.  ``countDistinct`` is not available in
    streaming aggregations, so distinct event types are estimated with
    ``approx_count_distinct`` (exact in batch twin)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(
            F.session_window("ts", gap).alias("sw"), F.col("user_id")
        )
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
            F.approx_count_distinct("event_type").alias("n_types_approx"),
        )
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
            F.expr(
                "timestampdiff(SECOND, first_ts, last_ts)"
            ).alias("duration_s"),
            "n_types_approx",
        )
    )
