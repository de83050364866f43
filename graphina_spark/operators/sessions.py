"""Gap-based sessionization over the events table.

The classic clickstream/session primitive a web-scale training-data pipeline
needs next to the co-occurrence graph (sources/derived.py): group each
user's event stream into sessions separated by idle gaps > ``gap_s``.

No reference analogue (graphina is a pure graph library); this is a
north-star addition in the events family, same tz-free epoch-seconds
bucketing contract as events_cooccurrence_graph.

Scale shape (100 TB story):

- ONE shuffle total: the session-boundary window partitions by ``user_id``;
  the per-session aggregation groups by ``(user_id, session_idx)`` — hash
  partitioning on ``user_id`` already clusters every group into one
  partition, so EnsureRequirements inserts no second Exchange.
- Per-user state is a sort within the user's partition slice, bounded by
  that user's event count — no global sort, no driver state.  A pathological
  bot user (10^8 events) is a per-key spill, not a plan failure: the sort
  spills to disk and the running-sum window streams.
- All expressions are built-in column functions (whole-stage codegen);
  the timestamp→epoch-seconds conversion is ``timestampdiff`` against a
  pre-data anchor so Spark's truncate-toward-zero and DuckDB's
  boundary-count semantics agree (both deltas positive).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

ANCHOR = "TIMESTAMP_NTZ'2000-01-01 00:00:00'"
DEFAULT_GAP_S = 14_400  # 4h — web-crawl event streams are sparse


def _events(events: DataFrame) -> DataFrame:
    return events.select(
        F.col("event_id").cast("long").alias("eid"),
        F.col("user_id").cast("long").alias("uid"),
        F.col("event_type").alias("etype"),
        F.expr(f"timestampdiff(SECOND, {ANCHOR}, ts)").alias("es"),
    )


def sessionize(events: DataFrame, gap_s: int = DEFAULT_GAP_S) -> DataFrame:
    """(eid, uid, es, session_idx): assign every event to a per-user session.

    A new session starts at the user's first event and whenever the gap to
    the previous event is strictly greater than ``gap_s`` seconds.
    ``session_idx`` is 1-based per user in time order; ties on the same
    second break deterministically by ``event_id``.
    """
    ev = _events(events)
    w = Window.partitionBy("uid").orderBy("es", "eid")
    new_session = F.when(
        F.lag("es").over(w).isNull()
        | ((F.col("es") - F.lag("es").over(w)) > F.lit(int(gap_s))),
        F.lit(1),
    ).otherwise(F.lit(0))
    run = Window.partitionBy("uid").orderBy("es", "eid").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return ev.withColumn("_new", new_session).select(
        "eid",
        "uid",
        "etype",
        "es",
        F.sum("_new").over(run).alias("session_idx"),
    )


def session_stats(events: DataFrame, gap_s: int = DEFAULT_GAP_S) -> DataFrame:
    """One row per (uid, session_idx): event count, start/end epoch-seconds,
    duration, distinct event types.  All-integer output (hash-stable across
    engines)."""
    s = sessionize(events, gap_s=gap_s)
    return s.groupBy("uid", "session_idx").agg(
        F.count("*").alias("n_events"),
        F.min("es").alias("start_es"),
        F.max("es").alias("end_es"),
        (F.max("es") - F.min("es")).alias("duration_s"),
        F.countDistinct("etype").alias("n_types"),
    )
