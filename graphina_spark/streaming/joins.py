"""Stream-stream watermarked interval join — live purchase attribution.

The remaining Structured Streaming join surface: joining TWO unbounded
streams (clicks × purchases) needs both sides buffered in state, and the
ONLY thing that lets the engine discard that state is (a) watermarks on
both event-time columns and (b) an event-time RANGE constraint in the join
condition.  With both present, Spark buffers each side only within the
watermark + tolerance horizon — state is bounded by stream RATE, not stream
length (the 100 TB/day contract), and the join is exactly-once under
checkpointing.

Semantics: inner join on the key with

    purchase.ts - tolerance  <=  click.ts  <=  purchase.ts

i.e. every (click, purchase) pair of the same user within the attribution
window — the INTERVAL-join contract (all qualifying pairs), deliberately
distinct from the batch as-of join (operators/asof.py picks only the MOST
RECENT click; a stream cannot know "most recent" until the watermark
closes, which is why Spark has no streaming as-of).  Downstream, the as-of
winner is one ordered dedup per purchase over this (bounded) pair stream
once the watermark seals it — tests pin that reduction equal to the batch
asof_join on the same data.

Batch-equality: run on the SAME frames as a batch join, the predicate is
identical, so the streamed pair set equals the batch interval join — pinned
in tests/test_streaming_joins.py (streams have no SQL oracle; the pinned
batch twin rides the gated events tables instead).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interval_join_condition(
    left_ts: Column, right_ts: Column, tolerance_s: int
) -> Column:
    """left_ts ∈ [right_ts − tolerance, right_ts] — the attribution window."""
    return (left_ts <= right_ts) & (
        left_ts >= right_ts - F.expr(f"INTERVAL {tolerance_s} SECONDS")
    )


def attribute_purchases(
    clicks: DataFrame,
    purchases: DataFrame,
    tolerance_s: int = 600,
    click_watermark_s: int = 1200,
    purchase_watermark_s: int = 600,
) -> DataFrame:
    """(user_id, click_id, click_ts, purchase_id, purchase_ts) — every
    click of the same user within ``tolerance_s`` BEFORE the purchase.

    Both inputs are streaming frames with (event_id, ts, user_id) columns.
    The click watermark must cover purchase-watermark + tolerance (a click
    can only become joinable ``tolerance_s`` after it happened); passing a
    smaller one raises rather than silently dropping attributable clicks.
    """
    if click_watermark_s < purchase_watermark_s + tolerance_s:
        raise ValueError(
            "click watermark must be >= purchase watermark + tolerance, "
            f"got {click_watermark_s} < {purchase_watermark_s} + {tolerance_s}"
        )
    c = (
        clicks.withWatermark("ts", f"{click_watermark_s} seconds")
        .select(
            F.col("user_id"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
    )
    p = (
        purchases.withWatermark("ts", f"{purchase_watermark_s} seconds")
        .select(
            F.col("user_id").alias("p_user_id"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        )
    )
    joined = c.join(
        p,
        (F.col("user_id") == F.col("p_user_id"))
        & interval_join_condition(
            F.col("click_ts"), F.col("purchase_ts"), tolerance_s
        ),
        "inner",
    )
    return joined.select(
        "user_id", "click_id", "click_ts", "purchase_id", "purchase_ts"
    )


def asof_winners(pairs: DataFrame) -> DataFrame:
    """Batch reduction of the sealed pair stream to the as-of winner per
    purchase: the LATEST qualifying click, ties on click_ts broken by max
    click_id (the deterministic right-side tie-break convention of
    operators/asof.py).  One map-side-combinable groupBy — run it on the
    sink snapshot (or per closed watermark window), never inside the
    stream."""
    return (
        pairs.groupBy("user_id", "purchase_id", "purchase_ts")
        .agg(
            F.max(F.struct("click_ts", "click_id")).alias("m"),
        )
        .select(
            "user_id",
            "purchase_id",
            "purchase_ts",
            F.col("m.click_ts").alias("click_ts"),
            F.col("m.click_id").alias("click_id"),
        )
    )
