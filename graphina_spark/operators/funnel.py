"""Ordered funnel analysis over the events table.

The classic product-analytics readout next to sessionization: how far does
each user get through an ordered step sequence (view → click → purchase),
where each step must occur STRICTLY after the completion of the previous
one (first-touch semantics: the earliest qualifying event per step).

No reference analogue (graphina is a graph library); north-star addition in
the events family.

Determinism: "after" compares a composite order key ``o = es·EID_SCALE +
event_id`` so same-second ties break by event id identically in both
engines.  ``EID_SCALE`` must exceed the max event_id; the default (10⁹)
keeps ``o`` < 2⁶² for epoch-seconds anchored in 2000 through year ~2150 —
a documented bound, checked at runtime.

Scale shape: one aggregation per step, each keyed by user — k steps = k
hash-aggregate shuffles on the same key (co-partitioned after the first),
with the step filter pushed below every aggregation.  No arrays, no
windows, no per-user event lists held in memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphina_spark.operators.sessions import ANCHOR

EID_SCALE = 1_000_000_000


def funnel_stages(events: DataFrame, steps: list[str]) -> DataFrame:
    """(uid, stage): the number of funnel steps (0..len(steps)) each user
    completed in strict order; every user in the events table gets a row."""
    if not steps:
        raise ValueError("steps must be non-empty")
    ev = events.select(
        F.col("user_id").cast("long").alias("uid"),
        F.col("event_type").alias("etype"),
        F.col("event_id").cast("long").alias("eid"),
        (
            F.expr(f"timestampdiff(SECOND, {ANCHOR}, ts)") * F.lit(EID_SCALE)
            + F.col("event_id").cast("long")
        ).alias("o"),
    )
    mx = ev.agg(F.max("eid")).first()[0]
    if mx is not None and mx >= EID_SCALE:
        raise ValueError("event_id exceeds EID_SCALE; raise EID_SCALE")
    ev = ev.drop("eid")
    reached = ev.select(F.col("uid")).distinct().withColumn(
        "stage", F.lit(0)
    )
    prev = None  # (uid, o_completed)
    for i, step in enumerate(steps, start=1):
        hits = ev.where(F.col("etype") == step)
        if prev is not None:
            hits = hits.join(prev, "uid").where(F.col("o") > F.col("_po"))
        cur = hits.groupBy("uid").agg(F.min("o").alias("_po"))
        reached = (
            reached.join(cur.select("uid", F.lit(1).alias("_hit")), "uid", "left")
            .select(
                "uid",
                F.when(F.col("_hit").isNotNull(), F.lit(i))
                .otherwise(F.col("stage"))
                .alias("stage"),
            )
        )
        prev = cur
    return reached


def funnel_counts(events: DataFrame, steps: list[str]) -> DataFrame:
    """(stage, n_users): users whose furthest strictly-ordered step is
    ``stage`` (0 = entered no step)."""
    return funnel_stages(events, steps).groupBy("stage").agg(
        F.count("*").alias("n_users")
    )
