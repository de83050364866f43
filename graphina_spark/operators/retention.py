"""Cohort retention analysis over the events table.

Users are grouped into cohorts by the period (day/week) of their first
event; retention counts how many of each cohort are active k periods later
— the standard triangle table next to funnels and sessionization.

No reference analogue (graphina is a graph library); north-star addition in
the events family.  All-integer output (period indexes and counts) so the
cross-engine gate is hash-exact.

Scale shape: two aggregations — first-touch per user (min over one keyed
shuffle), then distinct (cohort, offset, uid) → count.  The period index is
a row-local integer division of the same tz-free epoch-seconds the other
events operators use; no windows, no per-user state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphina_spark.operators.sessions import ANCHOR

WEEK_S = 7 * 86_400


def cohort_retention(
    events: DataFrame, period_s: int = WEEK_S
) -> DataFrame:
    """(cohort, offset, n_users): users whose first-ever event falls in
    period ``cohort`` and who are active in period ``cohort + offset``
    (offset 0 row = cohort size).  Periods are ``floor(epoch_s / period_s)``
    from the shared 2000-01-01 anchor."""
    if period_s < 1:
        raise ValueError("period_s must be >= 1")
    ev = events.select(
        F.col("user_id").cast("long").alias("uid"),
        F.expr(f"timestampdiff(SECOND, {ANCHOR}, ts)").alias("es"),
    ).select(
        "uid", F.floor(F.col("es") / F.lit(float(period_s))).alias("per")
    )
    first = ev.groupBy("uid").agg(F.min("per").alias("cohort"))
    active = ev.distinct()
    return (
        active.join(first, "uid")
        .select("uid", "cohort", (F.col("per") - F.col("cohort")).alias("offset"))
        .groupBy("cohort", "offset")
        .agg(F.count("*").alias("n_users"))
    )
