"""Session-level event-type transition model (clickstream Markov chain).

Within each session (operators/sessions.py), count consecutive event-type
pairs and estimate the first-order transition matrix P(next | cur) — the
standard clickstream model next to funnels and retention.

Scale shape: reuses the sessionizer's single keyed-window shuffle (the lead
window shares the same (uid) partitioning and (es, eid) sort, so Catalyst
stacks it on the same sorted pass); the pair count is one small aggregation
over |event types|² keys with map-side partial aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from graphina_spark.operators.sessions import DEFAULT_GAP_S, sessionize


def session_transitions(
    events: DataFrame, gap_s: int = DEFAULT_GAP_S
) -> DataFrame:
    """(cur, nxt, n, p): count of consecutive (cur → nxt) event-type pairs
    within sessions, and the row-normalized transition probability
    (n / Σ_nxt n, 6-dp).  Session boundaries break chains (no cross-session
    pairs)."""
    s = sessionize(events, gap_s=gap_s)
    w = Window.partitionBy("uid", "session_idx").orderBy("es", "eid")
    pairs = (
        s.withColumn("nxt", F.lead("etype").over(w))
        .where(F.col("nxt").isNotNull())
        .groupBy(F.col("etype").alias("cur"), "nxt")
        .agg(F.count("*").alias("n"))
    )
    tot = Window.partitionBy("cur")
    return pairs.select(
        "cur",
        "nxt",
        "n",
        F.round(F.col("n") / F.sum("n").over(tot), 6).alias("p"),
    )
