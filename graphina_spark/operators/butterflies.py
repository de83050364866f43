"""Butterfly counting on bipartite activity graphs (users × time windows).

A butterfly is the bipartite 4-cycle (u1—w1—u2—w2—u1) — the smallest
non-trivial bipartite motif, the standard cohesion unit for user–item /
user–window graphs (Wang et al., "Butterfly Counting in Bipartite Networks",
KDD 2018; the bipartite analogue of the triangle).

No reference analogue (graphina has no bipartite motif ops); north-star
addition: per-user butterfly counts over the same (uid, win) bipartite
incidence the temporal co-occurrence graph is built from
(sources/derived.py::events_cooccurrence_graph), so the two readouts share
one derivation.

Per-left-vertex count: butterflies(u) = Σ_{v≠u} C(shared(u,v), 2) where
shared(u,v) = number of windows both users are active in.

Scale shape (100 TB story):

- The wedge join is on the *window* side: a window with d active users
  emits C(d,2) pairs, so the hot-window skew is capped exactly like the
  co-occurrence graph (per-window top-``max_users_per_window`` by uid,
  deterministic).  With the cap the pair fan-out is bounded by
  windows × cap², never global-quadratic.
- Two shuffles end-to-end: distinct (uid, win) incidence (reused by the
  cap window), and the pair groupBy; the final per-user sum folds both
  pair endpoints with one explode-free union aggregation.
- Everything is built-in column expressions — no UDFs, whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from graphina_spark.operators.sessions import ANCHOR
from graphina_spark.sources.derived import (
    COOC_MAX_USERS_PER_WINDOW,
    COOC_WINDOW_S,
)


def user_window_incidence(
    events: DataFrame,
    window_s: int = COOC_WINDOW_S,
    max_users_per_window: int = COOC_MAX_USERS_PER_WINDOW,
) -> DataFrame:
    """Distinct (uid, win) bipartite incidence with the deterministic
    per-window user cap (same derivation as events_cooccurrence_graph)."""
    ev = events.select(
        F.col("user_id").cast("long").alias("uid"),
        F.expr(f"timestampdiff(SECOND, {ANCHOR}, ts)").alias("es"),
    )
    w = ev.select(
        "uid", F.floor(F.col("es") / F.lit(float(window_s))).alias("win")
    ).distinct()
    cap = Window.partitionBy("win").orderBy(F.asc("uid"))
    return (
        w.withColumn("rn", F.row_number().over(cap))
        .where(F.col("rn") <= max_users_per_window)
        .select("uid", "win")
    )


def user_butterflies(
    events: DataFrame,
    window_s: int = COOC_WINDOW_S,
    max_users_per_window: int = COOC_MAX_USERS_PER_WINDOW,
) -> DataFrame:
    """(id, butterflies) per user: number of bipartite 4-cycles through the
    user in the capped (uid, win) incidence.  Users active in the events
    table but in no butterfly get 0."""
    inc = user_window_incidence(events, window_s, max_users_per_window)
    pairs = (
        inc.alias("a")
        .join(inc.alias("b"), "win")
        .where(F.col("a.uid") < F.col("b.uid"))
        .groupBy(F.col("a.uid").alias("u"), F.col("b.uid").alias("v"))
        .agg(F.count("*").alias("shared"))
        .where(F.col("shared") >= 2)
        .withColumn(
            "bf", (F.col("shared") * (F.col("shared") - 1) / 2).cast("long")
        )
    )
    both = pairs.select(F.col("u").alias("id"), "bf").unionAll(
        pairs.select(F.col("v").alias("id"), "bf")
    )
    per_user = both.groupBy("id").agg(F.sum("bf").alias("butterflies"))
    users = events.select(
        F.col("user_id").cast("long").alias("id")
    ).distinct()
    return users.join(per_user, "id", "left").select(
        "id", F.coalesce("butterflies", F.lit(0)).alias("butterflies")
    )
