"""Partition tracking between crawl snapshots (community evolution).

Given two labelings of (roughly) the same vertex set — Louvain runs on
consecutive crawls, core shells before/after a recrawl, topic labels
across months — :func:`track_partitions` computes the overlap table
that every community-evolution method starts from (Greene, Doyle &
Cunningham, ASONAM 2010: event detection via maximum-Jaccard matching),
and :func:`partition_events` classifies the standard lifecycle events
(continuation, split, merge, birth, death) from it.

Scale shape: one id-equi-join of the two label frames plus three
community-keyed aggregations — all map-side-combinable; the overlap
table has one row per label PAIR that actually shares a vertex, so its
size is bounded by min(#vertices, pairs-with-overlap), never
|P0|×|P1|.  Vertices present in only one snapshot simply don't join
(they surface as mass lost from size0/size1, and as births/deaths in
the event view).

DuckDB twin: oracles.py::core_track_web_sql (tracks core shells across
the base→recrawl snapshot pair — two nested unrolled coreness chains).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def track_partitions(
    lab0: DataFrame, lab1: DataFrame, label_col: str = "community"
) -> DataFrame:
    """(c0, c1, overlap, size0, size1, jaccard): one row per pair of
    old/new communities sharing at least one vertex; jaccard =
    overlap / (size0 + size1 - overlap), 6 dp."""
    a = lab0.select("id", F.col(label_col).alias("c0"))
    b = lab1.select("id", F.col(label_col).alias("c1"))
    ov = a.join(b, "id").groupBy("c0", "c1").agg(F.count("*").alias("overlap"))
    s0 = a.groupBy("c0").agg(F.count("*").alias("size0"))
    s1 = b.groupBy("c1").agg(F.count("*").alias("size1"))
    return (
        ov.join(s0, "c0")
        .join(s1, "c1")
        .select(
            "c0",
            "c1",
            "overlap",
            "size0",
            "size1",
            F.round(
                F.col("overlap")
                / (F.col("size0") + F.col("size1") - F.col("overlap")),
                6,
            ).alias("jaccard"),
        )
    )


def partition_events(
    lab0: DataFrame,
    lab1: DataFrame,
    label_col: str = "community",
    min_share: float = 0.5,
) -> DataFrame:
    """(community, snapshot, event): lifecycle classification.

    For every old community c0 (snapshot = 0):
      - ``continued``: some c1 absorbs > min_share of c0 AND c0 supplies
        > min_share of that c1 (strict mutual majority — the Greene et
        al. matching criterion; strict so an even split is a split);
      - ``split``: no mutual match, but ≥ 2 new communities each absorb
        ≥ min_share/2 of c0;
      - ``dissolved``: otherwise (including vertices vanishing).
    For every new community c1 (snapshot = 1) with no mutual match:
      - ``merged``: ≥ 2 old communities each supply ≥ min_share/2 of c1;
      - ``offshoot``: exactly 1 old community supplies ≥ min_share/2
        (c1 is a piece that broke off a larger c0);
      - ``born``: no old community supplies ≥ min_share/2 of c1;
      (mutually-matched c1 rows are ``continued`` and not re-emitted —
      their event is already recorded on the c0 side).
    """
    # not cached: the overlap table is re-derived per branch below, but
    # callers own cache lifecycle (ADVICE r1: never leak persisted frames);
    # cache track_partitions() yourself when calling repeatedly.
    t = track_partitions(lab0, lab1, label_col)
    half = min_share / 2
    # STRICT majority: an even 2-way split (each piece = exactly half)
    # must classify as a split, not a continuation
    mutual = t.where(
        (F.col("overlap") / F.col("size0") > min_share)
        & (F.col("overlap") / F.col("size1") > min_share)
    )
    m0 = mutual.select("c0").distinct()
    m1 = mutual.select("c1").distinct()

    frag0 = (
        t.where(F.col("overlap") / F.col("size0") >= half)
        .groupBy("c0")
        .agg(F.count("*").alias("parts"))
    )
    # event universes come from the LABEL frames, not the overlap table:
    # a community whose vertices all vanish has no overlap row at all
    ev0 = (
        lab0.select(F.col(label_col).alias("c0"))
        .distinct()
        .join(m0.withColumn("m", F.lit(True)), "c0", "left")
        .join(frag0, "c0", "left")
        .select(
            F.col("c0").alias("community"),
            F.lit(0).alias("snapshot"),
            F.when(F.col("m"), F.lit("continued"))
            .when(F.coalesce("parts", F.lit(0)) >= 2, F.lit("split"))
            .otherwise(F.lit("dissolved"))
            .alias("event"),
        )
    )
    feed1 = (
        t.where(F.col("overlap") / F.col("size1") >= half)
        .groupBy("c1")
        .agg(F.count("*").alias("feeders"))
    )
    ev1 = (
        lab1.select(F.col(label_col).alias("c1"))
        .distinct()
        .join(m1.withColumn("m", F.lit(True)), "c1", "left")
        .where(F.col("m").isNull())
        .join(feed1, "c1", "left")
        .select(
            F.col("c1").alias("community"),
            F.lit(1).alias("snapshot"),
            F.when(F.coalesce("feeders", F.lit(0)) >= 2, F.lit("merged"))
            .when(F.coalesce("feeders", F.lit(0)) == 1, F.lit("offshoot"))
            .otherwise(F.lit("born"))
            .alias("event"),
        )
    )
    out = ev0.unionAll(ev1)
    return out
