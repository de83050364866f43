"""Balanced graph partitioning — capacity-constrained synchronous label
propagation (the "balanced LPA" family: Ugander & Backstrom WSDM 2013
restreaming/balanced label propagation, Facebook's BLP; Spinner,
Martella et al. 2017).

Why it exists: placing a 10^12-edge graph on 1000 executors needs an
assignment that (a) keeps partitions near-equal (quota) and (b) minimizes
cross-partition edges (communication).  Hash partitioning gives (a) but
ignores (b); plain LPA optimizes (b) but collapses partitions.  This
operator does both, as a deterministic synchronous kernel the DuckDB
oracle replays round for round.

Round semantics (all ties broken by portable deterministic orders):

1. ``cnt(v, p)`` = #neighbors of v currently in partition p (one gather).
2. ``best(v)``  = argmax_p cnt, ties → smaller p.
3. ``gain(v)``  = cnt(v, best) - cnt(v, current); movers have gain > 0.
4. quota_in(p)  = max(0, cap - size(p)) with
   ``cap = ceil(n·(100+slack_pct) / (100·k))`` in INTEGER arithmetic
   (cross-engine exact — no float ceil boundary)
   — computed BEFORE the round's moves (departures free space only next
   round; the standard synchronous simplification, keeps every round one
   pass).
5. per target partition, accept the top-quota movers by
   (gain desc, hash(id, round) asc, id asc).

Every step is a keyed join / map-side-combinable aggregate / bounded
window: the per-vertex argmax is a packed-long HashAggregate
(plans/argmax.py — no sort), and the only window left is the per-target
quota acceptance, which sorts ONLY the movers of the round (an ordered
prefix selection is inherently a sort; movers ≪ |V|) — no step is
quadratic in degree, so crawl hubs cost their degree and nothing more.

Initial assignment ``id % k`` is exactly balanced; ``slack_pct`` bounds how
far any round may drift.  ``fixed_rounds`` is the oracle contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from graphina_spark.graph import LinkGraph
from graphina_spark.operators.approximation import PRI_A1, PRI_A2, PRI_B
from graphina_spark.operators.distmetrics import ANF_P
from graphina_spark.plans.argmax import argmax_long
from graphina_spark.plans.materialize import local_materialize as _mat


def _move_pri(id_col: F.Column, r: int) -> F.Column:
    h1 = (id_col * F.lit(PRI_A1) + F.lit(r * PRI_A2 + PRI_B)) % F.lit(ANF_P)
    h2 = (h1 * h1 + F.lit(PRI_A1)) % F.lit(ANF_P)
    return (h2 * h2 + F.lit(PRI_A2)) % F.lit(ANF_P)


def balanced_partition(
    g: LinkGraph, k: int, fixed_rounds: int = 4, slack_pct: int = 10
) -> DataFrame:
    """(id, part) — capacity-constrained balanced-LPA assignment after
    exactly ``fixed_rounds`` synchronous rounds starting from ``id % k``."""
    if k < 1:
        raise ValueError("k must be >= 1")
    e = g.edges.select("src", "dst").where(F.col("src") != F.col("dst"))
    sym = (
        e.unionAll(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .repartition("src")
        .cache()
    )
    n = g.num_vertices()
    cap = (n * (100 + slack_pct) + 100 * k - 1) // (100 * k)
    part = g.vertices.select("id", (F.col("id") % k).alias("part")).transform(_mat)

    for r in range(fixed_rounds):
        nbr_part = sym.join(
            part.select(F.col("id").alias("dst"), F.col("part").alias("p")), "dst"
        )
        cnt = nbr_part.groupBy(F.col("src").alias("id"), "p").agg(
            F.count("*").alias("c")
        )
        # argmax by (c desc, p asc) as a packed-long hash aggregation
        # (plans/argmax.py): map-side partial combine, NO sort — the
        # sort-window variant was the measured scaling bottleneck of the
        # LPA kernel, and max(struct) silently plans SortAggregate.
        # Bounds are free here: c ≤ degree < n and p < k.
        best = argmax_long(
            cnt, "id", "c", "p", out_score="cbest", out_tie="best",
            max_score=n, max_tie=k - 1,
        )
        cur = part.join(
            cnt.withColumnRenamed("p", "part"), ["id", "part"], "left"
        ).select("id", "part", F.coalesce("c", F.lit(0)).alias("ccur"))
        cand = (
            cur.join(best, "id")
            .where((F.col("best") != F.col("part")) & (F.col("cbest") > F.col("ccur")))
            .select(
                "id",
                "part",
                "best",
                (F.col("cbest") - F.col("ccur")).alias("gain"),
                _move_pri(F.col("id"), r).alias("pri"),
            )
        )
        sizes = part.groupBy("part").agg(F.count("*").alias("sz"))
        # full 0..k-1 range: a partition that empties out must still accept
        # movers (absent from `sizes`, an inner join would silently bar it)
        quota = (
            part.sparkSession.range(k)
            .select(F.col("id").alias("best"))
            .join(sizes.withColumnRenamed("part", "best"), "best", "left")
            .select(
                "best",
                F.greatest(
                    F.lit(0), F.lit(cap) - F.coalesce("sz", F.lit(0))
                ).alias("q"),
            )
        )
        w_acc = Window.partitionBy("best").orderBy(
            F.desc("gain"), F.asc("pri"), F.asc("id")
        )
        accepted = (
            cand.join(quota, "best")
            .withColumn("rn", F.row_number().over(w_acc))
            .where(F.col("rn") <= F.col("q"))
            .select("id", F.col("best").alias("newp"))
        )
        part = (
            part.join(accepted, "id", "left")
            .select("id", F.coalesce("newp", "part").alias("part"))
            .transform(_mat)
        )
    sym.unpersist()
    return part


def partition_quality(g: LinkGraph, assignment: DataFrame) -> DataFrame:
    """One row (cut_edges, total_edges, cut_frac, max_size, min_size) — the
    two numbers a placement decision reads: cross-partition edge fraction
    and balance envelope.  Two keyed joins + two scalar aggregations."""
    canon = g.canonical_undirected_edges(dedup=True)
    pa = assignment.select(F.col("id").alias("src"), F.col("part").alias("ps"))
    pb = assignment.select(F.col("id").alias("dst"), F.col("part").alias("pd"))
    ed = canon.join(pa, "src").join(pb, "dst")
    agg = ed.agg(
        F.sum(F.when(F.col("ps") != F.col("pd"), 1).otherwise(0)).alias("cut_edges"),
        F.count("*").alias("total_edges"),
    ).first()
    sz = assignment.groupBy("part").agg(F.count("*").alias("sz"))
    szr = sz.agg(F.max("sz").alias("mx"), F.min("sz").alias("mn")).first()
    spark = assignment.sparkSession
    cut, tot = int(agg["cut_edges"] or 0), int(agg["total_edges"])
    return spark.createDataFrame(
        [
            (
                cut,
                tot,
                round(cut / tot, 6) if tot else 0.0,
                int(szr["mx"]),
                int(szr["mn"]),
            )
        ],
        "cut_edges long, total_edges long, cut_frac double, max_size long, min_size long",
    )
