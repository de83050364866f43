"""Graph snapshot diff — crawl-to-crawl edge churn.

A web graph is recrawled continuously; the operational questions are "which
links appeared, which rotted, how big is the churn per recrawl".  No
reference analogue (graphina holds one in-memory graph); north-star addition
for the maintenance loop around the link-graph kernels.

Scale shape: one full outer join on the canonical edge key (src, dst) — a
single co-partitioned shuffle of both edge tables; with both snapshots
bucketed by src (sources/io.py::save_bucketed_edges) the exchange disappears
entirely.  The summary is a map-side-combinable count per status.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphina_spark.graph import LinkGraph


def edge_diff(g_old: LinkGraph, g_new: LinkGraph) -> DataFrame:
    """(src, dst, status) — every edge present in either snapshot, with
    status 'kept' (both), 'removed' (old only), or 'added' (new only).
    Multi-edges collapse to their distinct (src, dst) key."""
    a = g_old.edges.select("src", "dst").distinct().withColumn("_a", F.lit(1))
    b = g_new.edges.select("src", "dst").distinct().withColumn("_b", F.lit(1))
    return (
        a.join(b, ["src", "dst"], "full_outer")
        .select(
            "src",
            "dst",
            F.when(
                F.col("_a").isNotNull() & F.col("_b").isNotNull(), F.lit("kept")
            )
            .when(F.col("_a").isNotNull(), F.lit("removed"))
            .otherwise(F.lit("added"))
            .alias("status"),
        )
    )


def diff_summary(g_old: LinkGraph, g_new: LinkGraph) -> DataFrame:
    """One row per status with its edge count (kept / added / removed)."""
    return edge_diff(g_old, g_new).groupBy("status").agg(
        F.count("*").alias("n_edges")
    )


def rank_drift(
    g_old: LinkGraph, g_new: LinkGraph, damping: float = 0.85, fixed_iters: int = 5
) -> DataFrame:
    """(id, pr_old, pr_new, drift) — per-page PageRank movement between two
    crawl snapshots: the crawl-ops question behind every "why did this site
    drop" report.  Runs the SAME fixed-iteration kernel on both snapshots
    (shared vertex universe assumed — pages absent from a snapshot simply
    have no inbound mass there) and joins the score vectors; ``drift`` =
    pr_new − pr_old over 6-dp-rounded scores (the gate convention, so both
    engines subtract identical values).

    Scale shape: two independent PageRank runs (each the one-shuffle-per-
    superstep kernel) + one co-keyed join on id — drift adds one exchange
    beyond the ranking itself.  Composes with :func:`edge_diff` (the edge-
    level churn view) for a full snapshot report.  DuckDB twin:
    oracles.py::rank_drift_web_sql (two unrolled PR chains, nested CTEs).
    """
    from graphina_spark.operators.pagerank import pagerank

    a = pagerank(g_old, damping=damping, fixed_iters=fixed_iters, tol=None).select(
        "id", F.round("rank", 6).alias("pr_old")
    )
    b = pagerank(g_new, damping=damping, fixed_iters=fixed_iters, tol=None).select(
        "id", F.round("rank", 6).alias("pr_new")
    )
    return (
        a.join(b, "id", "full_outer")
        .select(
            "id",
            F.coalesce("pr_old", F.lit(0.0)).alias("pr_old"),
            F.coalesce("pr_new", F.lit(0.0)).alias("pr_new"),
            F.round(
                F.coalesce("pr_new", F.lit(0.0)) - F.coalesce("pr_old", F.lit(0.0)), 6
            ).alias("drift"),
        )
    )
