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
