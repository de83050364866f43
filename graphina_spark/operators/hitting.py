"""Truncated expected hitting time to a target set (Sarkar–Moore 2007).

h_T(v) = expected number of random-walk steps from v until the walk
first enters the target set, truncated at horizon T:

    h_0(v)   = 0            if v ∈ targets else T
    h_k(v)   = 0                        if v ∈ targets
             = min(T, 1 + avg_{u ∈ out(v)} h_{k-1}(u))   otherwise
    (vertices with no out-edges can never reach the targets: h = T)

Truncation is what makes the quantity well-defined on a crawl graph
(untruncated hitting time is infinite from any vertex that cannot reach
the targets) and is the published form used for proximity/link
prediction ("Fast incremental proximity search in large graphs", ICML
2008 uses the same truncated variant).  Low h = close to the target set
in random-walk geometry — the directed, walk-weighted cousin of BFS
distance (operators/paths.py), useful for spam-distance (walk steps to
a blocklist) and trust-distance readouts.

Scale shape: exactly a PageRank superstep in reverse — one gather
shuffle per round (out-edges join the current h frame on dst, then a
groupBy(src) average with map-side partial agg), the out-degree frame
computed once and cached, per-round local_materialize (lineage/stats
rule).  h frames are dense (n rows) like rank vectors.

DuckDB twin: oracles.py::hitting_time_web_sql (rounds unrolled, same
min/avg arithmetic, same horizon).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphina_spark.graph import LinkGraph
from graphina_spark.plans.materialize import local_materialize as _mat


def truncated_hitting_time(
    g: LinkGraph,
    targets: DataFrame,
    horizon: int = 8,
) -> DataFrame:
    """(id, h): truncated expected hitting time from every vertex to the
    ``targets`` (an (id) frame), horizon-capped value iteration run
    ``horizon`` rounds (the fixpoint for h_T needs exactly T rounds)."""
    if horizon < 1:
        raise ValueError("horizon must be >= 1")
    T = float(horizon)

    tgt = targets.select("id").distinct().withColumn("is_t", F.lit(True))
    adj = g.edges.select("src", "dst").repartition("src").cache()
    outdeg = adj.groupBy(F.col("src").alias("id")).agg(
        F.count("*").alias("deg")
    )
    base = (
        g.vertices.select("id")
        .join(tgt, "id", "left")
        .join(outdeg, "id", "left")
        .select(
            "id",
            F.coalesce("is_t", F.lit(False)).alias("is_t"),
            F.coalesce("deg", F.lit(0)).alias("deg"),
        )
        .transform(_mat)
    )

    h = base.select(
        "id", F.when(F.col("is_t"), F.lit(0.0)).otherwise(F.lit(T)).alias("h")
    ).transform(_mat)
    for _ in range(horizon):
        nbr = (
            adj.join(h.withColumnRenamed("id", "dst"), "dst")
            .groupBy(F.col("src").alias("id"))
            .agg(F.sum("h").alias("sh"))
        )
        h = (
            base.join(nbr, "id", "left")
            .select(
                "id",
                F.when(F.col("is_t"), F.lit(0.0))
                .when(
                    F.col("deg") > 0,
                    F.least(F.lit(T), F.lit(1.0) + F.col("sh") / F.col("deg")),
                )
                .otherwise(F.lit(T))
                .alias("h"),
            )
            .transform(_mat)
        )
    adj.unpersist()
    return h
