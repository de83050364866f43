"""ReFeX recursive structural features (Henderson et al., KDD 2011).

Role discovery's feature extractor: start from local features (degrees)
and recursively append neighborhood AGGREGATES of the newest feature block
(sum and mean over neighbors).  After r rounds each vertex carries
information from its r-hop neighborhood *by role, not by identity* — two
vertices on different sides of the graph with the same structural position
get near-identical vectors (contrast FastRP/node2vec, which embed
identity+proximity).  Standard uses: structural role clustering (RolX),
anomalous-host detection, cross-graph transfer features for GNNs.

Deterministic subset of the paper: aggregation applies to the PREVIOUS
round's block only (the paper aggregates everything and prunes duplicates
by correlation — a data-dependent heuristic that would make the feature
index mapping fragile; block-recursion yields the same information
without ever creating the duplicates), fixed (sum, mean) aggregates,
feature indices by closed-form arithmetic so the DuckDB twin
(oracles.refex_web_sql) maps identically.

Feature layout: base block 0..2 = (total, in, out) degree.  Round r maps
each feature fi of the previous block [lo, hi) to two appended features:
sum → n + 2·(fi − lo), mean → n + 2·(fi − lo) + 1, where n is the feature
count before the round.  Counts: 3 → 9 → 21 → 45 (3·(2^(r+1)−1)).

Scale shape: the feature table is exploded (id, fi, v) rows; each round is
ONE edge-join + ONE groupBy((id, fi)) computing sum and count together
(map-side combined, the smoothing.py posture) — round r costs
O(|E|·3·2^r) partial-summed rows, with r = 2-3 in every published use.
Means divide at round end; 6-dp rounding on output only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphina_spark.graph import LinkGraph

ROUND = 6


def refex_features(g: LinkGraph, rounds: int = 2) -> DataFrame:
    """(id, fi, v) — exploded ReFeX feature matrix after ``rounds``
    recursive aggregations; vertices with no neighbors carry their base
    features and zeros for every aggregate (sum 0; mean 0 by the paper's
    empty-neighborhood convention)."""
    sym = g.undirected_view().select("src", "dst")
    deg = sym.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("d"))
    ind = g.edges.groupBy(F.col("dst").alias("id")).agg(F.count("*").alias("d"))
    outd = g.edges.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("d"))
    block = None
    for fi, frame in enumerate((deg, ind, outd)):
        part = (
            g.vertices.select("id")
            .join(frame, "id", "left")
            .select(
                "id",
                F.lit(fi).alias("fi"),
                F.coalesce("d", F.lit(0)).cast("double").alias("v"),
            )
        )
        block = part if block is None else block.unionAll(part)
    feats, lo, n_feats = block, 0, 3
    for _ in range(rounds):
        agg = (
            sym.join(block.withColumnRenamed("id", "dst"), "dst")
            .groupBy(F.col("src").alias("id"), "fi")
            .agg(F.sum("v").alias("s"), F.count("*").alias("c"))
        )
        both = (
            block.select("id", "fi")
            .join(agg, ["id", "fi"], "left")
            .select(
                "id",
                "fi",
                F.coalesce("s", F.lit(0.0)).alias("s"),
                F.coalesce("c", F.lit(0)).alias("c"),
            )
        )
        sums = both.select(
            "id",
            (F.lit(n_feats) + 2 * (F.col("fi") - lo)).alias("fi"),
            F.col("s").alias("v"),
        )
        means = both.select(
            "id",
            (F.lit(n_feats) + 2 * (F.col("fi") - lo) + 1).alias("fi"),
            F.when(F.col("c") > 0, F.col("s") / F.col("c"))
            .otherwise(F.lit(0.0))
            .alias("v"),
        )
        block = sums.unionAll(means)
        feats = feats.unionAll(block)
        lo, n_feats = n_feats, n_feats + 2 * (n_feats - lo)
    return feats.select(
        "id", F.col("fi").cast("int").alias("fi"), F.round("v", ROUND).alias("v")
    )
