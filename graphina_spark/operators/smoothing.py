"""Neighborhood embedding aggregation — the GNN mean-aggregator as a query.

One round of GraphSAGE-mean / simplified graph convolution (SGC, Wu et al.
ICML 2019): each vertex's smoothed representation is the per-dimension mean
of its neighbors' embedding vectors (optionally including its own).  At
web scale this is how link structure is folded into document embeddings
without training anything — k applications ≈ SGC's Â^k X propagation, and
the result feeds dedup/ANN/clustering over *link-aware* vectors.

Scale shape: one join of the symmetrized edge frame onto the embedding
table (keyed by the neighbor id), one posexplode + groupBy(id, pos) mean
(map-side combined — the shuffle carries (id, pos) partial sums, never
vectors-of-vectors), then a list reassembly per id.  A degree-10⁶ hub costs
one skewed reduce cell per dimension (AQE splits it), not a fan-out.

Means are rounded to 6 dp (the kmeans CENT_ROUND convention) so the DuckDB
twin (oracles_text.py::nbr_emb_sql) is bit-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphina_spark.graph import LinkGraph

ROUND = 6


def neighborhood_mean_embedding(
    g: LinkGraph,
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    include_self: bool = False,
) -> DataFrame:
    """(id, pos, v) — exploded smoothed embedding: per vertex, the per-dim
    mean over the embedded members of its (undirected) neighbor multiset —
    neighbors without an embedding row are skipped; vertices with no
    embedded neighbor emit no rows.  ``include_self`` adds the vertex's own
    vector to the multiset (the self-loop of the GCN propagation)."""
    e = emb.select(
        F.col(id_col).cast("long").alias("nid"),
        F.col(vec_col).cast("array<double>").alias("x"),
    )
    sym = g.undirected_view().select("src", "dst")
    pairs = sym.select(F.col("src").alias("id"), F.col("dst").alias("nid"))
    if include_self:
        ids = g.vertices.select(F.col("id"), F.col("id").alias("nid"))
        pairs = pairs.unionAll(ids)
    return (
        pairs.join(e, "nid")
        .select("id", F.posexplode("x").alias("pos", "xi"))
        .groupBy("id", "pos")
        .agg(F.round(F.avg("xi"), ROUND).alias("v"))
    )
