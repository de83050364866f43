"""Co-citation and bibliographic-coupling networks (Small 1973; Kessler
1963) — the two classic derived similarity graphs of a directed link graph.

Not in the reference (graphina's link-prediction family works on the
undirected neighbor sets, src/links/prediction.rs); these are the directed
web/citation variants: two pages are *co-cited* when a third page links to
both (shared in-neighbor), and *coupled* when they link to the same third
page (shared out-neighbor).  Both are standard crawl-analysis primitives
(related-page discovery, citation clustering).

Scale shape: one deduped edge projection, one self-join on the shared
endpoint, one pair-count aggregation — the same wedge pattern as
operators/links.py, with the identical hub hazard: a shared endpoint of
degree d emits d² pairs, so one 10⁶-in-degree hub yields 10¹² co-citation
rows.  ``max_degree`` (default ``DEFAULT_MAX_DEGREE``) drops wedge centers
above the cap *before* the self-join (documented bias: pairs sharing ONLY
ultra-hubs disappear — at web scale "co-cited via google.com's homepage"
carries no signal anyway).  ``min_count`` prunes the long tail after the
map-side-combined count aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphina_spark.graph import LinkGraph

DEFAULT_MAX_DEGREE = 10_000


def _pair_counts(
    adj: DataFrame,
    shared: str,
    other: str,
    max_degree: int | None,
    min_count: int,
) -> DataFrame:
    if max_degree is not None:
        deg = adj.groupBy(shared).agg(F.count("*").alias("_d"))
        adj = (
            adj.join(deg.where(F.col("_d") <= max_degree), shared, "left_semi")
        )
    a = adj.select(F.col(other).alias("u"), F.col(shared).alias("_k"))
    b = adj.select(F.col(other).alias("v"), F.col(shared).alias("_k"))
    out = (
        a.join(b, "_k")
        .where(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count("*").alias("n_common"))
    )
    if min_count > 1:
        out = out.where(F.col("n_common") >= min_count)
    return out


def co_citation(
    g: LinkGraph,
    max_degree: int | None = DEFAULT_MAX_DEGREE,
    min_count: int = 1,
) -> DataFrame:
    """(u, v, n_common) with u < v — number of pages linking to BOTH u and
    v (shared in-neighbors), hub centers above ``max_degree`` excluded."""
    adj = g.edges.select("src", "dst").distinct()
    return _pair_counts(adj, "src", "dst", max_degree, min_count)


def bibliographic_coupling(
    g: LinkGraph,
    max_degree: int | None = DEFAULT_MAX_DEGREE,
    min_count: int = 1,
) -> DataFrame:
    """(u, v, n_common) with u < v — number of pages BOTH u and v link to
    (shared out-neighbors), hub centers above ``max_degree`` excluded."""
    adj = g.edges.select("src", "dst").distinct()
    return _pair_counts(adj, "dst", "src", max_degree, min_count)
