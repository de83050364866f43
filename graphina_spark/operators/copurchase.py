"""Co-purchase graphs from relational order lines — the classic
graph-from-relational derivation (market-basket item graphs; Amazon
"customers also bought").

Everything else in the engine runs on graphs derived by modular arithmetic
(so the DuckDB twin can replay the derivation); this module instead derives
a graph from the TPC-H-shaped ``lineitem`` table — realistic key skew, a
real-world co-occurrence weighting — and feeds it to the SAME gated kernels
(PageRank below).  It doubles as the engine's demonstration that relational
staging and graph analytics compose in one DataFrame plan with no export
step.

Scale shape: the within-order pair join fans out C(items_per_order, 2) per
order.  Orders are baskets (tens of items), so the fan-out is small and
data-bounded — but a pathological mega-order (a crawl-hub analogue) would
blow it up quadratically, so orders with more than ``max_items_per_order``
distinct items are EXCLUDED up front (one groupBy + semi-join; documented
bias, the same trade as the links family's middle-degree cap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphina_spark.graph import LinkGraph

DEFAULT_MAX_ITEMS_PER_ORDER = 1_000


def copurchase_pairs(
    lineitem: DataFrame,
    min_count: int = 2,
    max_items_per_order: int = DEFAULT_MAX_ITEMS_PER_ORDER,
) -> DataFrame:
    """(src, dst, cnt) — canonical src<dst part pairs co-occurring in at
    least ``min_count`` orders (distinct (order, part) incidence; mega-orders
    above the item cap excluded before the pair join)."""
    items = lineitem.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
    ).distinct()
    ok_sizes = items.groupBy("ok").agg(F.count("*").alias("c"))
    keep = ok_sizes.where(F.col("c") <= max_items_per_order).select("ok")
    items = items.join(keep, "ok")
    a = items.select("ok", F.col("pk").alias("src"))
    b = items.select("ok", F.col("pk").alias("dst"))
    return (
        a.join(b, "ok")
        .where(F.col("src") < F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count("*").alias("cnt"))
        .where(F.col("cnt") >= min_count)
    )


def copurchase_graph(
    lineitem: DataFrame,
    min_count: int = 2,
    max_items_per_order: int = DEFAULT_MAX_ITEMS_PER_ORDER,
) -> LinkGraph:
    """Undirected weighted co-purchase graph: vertices = every part seen in
    ``lineitem`` (parts with no co-purchases are dangling — PageRank's
    redistribution path gets exercised on real data), edge weight = number
    of shared orders.  Stored pre-symmetrized so the DuckDB oracle's edge
    CTE is literally the same list."""
    pairs = copurchase_pairs(
        lineitem, min_count=min_count, max_items_per_order=max_items_per_order
    )
    edges = pairs.select(
        "src", "dst", F.col("cnt").cast("double").alias("weight")
    ).unionAll(
        pairs.select(
            F.col("dst").alias("src"),
            F.col("src").alias("dst"),
            F.col("cnt").cast("double").alias("weight"),
        )
    )
    vertices = lineitem.select(
        F.col("l_partkey").cast("long").alias("id")
    ).distinct()
    return LinkGraph(vertices=vertices, edges=edges, directed=True)
