"""TrustRank and spam mass (Gyöngyi, Garcia-Molina & Pedersen, VLDB 2004).

Not in the reference (graphina has no TrustRank); added as a first-class
web link-graph kernel: the canonical crawl-quality workflow ranks pages by
uniform PageRank, re-ranks by trust propagated from a vetted seed set, and
flags spam by how much of a page's rank is NOT trust-reachable.

Both scores reuse the gate-green PageRank kernel (operators/pagerank.py —
salted CSR shards, sink-edge dangling mass, one shuffle per superstep):

    trust_rank  = personalized PageRank whose teleport AND dangling mass
                  follow the normalized seed indicator (the reference's
                  personalization semantics, personalized_pagerank.rs:98-107)
    spam_mass   = (pr − tr) / pr        (relative mass; Gyöngyi §5.2)

pr > 0 always holds under uniform teleport ((1−d)/n per vertex), so the
division is total.  The extra cost over one PageRank run is exactly one
more PageRank run — no new shuffle shapes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphina_spark.graph import LinkGraph
from graphina_spark.operators.pagerank import pagerank


def _seed_indicator(g: LinkGraph, seeds: DataFrame) -> DataFrame:
    return g.vertices.join(
        seeds.select("id").withColumn("_s", F.lit(1.0)), "id", "left"
    ).select("id", F.coalesce("_s", F.lit(0.0)).alias("p"))


def trust_rank(g: LinkGraph, seeds: DataFrame, damping: float = 0.85, **kw) -> DataFrame:
    """(id, rank) — PageRank with teleport restricted to ``seeds`` (id col).

    ``kw`` passes through to :func:`pagerank` (tol / max_iter /
    fixed_iters / checkpoint)."""
    return pagerank(g, damping=damping, personalization=_seed_indicator(g, seeds), **kw)


def spam_mass(g: LinkGraph, seeds: DataFrame, damping: float = 0.85, **kw) -> DataFrame:
    """(id, pr, tr, spam_mass) — uniform PageRank, TrustRank from ``seeds``,
    and the relative spam mass (pr − tr)/pr ∈ (−∞, 1]; values near 1 mean
    the page's rank comes almost entirely from outside the trust cone."""
    pr = pagerank(g, damping=damping, **kw).withColumnRenamed("rank", "pr")
    tr = trust_rank(g, seeds, damping=damping, **kw).withColumnRenamed("rank", "tr")
    return pr.join(tr, "id").select(
        "id",
        "pr",
        "tr",
        ((F.col("pr") - F.col("tr")) / F.col("pr")).alias("spam_mass"),
    )
