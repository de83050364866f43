"""Structural near-duplicate pages via neighbourhood MinHash.

Mirror sites, scraper farms, and template-generated link pages duplicate
each other's LINK STRUCTURE even when their text differs — the classic
detector (Broder's shingling applied to adjacency sets; Gibson-Kumar-
Tomkins-style link spam discovery) sketches each page's out-neighbour
set with k min-hashes and bands the signature so that only pages with
high neighbour-set Jaccard collide.

Pipeline (every stage a keyed aggregation or bounded join):

1. signatures: one pass over distinct out-edges — k portable-hash mins
   per source vertex in a single groupBy (one shuffle).  The hash is the
   repo's checked-arithmetic H(j, 0, nbr) (walks._hop_hash with the
   hash index in the walk slot), so the DuckDB oracle replays it.
2. banding: the k mins split into ``bands`` contiguous slices; each
   slice becomes a string bucket key.  Pages sharing any band bucket are
   candidates (standard LSH OR-construction: catches pairs whose
   Jaccard ~ (1/2)^(rows-per-band) or better per band).
3. bucket cap: buckets with more than ``max_bucket`` members are dropped
   before pairing (a 10^6-page template family would otherwise emit
   10^12 candidate pairs — same trade as the ANN-LSH and links caps;
   documented bias toward missing the very largest families, which are
   detectable by the bucket-size report itself).
4. verify: exact neighbour-set Jaccard per candidate pair via one join
   through the shared-neighbour table — O(deg) work per candidate, no
   all-pairs anything.  Pairs below ``min_jaccard`` are dropped.

Only vertices with at least one out-neighbour participate (an empty set
has no sketch; two no-outlink pages are vacuously "identical" and
uninteresting).  DuckDB twin: oracles.py::structdup_web_sql.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphina_spark.graph import LinkGraph
from graphina_spark.operators.walks import _hop_hash
from graphina_spark.plans.materialize import local_materialize as _mat

DEFAULT_K = 8
DEFAULT_BANDS = 4
DEFAULT_MAX_BUCKET = 1000


def _out_edges(g: LinkGraph) -> DataFrame:
    e = g.edges if g.directed else g.symmetric_edges()
    return e.select("src", "dst").where(F.col("src") != F.col("dst")).distinct()


def neighbor_minhash(g: LinkGraph, k: int = DEFAULT_K) -> DataFrame:
    """(id, h0..h{k-1}) — k min-hash values over each vertex's distinct
    out-neighbour set; one groupBy pass.  Vertices without out-neighbours
    are absent."""
    if k < 1:
        raise ValueError("k must be >= 1")
    e = _out_edges(g)
    aggs = [
        F.min(_hop_hash(F.lit(j), 0, F.col("dst"))).alias(f"h{j}") for j in range(k)
    ]
    return e.groupBy(F.col("src").alias("id")).agg(*aggs)


def structural_dup_pairs(
    g: LinkGraph,
    k: int = DEFAULT_K,
    bands: int = DEFAULT_BANDS,
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
    min_jaccard: float = 0.5,
) -> DataFrame:
    """(a, b, jaccard) with a < b: candidate structural duplicates from
    banded neighbourhood MinHash, verified with the exact out-neighbour
    Jaccard and filtered to ``jaccard >= min_jaccard``."""
    if bands < 1 or k % bands != 0:
        raise ValueError("k must be a positive multiple of bands")
    rows = k // bands
    sig = neighbor_minhash(g, k=k).persist()
    e = _out_edges(g).persist()
    try:
        # band buckets: (band, key, id)
        buckets = None
        for b in range(bands):
            key = F.concat_ws(
                "_", *[F.col(f"h{b * rows + r}") for r in range(rows)]
            ).alias("key")
            part = sig.select(F.lit(b).alias("band"), key, "id")
            buckets = part if buckets is None else buckets.unionAll(part)
        if max_bucket is not None:
            ok = (
                buckets.groupBy("band", "key")
                .count()
                .where(F.col("count") <= max_bucket)
                .select("band", "key")
            )
            buckets = buckets.join(ok, ["band", "key"])
        cand = (
            buckets.alias("x")
            .join(buckets.alias("y"), ["band", "key"])
            .where(F.col("x.id") < F.col("y.id"))
            .select(F.col("x.id").alias("a"), F.col("y.id").alias("b"))
            .distinct()
        )
        # exact neighbour-set Jaccard per candidate
        deg = e.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("deg"))
        inter = (
            cand.join(e.select(F.col("src").alias("a"), "dst"), "a")
            .join(e.select(F.col("src").alias("b"), "dst"), ["b", "dst"])
            .groupBy("a", "b")
            .agg(F.count("*").alias("cn"))
        )
        out = (
            cand.join(inter, ["a", "b"], "left")
            .join(deg.withColumnRenamed("id", "a").withColumnRenamed("deg", "da"), "a")
            .join(deg.withColumnRenamed("id", "b").withColumnRenamed("deg", "db"), "b")
            .select(
                "a",
                "b",
                (
                    F.coalesce("cn", F.lit(0))
                    / (F.col("da") + F.col("db") - F.coalesce("cn", F.lit(0)))
                ).alias("jaccard"),
            )
            .where(F.col("jaccard") >= min_jaccard)
        )
        # materialize before releasing the caches the plan references
        out = _mat(out)
    finally:
        sig.unpersist()
        e.unpersist()
    return out
