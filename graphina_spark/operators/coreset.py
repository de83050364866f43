"""Diversity coreset seeding over embeddings — greedy k-center (Gonzalez
1985 farthest-point traversal, the 2-approximation for the k-center
objective; also the kmeans++-style seeding used for coverage-maximizing
training-data subset selection).

Pipeline role: given a 100 TB corpus with an embedding column, pick k
maximally-spread exemplars (dedup anchors, curriculum strata, eval probes).
Random sampling over-represents dense modes; farthest-point traversal
provably covers every mode within 2× the optimal radius.

Determinism across engines: embeddings are quantized ONCE via
``floor(x · 2^qbits)`` (float32·2^qbits is exact in double — a power-of-two
scale only shifts the exponent — and ``floor`` has identical semantics in
Spark and DuckDB, unlike ``round`` whose half-way rule differs), after which
every distance is INTEGER arithmetic: d²(u, v) = Σ (qu_i - qv_i)².  With
64 dims and 12-bit quantization the sums stay far below 2^62, so the DuckDB
twin replays selection bit-exactly.

Scale shape per round (k rounds total, k small):

- the newly chosen center is ONE broadcast row; the min-distance frame
  updates via ``zip_with`` + ``aggregate`` column expressions (JVM-side,
  no shuffle);
- the argmax is a single map-side-combinable ``max(struct(d, -vec_id))``
  aggregation (ties → smaller vec_id);
- the running ``mind`` frame is local_materialize'd per round (repo
  superstep rule), so the plan never grows with k.

Driver round-trips are O(k) one-row collects — the documented MST-style
exception to the no-collect rule (k ≤ tens, never corpus-sized).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphina_spark.plans.materialize import local_materialize as _mat


def quantize_embeddings(embs: DataFrame, qbits: int = 12) -> DataFrame:
    """(vec_id, qv array<long>) — floor(x · 2^qbits) integer grid."""
    scale = float(1 << qbits)
    return embs.select(
        "vec_id",
        F.transform(
            F.col("embedding").cast("array<double>"),
            lambda x: F.floor(x * F.lit(scale)).cast("long"),
        ).alias("qv"),
    )


def _d2(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def k_center_seeds(embs: DataFrame, k: int, qbits: int = 12) -> DataFrame:
    """(seed_rank, vec_id, d2) — the k farthest-point-traversal seeds over
    the quantized embedding grid.  seed_rank 0 is the minimum vec_id (the
    deterministic start); each later seed maximizes the squared distance to
    the already-chosen set (``d2``, its selection radius — non-increasing;
    ties → smaller vec_id).  d2 of seed 0 is 0 by convention.

    Chosen points leave the candidate pool, so seeds are DISTINCT even on
    degenerate inputs where every remaining distance is 0 (grid-coincident
    embeddings), and ``k > n`` caps at n seeds instead of re-listing the
    min-id point — both were mirrored blind spots (twin updated together;
    tests/test_readout_edgecases.py pins the planted cases).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    q = quantize_embeddings(embs, qbits=qbits).transform(_mat)
    n = q.count()
    first = q.agg(F.min("vec_id")).first()[0]
    if first is None:
        raise ValueError("empty embedding table")
    seeds = [(0, int(first), 0)]
    center = q.where(F.col("vec_id") == first).select(
        F.col("qv").alias("cv")
    )
    mind = (
        q.where(F.col("vec_id") != first)
        .crossJoin(F.broadcast(center))
        .select("vec_id", "qv", _d2(F.col("qv"), F.col("cv")).alias("d"))
        .transform(_mat)
    )
    for rank in range(1, min(k, n)):
        top = (
            mind.agg(
                F.max(F.struct(F.col("d"), (-F.col("vec_id")).alias("nid"))).alias("m")
            )
            .select(F.col("m.d").alias("d"), (-F.col("m.nid")).alias("vid"))
            .first()
        )
        vid, d = int(top["vid"]), int(top["d"])
        seeds.append((rank, vid, d))
        center = q.where(F.col("vec_id") == vid).select(F.col("qv").alias("cv"))
        mind = (
            mind.where(F.col("vec_id") != vid)
            .crossJoin(F.broadcast(center))
            .select(
                "vec_id",
                "qv",
                F.least(F.col("d"), _d2(F.col("qv"), F.col("cv"))).alias("d"),
            )
            .transform(_mat)
        )
    spark = embs.sparkSession
    return spark.createDataFrame(seeds, "seed_rank int, vec_id long, d2 long")


def coreset_assign(embs: DataFrame, seeds: DataFrame, qbits: int = 12) -> DataFrame:
    """(vec_id, seed_vec_id, d2) — every vector assigned to its nearest
    k-center seed (ties → smaller seed vec_id): the coverage partition a
    stratified-sampling stage draws from.  One broadcast join (seeds are k
    rows) + one per-vector argmin — no shuffle beyond the final agg.
    """
    q = quantize_embeddings(embs, qbits=qbits)
    s = seeds.select(F.col("vec_id").alias("svid")).join(
        quantize_embeddings(embs, qbits=qbits).select(
            F.col("vec_id").alias("svid"), F.col("qv").alias("sv")
        ),
        "svid",
    )
    pairs = q.crossJoin(F.broadcast(s)).select(
        "vec_id", "svid", _d2(F.col("qv"), F.col("sv")).alias("d")
    )
    best = pairs.groupBy("vec_id").agg(
        F.max(F.struct((-F.col("d")).alias("nd"), (-F.col("svid")).alias("ns"))).alias("m")
    )
    return best.select(
        "vec_id",
        (-F.col("m.ns")).alias("seed_vec_id"),
        (-F.col("m.nd")).cast("long").alias("d2"),
    )
