"""Scalar int8 embedding quantization + retrieval-recall evaluation.

The vector-infra primitive every 100 TB embedding store runs before
serving: per-dimension affine int8 quantization (asymmetric min/max — the
faiss ``SQ8``/``ScalarQuantizer`` scheme) shrinks the corpus 4×, and the
question that decides whether it ships is *recall against the exact index*.
This module does both:

- :func:`scalar_quantize` — per-dim corpus min/max (one exact aggregation),
  then ``q = round(255·(x−min)/(max−min))`` clamped to [0, 255], stored with
  the 2·d codebook floats.  EXACT min/max make the codes a deterministic
  function of the corpus, so the DuckDB twin reproduces every code.
- :func:`quantization_recall` — dequantize (``min + q·(max−min)/255``), run
  the same exact top-k as operators/ann.py::cosine_topk on the dequantized
  vectors, and report recall@k per query = |topk_quant ∩ topk_exact| / k —
  the standard acceptance readout (faiss benchmarks, Milvus/SQ docs).

Scale shape: quantization is one min/max aggregation (a 2·d-double
broadcast codebook) + one projection — embarrassingly parallel.  The recall
harness reuses the broadcast-nested-loop exact scorer on a SAMPLED query
set (documented exactness baseline at gate scale; swap the scorer for
lsh/ivf_cosine_topk at production scale — recall composes with any scorer).

DuckDB twin: oracles_text.py::quant_recall_sql.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphina_spark.operators.ann import cosine_topk

Q_LEVELS = 255


def scalar_quantize(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(id, qvec: array<int>, mins: array<double>, scales: array<double>) —
    per-dim asymmetric int8 codes with the (broadcast) codebook columns
    attached; constant dimensions (max == min) quantize to 0."""
    base = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(vec_col).cast("array<double>").alias("x"),
    )
    mm = (
        base.select(F.posexplode("x").alias("pos", "xi"))
        .groupBy("pos")
        .agg(F.min("xi").alias("lo"), F.max("xi").alias("hi"))
        .groupBy()
        .agg(
            F.array_sort(F.collect_list(F.struct("pos", "lo", "hi"))).alias("t")
        )
        .select(
            F.transform("t", lambda s: s["lo"]).alias("mins"),
            F.transform("t", lambda s: (s["hi"] - s["lo"]) / F.lit(float(Q_LEVELS))).alias(
                "scales"
            ),
        )
    )
    q = base.crossJoin(F.broadcast(mm)).select(
        "id",
        F.expr(
            f"transform(x, (xi, i) -> CASE WHEN scales[i] > 0 THEN"
            f" least({Q_LEVELS}, greatest(0,"
            f" CAST(round((xi - mins[i]) / scales[i]) AS INT))) ELSE 0 END)"
        ).alias("qvec"),
        "mins",
        "scales",
    )
    return q


def quantization_recall(
    df: DataFrame,
    k: int = 5,
    query_mod: int = 25,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, hits, recall) — |topk over dequantized ∩ topk exact| / k
    for the sampled queries (``id % query_mod == 0``)."""
    base = df.select(
        F.col(id_col).cast("long").alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("embedding"),
    )
    deq = scalar_quantize(base).select(
        "id",
        F.expr(
            "transform(qvec, (qi, i) -> mins[i] + qi * scales[i])"
        ).alias("dvec"),
    )
    dbase = deq.select(F.col("id").alias("vec_id"), F.col("dvec").alias("embedding"))
    queries_e = base.where(F.col("vec_id") % query_mod == 0)
    queries_q = dbase.where(F.col("vec_id") % query_mod == 0)
    exact = cosine_topk(base, k=k, queries=queries_e).select(
        "query_id", F.col("neighbor_id").alias("n_exact")
    )
    quant = cosine_topk(dbase, k=k, queries=queries_q).select(
        "query_id", F.col("neighbor_id").alias("n_quant")
    )
    return _recall_vs_exact(exact, quant.withColumnRenamed("n_quant", "n_apx"), k)


def _recall_vs_exact(exact: DataFrame, approx: DataFrame, k: int) -> DataFrame:
    """(query_id, hits, recall) — |exact.n_exact ∩ approx.n_apx| per query
    over exact's query set (queries with zero overlap keep a 0 row)."""
    hits = (
        exact.join(
            approx,
            (exact["query_id"] == approx["query_id"])
            & (exact["n_exact"] == approx["n_apx"]),
        )
        .groupBy(exact["query_id"].alias("qid"))
        .agg(F.count("*").alias("hits"))
    )
    qids = exact.select("query_id").distinct()
    return qids.join(hits, qids["query_id"] == hits["qid"], "left").select(
        "query_id",
        F.coalesce("hits", F.lit(0)).cast("long").alias("hits"),
        F.round(F.coalesce("hits", F.lit(0)) / F.lit(float(k)), 6).alias("recall"),
    )


def matryoshka_recall(
    df: DataFrame,
    k: int = 5,
    dims: int = 16,
    query_mod: int = 25,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, hits, recall) — recall@k of top-k search run on the first
    ``dims`` embedding dimensions vs the full-dimension exact top-k.

    The Matryoshka-representation readout (Kusupati et al. 2022, and the
    truncation mode OpenAI/Cohere embedding APIs expose): a prefix slice of
    the vector is itself a usable lower-cost index, and the acceptance
    number is prefix-vs-full recall@k.  At 100 TB a ``dims``/d slice cuts
    scan bytes and shuffle width by the same factor before any
    quantization, and composes with it.

    Scale shape: one column-level ``slice`` projection (no shuffle), then
    the same sampled-query recall harness as :func:`quantization_recall`.
    DuckDB twin: oracles_text.py::matryoshka_recall_sql.
    """
    base = df.select(
        F.col(id_col).cast("long").alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("embedding"),
    )
    pref = base.select(
        "vec_id", F.slice("embedding", 1, dims).alias("embedding")
    )
    queries_e = base.where(F.col("vec_id") % query_mod == 0)
    queries_p = pref.where(F.col("vec_id") % query_mod == 0)
    exact = cosine_topk(base, k=k, queries=queries_e).select(
        "query_id", F.col("neighbor_id").alias("n_exact")
    )
    prefix = cosine_topk(pref, k=k, queries=queries_p).select(
        "query_id", F.col("neighbor_id").alias("n_apx")
    )
    return _recall_vs_exact(exact, prefix, k)


def product_quantize(
    df: DataFrame,
    m: int = 4,
    ks: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, code: array<int>, dvec: array<double>) — product quantization
    (Jégou et al. 2011, the PQ half of faiss IVF-PQ): the d-dim vector is
    split into ``m`` contiguous subvectors, each quantized to its nearest
    of ``ks`` per-subspace k-means centroids; the code is m small ints
    (m·log2(ks) bits vs 32·d — a 32× shrink at m=4, ks=16, d=64) and the
    reconstruction concatenates the assigned centroids.

    Determinism contract (what lets a DuckDB oracle replay it): each
    subspace runs the exact kmeans.py Lloyd trajectory (sampled init,
    9-dp distance argmin with small-cid ties, 6-dp centroid means), and
    reconstruction uses the centroid frame the FINAL assignment was scored
    against.

    Scale shape: m driver-side iterations of the kmeans kernel over sliced
    columns (slice is a projection, no shuffle); codebooks are ks×(d/m)
    — broadcast-sized at any corpus scale.  DuckDB twin:
    oracles_text.py::pq_recall_sql.
    """
    from graphina_spark.operators.kmeans import lloyd_states
    from graphina_spark.plans.materialize import local_materialize as _mat

    base = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    ).transform(_mat)
    first = base.select(F.size("vec").alias("d")).first()
    dim = first["d"] if first else 0
    if dim == 0 or dim % m != 0:
        raise ValueError(f"embedding dim {dim} not divisible by m={m}")
    sub = dim // m
    n = base.count()
    parts = []
    for j in range(m):
        sliced = base.select(
            "id", F.slice("vec", j * sub + 1, sub).alias("vec")
        )
        assign, cents = lloyd_states(sliced, ks, iters, n=n)
        parts.append(
            assign.join(F.broadcast(cents), "cid").select(
                "id",
                F.lit(j).alias("subspace"),
                F.col("cid").alias("c"),
                F.col("cvec").alias("sv"),
            )
        )
    allp = parts[0]
    for p in parts[1:]:
        allp = allp.unionByName(p)
    return (
        allp.groupBy("id")
        .agg(
            F.array_sort(F.collect_list(F.struct("subspace", "c", "sv"))).alias("t")
        )
        .select(
            "id",
            F.transform("t", lambda s: s["c"]).alias("code"),
            F.flatten(F.transform("t", lambda s: s["sv"])).alias("dvec"),
        )
    )


def rotation_matrix(dim: int, rounds: int = 2) -> list:
    """Deterministic orthonormal ``dim×dim`` rotation: a product of Givens
    rotations over a fixed pair schedule with golden-angle-sequence angles.

    This is the data-independent rotation of OPQ's random-rotation variant
    (Ge et al. 2013 §4 "OPQ_RR"; faiss ``OPQMatrix`` with random init, ITQ's
    starting point): decorrelating/mixing dimensions before PQ so no
    subspace carries disproportionate variance.  Pure-Python floats (no
    BLAS, no RNG stream) so the DuckDB oracle builder replays the exact
    same matrix by importing this function — the gate stays bit-exact.
    """
    R = [[1.0 if i == j else 0.0 for j in range(dim)] for i in range(dim)]
    t = 0
    for r in range(rounds):
        for i in range(dim - 1):
            j = (i + 1 + r) % dim
            if j == i:
                continue
            t += 1
            theta = 2.399963229728653 * t  # golden angle
            c, s = math.cos(theta), math.sin(theta)
            for k in range(dim):
                a, b = R[i][k], R[j][k]
                R[i][k] = c * a - s * b
                R[j][k] = s * a + c * b
    return R


def rotate_vectors(
    df: DataFrame,
    R: list,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, embedding) with ``embedding ← round(R·x, 6)`` — a literal
    broadcast matrix-vector product, shuffle-free projection (the rotation
    is dim² doubles regardless of corpus size).  The 6-dp rounding pins the
    rotated coordinates to the repo's cross-engine decimal grid before any
    downstream k-means trajectory consumes them."""
    rmat = F.array(*[F.array(*(F.lit(float(v)) for v in row)) for row in R])
    return df.select(
        F.col(id_col).cast("long").alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("x"),
    ).select(
        "vec_id",
        F.transform(
            rmat,
            lambda row: F.round(
                F.aggregate(
                    F.zip_with(row, F.col("x"), lambda r, xi: r * xi),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                ),
                6,
            ),
        ).alias("embedding"),
    )


def opq_recall(
    df: DataFrame,
    k: int = 5,
    m: int = 4,
    ks: int = 16,
    iters: int = 2,
    rounds: int = 2,
    query_mod: int = 25,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, hits, recall) — recall@k of top-k search over
    rotated-then-PQ-reconstructed vectors vs the full-precision exact top-k
    in the ORIGINAL space (rotation preserves inner products, so the two
    spaces rank identically at full precision; any recall loss is
    quantization error, which the rotation redistributes across subspaces).

    The OPQ acceptance readout: compare against :func:`pq_recall` at the
    same (m, ks) to measure what the rotation buys.  Full learned OPQ
    alternates SVD/Procrustes solves whose float trajectory is not
    cross-engine replayable; the deterministic rotation here is the
    standard data-independent variant with the same distributed shape
    (broadcast rotation + the identical PQ kernel).  DuckDB twin:
    oracles_text.py::opq_recall_sql."""
    base = df.select(
        F.col(id_col).cast("long").alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("embedding"),
    )
    first = base.select(F.size("embedding").alias("d")).first()
    dim = first["d"] if first else 0
    rot = rotate_vectors(base, rotation_matrix(dim, rounds))
    recon = product_quantize(
        rot, m=m, ks=ks, iters=iters, id_col="vec_id", vec_col="embedding"
    ).select(F.col("id").alias("vec_id"), F.col("dvec").alias("embedding"))
    queries_e = base.where(F.col("vec_id") % query_mod == 0)
    queries_q = recon.where(F.col("vec_id") % query_mod == 0)
    exact = cosine_topk(base, k=k, queries=queries_e).select(
        "query_id", F.col("neighbor_id").alias("n_exact")
    )
    quant = cosine_topk(recon, k=k, queries=queries_q).select(
        "query_id", F.col("neighbor_id").alias("n_apx")
    )
    return _recall_vs_exact(exact, quant, k)


def pq_recall(
    df: DataFrame,
    k: int = 5,
    m: int = 4,
    ks: int = 16,
    iters: int = 2,
    query_mod: int = 25,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, hits, recall) — recall@k of top-k search over
    PQ-reconstructed vectors vs the full-precision exact top-k; the
    acceptance readout that decides whether a PQ index ships (the faiss
    benchmark protocol).  Same sampled-query harness as
    :func:`quantization_recall`."""
    base = df.select(
        F.col(id_col).cast("long").alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("embedding"),
    )
    recon = product_quantize(
        base, m=m, ks=ks, iters=iters, id_col="vec_id", vec_col="embedding"
    ).select(F.col("id").alias("vec_id"), F.col("dvec").alias("embedding"))
    queries_e = base.where(F.col("vec_id") % query_mod == 0)
    queries_q = recon.where(F.col("vec_id") % query_mod == 0)
    exact = cosine_topk(base, k=k, queries=queries_e).select(
        "query_id", F.col("neighbor_id").alias("n_exact")
    )
    quant = cosine_topk(recon, k=k, queries=queries_q).select(
        "query_id", F.col("neighbor_id").alias("n_apx")
    )
    return _recall_vs_exact(exact, quant, k)
