"""Approximate-nearest-neighbor search over an embedding column.

Two paths over ``(vec_id: long, embedding: array<float>)``:

- **Brute-force cosine top-k** (the exactness baseline): block-nested-loop
  self-join with the smaller side broadcast; dot products via
  ``zip_with``/``aggregate`` — JVM-side, whole-stage codegen, no Python.
  O(n²·d) — correct at any scale but only affordable for moderate n or as
  the per-bucket kernel below.

- **Hyperplane-LSH cosine** (the scale path): P deterministic random
  hyperplanes (entries ±1 derived from md5 bytes in the *driver*, embedded
  as literals so the DuckDB oracle sees the identical matrix); bucket =
  P-bit sign pattern; exact cosine + top-k within each bucket.  Recall is
  traded for a shuffle keyed by bucket instead of a cross join; multi-probe
  = union of runs with different ``seed``.

Cosine convention: dot/(‖a‖·‖b‖); pairs with a zero-norm side are dropped.
Ties in top-k break on neighbor id ascending (deterministic).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def hyperplanes(dim: int, planes: int, seed: int = 42) -> list[list[int]]:
    """Deterministic ±1 hyperplane matrix from md5 bytes (pure function of
    (dim, planes, seed) — reproducible anywhere, embeddable as SQL literals)."""
    mat = []
    for p in range(planes):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"{seed}:{p}:{d}".encode()).digest()[0]
            row.append(1 if h % 2 else -1)
        mat.append(row)
    return mat


def cosine_topk(
    df: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    queries: DataFrame | None = None,
) -> DataFrame:
    """(query_id, neighbor_id, cosine, rank): exact top-k cosine neighbors
    of every query vector (default: all vectors, self excluded)."""
    base = df.select(F.col(id_col).alias("nid"), F.col(vec_col).alias("nvec"))
    q = (queries or df).select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qvec"))
    pairs = q.crossJoin(F.broadcast(base)).where(F.col("qid") != F.col("nid"))
    den = _norm(F.col("qvec")) * _norm(F.col("nvec"))
    # ANSI-safe: zero-norm vectors yield NULL (dropped), not a divide error
    scored = pairs.select(
        "qid",
        "nid",
        F.when(den > 0, _dot(F.col("qvec"), F.col("nvec")) / den).alias("cosine"),
    ).where(F.col("cosine").isNotNull())
    # rank on round(cosine, 9): full-precision ordering could flip between
    # engines on last-bit fp differences; 9 dp is far below any real margin
    w = Window.partitionBy("qid").orderBy(
        F.desc(F.round("cosine", 9)), F.asc("nid")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("qid").alias("query_id"),
            F.col("nid").alias("neighbor_id"),
            "cosine",
            "rank",
        )
    )


def lsh_bucket(vec: Column, mat: list[list[int]]) -> Column:
    """P-bit sign-pattern bucket id for a vector under the hyperplane matrix."""
    bucket = F.lit(0).cast("long")
    for p, row in enumerate(mat):
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(x) for x in row]),
                lambda x, r: x.cast("double") * r,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(proj > 0, F.lit(2**p)).otherwise(F.lit(0))
    return bucket


def lsh_cosine_topk(
    df: DataFrame,
    k: int = 5,
    planes: int | None = None,
    tables: int = 2,
    seed: int = 42,
    max_bucket: int = 4096,
    target_bucket: int = 128,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, neighbor_id, cosine, rank): approximate top-k — exact
    cosine ranking over the LSH candidate set.

    Scale hardening (each knob bounds a 100-TB failure mode):

    - ``planes=None`` sizes the bucket count to the data:
      ``ceil(log2(n / target_bucket))`` so E[bucket] ≈ ``target_bucket``
      regardless of n — a fixed plane count degrades to O(n²/2^P) as n
      grows.
    - ``tables`` independent hyperplane sets (seeds ``seed+t``) form the
      standard OR-construction: a true neighbor pair is a candidate if it
      collides in ANY table, recovering the recall the per-table bucket
      split loses.  Candidates are deduped BEFORE scoring, so each pair
      pays the dot product once.
    - ``max_bucket`` hard-caps every bucket: rows ranked by id beyond the
      cap are dropped from that table's candidate generation (deterministic
      truncation; documented recall bias on degenerate/correlated
      embeddings, bounded O(max_bucket²) work per bucket — correlated
      inputs otherwise collapse into one quadratic bucket).
    """
    first = df.select(F.col(vec_col).alias("v")).first()
    if first is None:
        return df.sparkSession.createDataFrame(
            [], "query_id long, neighbor_id long, cosine double, rank int"
        )
    dim = len(first["v"])
    if planes is None:
        import math

        n = df.count()
        planes = max(2, math.ceil(math.log2(max(2.0, n / float(target_bucket)))))
    base = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    cand: DataFrame | None = None
    for t in range(tables):
        mat = hyperplanes(dim, planes, seed + t)
        b = base.select("id", lsh_bucket(F.col("vec"), mat).alias("bucket"))
        wb = Window.partitionBy("bucket").orderBy(F.asc("id"))
        capped = (
            b.withColumn("rn", F.row_number().over(wb))
            .where(F.col("rn") <= max_bucket)
            .select("id", "bucket")
        )
        p = (
            capped.alias("x")
            .join(capped.alias("y"), "bucket")
            .where(F.col("x.id") != F.col("y.id"))
            .select(F.col("x.id").alias("qid"), F.col("y.id").alias("nid"))
        )
        cand = p if cand is None else cand.unionAll(p)
    pairs = cand.distinct()
    qv = base.select(F.col("id").alias("qid"), F.col("vec").alias("qvec"))
    nv = base.select(F.col("id").alias("nid"), F.col("vec").alias("nvec"))
    den = _norm(F.col("qvec")) * _norm(F.col("nvec"))
    scored = (
        pairs.join(qv, "qid")
        .join(nv, "nid")
        .select(
            "qid",
            "nid",
            F.when(den > 0, _dot(F.col("qvec"), F.col("nvec")) / den).alias("cosine"),
        )
        .where(F.col("cosine").isNotNull())
    )
    w = Window.partitionBy("qid").orderBy(
        F.desc(F.round("cosine", 9)), F.asc("nid")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("qid").alias("query_id"),
            F.col("nid").alias("neighbor_id"),
            "cosine",
            "rank",
        )
    )


def embedding_neardup_pairs(
    df: DataFrame,
    threshold: float = 0.9,
    planes: int = 6,
    tables: int = 2,
    seed: int = 42,
    max_bucket: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(a, b, cosine) with a < b: embedding-space near-duplicate pairs —
    cosine ≥ ``threshold`` among hyperplane-LSH candidates (same
    multi-table OR-construction + per-bucket cap as lsh_cosine_topk, so
    the candidate generation is never O(n²)).  The canonical a < b form is
    the dedup-pair contract shared with dedup.py's MinHash/SimHash
    families; a training-data pipeline drops min-id-keeps like exact_dedup.
    Recall is the LSH recall (documented trade); the brute-force twin for
    recall measurement is cosine_topk."""
    first = df.select(F.col(vec_col).alias("v")).first()
    if first is None:
        return df.sparkSession.createDataFrame([], "a long, b long, cosine double")
    dim = len(first["v"])
    base = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    cand: DataFrame | None = None
    for t in range(tables):
        mat = hyperplanes(dim, planes, seed + t)
        b = base.select("id", lsh_bucket(F.col("vec"), mat).alias("bucket"))
        wb = Window.partitionBy("bucket").orderBy(F.asc("id"))
        capped = (
            b.withColumn("rn", F.row_number().over(wb))
            .where(F.col("rn") <= max_bucket)
            .select("id", "bucket")
        )
        p = (
            capped.alias("x")
            .join(capped.alias("y"), "bucket")
            .where(F.col("x.id") < F.col("y.id"))
            .select(F.col("x.id").alias("a"), F.col("y.id").alias("b"))
        )
        cand = p if cand is None else cand.unionAll(p)
    pairs = cand.distinct()
    av = base.select(F.col("id").alias("a"), F.col("vec").alias("avec"))
    bv = base.select(F.col("id").alias("b"), F.col("vec").alias("bvec"))
    den = _norm(F.col("avec")) * _norm(F.col("bvec"))
    return (
        pairs.join(av, "a")
        .join(bv, "b")
        .select(
            "a",
            "b",
            F.when(den > 0, _dot(F.col("avec"), F.col("bvec")) / den).alias("cosine"),
        )
        .where(F.col("cosine") >= F.lit(threshold))
    )


def _centroids(base: DataFrame, n_centroids: int) -> DataFrame:
    """(cid, cvec): deterministic sampled centroids — the vectors whose id
    is a multiple of ⌊n/c⌋ (cid = id/step), a pure filter with no global
    sort (a rank-based pick would funnel every row through one window
    task).  Sampled (not k-means) centroids keep the quantizer a pure
    function of the data, so the DuckDB oracle replays it exactly and no
    cross-engine float-averaging can perturb assignments; Lloyd refinement
    (ivf_cosine_topk(lloyd_iters>0)) is the Spark-only quality path.
    Sparse id spaces yield ≤ n_centroids centroids (fine — the probe logic
    only needs a non-empty centroid table)."""
    n = base.count()
    step = max(1, n // n_centroids)
    return base.where(
        (F.col("id") % step == 0) & (F.col("id") < step * n_centroids)
    ).select((F.col("id") / step).cast("int").alias("cid"), F.col("vec").alias("cvec"))


def _assign(base: DataFrame, cents: DataFrame) -> DataFrame:
    """(id, vec, cid): nearest centroid by cosine (ties → smaller cid).
    The centroid table is tiny → broadcast; the argmin is a window over
    id with deterministic (cosine desc, cid asc) order."""
    den = _norm(F.col("vec")) * _norm(F.col("cvec"))
    scored = (
        base.crossJoin(F.broadcast(cents))
        .select(
            "id",
            "vec",
            "cid",
            F.when(den > 0, _dot(F.col("vec"), F.col("cvec")) / den)
            .otherwise(F.lit(-2.0))
            .alias("csim"),
        )
    )
    w = Window.partitionBy("id").orderBy(F.desc(F.round("csim", 9)), F.asc("cid"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("id", "vec", "cid")
    )


def ivf_cosine_topk(
    df: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 2,
    lloyd_iters: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, neighbor_id, cosine, rank): IVF-flat approximate top-k.

    Coarse quantizer = deterministic sampled centroids (``_centroids``);
    each vector lands in its nearest centroid's inverted list; a query
    probes its ``n_probe`` nearest centroids and exact-reranks only those
    lists.  Expected candidate count ≈ n·n_probe/n_centroids per query —
    the IVF trade — with one broadcast join for assignment and one shuffle
    keyed by (probed) centroid for candidate generation.

    ``lloyd_iters > 0`` refines centroids with k-means steps (per-dimension
    mean via posexplode + re-assignment) — better lists, but the centroid
    averages are float-order-dependent, so the oracle-gated configuration
    is ``lloyd_iters=0``.
    """
    first = df.select(F.col(vec_col).alias("v")).first()
    if first is None:
        return df.sparkSession.createDataFrame(
            [], "query_id long, neighbor_id long, cosine double, rank int"
        )
    base = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    cents = _centroids(base, n_centroids)
    for _ in range(lloyd_iters):
        assigned = _assign(base, cents)
        cents = (
            assigned.select("cid", F.posexplode("vec").alias("pos", "val"))
            .groupBy("cid", "pos")
            .agg(F.avg("val").alias("mv"))
            .groupBy("cid")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("pos", "mv"))
                ).alias("pm")
            )
            .select(
                "cid",
                F.transform(F.col("pm"), lambda s: s["mv"].cast("float")).alias(
                    "cvec"
                ),
            )
        )
    assigned = _assign(base, cents)

    # probe lists: top n_probe centroids per query, deterministic order
    den = _norm(F.col("vec")) * _norm(F.col("cvec"))
    qprobe = (
        base.crossJoin(F.broadcast(cents))
        .select(
            F.col("id").alias("qid"),
            "cid",
            F.when(den > 0, _dot(F.col("vec"), F.col("cvec")) / den)
            .otherwise(F.lit(-2.0))
            .alias("csim"),
        )
    )
    wp = Window.partitionBy("qid").orderBy(F.desc(F.round("csim", 9)), F.asc("cid"))
    probes = (
        qprobe.withColumn("rn", F.row_number().over(wp))
        .where(F.col("rn") <= n_probe)
        .select("qid", "cid")
    )
    qv = base.select(F.col("id").alias("qid"), F.col("vec").alias("qvec"))
    cand = (
        probes.join(
            assigned.select(F.col("id").alias("nid"), F.col("vec").alias("nvec"), "cid"),
            "cid",
        )
        .where(F.col("qid") != F.col("nid"))
        .join(qv, "qid")
    )
    den2 = _norm(F.col("qvec")) * _norm(F.col("nvec"))
    scored = cand.select(
        "qid",
        "nid",
        F.when(den2 > 0, _dot(F.col("qvec"), F.col("nvec")) / den2).alias("cosine"),
    ).where(F.col("cosine").isNotNull())
    w = Window.partitionBy("qid").orderBy(F.desc(F.round("cosine", 9)), F.asc("nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("qid").alias("query_id"),
            F.col("nid").alias("neighbor_id"),
            "cosine",
            "rank",
        )
    )


def lsh_recall(
    df: DataFrame,
    k: int = 5,
    planes: int = 6,
    tables: int = 2,
    max_bucket: int = 32,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_mod: int | None = None,
) -> DataFrame:
    """(query_id, hits, recall) — per-query recall@k of the hardened LSH
    path against exact brute-force cosine top-k: the readout that decides
    whether a (planes, tables, max_bucket) configuration is shippable
    before pointing it at 10^11 vectors (the same evaluation contract as
    quantize.quantization_recall).

    Scale note: exact top-k is O(q·n·d) in the query count — pass
    ``query_mod`` to evaluate on the deterministic ``id % query_mod == 0``
    sample (the quantization_recall convention); the LSH side is the
    at-scale path and is merely filtered to the sampled queries.
    DuckDB twin: oracles_text.py::lsh_recall_sql."""
    queries = None
    if query_mod is not None:
        queries = df.where(F.col(id_col) % query_mod == 0)
    exact = cosine_topk(
        df, k=k, id_col=id_col, vec_col=vec_col, queries=queries
    ).select("query_id", F.col("neighbor_id").alias("n_exact"))
    approx = lsh_cosine_topk(
        df,
        k=k,
        planes=planes,
        tables=tables,
        max_bucket=max_bucket,
        id_col=id_col,
        vec_col=vec_col,
    ).select("query_id", F.col("neighbor_id").alias("n_lsh"))
    if query_mod is not None:
        approx = approx.where(F.col("query_id") % query_mod == 0)
    hits = (
        exact.join(
            approx,
            (exact["query_id"] == approx["query_id"])
            & (exact["n_exact"] == approx["n_lsh"]),
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


def ivfpq_topk(
    df: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 2,
    m: int = 4,
    ks: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, neighbor_id, cosine, rank): IVF-PQ approximate top-k —
    the full faiss-style serving index (Jégou et al. 2011).

    IVF coarse quantizer (deterministic sampled centroids, as
    :func:`ivf_cosine_topk` with ``lloyd_iters=0``) bounds candidates to
    the query's ``n_probe`` inverted lists; scoring is ASYMMETRIC
    (ADC): the full-precision query against the neighbor's PQ
    reconstruction (quantize.py::product_quantize), so the index stores
    only m·log2(ks) bits per vector.

    Scale shape: candidate generation ≈ n·n_probe/n_centroids rows per
    query (one shuffle keyed by probed centroid); PQ codebooks are
    ks×(d/m) broadcasts; reconstruction joins on the candidate side only.
    Recall composes with pq_recall/lsh_recall for acceptance.  DuckDB
    twin: oracles_text.py::ivfpq_topk_sql.
    """
    from graphina_spark.operators.quantize import product_quantize

    base = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    )
    cents = _centroids(base, n_centroids)
    assigned = _assign(base, cents).select("id", "cid")
    recon = product_quantize(
        base, m=m, ks=ks, iters=iters, id_col="id", vec_col="vec"
    ).select(F.col("id").alias("nid"), F.col("dvec").alias("nvec"))

    den = _norm(F.col("vec")) * _norm(F.col("cvec"))
    qprobe = base.crossJoin(F.broadcast(cents)).select(
        F.col("id").alias("qid"),
        "cid",
        F.when(den > 0, _dot(F.col("vec"), F.col("cvec")) / den)
        .otherwise(F.lit(-2.0))
        .alias("csim"),
    )
    wp = Window.partitionBy("qid").orderBy(F.desc(F.round("csim", 9)), F.asc("cid"))
    probes = (
        qprobe.withColumn("rn", F.row_number().over(wp))
        .where(F.col("rn") <= n_probe)
        .select("qid", "cid")
    )
    qv = base.select(F.col("id").alias("qid"), F.col("vec").alias("qvec"))
    cand = (
        probes.join(
            assigned.select(F.col("id").alias("nid"), "cid"), "cid"
        )
        .where(F.col("qid") != F.col("nid"))
        .join(recon, "nid")
        .join(qv, "qid")
    )
    den2 = _norm(F.col("qvec")) * _norm(F.col("nvec"))
    scored = cand.select(
        "qid",
        "nid",
        F.when(den2 > 0, _dot(F.col("qvec"), F.col("nvec")) / den2).alias("cosine"),
    ).where(F.col("cosine").isNotNull())
    w = Window.partitionBy("qid").orderBy(F.desc(F.round("cosine", 9)), F.asc("nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("qid").alias("query_id"),
            F.col("nid").alias("neighbor_id"),
            "cosine",
            "rank",
        )
    )
