"""Distributed Lloyd k-means over an embedding column — fixed-iteration,
cross-engine deterministic.

Training-data curation clusters embeddings constantly (topic balancing,
dedup cell discovery, SemDeDup-style pruning); this is the scale-shaped
kernel: per round ONE pass over the vectors (centroids are k×d ≪ data —
they live on the driver between rounds and broadcast into the assignment
join) plus one (cluster, dim)-keyed mean aggregation.  No Python in the
path — distances and means are column expressions over the exploded dims.

Determinism contract (what lets a DuckDB oracle replay the trajectory):
  - init: the vectors whose id is a multiple of ⌊n/k⌋ (the same sampled
    rule as operators/ann.py::_centroids — a pure function of the data)
  - assignment: squared-L2 rounded to 9 dp before the argmin, ties to the
    smaller cluster id
  - update: per-dimension mean rounded to 6 dp (absorbs cross-engine
    summation-order ulps); an emptied cluster keeps its previous centroid
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphina_spark.plans.argmax import argmin_any
from graphina_spark.plans.materialize import local_materialize as _mat

DIST_ROUND = 9
CENT_ROUND = 6


def _sq_dist(vec, cvec):
    """Σ (x−y)² via the dot-product identity (stays in one aggregate)."""
    return F.aggregate(
        F.zip_with(vec, cvec, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def kmeans(
    df: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cluster) — Lloyd assignments after exactly ``iters`` rounds."""
    if k < 1 or iters < 1:
        raise ValueError("need k >= 1 and iters >= 1")
    base = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    ).transform(_mat)
    assign, _cents = lloyd_states(base, k, iters)
    return assign.select("id", F.col("cid").alias("cluster"))


def lloyd_states(base: DataFrame, k: int, iters: int, n: int | None = None):
    """(assign, cents_used): the final-round assignments over a prepared
    (id, vec) frame AND the centroid frame those assignments were scored
    against — the codebook a quantizer reconstructs with (quantize.py PQ).
    Same trajectory contract as :func:`kmeans` (shared by its oracle)."""
    n = base.count() if n is None else n
    step = max(1, n // k)
    cents = (
        base.where((F.col("id") % step == 0) & (F.col("id") < step * k))
        .select(
            (F.col("id") / step).cast("int").alias("cid"),
            F.col("vec").alias("cvec"),
        )
        .transform(_mat)
    )
    assign = None
    cents_used = cents
    for _ in range(iters):
        cents_used = cents
        scored = base.crossJoin(F.broadcast(cents)).select(
            "id",
            "vec",
            "cid",
            F.round(_sq_dist(F.col("vec"), F.col("cvec")), DIST_ROUND).alias("d2"),
        )
        # argmin (d2 asc, cid asc) as a map-side-combining aggregate: the
        # window formulation shuffles the whole n×k scored frame every
        # round (plans/argmax.py); `vec` is constant per id and rides as
        # a carry field (the comparison never reaches it — (id, cid) is
        # unique per row)
        assign = (
            argmin_any(scored, "id", "d2", "cid", out_tie="cid",
                       carry=["vec"])
            .select("id", "vec", "cid")
            .transform(_mat)
        )
        means = (
            assign.select("cid", F.posexplode("vec").alias("pos", "x"))
            .groupBy("cid", "pos")
            .agg(F.round(F.avg("x"), CENT_ROUND).alias("m"))
            .groupBy("cid")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select(
                "cid", F.transform("pm", lambda s: s["m"]).alias("cvec_new")
            )
        )
        cents = (
            cents.join(means, "cid", "left")
            .select(
                "cid", F.coalesce("cvec_new", "cvec").alias("cvec")
            )
            .transform(_mat)
        )
    return assign, cents_used


def semdedup_pairs(
    df: DataFrame,
    k: int = 8,
    iters: int = 2,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(a, b, cluster, cosine) with a < b — SemDeDup (Abbas et al. 2023):
    embedding near-duplicate pairs found *within k-means cells only*.  The
    cells bound the quadratic: candidate pairs are Σ|cell|² instead of n²,
    and at 10^9+ vectors k scales with n to keep E|cell| fixed, so the
    per-cell self-join stays one bounded shuffle stage.  Complements the
    LSH candidate generator in ann.embedding_neardup_pairs (cells group by
    global geometry; hyperplane buckets by random projections)."""
    base = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    )
    cl = kmeans(df, k=k, iters=iters, id_col=id_col, vec_col=vec_col)
    withc = base.join(cl, "id")
    a = withc.select(
        F.col("id").alias("a"), F.col("vec").alias("avec"), "cluster"
    )
    b = withc.select(
        F.col("id").alias("b"), F.col("vec").alias("bvec"), "cluster"
    )
    from graphina_spark.operators.ann import _dot, _norm

    den = _norm(F.col("avec")) * _norm(F.col("bvec"))
    return (
        a.join(b, "cluster")
        .where(F.col("a") < F.col("b"))
        .select(
            "a",
            "b",
            "cluster",
            F.when(den > 0, _dot(F.col("avec"), F.col("bvec")) / den).alias(
                "cosine"
            ),
        )
        .where(F.col("cosine") >= F.lit(threshold))
    )


def centroid_silhouette(
    df: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(cluster, n, mean_silhouette) — simplified (centroid-based)
    silhouette per cluster over the :func:`kmeans` assignment.

    The simplified silhouette (Hruschka et al. 2004; what sklearn calls the
    "medoid shortcut" and large-scale evaluators actually compute) replaces
    the O(n²) pairwise distances of the classic coefficient with distances
    to centroids: a(i) = ‖x_i − c(own)‖, b(i) = min over other clusters
    ‖x_i − c‖, s(i) = (b − a)/max(a, b) (0 when both are 0).  Evaluation
    centroids are the per-dimension means of the FINAL assignment (same
    6-dp rounding as the Lloyd update, so the trajectory and the evaluation
    agree bit-for-bit with the DuckDB twin).

    Scale shape: one per-dim mean aggregation + one broadcast of k centroid
    rows + one map-side-combinable groupBy — evaluating 10¹² vectors costs
    one pass; nothing pairwise, nothing driver-side beyond k×dim doubles.
    DuckDB twin: oracles_text.py::silhouette_sql.
    """
    base = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    )
    assign = kmeans(df, k=k, iters=iters, id_col=id_col, vec_col=vec_col)
    av = assign.join(base, assign["id"] == base["id"]).select(
        assign["id"], F.col("cluster").alias("cid"), "vec"
    )
    ecents = (
        av.select("cid", F.posexplode("vec").alias("pos", "x"))
        .groupBy("cid", "pos")
        .agg(F.round(F.avg("x"), CENT_ROUND).alias("m"))
        .groupBy("cid")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
        .select(F.col("cid").alias("ecid"), F.transform("pm", lambda s: s["m"]).alias("cvec"))
    )
    d = av.crossJoin(F.broadcast(ecents)).select(
        "id",
        "cid",
        "ecid",
        F.round(F.sqrt(_sq_dist(F.col("vec"), F.col("cvec"))), DIST_ROUND).alias("d"),
    )
    ab = d.groupBy("id", "cid").agg(
        F.min(F.when(F.col("ecid") == F.col("cid"), F.col("d"))).alias("a"),
        F.min(F.when(F.col("ecid") != F.col("cid"), F.col("d"))).alias("b"),
    )
    s = ab.select(
        "cid",
        F.when(
            F.greatest("a", F.coalesce("b", F.lit(0.0))) > 0,
            (F.coalesce("b", F.lit(0.0)) - F.col("a"))
            / F.greatest("a", F.coalesce("b", F.lit(0.0))),
        )
        .otherwise(F.lit(0.0))
        .alias("s"),
    )
    return s.groupBy(F.col("cid").cast("int").alias("cluster")).agg(
        F.count("*").alias("n"), F.round(F.avg("s"), 6).alias("mean_silhouette")
    )
