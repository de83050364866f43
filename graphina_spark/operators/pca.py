"""Top principal component by distributed power iteration.

The one-component PCA every embedding pipeline actually runs at scale
(ABTT/"all-but-the-top" post-processing, drift monitoring, whitening the
dominant direction before ANN): find the leading eigenvector of the Gram
matrix X'X by power iteration

    v ← normalize( Σ_i  x_i · (x_i · v) ),

which never materializes the d×d covariance — each round is ONE pass over
the vectors:  per row a scalar projection (x_i·v, v broadcast), then a
per-dimension weighted sum (posexplode + groupBy(pos), map-side combined →
the shuffle moves d doubles per partition).  d rounds of driver state =
d doubles.  Mean-centering is deliberately omitted (Gram, not covariance —
the ABTT convention for embedding post-processing; center upstream if you
want covariance PCA).

Cross-engine determinism: v starts at the unit vector e_0 and is ROUNDED to
9 dp after every normalization (the same stabilize-the-trajectory trick the
kmeans twin uses for centroids), so the DuckDB twin replays the identical
trajectory; the final readout rounds to 6 dp.  Sign convention: the
component is flipped so its first nonzero coordinate is positive.

DuckDB twin: oracles_text.py::pca_emb_sql (unrolled rounds, list algebra).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

V_ROUND = 9


def top_component(
    df: DataFrame,
    iters: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(pos, v, eigenvalue) — the leading Gram eigenvector after exactly
    ``iters`` power rounds (one row per dimension, 0-based ``pos``), with
    the Rayleigh-quotient eigenvalue estimate Σ(x·v)²/Σ‖... repeated on
    every row for a flat schema."""
    if iters < 1:
        raise ValueError("iters must be positive")
    base = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(vec_col).cast("array<double>").alias("x"),
    )
    from graphina_spark.plans.materialize import local_materialize as _mat

    base = base.transform(_mat)
    dim = base.select(F.size("x").alias("d")).first()["d"]
    v = [1.0] + [0.0] * (dim - 1)
    spark = df.sparkSession
    for _ in range(iters):
        vlit = F.array(*[F.lit(float(c)) for c in v])
        proj = base.select(
            "x",
            F.aggregate(
                F.zip_with("x", vlit, lambda a, b: a * b),
                F.lit(0.0),
                lambda acc, t: acc + t,
            ).alias("p"),
        )
        sums = (
            proj.select(F.posexplode("x").alias("pos", "xi"), "p")
            .groupBy("pos")
            .agg(F.sum(F.col("xi") * F.col("p")).alias("s"))
            .collect()
        )
        w = [0.0] * dim
        for r in sums:
            w[r["pos"]] = r["s"]
        norm = sum(c * c for c in w) ** 0.5
        if norm == 0.0:
            break
        v = [round(c / norm, V_ROUND) for c in w]
    # deterministic sign: first nonzero coordinate positive
    for c in v:
        if c != 0.0:
            if c < 0:
                v = [-c2 for c2 in v]
            break
    vlit = F.array(*[F.lit(float(c)) for c in v])
    ray = base.select(
        F.aggregate(
            F.zip_with("x", vlit, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, t: acc + t,
        ).alias("p")
    ).agg(F.sum(F.col("p") * F.col("p")).alias("num"), F.count("*").alias("n"))
    row = ray.first()
    lam = round(row["num"] / row["n"], 6)
    return spark.createDataFrame(
        [(i, round(float(c), 6), lam) for i, c in enumerate(v)],
        "pos int, v double, eigenvalue double",
    )
