"""Label spreading (Zhou et al., NIPS 2004) over the link graph.

Semi-supervised node classification: a handful of labeled vertices
(spam/ham verdicts, curated topic tags) propagate soft class scores to
the whole graph through the symmetrically normalized adjacency

    F_{k+1} = α · S · F_k + (1 − α) · Y,     S = D^{-1/2} A D^{-1/2}

with Y the one-hot seed matrix and F_0 = Y.  Unlike hard-label LPA
(operators/lpa.py) the scores are continuous and the seeds are only
SOFT-clamped (the (1−α)Y term), which is the variant with the
closed-form fixpoint (I − αS)^{-1}Y; unlike topic-PPR
(operators/topicrank.py) propagation is symmetric — undirected
diffusion, not directed random-walk mass.

Scale shape — the topicrank batching pattern: all classes advance on
ONE sparse (cls, id, f) frame, each superstep exactly one gather
shuffle (groupBy (cls, dst)) regardless of class count; support = the
k-hop neighbourhood of each class's seeds, zero rows never materialized
(every materialized score is a sum of strictly positive terms, so the
sparse support is engine-independent).  S's edge weights
1/sqrt(d_u · d_v) are computed once on the cached symmetrized simple
adjacency.  Per-superstep local_materialize (lineage/stats rule).

:func:`predict_labels` reads the final frame into hard labels with a
deterministic tie-break (max score, then min class id).

DuckDB twin: oracles.py::spreading_web_sql (dense unrolled SQL filtered
to f > 0, same weights, same clamp arithmetic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphina_spark.graph import LinkGraph
from graphina_spark.plans.materialize import local_materialize as _mat


def label_spreading(
    g: LinkGraph,
    seeds: DataFrame,
    alpha: float = 0.8,
    fixed_iters: int = 5,
) -> DataFrame:
    """(cls, id, f) sparse class scores after ``fixed_iters`` supersteps.

    ``seeds``: (id, cls) hard labels (one class per seed vertex)."""
    if not (0.0 < alpha < 1.0):
        raise ValueError("alpha must be in (0, 1)")
    if fixed_iters < 0:
        raise ValueError("fixed_iters must be >= 0")

    c = g.canonical_undirected_edges().select("src", "dst")
    sym = c.unionAll(c.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    deg = sym.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("deg"))
    sedges = (
        sym.join(deg.withColumnRenamed("id", "src"), "src")
        .join(
            deg.select(F.col("id").alias("dst"), F.col("deg").alias("degd")),
            "dst",
        )
        .select(
            "src",
            "dst",
            (F.lit(1.0) / F.sqrt(F.col("deg") * F.col("degd"))).alias("w"),
        )
        .repartition("src")
        .cache()
    )

    y = seeds.select("cls", "id", F.lit(1.0).alias("y")).distinct()
    state = y.select("cls", "id", F.col("y").alias("f")).transform(_mat)
    for _ in range(fixed_iters):
        gathered = (
            state.withColumnRenamed("id", "src")
            .join(sedges, "src")
            .groupBy("cls", F.col("dst").alias("id"))
            .agg(F.sum(F.col("f") * F.col("w")).alias("sf"))
        )
        state = (
            gathered.join(y, ["cls", "id"], "full_outer")
            .select(
                "cls",
                "id",
                (
                    F.lit(alpha) * F.coalesce("sf", F.lit(0.0))
                    + F.lit(1.0 - alpha) * F.coalesce("y", F.lit(0.0))
                ).alias("f"),
            )
            .where(F.col("f") > 0)
            .transform(_mat)
        )
    sedges.unpersist()
    return state


def predict_labels(scores: DataFrame) -> DataFrame:
    """(id, cls): argmax class per vertex from a (cls, id, f) score
    frame; ties break to the smallest class id (deterministic)."""
    # argmax (f desc, cls asc) as a map-side-combining aggregate
    # (plans/argmax.py struct strategy)
    from graphina_spark.plans.argmax import argmax_any

    return argmax_any(scores, "id", "f", "cls", out_tie="cls")
