"""Infomap (simplified flow-greedy variant) — weighted label propagation.

Reference: /root/reference/src/community/infomap.rs:33-106 — each node joins
the neighboring module with the largest incident *weight share* (flow), both
endpoints accumulate (edge src↔tgt contributes to both views), async +
seeded-shuffle order, stop on no change or max_iter; errors on empty graph /
max_iter=0.

Distributed variant (same policy as operators/lpa.py): **synchronous**
supersteps with a deterministic tie-break (max weight share, then smallest
module id) — the reference's async shuffle order is unreproducible across
partitions, and its own tests only pin the partition shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphina_spark.graph import LinkGraph
from graphina_spark.plans.argmax import argmax_any
from graphina_spark.plans.materialize import local_materialize as _mat


def infomap(
    g: LinkGraph,
    max_iter: int = 100,
    fixed_iters: int | None = None,
) -> DataFrame:
    """(id, module) — converged flow-greedy modules."""
    if g.vertices.isEmpty():
        raise ValueError("Infomap: empty graph")  # infomap.rs:44-46
    if fixed_iters is None and max_iter <= 0:
        raise ValueError("Infomap: max_iter=0")  # infomap.rs:47-49

    # both-endpoints accumulation regardless of directedness (infomap.rs:60-67)
    adj = (
        g.edges.select("src", "dst", "weight")
        .unionAll(
            g.edges.select(
                F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"
            )
        )
        .repartition("src")
        .cache()
    )
    labels = g.vertices.select("id", F.col("id").alias("module")).localCheckpoint(
        eager=True
    )
    n_rounds = fixed_iters if fixed_iters is not None else max_iter
    for _ in range(n_rounds):
        flows = (
            adj.join(labels.select(F.col("id").alias("dst"), "module"), "dst")
            .groupBy(F.col("src").alias("id"), "module")
            .agg(F.sum("weight").alias("flow"))
        )
        # argmax by (flow desc, module asc) as a map-side-combining
        # aggregate (plans/argmax.py struct strategy — float flows can't
        # ride the packed-long encoding): the Exchange carries only the
        # per-map-partition partial maxima, never the full flow frame
        best = argmax_any(
            flows, "id", "flow", "module", out_tie="new_module"
        )
        updated = (
            labels.join(best, "id", "left")
            .select(
                "id", F.coalesce("new_module", F.col("module")).alias("module")
            )
            .transform(_mat)
        )
        if fixed_iters is None:
            changed = (
                updated.alias("a")
                .join(labels.alias("b"), "id")
                .where(F.col("a.module") != F.col("b.module"))
                .count()
            )
        else:
            changed = -1
        labels = updated
        if changed == 0:
            break
    adj.unpersist()
    return labels
