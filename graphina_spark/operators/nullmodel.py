"""Degree-preserving null models — the configuration model as a
deterministic distributed construction.

Network-science workflows compare every structural metric (assortativity,
clustering, rich-club, modularity) against a degree-preserving random null
model (Newman 2003; Maslov-Sneppen).  The classic construction is stub
matching: cut every edge into two stubs, shuffle the 2m stubs, pair them
off.  A sequential Fisher-Yates shuffle does not distribute; instead the
stubs are ranked by the repo's portable per-(vertex, stub) hash — a fixed
pseudo-random permutation both engines replay bit-identically — and paired
by consecutive rank (rank 2i ↔ 2i+1).

Scale shape:

- stub explosion is ``sequence(0, deg-1)`` per vertex — output exactly 2m
  rows, map-side only;
- the global rank uses the two-pass range-partitioned prefix sum
  (plans/ordered.py::global_cumsum) — NO single-task global window;
- pairing is ONE groupBy on ``rank // 2`` (2m rows, two per group).

Self-loops and multi-edges occur with the usual O(<k²>/m) frequency — they
are retained (the standard configuration-model contract; callers who need a
simple graph filter/collapse downstream, which biases the degree sequence
and is therefore not done silently here).

Determinism means this is ONE draw from the configuration-model ensemble,
not an ensemble average — the right contract for a reproducible pipeline
(a seed parameter varies the draw).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphina_spark.graph import LinkGraph
from graphina_spark.operators.approximation import PRI_A1, PRI_A2, PRI_B
from graphina_spark.operators.distmetrics import ANF_P
from graphina_spark.plans.ordered import global_cumsum


def _stub_hash(id_col: F.Column, stub: F.Column, seed: int) -> F.Column:
    h1 = (id_col * F.lit(PRI_A1) + stub + F.lit(PRI_B + seed * PRI_A2)) % F.lit(ANF_P)
    h2 = (h1 * h1 + F.lit(PRI_A1)) % F.lit(ANF_P)
    h3 = (h2 * h2 + F.lit(PRI_A2)) % F.lit(ANF_P)
    return h3


def configuration_model(g: LinkGraph, seed: int = 0) -> DataFrame:
    """(src, dst, multiplicity) — one deterministic stub-matching draw of
    the configuration model over the degree sequence of the simple
    undirected projection.  Edges are canonical (src <= dst; self-loops
    allowed), with ``multiplicity`` counting parallel draws.

    The stub permutation is the portable hash over (vertex, stub index,
    seed) — distinct seeds give independent-looking draws; the identical
    construction runs in the DuckDB oracle.
    """
    canon = g.canonical_undirected_edges(dedup=True)
    cdeg = (
        canon.select(F.col("src").alias("id"))
        .unionAll(canon.select(F.col("dst").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("deg"))
    )
    stubs = cdeg.select(
        "id", F.explode(F.sequence(F.lit(0), F.col("deg") - 1)).alias("stub")
    ).select("id", "stub", _stub_hash(F.col("id"), F.col("stub"), seed).alias("h"))
    ranked = global_cumsum(
        stubs.withColumn("one", F.lit(1)),
        order_cols=["h", "id", "stub"],
        value_col="one",
        out_col="r",
    )
    paired = ranked.select(
        "id", (F.col("r") / 2).cast("long").alias("pair"), (F.col("r") % 2).alias("side")
    )
    edges = paired.groupBy("pair").agg(
        F.max(F.when(F.col("side") == 0, F.col("id"))).alias("a"),
        F.max(F.when(F.col("side") == 1, F.col("id"))).alias("b"),
    )
    return (
        edges.select(
            F.least("a", "b").alias("src"), F.greatest("a", "b").alias("dst")
        )
        .groupBy("src", "dst")
        .agg(F.count("*").alias("multiplicity"))
    )
