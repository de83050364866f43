"""Louvain community detection — synchronous local moving + graph coarsening.

Reference: /root/reference/src/community/louvain.rs:33-229 — multi-level:
(1) local moving (seeded-shuffled node order, strict-gain move to the best
neighboring community, candidates scanned sorted by community id) until no
move improves modularity; (2) aggregate communities into a super-graph
(intra-community weight becomes a self-loop, louvain.rs:205-229); repeat up
to 100 levels (:97-112); self-loops count 2 toward weighted degree (:79-83).

Distributed reformulation (same policy as LPA/infomap): the sequential
shuffled-order *asynchronous* sweep is unreproducible across partitions, so
local moving is **synchronous** with two standard distributed-Louvain
safeguards:

- the move criterion is the full relocation gain — insertion gain into the
  best candidate MINUS the gain of staying,
      ΔQ(v→c) ∝ [w(v,c) − deg_w(v)·Σtot(c\\v)/(2m)]
              − [w(v,cur) − deg_w(v)·Σtot(cur\\v)/(2m)]
  (without the stay term every vertex "improves" forever and labels chase
  each other in chains);
- only one parity class (hash(id) % 2 == round % 2) may move per round,
  which breaks symmetric A↔B swap oscillation; convergence = a full
  even+odd sweep with zero moves.

Ties break to the smallest community id.  Correctness is pinned the same way
the reference pins its own Louvain — **modularity quality**, not label
equality (tests/oracle_community_tests.rs:150) — asserted in tests via
operators.metrics.modularity.

Coarsening keeps a vertex→community mapping per level and rebuilds the
weighted super-graph with one groupBy; levels stop when modularity gain
< ``min_gain``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphina_spark.graph import LinkGraph
from graphina_spark.plans.argmax import argmax_any
from graphina_spark.plans.materialize import local_materialize as _mat


def _local_moving(
    g: LinkGraph, max_rounds: int, m2: float
) -> DataFrame:
    """One level of synchronous local moving → (id, community)."""
    # localCheckpoint (not just cache): a cached-but-deep logical plan still
    # feeds Catalyst's size-only stats, whose per-join child-size *product*
    # doubles in bit-length per nesting level and can OOM the driver on
    # Long.MaxValue-stat leaves; a checkpointed leaf is flat
    sym = g.symmetric_edges().repartition("src").transform(_mat)
    degw = sym.groupBy(F.col("src").alias("id")).agg(F.sum("weight").alias("dw"))
    com = g.vertices.select("id", F.col("id").alias("community")).localCheckpoint(
        eager=True
    )
    zero_sweeps = 0
    for rnd in range(max_rounds):
        labeled = com.select(F.col("id").alias("dst"), F.col("community").alias("cd"))
        # w(v, c): total weight from v to each neighboring community
        # (self-loops excluded from the move gain, standard Louvain)
        wvc = (
            sym.where(F.col("src") != F.col("dst"))
            .join(labeled, "dst")
            .groupBy(F.col("src").alias("id"), F.col("cd").alias("community"))
            .agg(F.sum("weight").alias("w_vc"))
        )
        sigma = (
            com.join(degw, "id")
            .groupBy("community")
            .agg(F.sum("dw").alias("tot"))
        )
        cand = (
            wvc.join(sigma, "community")
            .join(com.select("id", F.col("community").alias("cur")), "id")
            .join(degw, "id")
            .select(
                "id",
                "community",
                "cur",
                (
                    F.col("w_vc")
                    - F.col("dw")
                    * (
                        F.col("tot")
                        - F.when(F.col("community") == F.col("cur"), F.col("dw")).otherwise(
                            0.0
                        )
                    )
                    / F.lit(m2)
                ).alias("gain"),
            )
        )
        # true relocation stay term for EVERY vertex: w(v,cur) − dw·Σtot(cur\v)/m2,
        # with w(v,cur)=0 when v has no neighbor in its current community —
        # coalescing a missing candidate row to 0.0 would overestimate the
        # stay gain (the true term is negative there) and suppress moves
        stay = (
            com.select("id", F.col("community").alias("cur"))
            .join(degw, "id")
            .join(
                sigma.select(
                    F.col("community").alias("cur"), F.col("tot").alias("cur_tot")
                ),
                "cur",
            )
            .join(
                wvc.select(
                    "id", F.col("community").alias("cur"), F.col("w_vc").alias("w_cur")
                ),
                ["id", "cur"],
                "left",
            )
            .select(
                "id",
                (
                    F.coalesce("w_cur", F.lit(0.0))
                    - F.col("dw") * (F.col("cur_tot") - F.col("dw")) / F.lit(m2)
                ).alias("stay_gain"),
            )
        )
        # argmax by (gain desc, community asc) as a map-side-combining
        # aggregate (plans/argmax.py struct strategy — float gains can't
        # ride the packed-long encoding): the Exchange carries only the
        # per-map-partition partial maxima, never the full candidate
        # frame.  `cur` is constant per id and rides as a carry column.
        best = (
            argmax_any(
                cand, "id", "gain", "community",
                out_score="gain", out_tie="community", carry=["cur"],
            )
            .join(stay, "id")
            .select(
                "id",
                # parity class via a per-round-seeded hash, not id % 2: two
                # mutually-mergeable communities whose ids share raw parity
                # would otherwise NEVER be split into different classes and
                # oscillate A↔B forever; reseeding every 2 rounds guarantees
                # some sweep separates any stuck pair (deterministic — xxhash64
                # of a value is partitioning-independent)
                F.when(
                    (F.pmod(F.xxhash64(F.col("id"), F.lit(rnd // 2)), F.lit(2)) == rnd % 2)
                    & (F.col("gain") > F.col("stay_gain") + F.lit(1e-12)),
                    F.col("community"),
                )
                .otherwise(F.col("cur"))
                .alias("new_community"),
                "cur",
            )
        )
        best = best.transform(_mat)
        moved = best.where(F.col("new_community") != F.col("cur")).count()
        new_com = (
            com.join(best.select("id", "new_community"), "id", "left")
            .select(
                "id", F.coalesce("new_community", "community").alias("community")
            )
            .transform(_mat)
        )
        com.unpersist()
        best.unpersist()
        com = new_com
        zero_sweeps = zero_sweeps + 1 if moved == 0 else 0
        if zero_sweeps >= 2:  # a full even+odd sweep without movement
            break
    sym.unpersist()
    return com


def louvain(
    g: LinkGraph,
    max_levels: int = 10,
    max_rounds: int = 20,
    min_gain: float = 1e-7,
) -> DataFrame:
    """(id, community) on the ORIGINAL vertex ids; community = min original
    member id (canonical relabel, comparable as partitions)."""
    from graphina_spark.operators.metrics import modularity

    m2 = g.symmetric_edges().agg(F.sum("weight")).first()[0] or 0.0
    if m2 == 0:
        return g.vertices.select("id", F.col("id").alias("community"))

    mapping = g.vertices.select("id", F.col("id").alias("node"))  # orig → level vertex
    level_g = g
    prev_q = None
    for _ in range(max_levels):
        com = _local_moving(level_g, max_rounds, m2)
        full = (
            mapping.join(com.select(F.col("id").alias("node"), "community"), "node")
            .select("id", "community")
            .transform(_mat)
        )
        q = modularity(g, full)
        if prev_q is not None and q - prev_q < min_gain:
            break
        prev_q = q
        mapping = full.select("id", F.col("community").alias("node")).localCheckpoint(
            eager=True
        )
        # coarsen: communities become vertices; weights aggregate
        cl = com.select(F.col("id").alias("src"), F.col("community").alias("cs"))
        cr = com.select(F.col("id").alias("dst"), F.col("community").alias("cd"))
        agg_edges = (
            level_g.edges.join(cl, "src")
            .join(cr, "dst")
            .groupBy(F.col("cs").alias("src"), F.col("cd").alias("dst"))
            .agg(F.sum("weight").alias("weight"))
            .transform(_mat)
        )
        agg_vertices = com.select(F.col("community").alias("id")).distinct()
        n_before = level_g.num_vertices()
        level_g = LinkGraph(
            vertices=agg_vertices.transform(_mat),
            edges=agg_edges,
            directed=level_g.directed,
        )
        if level_g.num_vertices() == n_before:
            break

    # canonical relabel: community id → min original member id
    canon = mapping.groupBy("node").agg(F.min("id").alias("canon"))
    return (
        mapping.join(canon, "node")
        .select("id", F.col("canon").alias("community"))
    )
