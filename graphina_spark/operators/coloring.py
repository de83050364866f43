"""Distributed greedy graph coloring (Jones–Plassmann).

The reference ships greedy independent-set/clique heuristics
(/root/reference/src/approximation/*.rs) but no coloring; coloring is the
canonical *scheduling* primitive a link-graph pipeline needs at scale —
conflict-free update waves (two adjacent pages never recomputed in the same
wave), register allocation for co-hosted crawls, channel assignment.

Jones & Plassmann (1993): give every vertex one static, unique random
priority.  Each synchronous round, every still-uncolored vertex that holds
the *minimum* priority among its uncolored neighbors colors itself with the
smallest color absent from its already-colored neighborhood (greedy "mex").
Round winners form an independent set (two adjacent vertices cannot both be
strict minima over each other), so the coloring is proper by construction;
expected rounds are O(log n / log log n) on bounded-degree graphs and the
color count matches sequential greedy's Δ+1 bound.

Execution shape per round: one join of the active adjacency against active
priorities + a ``groupBy(src).min(pri)`` (winner election — identical shape
to Luby MIS in approximation.py), one join of winners against *colored*
neighbors + ``collect_set(color)`` (bounded by the winner's degree), and the
mex as a whole-stage-codegen ``aggregate`` over the sorted used-color array.
Both state frames are eagerly materialized per round
(plans/materialize.py::local_materialize) like every fixpoint kernel here.

Determinism: priorities come from the portable hash family
(approximation.py::_priority, round pinned to 0 — STATIC priorities are
what bounds JP's round count), all tie-breaks are impossible (priorities
unique), and the synchronous schedule makes the color assignment a pure
function of the graph.  The fixpoint tail is optionally finished on the
driver below ``local_finish`` active vertices with a bit-identical Python
replay of the same rule (the approximation.py pattern).

DuckDB twin: oracles.py::coloring_web_sql (unrolled MATERIALIZED rounds,
mex as a generate_series anti-join — integer outputs, zero float risk).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphina_spark.graph import LinkGraph
from graphina_spark.operators.approximation import (
    LOCAL_FINISH_VERTICES,
    _priority,
    _undirected_adj,
    _vertex_pri,
)
from graphina_spark.plans.materialize import local_materialize as _mat


def _simulate_coloring(
    active: set, nbrs: dict, used: dict
) -> dict:
    """Driver-local replay of the synchronous JP rounds: ``nbrs`` maps each
    active vertex to its *active* neighbors, ``used`` to the color set of
    its already-colored neighbors.  Mutates its arguments; returns
    {id: color} for every vertex in ``active``."""
    out: dict = {}
    while active:
        pri = {v: _vertex_pri(v, 0) for v in active}
        winners = [
            v
            for v in active
            if all(pri[v] < pri[u] for u in nbrs.get(v, ()) if u in active)
        ]
        for w in winners:
            have = used.get(w, set())
            c = 0
            while c in have:
                c += 1
            out[w] = c
        # synchronous: colors land AFTER the full winner set is decided
        for w in winners:
            for u in nbrs.get(w, ()):
                if u in active and u not in out:
                    used.setdefault(u, set()).add(out[w])
            active.discard(w)
            nbrs.pop(w, None)
    return out


def greedy_coloring(
    g: LinkGraph,
    rounds: int | None = None,
    local_finish: int = LOCAL_FINISH_VERTICES,
) -> DataFrame:
    """(id, color) — a proper coloring of the simple undirected structure
    with at most Δ+1 colors.  ``rounds=None`` runs the fixpoint (every
    vertex colored); a fixed ``rounds`` executes exactly that many
    synchronous rounds and returns only the vertices colored so far (oracle
    mode — the unrolled SQL twin runs the identical rounds)."""
    adj = _undirected_adj(g).cache()
    spark = g.vertices.sparkSession
    active = (
        g.vertices.select("id", _priority(F.col("id"), 0).alias("pri"))
        .transform(_mat)
    )
    colors = spark.createDataFrame([], "id long, color long")
    r = 0
    while rounds is None or r < rounds:
        if rounds is None:
            n_active = active.count()
            if n_active == 0:
                break
            if n_active <= local_finish:
                act = {row["id"] for row in active.collect()}
                nbrs: dict = {}
                for row in (
                    adj.join(active.select(F.col("id").alias("src")), "src")
                    .join(active.select(F.col("id").alias("dst")), "dst")
                    .collect()
                ):
                    nbrs.setdefault(row["src"], set()).add(row["dst"])
                used: dict = {}
                for row in (
                    adj.join(active.select(F.col("id").alias("src")), "src")
                    .join(colors.withColumnRenamed("id", "dst"), "dst")
                    .select("src", "color")
                    .collect()
                ):
                    used.setdefault(row["src"], set()).add(row["color"])
                local = _simulate_coloring(act, nbrs, used)
                if local:
                    colors = colors.unionAll(
                        spark.createDataFrame(
                            [(v, int(c)) for v, c in local.items()],
                            "id long, color long",
                        )
                    )
                break
        nbr_min = (
            adj.join(
                active.select(F.col("id").alias("dst"), "pri"), "dst"
            )
            .join(active.select(F.col("id").alias("src")), "src")
            .groupBy(F.col("src").alias("id"))
            .agg(F.min("pri").alias("nmin"))
        )
        winners = (
            active.join(nbr_min, "id", "left")
            .where(F.col("nmin").isNull() | (F.col("pri") < F.col("nmin")))
            .select("id")
        )
        used_df = (
            adj.join(winners.withColumnRenamed("id", "src"), "src")
            .join(colors.withColumnRenamed("id", "dst"), "dst")
            .groupBy(F.col("src").alias("id"))
            .agg(F.collect_set("color").alias("used"))
        )
        # mex: longest matched prefix of the ascending distinct used colors
        mex = F.aggregate(
            F.array_sort(F.coalesce(F.col("used"), F.array().cast("array<long>"))),
            F.lit(0).cast("long"),
            lambda acc, x: F.when(x == acc, acc + 1).otherwise(acc),
        )
        newc = (
            winners.join(used_df, "id", "left")
            .select("id", mex.alias("color"))
        )
        colors = colors.unionAll(newc).transform(_mat)
        active = active.join(winners, "id", "left_anti").transform(_mat)
        r += 1
    adj.unpersist()
    return colors
