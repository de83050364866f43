"""Strongly connected components — distributed coloring (FB-Trim family).

Reference: /root/reference/src/community/connected_components.rs:130-139
(Tarjan via petgraph) with the oracle corpus at
tests/oracle_directed_tests.rs:104-233.  Tarjan's single DFS stack is
inherently sequential; the distributed reformulation is the standard
coloring algorithm (Orzan; also the FB-Trim family, Hong et al.):

repeat until no active vertices:
  1. **Trim**: a vertex with zero in-degree or zero out-degree within the
     active subgraph is a singleton SCC — peel iteratively (this alone
     removes most of a web crawl's bow-tie periphery).
  2. **Forward color**: propagate ``color(v) = max(color(v), colors of
     in-neighbors)`` to fixpoint — color(v) = the max-id active vertex that
     reaches v within the active subgraph.
  3. **Backward gather**: max-propagation along REVERSED edges restricted
     to same-color pairs (the same pointer-jumped kernel as step 2): the
     propagated value at v is the max id v forward-reaches within its color
     region, which equals the region root r exactly when v reaches r — so
     members are ``backward(v) == color(v)``.  All regions resolve in the
     same supersteps, and pointer jumping makes this O(log diameter) rounds
     (a frontier BFS here walks one edge per superstep — a ring-shaped SCC
     of size d would cost d rounds).
  4. Remove the identified SCCs from the active set.

Each outer round removes ≥1 SCC per color region; web-scale graphs finish
in a handful of outer rounds (the giant SCC falls in round 1).  All steps
are joins + min/max aggregations with per-superstep materialization
(O(1) plan depth), exactly the CC kernel's shape.

Labels are canonicalized to the minimum member id, like connected
components (the reference compares sorted partitions,
connected_components.rs:219-230, so min-member relabel is comparison-safe).

On an undirected graph every component is strongly connected, so the result
defers to ``connected_components`` (matching the reference's documented
behavior of ``strongly_connected_components`` on undirected graphs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphina_spark.graph import LinkGraph
from graphina_spark.plans.materialize import local_materialize as _mat


def _fixpoint_color(
    edges: DataFrame, vertices: DataFrame, max_iter: int
) -> DataFrame:
    """(id, color): color = max active vertex id that reaches ``id`` along
    ``edges`` (forward max-propagation with pointer-jump compression)."""
    color = vertices.select("id", F.col("id").alias("color")).transform(_mat)
    for _ in range(max_iter):
        nbr_max = (
            color.alias("c")
            .join(edges.alias("e"), F.col("c.id") == F.col("e.src"))
            .groupBy(F.col("e.dst").alias("id"))
            .agg(F.max("c.color").alias("nbr"))
        )
        new = color.join(nbr_max, "id", "left").select(
            "id", F.greatest("color", F.coalesce("nbr", "color")).alias("color")
        )
        # pointer jump: adopt my color's current color when larger — colors
        # only ever increase toward the region root, so this is safe and
        # collapses long chains in O(log d) rounds
        new = (
            new.alias("a")
            .join(
                new.select(
                    F.col("id").alias("color"), F.col("color").alias("cc")
                ).alias("b"),
                "color",
                "left",
            )
            .select(
                F.col("a.id").alias("id"),
                F.greatest(F.col("a.color"), F.coalesce("cc", "a.color")).alias(
                    "color"
                ),
            )
            .transform(_mat)
        )
        changed = (
            new.alias("n")
            .join(color.alias("o"), "id")
            .where(F.col("n.color") != F.col("o.color"))
            .count()
        )
        color = new
        if changed == 0:
            break
    return color


def strongly_connected_components(
    g: LinkGraph, max_outer: int = 50, max_iter: int = 200
) -> DataFrame:
    """(id: long, component: long) — component = min vertex id in the SCC."""
    if not g.directed:
        from graphina_spark.operators.components import connected_components

        return connected_components(g)

    edges_all = g.edges.select("src", "dst").distinct().repartition("src").cache()
    active = g.vertices.select("id").transform(_mat)
    # accumulated (id, grp) assignments; grp is any per-SCC key (the color
    # root or the vertex itself for trimmed singletons)
    done: DataFrame | None = None
    spark = g.vertices.sparkSession

    def _accumulate(done, new):
        out = new if done is None else done.unionAll(new)
        return out.transform(_mat)

    for _ in range(max_outer):
        if active.isEmpty():
            break
        # edges within the active subgraph
        eact = (
            edges_all.join(active.withColumnRenamed("id", "src"), "src", "left_semi")
            .join(active.withColumnRenamed("id", "dst"), "dst", "left_semi")
            .select("src", "dst")
            .where(F.col("src") != F.col("dst"))
            .transform(_mat)
        )
        # ---- trim to fixpoint: zero in- or out-degree ⇒ singleton SCC
        trimmed_any = False
        while True:
            srcs = eact.select("src").distinct()
            dsts = eact.select(F.col("dst").alias("src")).distinct()
            has_out = srcs
            has_in = dsts
            keep = (
                active.join(has_out.withColumnRenamed("src", "id"), "id", "left_semi")
                .join(has_in.withColumnRenamed("src", "id"), "id", "left_semi")
                .transform(_mat)
            )
            n_keep = keep.count()
            n_active = active.count()
            if n_keep == n_active:
                break
            trivial = active.join(keep, "id", "left_anti").select(
                "id", F.col("id").alias("grp")
            )
            done = _accumulate(done, trivial)
            active = keep
            trimmed_any = True
            eact = (
                eact.join(active.withColumnRenamed("id", "src"), "src", "left_semi")
                .join(active.withColumnRenamed("id", "dst"), "dst", "left_semi")
                .transform(_mat)
            )
        if active.isEmpty():
            break
        # ---- forward color to fixpoint
        color = _fixpoint_color(eact, active, max_iter)
        # ---- backward gather: max-propagation on reversed same-color edges
        # (pointer-jumped, so a deep SCC resolves in O(log d) rounds instead
        # of the d rounds a frontier BFS would take on e.g. a ring)
        rev = eact.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        colored_rev = (
            rev.join(color.withColumnRenamed("id", "src"), "src")
            .withColumnRenamed("color", "c_src")
            .join(
                color.select(F.col("id").alias("dst"), F.col("color").alias("c_dst")),
                "dst",
            )
            .where(F.col("c_src") == F.col("c_dst"))
            .select("src", "dst")
            .transform(_mat)
        )
        back = _fixpoint_color(colored_rev, active, max_iter)
        # back(v) = max id v forward-reaches within its color region; v is in
        # its region root's SCC exactly when that max is the root itself
        members = (
            back.withColumnRenamed("color", "b")
            .join(color, "id")
            .where(F.col("b") == F.col("color"))
            .select("id", F.col("color").alias("grp"))
        )
        done = _accumulate(done, members)
        active = active.join(
            members.select("id"), "id", "left_anti"
        ).transform(_mat)
        if not trimmed_any and members.isEmpty():  # pragma: no cover - safety
            raise RuntimeError("SCC made no progress")
    edges_all.unpersist()
    if done is None:
        return spark.createDataFrame([], "id long, component long")
    canon = done.groupBy("grp").agg(F.min("id").alias("component"))
    return done.join(canon, "grp").select("id", "component")


def condensation_edges(g: LinkGraph) -> DataFrame:
    """(src, dst) edges of the condensation DAG (SCC → SCC), deduplicated —
    the bow-tie analysis companion of SCC."""
    lab = strongly_connected_components(g)
    ls = lab.select(F.col("id").alias("src"), F.col("component").alias("cs"))
    ld = lab.select(F.col("id").alias("dst"), F.col("component").alias("cd"))
    return (
        g.edges.join(ls, "src")
        .join(ld, "dst")
        .where(F.col("cs") != F.col("cd"))
        .select(F.col("cs").alias("src"), F.col("cd").alias("dst"))
        .distinct()
    )
