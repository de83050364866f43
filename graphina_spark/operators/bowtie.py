"""Bow-tie decomposition of a directed web graph (Broder et al., WWW 2000).

The classic structural map of a crawl graph: the largest SCC is the CORE,
IN = vertices that reach the core, OUT = vertices the core reaches,
TUBE = vertices on a core-avoiding IN→OUT path, TENDRIL = everything else
weakly connected to the core, DISC = the rest.  The reference has the
building blocks (SCC at src/community/connected_components.rs:130-139, BFS
reachability in core/paths.rs) but not the composition; this is the first
query an analyst runs on a new crawl, so it is a public operator here.

Class conventions (deterministic, mirrored in the DuckDB oracles):

- ``CORE``   — member of the largest SCC (ties broken by smallest canonical
  min-member label, matching the SCC labeling contract).
- ``IN``     — reaches the core, not in it.
- ``OUT``    — reachable from the core, not in it.
- ``TUBE``   — not CORE/IN/OUT, reachable from IN *and* reaches OUT within
  the core-free subgraph (the "core-avoiding path" of the paper).
- ``TENDRIL``— not any of the above but in the core's weakly connected
  component (Broder's TENDRILS bucket is "everything else hanging off the
  bow-tie"; the paper carves tubes out of it exactly as done here).
- ``DISC``   — not weakly connected to the core.

Scale shape: ONE vertex-scale kernel (the SCC coloring), then everything
else — four reachability passes and the weak-connectivity check — runs on
the **condensation DAG**, because every one of those predicates is
SCC-invariant (a vertex reaches the core iff its SCC node reaches the core
node; a core-avoiding path exists iff one exists among SCC nodes, since no
non-core SCC contains a core vertex).  A web crawl's condensation is orders
of magnitude smaller than the graph (the giant SCC collapses to one node),
so the post-SCC phase costs one labels join plus frontier BFS on the small
DAG — still distributed DataFrame ops, no driver materialization beyond the
single (component, size) row that picks the core.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphina_spark.graph import LinkGraph
from graphina_spark.plans.materialize import local_materialize as _mat

CLASSES = ["CORE", "IN", "OUT", "TUBE", "TENDRIL", "DISC"]


def _reach(edges: DataFrame, seeds: DataFrame, max_iter: int) -> DataFrame:
    """(id) — every vertex reachable from ``seeds`` along ``edges``
    (seeds included).  Frontier BFS: visited set grows monotonically, each
    superstep one join + distinct + anti-join, O(diameter) rounds."""
    seen = seeds.select("id").distinct().transform(_mat)
    frontier = seen
    for _ in range(max_iter):
        nxt = (
            frontier.join(edges, frontier["id"] == edges["src"])
            .select(F.col("dst").alias("id"))
            .distinct()
            .join(seen, "id", "left_anti")
            .transform(_mat)
        )
        if nxt.isEmpty():
            break
        seen = seen.unionAll(nxt).transform(_mat)
        frontier = nxt
    return seen


def bowtie_classification(g: LinkGraph, max_iter: int = 200) -> DataFrame:
    """(id: long, cls: string) — bow-tie class per vertex (see module doc).

    Requires a directed graph (the bow-tie of an undirected graph is
    degenerate: every WCC is its own core)."""
    if not g.directed:
        raise ValueError("bowtie_classification requires a directed graph")
    from graphina_spark.operators.components import connected_components
    from graphina_spark.operators.scc import strongly_connected_components

    lab = strongly_connected_components(g, max_iter=max_iter).transform(_mat)
    core_row = (
        lab.groupBy("component")
        .agg(F.count("*").alias("sz"))
        .orderBy(F.desc("sz"), F.asc("component"))
        .limit(1)
        .collect()
    )
    if not core_row:
        return g.vertices.sparkSession.createDataFrame([], "id long, cls string")
    core_id = core_row[0]["component"]

    # ---- everything below runs on the condensation DAG (SCC → SCC edges)
    ls = lab.select(F.col("id").alias("src"), F.col("component").alias("cs"))
    ld = lab.select(F.col("id").alias("dst"), F.col("component").alias("cd"))
    cedges = (
        g.edges.select("src", "dst")
        .join(ls, "src")
        .join(ld, "dst")
        .where(F.col("cs") != F.col("cd"))
        .select(F.col("cs").alias("src"), F.col("cd").alias("dst"))
        .distinct()
        .transform(_mat)
    )
    cverts = lab.select(F.col("component").alias("id")).distinct().transform(_mat)
    crev = cedges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    spark = g.vertices.sparkSession
    core_node = spark.createDataFrame([(int(core_id),)], "id long")

    fwd = _reach(cedges, core_node, max_iter)  # core node ∪ OUT nodes
    bwd = _reach(crev, core_node, max_iter)  # core node ∪ IN nodes
    out_c = fwd.where(F.col("id") != core_id).transform(_mat)
    in_c = bwd.where(F.col("id") != core_id).transform(_mat)

    # core-free sub-DAG for the tube test (no non-core SCC contains a core
    # vertex, so DAG-level core avoidance == vertex-level core avoidance)
    e2 = cedges.where(
        (F.col("src") != core_id) & (F.col("dst") != core_id)
    ).transform(_mat)
    r2 = e2.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    from_in = _reach(e2, in_c, max_iter)
    to_out = _reach(r2, out_c, max_iter)

    cg = LinkGraph(
        vertices=cverts,
        edges=cedges.withColumn("weight", F.lit(1.0)),
        directed=False,
    )
    cwcc = connected_components(cg).transform(_mat)
    core_wc = cwcc.where(F.col("id") == core_id).select(
        F.col("component").alias("wc")
    )
    in_core_wcc = cwcc.join(
        F.broadcast(core_wc), cwcc["component"] == F.col("wc"), "left_semi"
    ).select("id")

    def flag(s: DataFrame, name: str) -> DataFrame:
        return s.select("id", F.lit(True).alias(name))

    node_cls = (
        cverts.join(flag(in_c, "is_in"), "id", "left")
        .join(flag(out_c, "is_out"), "id", "left")
        .join(flag(from_in, "f_in"), "id", "left")
        .join(flag(to_out, "t_out"), "id", "left")
        .join(flag(in_core_wcc, "in_wcc"), "id", "left")
        .select(
            F.col("id").alias("component"),
            F.when(F.col("id") == core_id, "CORE")
            .when(F.col("is_in"), "IN")
            .when(F.col("is_out"), "OUT")
            .when(F.col("f_in") & F.col("t_out"), "TUBE")
            .when(F.col("in_wcc"), "TENDRIL")
            .otherwise("DISC")
            .alias("cls"),
        )
    )
    # one labels join projects DAG-node classes back to vertices
    return lab.join(node_cls, "component").select("id", "cls")


def bowtie_summary(g: LinkGraph, max_iter: int = 200) -> DataFrame:
    """(cls, n) — vertex count per bow-tie class (the headline crawl-shape
    table from the paper)."""
    return (
        bowtie_classification(g, max_iter=max_iter)
        .groupBy("cls")
        .agg(F.count("*").alias("n"))
    )
