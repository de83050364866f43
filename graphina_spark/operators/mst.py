"""Minimum spanning forest — distributed Borůvka.

Reference: /root/reference/src/mst/algorithms.rs (Prim :155, Kruskal :295,
Borůvka :367; parallel Borůvka above 10k edges :38-40).  Prim/Kruskal are
inherently sequential (heap / sorted union-find scan); Borůvka is the
Spark-shaped member of the family (SURVEY §2.3): each round every component
picks its minimum outgoing edge, chosen edges merge components, rounds
halve the component count → O(log n) supersteps.

Determinism: ties are broken by the total order (weight, min(src,dst),
max(src,dst)) — equivalent to a lexicographic weight perturbation, so the
result is a valid MSF and identical across runs/cluster sizes.  Matches the
reference's forest weight on connected graphs (their tests compare total
weight + edge count, not edge identity — oracle_tests.rs MST checks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphina_spark.graph import LinkGraph
from graphina_spark.plans.materialize import local_materialize as _mat


def _union_find(pairs: list[tuple[int, int]]) -> dict[int, int]:
    """Driver-side union-find with min-root canonicalization."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            hi, lo = (ra, rb) if ra > rb else (rb, ra)
            parent[hi] = lo
    return {x: find(x) for x in parent}


def boruvka_msf(
    g: LinkGraph, max_rounds: int = 64, driver_merge_threshold: int = 5_000_000
) -> DataFrame:
    """(src, dst, weight) edges of the minimum spanning forest (canonical
    src < dst), one tree per connected component.

    Component merging per round: the merge graph has ≤1 chosen edge per
    component, so once the component count is ≤ ``driver_merge_threshold``
    it is collected and union-found on the driver (a few MB), broadcast back
    as a relabel map — replacing a nested distributed CC whose superstep
    count dominated wall time.  Above the threshold (first rounds at true
    web scale) the merge runs as distributed hash-min label exchange."""
    from graphina_spark.operators.components import connected_components

    edges = (
        g.edges.where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
            "weight",
        )
        .groupBy("src", "dst")
        .agg(F.min("weight").alias("weight"))  # parallel edges: keep cheapest
        .repartition("src")
        .cache()
    )
    spark = g.vertices.sparkSession
    labels = g.vertices.select("id", F.col("id").alias("comp")).localCheckpoint(
        eager=True
    )
    chosen_all: DataFrame | None = None
    for _ in range(max_rounds):
        lab_s = labels.select(F.col("id").alias("src"), F.col("comp").alias("cs"))
        lab_d = labels.select(F.col("id").alias("dst"), F.col("comp").alias("cd"))
        cross = (
            edges.join(lab_s, "src")
            .join(lab_d, "dst")
            .where(F.col("cs") != F.col("cd"))
        )
        if cross.isEmpty():
            break
        # min outgoing edge per component under the deterministic total order
        per_comp = cross.select(
            F.col("cs").alias("comp"), "src", "dst", "weight", "cs", "cd"
        ).unionAll(
            cross.select(F.col("cd").alias("comp"), "src", "dst", "weight", "cs", "cd")
        )
        best = per_comp.groupBy("comp").agg(
            F.min(F.struct("weight", "src", "dst", "cs", "cd")).alias("m")
        )
        # cut lineage before chosen fans out into three consumers (picked,
        # comp_edges, and the nested CC kernel) — otherwise the deep
        # cross-join plan replicates into every superstep of every round
        chosen = (
            best.select(
                F.col("m.src").alias("src"),
                F.col("m.dst").alias("dst"),
                F.col("m.weight").alias("weight"),
                F.col("m.cs").alias("cs"),
                F.col("m.cd").alias("cd"),
            )
            .distinct()
            .transform(_mat)
        )
        picked = chosen.select("src", "dst", "weight")
        chosen_all = picked if chosen_all is None else chosen_all.unionAll(picked)
        chosen_all = chosen_all.transform(_mat)
        # merge components along the chosen edges
        comp_edges = chosen.select(F.col("cs").alias("src"), F.col("cd").alias("dst"))
        n_merge = comp_edges.count()
        if n_merge <= driver_merge_threshold:
            mapping = _union_find(
                [(r["src"], r["dst"]) for r in comp_edges.collect()]
            )
            spark_local = labels.sparkSession
            map_df = spark_local.createDataFrame(
                list(mapping.items()), "comp long, new_comp long"
            )
            labels = (
                labels.join(F.broadcast(map_df), "comp", "left")
                .select("id", F.coalesce("new_comp", "comp").alias("comp"))
                .transform(_mat)
            )
        else:
            comp_vertices = (
                labels.select(F.col("comp").alias("id"))
                .distinct()
                .transform(_mat)
            )
            cg = LinkGraph(
                vertices=comp_vertices,
                edges=comp_edges.withColumn("weight", F.lit(1.0)),
                directed=False,
            )
            merged = connected_components(cg).select(
                F.col("id").alias("comp"), F.col("component").alias("new_comp")
            )
            labels = (
                labels.join(merged, "comp")
                .select("id", F.col("new_comp").alias("comp"))
                .transform(_mat)
            )
    edges.unpersist()
    if chosen_all is None:
        return spark.createDataFrame([], "src long, dst long, weight double")
    return chosen_all.distinct()


def msf_total_weight(g: LinkGraph) -> float:
    """Σ weight of the forest (the quantity the reference's oracle pins)."""
    row = boruvka_msf(g).agg(F.sum("weight")).first()
    return float(row[0] or 0.0)
