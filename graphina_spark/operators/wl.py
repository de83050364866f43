"""Weisfeiler-Leman (1-WL) color refinement — distributed structural
fingerprints.

Each round replaces every vertex's color with a digest of (own color,
sorted multiset of neighbor colors); after r rounds two vertices share a
color only if their radius-r neighborhoods are 1-WL-indistinguishable.  The
classic uses: structural-role discovery, graph fingerprinting (compare the
color-class histograms of two crawl snapshots or two per-host subgraphs —
the WL graph kernel), and candidate pruning for (sub)graph isomorphism.
The reference has no WL operator; this is pipeline value-add alongside the
dedup/fingerprint family (winnowing does it for text, WL for structure).

Execution shape per round: one join of the symmetrized adjacency against
the current colors + one ``groupBy(id)`` with an ORDERED ``collect_list``
(sorted in-row with ``array_sort`` — the sort is per-vertex, bounded by
degree, never a global sort), then an in-row md5 over the concatenation.
One shuffle per round, eagerly materialized (fixpoint kernels' rule).

Determinism: md5 over canonical strings — identical across engines,
partitionings, and runs.  Initial color = the vertex's (total simple)
degree, the standard uncolored-graph seed.

Hub note: ``collect_list`` on a 10⁶-degree hub materializes a 10⁶-element
array in one row.  ``max_list`` caps the digested list at the
lexicographically-first ``max_list`` neighbor colors (deterministic
truncation, documented bias: super-hub colors then distinguish only the
prefix); None keeps exact semantics.

DuckDB twin: oracles.py::wl_colors_web_sql (string_agg ORDER BY + md5,
identical digests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphina_spark.graph import LinkGraph
from graphina_spark.plans.materialize import local_materialize as _mat


def wl_refinement(
    g: LinkGraph, rounds: int = 3, max_list: int | None = None
) -> DataFrame:
    """(id long, color string) — the 1-WL color (32-hex md5 digest) of every
    vertex after ``rounds`` refinement rounds over the simple undirected
    structure.  Round 0 color = md5 of the vertex degree."""
    e = g.edges.select("src", "dst").where(F.col("src") != F.col("dst"))
    canon = e.select(
        F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
    ).distinct()
    adj = canon.unionAll(
        canon.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = adj.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("d"))
    colors = (
        g.vertices.select("id")
        .join(deg, "id", "left")
        .select(
            "id",
            F.md5(F.coalesce(F.col("d"), F.lit(0)).cast("string")).alias("color"),
        )
        .transform(_mat)
    )
    for _ in range(rounds):
        nbr = adj.join(
            colors.select(F.col("id").alias("dst"), F.col("color").alias("nc")),
            "dst",
        ).groupBy(F.col("src").alias("id"))
        lst = F.array_sort(F.collect_list("nc"))
        if max_list is not None:
            lst = F.slice(lst, 1, max_list)
        gathered = nbr.agg(F.concat_ws(",", lst).alias("nbrs"))
        colors = (
            colors.join(gathered, "id", "left")
            .select(
                "id",
                F.md5(
                    F.concat_ws(
                        "|", F.col("color"), F.coalesce(F.col("nbrs"), F.lit(""))
                    )
                ).alias("color"),
            )
            .transform(_mat)
        )
    return colors


def wl_histogram(
    g: LinkGraph, rounds: int = 3, max_list: int | None = None
) -> DataFrame:
    """(color string, n_nodes long) — the WL color-class histogram, the
    graph's structural fingerprint (two graphs with different histograms
    are certainly non-isomorphic; the WL kernel compares these vectors)."""
    return (
        wl_refinement(g, rounds=rounds, max_list=max_list)
        .groupBy("color")
        .agg(F.count("*").alias("n_nodes"))
    )


def wl_histogram_drift(
    g_a: LinkGraph, g_b: LinkGraph, rounds: int = 3, max_list: int | None = None
) -> DataFrame:
    """One row ``(l1, classes_a, classes_b, shared_classes)`` — L1 distance
    between the two graphs' WL color histograms plus class-count readouts:
    the structural-drift scalar between crawl snapshots (0 ⇔ 1-WL-identical
    structure; large ⇔ the recrawl reshaped neighborhoods, not just edge
    counts).  Integer end to end.  One full-outer join of two histogram
    frames whose size is bounded by the number of color classes ≤ |V|.
    DuckDB twin: oracles.py::wl_drift_web_sql."""
    ha = wl_histogram(g_a, rounds=rounds, max_list=max_list).select(
        "color", F.col("n_nodes").alias("na")
    )
    hb = wl_histogram(g_b, rounds=rounds, max_list=max_list).select(
        "color", F.col("n_nodes").alias("nb")
    )
    j = ha.join(hb, "color", "full_outer").select(
        F.coalesce("na", F.lit(0)).alias("na"),
        F.coalesce("nb", F.lit(0)).alias("nb"),
    )
    return j.agg(
        F.sum(F.abs(F.col("na") - F.col("nb"))).cast("long").alias("l1"),
        F.sum(F.when(F.col("na") > 0, 1).otherwise(0)).cast("long").alias("classes_a"),
        F.sum(F.when(F.col("nb") > 0, 1).otherwise(0)).cast("long").alias("classes_b"),
        F.sum(F.when((F.col("na") > 0) & (F.col("nb") > 0), 1).otherwise(0))
        .cast("long")
        .alias("shared_classes"),
    )
