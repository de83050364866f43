"""Exact 4-vertex motif census — ESCAPE-style closed forms (Pinar,
Seshadhri & Vishal, WWW 2017) over the engine's bounded triangle kernels.

Graphlet/motif profiles are the standard structural fingerprint one level
above triangles (network comparison, role discovery, anomaly scans).  The
insight that makes them tractable at 10^12 edges is ESCAPE's: every
connected 4-vertex NON-INDUCED count reduces to degree combinatorics +
per-edge triangle support + one bounded triangle-pair join — no 4-way
enumeration:

    wedges     = Σ_v C(d_v, 2)
    star3      = Σ_v C(d_v, 3)                      (claws)
    path3      = Σ_{(u,v)∈E} (d_u−1)(d_v−1) − 3·T   (3-edge paths)
    tailed_tri = Σ_v tri_v · (d_v − 2)              (triangle + pendant)
    diamond    = Σ_e C(t_e, 2)                      (two triangles on e)
    k4         = |{(e, {w1,w2}) : w1,w2 ∈ tri(e), (w1,w2) ∈ E}| / 6

with T total triangles, t_e per-edge support, tri_v per-vertex counts —
all already computed by the degree-ordered orientation kernel whose join
fan-out is bounded by oriented out-degree ≤ O(√m).  The k4 pair join costs
Σ_e C(t_e, 2) = the diamond count — bounded by the graph's own diamond
density, never by degree².  Counts are NON-INDUCED (ESCAPE's primal table;
induced counts are a constant linear transform a caller can apply).

4-cycles are deliberately NOT here: the engine's `square_count`
(metrics.py, gated as squares_web) already covers them under the links
family's documented hub cap; together the two gates pin the full connected
4-vertex table.  Everything below is integer arithmetic end to end — the
DuckDB oracle matches bit-exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphina_spark.graph import LinkGraph
from graphina_spark.operators.egonet import _ctx


def four_motif_census(g: LinkGraph) -> DataFrame:
    """One row (wedges, star3, path3, tailed_tri, diamond, k4, triangles) —
    global non-induced counts over the simple undirected projection."""
    canon, cdeg, _ = _ctx(g)
    # ONE triangle enumeration serves everything: the oriented corner join
    # is cached, per-edge support is DERIVED from it (tedges → groupBy), and
    # every scalar folds into one single-row lazy plan (cross joins of 1-row
    # aggregates) so the census is a single action.
    d = F.col("deg").cast("long")
    degrow = cdeg.agg(
        F.sum((d * (d - 1) / 2).cast("long")).alias("wedges"),
        F.sum((d * (d - 1) * (d - 2) / 6).cast("long")).alias("star3"),
    )

    da = cdeg.select(F.col("id").alias("src"), F.col("deg").alias("dsrc"))
    db = cdeg.select(F.col("id").alias("dst"), F.col("deg").alias("ddst"))
    fwd = (F.col("dsrc") < F.col("ddst")) | (
        (F.col("dsrc") == F.col("ddst")) & (F.col("src") < F.col("dst"))
    )
    edir = (
        canon.join(da, "src")
        .join(db, "dst")
        .select(
            F.when(fwd, F.col("src")).otherwise(F.col("dst")).alias("s"),
            F.when(fwd, F.col("dst")).otherwise(F.col("src")).alias("d"),
        )
    )
    e1 = edir.select(F.col("s").alias("a"), F.col("d").alias("b"))
    e2 = edir.select(F.col("s").alias("b"), F.col("d").alias("c"))
    e3 = edir.select(F.col("s").alias("a"), F.col("d").alias("c"))
    corners = e1.join(e2, "b").join(e3, ["a", "c"])
    tedges = (
        corners.select(
            F.least("a", "b").alias("le"), F.greatest("a", "b").alias("he"),
            F.col("c").alias("w"),
        )
        .unionAll(
            corners.select(
                F.least("a", "c").alias("le"), F.greatest("a", "c").alias("he"),
                F.col("b").alias("w"),
            )
        )
        .unionAll(
            corners.select(
                F.least("b", "c").alias("le"), F.greatest("b", "c").alias("he"),
                F.col("a").alias("w"),
            )
        )
        .cache()
    )
    sup = canon.join(
        tedges.groupBy(F.col("le").alias("src"), F.col("he").alias("dst")).agg(
            F.count("*").alias("t")
        ),
        ["src", "dst"],
        "left",
    ).select("src", "dst", F.coalesce("t", F.lit(0)).alias("support"))

    se = sup.join(cdeg.withColumnRenamed("id", "src"), "src").withColumnRenamed(
        "deg", "du"
    ).join(cdeg.select(F.col("id").alias("dst"), F.col("deg").alias("dv")), "dst")
    erow = se.agg(
        F.sum(((F.col("du") - 1) * (F.col("dv") - 1)).cast("long")).alias("p3raw"),
        F.sum("support").cast("long").alias("sup_sum"),
        F.sum((F.col("support") * (F.col("support") - 1) / 2).cast("long"))
        .alias("diamond"),
    )

    tri_v = (
        sup.select(F.col("src").alias("id"), "support")
        .unionAll(sup.select(F.col("dst").alias("id"), "support"))
        .groupBy("id")
        .agg((F.sum("support") / 2).cast("long").alias("tri"))
    )
    trow = tri_v.join(cdeg, "id").agg(
        F.sum((F.col("tri") * (F.col("deg") - 2)).cast("long")).alias("tailed")
    )

    # k4: pairs of triangles sharing an edge whose opposite vertices are
    # adjacent; each K4 is found once per its 6 edges
    t1, t2 = tedges.alias("t1"), tedges.alias("t2")
    k4pairs = t1.join(
        t2,
        (F.col("t1.le") == F.col("t2.le"))
        & (F.col("t1.he") == F.col("t2.he"))
        & (F.col("t1.w") < F.col("t2.w")),
    ).select(F.col("t1.w").alias("w1"), F.col("t2.w").alias("w2"))
    k4row = k4pairs.join(
        canon,
        (canon["src"] == F.least("w1", "w2"))
        & (canon["dst"] == F.greatest("w1", "w2")),
    ).agg(F.count("*").alias("c6"))

    tri_total = (F.col("sup_sum") / 3).cast("long")
    return (
        degrow.crossJoin(erow)
        .crossJoin(trow)
        .crossJoin(k4row)
        .select(
            F.coalesce("wedges", F.lit(0)).alias("wedges"),
            F.coalesce("star3", F.lit(0)).alias("star3"),
            (F.coalesce("p3raw", F.lit(0)) - 3 * tri_total).alias("path3"),
            F.coalesce("tailed", F.lit(0)).alias("tailed_tri"),
            F.coalesce("diamond", F.lit(0)).alias("diamond"),
            (F.coalesce("c6", F.lit(0)) / 6).cast("long").alias("k4"),
            tri_total.alias("triangles"),
        )
    )
