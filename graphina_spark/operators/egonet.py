"""Ego-network analytics: Forman curvature, edge embeddedness, Burt's
structural-hole measures, scan statistics, and the disparity-filter backbone.

Reference parity: graphina exposes per-node triangle counts and clustering
(src/metrics/node_metrics.rs:35-87); this module is the standard
network-science layer one level up from those — every quantity here is a
deterministic function of (degree, per-node triangles, per-edge triangle
support, edge weights), all of which the engine already computes with
hub-safe plans.  Nothing here introduces a new join shape:

- per-edge triangle support reuses the degree-ordered orientation join
  (operators/truss.py::_edge_support) — each triangle materializes once and
  the join fan-out is bounded by oriented out-degree ≤ O(sqrt(m)), so a
  10^6-degree crawl hub cannot explode the wedge join;
- Burt's indirect term sums over *triangles* (i,j,q all mutually reachable
  through i), so it is enumerated from the same oriented corner join — never
  the unbounded open-wedge join;
- the disparity filter is two map-side-combinable aggregations + one join.

Plan hygiene: every function builds the (canonical edges, degrees) kernel
ONCE via :func:`_ctx` and caches both frames, so the degree union+groupBy
is one exchange per query instead of one per consumer (the executedPlan
exchange audit in PLANS.md §6s dropped from 41-98 shuffles to the single
digits after this).  Per-node triangle counts derive from edge support
(tri(v) = Σ incident support / 2) — no second triangle enumeration.

At 10^12 edges every operator below is therefore bounded by one triangle
enumeration (the engine's existing scale envelope) or less.

Cache lifecycle: canon/cdeg (and burt's oriented frame) are ``.cache()``d
because the returned DataFrame re-references them across several joins —
they cannot be unpersisted eagerly here.  Long-lived sessions running many
ego-net passes own the lifecycle (``spark.catalog.clearCache()`` or
unpersist after materializing the result) — the same contract as the
dedup shingle caches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphina_spark.graph import LinkGraph


def _ctx(g: LinkGraph) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(canon, cdeg, sup): canonical src<dst simple edges, (id, deg) simple
    undirected degrees, (src, dst, support) per-edge triangle support —
    canon/cdeg cached, the support kernel reusing the SAME cached degrees."""
    from graphina_spark.operators.truss import _edge_support

    canon = g.canonical_undirected_edges().cache()
    cdeg = (
        canon.select(F.col("src").alias("id"))
        .unionAll(canon.select(F.col("dst").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("deg"))
    ).cache()
    sup = _edge_support(canon, deg=cdeg.withColumnRenamed("deg", "d"))
    return canon, cdeg, sup


def _with_end_degrees(sup: DataFrame, cdeg: DataFrame) -> DataFrame:
    return (
        sup.join(cdeg.withColumnRenamed("id", "src"), "src")
        .withColumnRenamed("deg", "dsrc")
        .join(cdeg.select(F.col("id").alias("dst"), F.col("deg").alias("ddst")), "dst")
    )


def forman_curvature(g: LinkGraph) -> DataFrame:
    """(src, dst, curvature) per canonical undirected simple edge.

    Augmented Forman–Ricci curvature for unweighted graphs
    (Forman 2003; Samal et al. 2018 "Comparative analysis of two
    discretizations of Ricci curvature for complex networks"):

        F#(e=(u,v)) = 4 - deg(u) - deg(v) + 3 * t(e)

    where t(e) is the number of triangles containing e.  Strongly negative
    edges are inter-community bridges; positive edges sit inside dense
    cores — the standard curvature-based community-boundary signal.
    """
    _, cdeg, sup = _ctx(g)
    return _with_end_degrees(sup, cdeg).select(
        "src",
        "dst",
        (F.lit(4) - F.col("dsrc") - F.col("ddst") + 3 * F.col("support"))
        .cast("long")
        .alias("curvature"),
    )


def edge_embeddedness(g: LinkGraph) -> DataFrame:
    """(src, dst, cn, overlap) per canonical undirected simple edge.

    Embeddedness cn = common-neighbor count of the endpoints (= triangle
    support of the edge); overlap = cn / (deg(u) + deg(v) - 2 - cn), the
    neighborhood-Jaccard restricted to *existing* edges (Onnela et al. 2007
    tie-strength / Granovetter weak-tie analysis).  overlap = 0.0 when the
    union of non-mutual neighbors is empty (two pendant endpoints).
    """
    _, cdeg, sup = _ctx(g)
    denom = F.col("dsrc") + F.col("ddst") - 2 - F.col("support")
    return _with_end_degrees(sup, cdeg).select(
        "src",
        "dst",
        F.col("support").cast("long").alias("cn"),
        F.when(denom > 0, F.col("support") / denom)
        .otherwise(F.lit(0.0))
        .alias("overlap"),
    )


def ego_stats(g: LinkGraph) -> DataFrame:
    """(id, deg, tri, scan1, effective_size, efficiency) per vertex with
    simple-undirected degree >= 1.

    - scan1(v) = deg(v) + tri(v): the edge count of the closed 1-hop induced
      ego network (Priebe et al. 2005 scan statistics — the standard local
      anomaly signal on graphs).
    - effective_size(v) = deg - 2*tri/deg: Burt's effective size in the
      unweighted Borgatti simplification; efficiency = effective_size/deg.

    tri(v) = Σ support(e) over edges incident to v, halved — each triangle
    at v covers exactly two of v's incident edges — so the per-node counts
    ride the SAME single support enumeration, not a second triangle pass.
    """
    _, cdeg, sup = _ctx(g)
    tri = (
        sup.select(F.col("src").alias("id"), "support")
        .unionAll(sup.select(F.col("dst").alias("id"), "support"))
        .groupBy("id")
        .agg((F.sum("support") / 2).cast("long").alias("tri"))
    )
    deg, t = F.col("deg"), F.coalesce(F.col("tri"), F.lit(0))
    return cdeg.join(tri, "id", "left").select(
        "id",
        deg.cast("long").alias("deg"),
        t.cast("long").alias("tri"),
        (deg + t).cast("long").alias("scan1"),
        (deg - 2.0 * t / deg).alias("effective_size"),
        ((deg - 2.0 * t / deg) / deg).alias("efficiency"),
    )


def burt_constraint(g: LinkGraph) -> DataFrame:
    """(id, constraint) — Burt's network constraint, unweighted undirected
    proportions p_ij = 1/deg(i):

        c(i) = sum_{j in N(i)} ( p_ij + sum_{q in N(i) ∩ N(j)} p_iq * p_qj )^2

    The indirect term is nonzero only when (i, q, j) is a triangle, so it is
    computed from the oriented triangle-corner join (each triangle emits its
    6 ordered (i, j, q) roles) — the enumeration is triangle-bounded, never
    the open 2-path join that a crawl hub would explode.  Vertices with
    deg = 0 are omitted (constraint is undefined on isolates).
    """
    canon, cdeg, _ = _ctx(g)
    # oriented corner join over the SAME cached (canon, cdeg) kernel
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
        .cache()
    )
    e1 = edir.select(F.col("s").alias("a"), F.col("d").alias("b"))
    e2 = edir.select(F.col("s").alias("b"), F.col("d").alias("c"))
    e3 = edir.select(F.col("s").alias("a"), F.col("d").alias("c"))
    corners = e1.join(e2, "b").join(e3, ["a", "c"])

    # ordered (i, j, q): for each unordered triangle {a,b,c}, all 6 role
    # assignments (i = ego, j = alter, q = the mediating common neighbor)
    perms = corners.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.col(i).alias("i"), F.col(j).alias("j"), F.col(q).alias("q")
                    )
                    for i, j, q in (
                        ("a", "b", "c"),
                        ("b", "a", "c"),
                        ("a", "c", "b"),
                        ("c", "a", "b"),
                        ("b", "c", "a"),
                        ("c", "b", "a"),
                    )
                ]
            )
        ).alias("t")
    ).select("t.i", "t.j", "t.q")
    indirect = (
        perms.join(cdeg.select(F.col("id").alias("i"), F.col("deg").alias("di")), "i")
        .join(cdeg.select(F.col("id").alias("q"), F.col("deg").alias("dq")), "q")
        .groupBy("i", "j")
        .agg(F.sum(1.0 / (F.col("di") * F.col("dq"))).alias("ind"))
    )
    adj = canon.select("src", "dst").unionAll(
        canon.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    per_pair = (
        adj.withColumnsRenamed({"src": "i", "dst": "j"})
        .join(cdeg.select(F.col("id").alias("i"), F.col("deg").alias("di")), "i")
        .join(indirect, ["i", "j"], "left")
        .select(
            "i",
            F.pow(1.0 / F.col("di") + F.coalesce("ind", F.lit(0.0)), 2).alias("c_ij"),
        )
    )
    return per_pair.groupBy(F.col("i").alias("id")).agg(
        F.sum("c_ij").alias("constraint")
    )


def disparity_backbone(g: LinkGraph, alpha_cut: float = 0.5) -> DataFrame:
    """(src, dst, alpha) — edges surviving the disparity filter (Serrano,
    Boguñá & Vespignani 2009, "Extracting the multiscale backbone of complex
    weighted networks") applied on the out-side of the directed weighted
    edge list:

        alpha_ij = (1 - w_ij / s_i)^(k_i - 1)

    with k_i the out-degree and s_i the out-strength of src i.  An edge
    survives when alpha < alpha_cut and k_i > 1 (degree-1 sources carry no
    statistical evidence and are dropped, the paper's convention).

    Scale shape: one map-side-combinable groupBy(src) for (k, s) + one
    src-keyed join — no wedge or self-join anywhere, so this runs at full
    crawl scale as a single shuffle.
    """
    stats = g.edges.groupBy("src").agg(
        F.count("*").alias("k"), F.sum("weight").alias("s")
    )
    alpha = F.pow(1.0 - F.col("weight") / F.col("s"), F.col("k") - 1)
    return (
        g.edges.join(stats, "src")
        .where(F.col("k") > 1)
        .select("src", "dst", alpha.alias("alpha"))
        .where(F.col("alpha") < F.lit(alpha_cut))
    )
