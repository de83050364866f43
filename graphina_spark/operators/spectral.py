"""Spectral clustering, distributed: Power Iteration Clustering (PIC).

Reference: /root/reference/src/community/spectral.rs — unnormalized-Laplacian
smallest-k eigenvectors via nalgebra's DENSE symmetric eigendecomposition
(O(n³), :36-101) + seeded k-means on the embedding (:103+).  A dense eigen
solve cannot scale past ~10⁴ nodes; the recognized distributed analogue is
Power Iteration Clustering (Lin & Cohen, ICML 2010): iterate the
row-normalized affinity ``v ← W v / ‖W v‖₁`` (W = D⁻¹A) from a
symmetry-breaking deterministic init — the trajectory converges per-cluster
to near-constant plateaus long before global convergence, so a 1-D
largest-gap split of the embedding recovers the clusters.  Each iteration is
the SAME one-shuffle gather superstep as PageRank/eigenvector; total state
is one double per vertex.

Determinism: init ``v0_i ∝ 1 + hash(i)/8192`` with the portable quadratic
hash (approximation.py::_priority) — an id-LINEAR init (e.g. ``i mod m``)
makes structurally-identical components' plateau means nearly equal (a
100-wide id window covers almost every residue class), and the gap split
cannot separate them; the hash gives each component an independent ~2%
mean offset while within-component spread decays geometrically with
iterations (disconnected plateaus never mix, so separation only improves).
L1 normalization each step; ties in the gap split break by
(gap desc, rank asc).  Cluster labels are canonical min-member ids, the
same convention as connected components (connected_components.rs:219-230
comparison style).

Scale note: the power iteration is the heavy part and is one gather
shuffle per step; the largest-gap split sorts n scalar (id, score) rows
through a single window task — fine up to ~10⁷ clusters-of-interest rows;
past that swap in approx_quantile boundaries (documented trade).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from graphina_spark.graph import LinkGraph
from graphina_spark.plans.materialize import local_materialize as _mat

INIT_BUCKETS = 8192


def pic_embedding(g: LinkGraph, iters: int = 15) -> DataFrame:
    """(id, score): the PIC pseudo-eigenvector after ``iters`` fixed
    power-normalize steps on W = D⁻¹A over the symmetrized weighted
    adjacency.  Isolated vertices keep their (normalized) init value."""
    sym = g.undirected_view().groupBy("src", "dst").agg(F.sum("weight").alias("w"))
    deg = sym.groupBy(F.col("src").alias("id")).agg(F.sum("w").alias("d"))
    adj = (
        sym.join(deg.withColumnRenamed("id", "src"), "src")
        .select("src", "dst", (F.col("w") / F.col("d")).alias("wn"))
        .repartition("dst")
        .cache()
    )
    # raw quadratic hash (NOT approximation._priority — its trailing
    # `*2^31 + id` term is ≡ id mod any power of two ≤ 2^31, which would
    # make the init linear in id again)
    from graphina_spark.operators.approximation import PRI_A1, PRI_A2, PRI_B
    from graphina_spark.operators.distmetrics import ANF_P

    h1 = ((F.col("id") + 1) * F.lit(PRI_A1) + F.lit(PRI_B)) % F.lit(ANF_P)
    h2 = (h1 * h1 + F.lit(PRI_A1)) % F.lit(ANF_P)
    h3 = (h2 * h2 + F.lit(PRI_A2)) % F.lit(ANF_P)
    v = g.vertices.select(
        "id",
        (1.0 + (h3 % F.lit(INIT_BUCKETS)).cast("double") / F.lit(float(INIT_BUCKETS))).alias("s"),
    )
    tot = v.agg(F.sum(F.abs(F.col("s"))).alias("t"))
    v = (
        v.crossJoin(F.broadcast(tot))
        .select("id", (F.col("s") / F.col("t")).alias("s"))
        .transform(_mat)
    )
    for _ in range(iters):
        gathered = (
            adj.join(v.withColumnRenamed("id", "dst"), "dst")
            .groupBy(F.col("src").alias("id"))
            .agg(F.sum(F.col("wn") * F.col("s")).alias("g"))
        )
        nxt = v.join(gathered, "id", "left").select(
            "id", F.coalesce("g", F.col("s")).alias("s")
        )
        tot = nxt.agg(F.sum(F.abs(F.col("s"))).alias("t"))
        v = (
            nxt.crossJoin(F.broadcast(tot))
            .select("id", (F.col("s") / F.col("t")).alias("s"))
            .transform(_mat)
        )
    adj.unpersist()
    return v.select("id", F.col("s").alias("score"))


def spectral_clusters(g: LinkGraph, k: int, iters: int = 15) -> DataFrame:
    """(id, cluster): k clusters from the largest-gap split of the 1-D PIC
    embedding; cluster = min member id (canonical).  On a graph whose
    components are separated plateaus this recovers connected components
    exactly — the semantic bar the gate pins (components are the ground
    truth the reference's own community oracles use)."""
    emb = pic_embedding(g, iters=iters)
    wr = Window.orderBy(F.asc(F.round("score", 9)), F.asc("id"))
    ranked = emb.withColumn("rn", F.row_number().over(wr)).transform(_mat)
    gaps = ranked.withColumn(
        "gap", F.col("score") - F.lag("score").over(Window.orderBy("rn"))
    ).where(F.col("rn") >= 2)
    wb = Window.orderBy(F.desc(F.round("gap", 9)), F.asc("rn"))
    bounds = (
        gaps.withColumn("brk", F.row_number().over(wb))
        .where(F.col("brk") <= k - 1)
        .select(F.col("rn").alias("b_rn"))
    )
    labeled = (
        ranked.join(
            F.broadcast(bounds), F.col("rn") >= F.col("b_rn"), "left"
        )
        .groupBy("id", "rn")
        .agg(F.count("b_rn").alias("nb"))
    )
    wc = Window.partitionBy("nb")
    return labeled.select(
        "id", F.min("id").over(wc).alias("cluster")
    )
