"""Partition-comparison measures: Adjusted Rand Index and Normalized Mutual
Information between two labelings.

The reference evaluates community detection by quality (modularity slack vs
NetworkX, tests/oracle_community_tests.rs:150), never by label equality —
because labels are arbitrary.  ARI (Hubert & Arabie 1985) is the standard
label-free agreement score between two partitions of the same vertex set:
1.0 = identical partitions, ~0.0 = chance agreement.  A web-scale pipeline
uses it to compare a detected community structure (LPA / Louvain) against a
ground truth (planted blocks, site boundaries) or against last crawl's
labels (community drift).

Scale shape: one inner join of the two (id, label) frames on id, one
``groupBy(label_a, label_b)`` contingency count (size bounded by the number
of co-occurring label pairs, <= n and usually << n), then three tiny
aggregations — all map-side-combinable, no self-joins, nothing driver-side
except the final 4-scalar formula.

DuckDB twin: oracles.py::ari_block_sql (contingency algebra over the
unrolled LPA CTE chain).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def adjusted_rand_index(a: DataFrame, b: DataFrame, label_col: str = "label") -> float:
    """ARI between two labelings ``(id, label)`` over their common ids.

    Returns 1.0 when the expected index equals the maximum index (both
    partitions all-singletons or both one-cluster — the sklearn convention).
    """
    la = a.select("id", F.col(label_col).alias("la"))
    lb = b.select("id", F.col(label_col).alias("lb"))
    j = la.join(lb, "id")
    cont = j.groupBy("la", "lb").agg(F.count("*").alias("nij"))

    def _pairs(col: str):
        return F.sum(F.col(col) * (F.col(col) - 1) / 2.0)

    sum_ij = cont.agg(_pairs("nij").alias("s")).first()["s"] or 0.0
    sum_a = (
        cont.groupBy("la").agg(F.sum("nij").alias("na")).agg(_pairs("na").alias("s"))
    ).first()["s"] or 0.0
    sum_b = (
        cont.groupBy("lb").agg(F.sum("nij").alias("nb")).agg(_pairs("nb").alias("s"))
    ).first()["s"] or 0.0
    n = j.count()
    cn2 = n * (n - 1) / 2.0
    if cn2 == 0:
        return 1.0
    expected = sum_a * sum_b / cn2
    maximum = (sum_a + sum_b) / 2.0
    if maximum == expected:
        return 1.0
    return (sum_ij - expected) / (maximum - expected)


def normalized_mutual_information(
    a: DataFrame, b: DataFrame, label_col: str = "label"
) -> float:
    """NMI (arithmetic normalization, natural log) between two labelings
    ``(id, label)`` over their common ids:

        MI  = Σ_ij n_ij/n · ln(n·n_ij / (n_a·n_b))
        NMI = 2·MI / (H(A) + H(B)),   1.0 when both entropies are 0
              (two constant labelings agree perfectly by convention).

    Same contingency-table scale shape as :func:`adjusted_rand_index` — one
    id join, one (la, lb) groupBy, marginals from the contingency frame,
    nothing driver-side but four scalars.  DuckDB twin:
    oracles.py::nmi_block_sql.
    """
    la = a.select("id", F.col(label_col).alias("la"))
    lb = b.select("id", F.col(label_col).alias("lb"))
    j = la.join(lb, "id")
    cont = j.groupBy("la", "lb").agg(F.count("*").alias("nij")).cache()
    n = cont.agg(F.sum("nij")).first()[0] or 0
    if n == 0:
        return 1.0
    ca = cont.groupBy("la").agg(F.sum("nij").alias("na"))
    cb = cont.groupBy("lb").agg(F.sum("nij").alias("nb"))
    mi = (
        cont.join(ca, "la")
        .join(cb, "lb")
        .agg(
            F.sum(
                F.col("nij")
                / n
                * F.log(n * F.col("nij") / (F.col("na") * F.col("nb")))
            )
        )
    ).first()[0] or 0.0

    def _entropy(marg: DataFrame, col: str) -> float:
        return (
            marg.agg(-F.sum(F.col(col) / n * F.log(F.col(col) / n))).first()[0]
            or 0.0
        )

    ha, hb = _entropy(ca, "na"), _entropy(cb, "nb")
    cont.unpersist()
    if ha + hb == 0.0:
        return 1.0
    return 2.0 * mi / (ha + hb)
