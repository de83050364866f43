"""Degree centrality — raw counts, not normalized.

Reference: src/centrality/degree.rs:50-114.  Conventions pinned by the
reference's tests: directed total degree = in + out; an undirected self-loop
counts 2 (degree.rs:196-206); parallel edges each count (degree.rs:183-194).
All three are one ``groupBy().count()`` over the (symmetrized) edge frame —
map-side partial aggregation makes this a single cheap shuffle at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphina_spark.graph import LinkGraph


def degree_centrality(g: LinkGraph) -> DataFrame:
    """(id, degree): total degree as double (reference returns NodeMap<f64>)."""
    return g.degrees().select("id", F.col("deg").cast("double").alias("degree"))


def in_degree_centrality(g: LinkGraph) -> DataFrame:
    return g.degrees().select("id", F.col("in_deg").cast("double").alias("degree"))


def out_degree_centrality(g: LinkGraph) -> DataFrame:
    return g.degrees().select("id", F.col("out_deg").cast("double").alias("degree"))
