"""graphina_spark — a PySpark-native link-graph analytics engine.

A from-scratch reimplementation of the query/data-processing capabilities of
the Graphina reference library (habedi/graphina, Rust) re-expressed Spark-first:

- the property graph is a pair of DataFrames (``vertices``, ``edges``) wrapped
  by :class:`graphina_spark.graph.LinkGraph` (reference: ``BaseGraph`` over
  petgraph, src/core/types.rs:133-142);
- iterative kernels (PageRank, connected components, label propagation, ...)
  are driver-orchestrated supersteps where each superstep is a Catalyst-planned
  join + aggregation, with parquet checkpointing to cut lineage;
- per-row web-page processing (text extraction, link parsing) is done in
  vectorized Arrow/pandas UDFs only — never row-at-a-time Python.

Designed for 100 TB-scale inputs: explicit partitioning, salted CSR-style
adjacency shards for hub skew, broadcast of small sides, AQE enabled.
"""

from graphina_spark.graph import LinkGraph

__all__ = ["LinkGraph"]
__version__ = "0.1.0"
