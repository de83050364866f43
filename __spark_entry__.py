"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Engine: graphina_spark — a PySpark-native link-graph analytics engine with
the capabilities of habedi/graphina (see SURVEY.md).  Graph queries run over
deterministic graphs derived from the ``customer`` table with pure modular
arithmetic, reproduced identically in the DuckDB oracles
(graphina_spark/sources/derived.py).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

ROUND = 6


def _web(spark: SparkSession, sf_dir: str):
    from graphina_spark.sources.derived import web_graph

    return web_graph(spark, sf_dir)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: weighted PageRank (5 supersteps) over the derived web graph
    at sf0.001; returns (id, pr) — driver checks rows > 0."""
    return _q_pagerank_web(spark, "/root/testdata/sf0.001")


def _q_pagerank_web(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graphina_spark.operators.pagerank import pagerank

    g = _web(spark, sf_dir)
    pr = pagerank(g, damping=0.85, fixed_iters=5, tol=None)
    return pr.select("id", F.round("rank", ROUND).alias("pr"))


def _q_degree_web(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graphina_spark.operators.degree import degree_centrality

    return degree_centrality(_web(spark, sf_dir))


def _q_out_degree_web(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graphina_spark.operators.degree import out_degree_centrality

    return out_degree_centrality(_web(spark, sf_dir))


def _q_in_degree_web(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graphina_spark.operators.degree import in_degree_centrality

    return in_degree_centrality(_web(spark, sf_dir))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "pagerank_web": _q_pagerank_web,
        "degree_web": _q_degree_web,
        "out_degree_web": _q_out_degree_web,
        "in_degree_web": _q_in_degree_web,
    }


def oracle_sql() -> dict[str, str]:
    from graphina_spark.oracles import degree_web_sql, pagerank_web_sql

    return {
        "pagerank_web": pagerank_web_sql(),
        "degree_web": degree_web_sql("total"),
        "out_degree_web": degree_web_sql("out"),
        "in_degree_web": degree_web_sql("in"),
    }
