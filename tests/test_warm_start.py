"""Incremental PageRank: warm-starting from the previous crawl's converged
ranks must reach tolerance in fewer supersteps than a cold uniform start —
the operational payoff of the recrawl-diff story (small churn ⇒ the old
fixpoint is near the new one)."""

from pyspark.sql import functions as F


def test_warm_start_converges_faster_on_recrawl(spark, sf_dir):
    from graphina_spark.operators.pagerank import pagerank
    from graphina_spark.sources.derived import web_graph, web_graph_recrawl
    from graphina_spark.plans.materialize import local_materialize as _mat

    tol = 1e-7
    g_old = web_graph(spark, sf_dir)
    g_old.edges = g_old.edges.transform(_mat)
    g_new = web_graph_recrawl(spark, sf_dir)
    g_new.edges = g_new.edges.transform(_mat)

    old_ranks = pagerank(g_old, tol=tol, max_iter=200).transform(_mat)

    cold_stats: dict = {}
    cold = pagerank(g_new, tol=tol, max_iter=200, stats=cold_stats)

    warm_stats: dict = {}
    warm = pagerank(
        g_new,
        tol=tol,
        max_iter=200,
        nstart=old_ranks.select("id", F.col("rank").alias("value")),
        stats=warm_stats,
    )

    assert warm_stats["delta"] < tol and cold_stats["delta"] < tol
    assert warm_stats["iterations"] < cold_stats["iterations"]

    # both fixpoints agree (same graph, same tolerance)
    diff = (
        warm.alias("a")
        .join(cold.alias("b"), "id")
        .agg(F.max(F.abs(F.col("a.rank") - F.col("b.rank"))))
        .first()[0]
    )
    assert diff < 1e-5
