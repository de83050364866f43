"""Graph snapshot diff invariants."""

from pyspark.sql import functions as F

from tests.conftest import make_graph


def test_edge_diff_statuses(spark):
    from graphina_spark.operators.diff import diff_summary, edge_diff

    g1 = make_graph(spark, [(0, 1), (1, 2), (2, 3)], n=4, directed=True)
    g2 = make_graph(spark, [(1, 2), (2, 3), (3, 0), (0, 2)], n=4, directed=True)
    d = {
        (r["src"], r["dst"]): r["status"] for r in edge_diff(g1, g2).collect()
    }
    assert d == {
        (0, 1): "removed",
        (1, 2): "kept",
        (2, 3): "kept",
        (3, 0): "added",
        (0, 2): "added",
    }
    s = {r["status"]: r["n_edges"] for r in diff_summary(g1, g2).collect()}
    assert s == {"kept": 2, "added": 2, "removed": 1}


def test_diff_conservation_on_recrawl(spark, sf_dir):
    from graphina_spark.operators.diff import edge_diff
    from graphina_spark.sources.derived import web_graph, web_graph_recrawl

    a = web_graph(spark, sf_dir)
    b = web_graph_recrawl(spark, sf_dir)
    d = edge_diff(a, b)
    counts = {r["status"]: r["n_edges"] for r in
              d.groupBy("status").agg(F.count("*").alias("n_edges")).collect()}
    n_a = a.edges.select("src", "dst").distinct().count()
    n_b = b.edges.select("src", "dst").distinct().count()
    assert counts.get("kept", 0) + counts.get("removed", 0) == n_a
    assert counts.get("kept", 0) + counts.get("added", 0) == n_b
    # the recrawl rule really produces churn in both directions
    assert counts.get("added", 0) > 0 and counts.get("removed", 0) > 0


def test_rank_drift_semantics(spark):
    from graphina_spark.operators.diff import rank_drift
    from tests.conftest import make_graph

    # old: star into 0; new: the same star but one spoke's edge removed —
    # 0 must lose rank, and drift must be pr_new − pr_old exactly
    old = make_graph(spark, [(1, 0), (2, 0), (3, 0)], n=4)
    new = make_graph(spark, [(1, 0), (2, 0)], n=4)
    out = {r["id"]: r for r in rank_drift(old, new, fixed_iters=4).collect()}
    assert len(out) == 4
    assert out[0]["drift"] < 0
    assert abs(out[0]["drift"] - round(out[0]["pr_new"] - out[0]["pr_old"], 6)) < 1e-9
    # identical snapshots → zero drift everywhere
    zero = (
        rank_drift(old, old, fixed_iters=4)
        .agg(F.sum(F.abs(F.col("drift"))))
        .first()[0]
    )
    assert zero == 0.0


def test_rank_delta_sums_to_zero(spark):
    """Both rank vectors sum to 1, so deltas sum to ~0 — and the recrawl
    must actually move mass (some nonzero deltas)."""
    import __spark_entry__ as m
    from pyspark.sql import functions as F

    df = m.queries()["rank_delta_web"](spark, "/root/testdata/sf0.001")
    agg = df.agg(
        F.sum("delta").alias("s"),
        F.sum(F.when(F.col("delta") != 0.0, 1).otherwise(0)).alias("moved"),
        F.count("*").alias("n"),
    ).first()
    assert abs(agg["s"]) < 1e-3  # 6-dp rounding residue only
    assert agg["moved"] > 0
    assert agg["n"] == df.select("id").distinct().count()
