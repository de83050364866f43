import os

from pyspark.sql import functions as F


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Both sides of a src-keyed self-join on the bucketed edge table read
    co-located buckets: the physical plan must contain NO Exchange."""
    from graphina_spark.sources.io import load_bucketed_edges, save_bucketed_edges

    edges = spark.range(2000).select(
        (F.col("id") % 97).alias("src"),
        ((F.col("id") * 7 + 3) % 97).alias("dst"),
        F.lit(1.0).alias("weight"),
    )
    save_bucketed_edges(edges, "e_bucketed", str(tmp_path / "e"), buckets=8)
    try:
        t1 = load_bucketed_edges(spark, "e_bucketed")
        t2 = load_bucketed_edges(spark, "e_bucketed").withColumnRenamed(
            "dst", "dst2"
        ).withColumnRenamed("weight", "w2")
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = t1.join(t2, "src")
            plan = j._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan, plan
            # and it still computes the right thing
            n = j.count()
            assert n == t1.groupBy("src").count().agg(
                F.sum(F.col("count") * F.col("count"))
            ).first()[0]
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    finally:
        spark.sql("DROP TABLE IF EXISTS e_bucketed")


def test_bucketed_aggregation_has_no_exchange(spark, tmp_path):
    from graphina_spark.sources.io import load_bucketed_edges, save_bucketed_edges

    edges = spark.range(500).select(
        (F.col("id") % 31).alias("src"),
        ((F.col("id") * 5 + 1) % 31).alias("dst"),
        F.lit(2.0).alias("weight"),
    )
    save_bucketed_edges(edges, "e_bucketed2", str(tmp_path / "e2"), buckets=4)
    try:
        t = load_bucketed_edges(spark, "e_bucketed2")
        agg = t.groupBy("src").agg(F.sum("weight").alias("w"))
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert agg.count() == 31
    finally:
        spark.sql("DROP TABLE IF EXISTS e_bucketed2")
