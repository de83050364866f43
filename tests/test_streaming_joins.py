"""Stream-stream watermarked interval join: streamed pair set equals the
batch interval join; as-of reduction equals the batch as-of join."""

import datetime as dt
import time

import pytest
from pyspark.sql import functions as F

from graphina_spark.streaming.joins import (
    asof_winners,
    attribute_purchases,
    interval_join_condition,
)

DDL = "event_id long, ts timestamp, user_id long"
T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _rows(specs):
    return [(i, T0 + dt.timedelta(seconds=s), u) for i, s, u in specs]


@pytest.fixture()
def dirs(spark, tmp_path):
    clicks = str(tmp_path / "clicks")
    purchases = str(tmp_path / "purch")
    # user 1: clicks at 0, 100, 550; purchase at 600 (tolerance 600 -> all 3)
    # user 2: click at 0; purchase at 900 (click too old -> no pair)
    # user 3: purchase at 300, no clicks
    c1 = _rows([(1, 0, 1), (2, 100, 1)])
    c2 = _rows([(3, 550, 1), (4, 0, 2)])
    p1 = _rows([(100, 600, 1)])
    p2 = _rows([(101, 900, 2), (102, 300, 3)])
    for d, batches in ((clicks, (c1, c2)), (purchases, (p1, p2))):
        for rows in batches:
            spark.createDataFrame(rows, DDL).coalesce(1).write.parquet(
                d, mode="append"
            )
    return clicks, purchases


def test_streamed_pairs_equal_batch_interval_join(spark, dirs):
    clicks_dir, purchases_dir = dirs
    cs = (
        spark.readStream.schema(DDL).option("maxFilesPerTrigger", 1).parquet(clicks_dir)
    )
    ps = (
        spark.readStream.schema(DDL)
        .option("maxFilesPerTrigger", 1)
        .parquet(purchases_dir)
    )
    pairs = attribute_purchases(cs, ps, tolerance_s=600,
                                click_watermark_s=1200, purchase_watermark_s=600)
    q = (
        pairs.writeStream.format("memory")
        .queryName("attrib")
        .outputMode("append")
        .start()
    )
    t0 = time.time()
    while time.time() - t0 < 120:
        time.sleep(2)
        assert q.exception() is None, q.exception()
        if sum(p["numInputRows"] > 0 for p in q.recentProgress) >= 2:
            got = spark.sql("SELECT * FROM attrib").count()
            if got >= 3:
                break
    q.stop()
    streamed = {
        (r["user_id"], r["click_id"], r["purchase_id"])
        for r in spark.sql("SELECT * FROM attrib").collect()
    }
    cb = spark.read.parquet(clicks_dir).select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("click_ts")
    )
    pb = spark.read.parquet(purchases_dir).select(
        F.col("user_id").alias("p_user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    batch = {
        (r["user_id"], r["click_id"], r["purchase_id"])
        for r in cb.join(
            pb,
            (F.col("user_id") == F.col("p_user_id"))
            & interval_join_condition(F.col("click_ts"), F.col("purchase_ts"), 600),
        ).collect()
    }
    assert streamed == batch
    assert batch == {(1, 1, 100), (1, 2, 100), (1, 3, 100)}


def test_asof_winner_matches_batch_asof(spark, dirs):
    clicks_dir, purchases_dir = dirs
    cb = spark.read.parquet(clicks_dir).select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("click_ts")
    )
    pb = spark.read.parquet(purchases_dir).select(
        F.col("user_id").alias("p_user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    pairs = cb.join(
        pb,
        (F.col("user_id") == F.col("p_user_id"))
        & interval_join_condition(F.col("click_ts"), F.col("purchase_ts"), 600),
    ).select("user_id", "click_id", "click_ts", "purchase_id", "purchase_ts")
    winners = {
        (r["purchase_id"], r["click_id"]) for r in asof_winners(pairs).collect()
    }
    # latest qualifying click per purchase
    assert winners == {(100, 3)}

    from graphina_spark.operators.asof import asof_join

    left = pb.select(
        F.col("p_user_id").alias("user_id"), "purchase_id",
        F.col("purchase_ts").alias("ts"),
    )
    right = cb.select("user_id", "click_id", F.col("click_ts").alias("ts"))
    got = asof_join(
        left, right, by="user_id", left_ts="ts", right_ts="ts",
        tolerance_s=600, tie_break="click_id",
    )
    ref = {
        (r["purchase_id"], r["asof_click_id"])
        for r in got.where(F.col("asof_click_id").isNotNull()).collect()
    }
    assert ref == winners


def test_insufficient_click_watermark_raises(spark, dirs):
    clicks_dir, purchases_dir = dirs
    cs = spark.readStream.schema(DDL).parquet(clicks_dir)
    ps = spark.readStream.schema(DDL).parquet(purchases_dir)
    with pytest.raises(ValueError):
        attribute_purchases(cs, ps, tolerance_s=600,
                            click_watermark_s=600, purchase_watermark_s=600)
