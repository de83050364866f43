"""Regression: superstep materialization must not inherit multiplied
Catalyst size statistics — localCheckpoint alone carries originStats whose
BigInteger bit-length grows k× per iteration and eventually OOMs the driver
(observed with Louvain/Borůvka under a 1 GiB default heap)."""

from pyspark.sql import functions as F

from graphina_spark.operators.pagerank import pagerank
from graphina_spark.plans.materialize import local_materialize
from tests.conftest import make_graph


def _size_bits(df) -> int:
    return int(
        df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
    ).bit_length()


def test_local_materialize_stats_stay_bounded(spark):
    df = local_materialize(
        spark.range(50).select(F.col("id"), F.lit(1.0).alias("w"))
    )
    bits = []
    for _ in range(5):
        j = (
            df.alias("a")
            .join(df.alias("b"), "id")
            .join(df.alias("c"), "id")
            .select("id", (F.col("a.w") + F.col("b.w")).alias("w"))
        )
        df = local_materialize(j)
        bits.append(_size_bits(df))
    # without the fix this sequence roughly triples per round (30, 86, 255…)
    assert max(bits) <= 64, bits
    assert df.count() == 50


def test_local_materialize_preserves_values(spark):
    base = spark.range(10).select(F.col("id"), (F.col("id") * 2.5).alias("x"))
    got = sorted(map(tuple, local_materialize(base).collect()))
    assert got == sorted(map(tuple, base.collect()))


def test_many_superstep_kernel_completes(spark):
    """30 fixed PageRank supersteps on a tiny graph: plan depth and stats
    must stay O(1) per iteration (this was fine for small counts and
    exploded beyond ~10-20 iterations before the fix)."""
    g = make_graph(spark, [(0, 1), (1, 2), (2, 0), (2, 3)], n=4, directed=True)
    pr = pagerank(g, fixed_iters=30, tol=None)
    rows = {r["id"]: r["rank"] for r in pr.collect()}
    assert abs(sum(rows.values()) - 1.0) < 1e-9
