"""Scalable global ordered prefix sums — the two-pass pattern behind every
"global running total" need (dense id assignment, sequence packing).

A single global window (`Window.orderBy(...)` with no partition) funnels the
whole table through ONE task; instead:

1. range-partition by the order key (ranges are globally ordered across
   partitions) and PIN the partitioning (eager local materialize —
   ``repartitionByRange``'s reservoir sampling is nondeterministic across
   actions, the same hazard documented at graph.assign_dense_ids),
2. one tiny job collects per-partition value sums → exclusive partition
   offsets (O(#partitions) driver state),
3. a per-partition window (parallel) computes the within-partition running
   sum; global prefix = partition offset + local prefix.

The result is independent of where the sampler drew the range boundaries —
only the total order (order key, then tie-break) matters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from graphina_spark.plans.materialize import local_materialize as _mat


def global_cumsum(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    out_col: str = "prefix",
    num_partitions: int | None = None,
) -> DataFrame:
    """Input columns + ``out_col`` = EXCLUSIVE global prefix sum of
    ``value_col`` in ``order_cols`` order (first row gets 0).  The order must
    be total (pass a unique tie-break column last) or the result is
    ill-defined."""
    spark = df.sparkSession
    p = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    parted = (
        df.repartitionByRange(p, *[F.col(c) for c in order_cols])
        .withColumn("_pid", F.spark_partition_id())
        .transform(_mat)
    )
    sums = parted.groupBy("_pid").agg(F.sum(value_col).alias("_s")).collect()
    offsets, acc = {}, 0
    for r in sorted(sums, key=lambda r: r["_pid"]):
        offsets[r["_pid"]] = acc
        acc += r["_s"] or 0
    off = spark.createDataFrame(
        [(k, v) for k, v in offsets.items()], "_pid int, _off long"
    )
    w = (
        Window.partitionBy("_pid")
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        parted.withColumn(
            "_local", F.coalesce(F.sum(value_col).over(w), F.lit(0))
        )
        .join(F.broadcast(off), "_pid")
        .withColumn(out_col, (F.col("_off") + F.col("_local")).cast("long"))
        .drop("_pid", "_local", "_off")
    )
