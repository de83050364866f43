"""Distributed range join (point-in-interval) without a cross product.

Spark's planner turns `l JOIN r ON l.k = r.k AND l.t BETWEEN r.lo AND r.hi`
into a per-key nested loop — fine until one key is hot, quadratic there.
The scale shape is the standard bucketized range join: quantize time into
fixed-width buckets, explode each interval to the buckets it spans, equi-join
points on (key, bucket) — hash join, partition-pruned, AQE-skew-splittable —
then apply the exact range predicate as a filter.  A point lands in exactly
one bucket, so no pair is produced twice (no post-join distinct needed).

Bucket width trades replication for selectivity: intervals spanning B buckets
emit B rows.  `max_span_buckets` is the skew guard — an interval spanning
more than that many buckets (a "match-everything" interval at web scale)
raises instead of silently exploding the build side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    by: str,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket: float,
    how: str = "inner",
    max_span_buckets: int = 1_000,
) -> DataFrame:
    """Join each interval row to the point rows with the same ``by`` key and
    ``lo_col <= point_col <= hi_col`` (numeric columns, e.g. epoch seconds).

    Returns interval columns + point columns (name collisions other than
    ``by`` must be resolved by the caller).  ``how='left'`` keeps intervals
    with no matching point (point columns null) — aggregate with
    ``count(point_col)`` to get 0 for those.

    One hash-join shuffle on (key, bucket) + the exact-range filter; the
    span guard is enforced per row inside the bucket expansion (raise_error
    inside the sequence bound), so a pathological interval fails loudly
    instead of emitting 10^6 build rows.
    """
    b = float(bucket)
    span = (
        F.floor(F.col(hi_col) / b).cast("long")
        - F.floor(F.col(lo_col) / b).cast("long")
        + 1
    )
    guarded = F.when(
        span > max_span_buckets,
        F.raise_error(
            F.concat(
                F.lit(
                    f"range_join: interval spans > {max_span_buckets} buckets "
                    f"of width {b} — widen `bucket` or cap the interval: "
                ),
                F.col(lo_col).cast("string"),
                F.lit(".."),
                F.col(hi_col).cast("string"),
            )
        ).cast("long"),
    ).otherwise(span)
    iv = intervals.where(F.col(lo_col) <= F.col(hi_col)).withColumn(
        "_bkt",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / b).cast("long"),
                F.floor(F.col(lo_col) / b).cast("long") + guarded - 1,
            )
        ),
    )
    pt = points.withColumn("_bkt", F.floor(F.col(point_col) / b).cast("long"))
    in_range = (F.col(point_col) >= F.col(lo_col)) & (
        F.col(point_col) <= F.col(hi_col)
    )
    matched = iv.join(pt, [by, "_bkt"], "inner").where(in_range).drop("_bkt")
    if how != "left":
        return matched
    # left semantics: one null-point row per interval with no match anywhere.
    # Interval identity is its full column tuple — exact-duplicate interval
    # rows collapse to one unmatched row (give intervals a unique id column
    # if duplicates must be preserved).
    pcols = [c for c in points.columns if c != by]
    unmatched = (
        intervals.join(
            matched.select(*intervals.columns).distinct(),
            intervals.columns,
            "left_anti",
        )
        .distinct()
        .select(
            *[F.col(c) for c in intervals.columns],
            *[F.lit(None).cast(points.schema[c].dataType).alias(c) for c in pcols],
        )
    )
    return matched.unionByName(unmatched)
