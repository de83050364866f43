"""Distributed as-of join: each left row matched to the most recent right row.

The classic time-series/attribution operator Spark's built-in joins lack
(DuckDB/kdb/pandas `merge_asof` have it natively).  Semantics here mirror
DuckDB's ``ASOF JOIN`` — backward inclusive: left row (k, t) matches the
right row (k, t') with the largest t' ≤ t — so the gate oracle can be the
engine-native implementation.

Scale shape — the union trick, ONE shuffle total:
  tag right rows 0 and left rows 1, union, and run a single
  ``last(value, ignorenulls=true)`` carry-forward window partitioned by the
  key and ordered by (ts, tag).  No per-row join, no range cross product;
  the only exchange is the hash partition on the key, and each key's rows
  are processed in one sorted stream (map-side the union is a zero-cost
  concat).  Inclusive ties resolve right-before-left because right rows
  sort first (tag 0) at equal ts.  A hot key serializes within its
  partition — inherent to as-of semantics (the carry-forward is a prefix
  scan per key); if one key dominates at 100 TB, pre-split it by time range
  and stitch the boundary row, the standard prefix-scan shard trick.

Right-side duplicate timestamps are made deterministic by keeping, per
(key, ts), the row with the greatest tie-break column — otherwise which
duplicate wins depends on partition layout (and DuckDB's ASOF pick is
equally arbitrary).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
    tolerance_s: float | None = None,
    tie_break: str | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """Backward-inclusive as-of join.

    Returns every ``left`` row plus ``prefix + right_ts`` and
    ``prefix + c`` for each ``c`` in ``value_cols`` (all right columns
    except key/ts when None), null when no right row at-or-before exists
    (left-outer semantics, like DuckDB's ASOF LEFT JOIN).

    ``tolerance_s``: matches older than this many seconds before the left
    timestamp are nulled out (pandas ``merge_asof(tolerance=...)``).
    ``tie_break``: right column deciding equal-(key, ts) duplicates (max
    wins); required for determinism when right can hold duplicate
    timestamps per key.
    """
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (by, right_ts)]
    r = right
    if tie_break is not None:
        w_dup = Window.partitionBy(by, right_ts).orderBy(F.desc(tie_break))
        r = (
            r.withColumn("_dup_rn", F.row_number().over(w_dup))
            .where(F.col("_dup_rn") == 1)
            .drop("_dup_rn")
        )
    carried = [F.col(c).alias(f"{prefix}{c}") for c in value_cols] + [
        F.col(right_ts).alias(f"{prefix}{right_ts}")
    ]
    lcols = [c for c in left.columns if c != by]
    r_tagged = r.select(
        F.col(by),
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_tag"),
        *carried,
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
    )
    l_tagged = left.select(
        F.col(by),
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_tag"),
        *[
            F.lit(None).cast(r.schema[c].dataType).alias(f"{prefix}{c}")
            for c in value_cols
        ],
        F.lit(None).cast(r.schema[right_ts].dataType).alias(f"{prefix}{right_ts}"),
        *[F.col(c) for c in lcols],
    )
    # right rows first at equal _t (tag 0 < 1) → inclusive match
    w = (
        Window.partitionBy(by)
        .orderBy("_t", "_tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = r_tagged.unionByName(l_tagged).select(
        "*",
        *[
            F.last(f"{prefix}{c}", ignorenulls=True).over(w).alias(f"_f_{c}")
            for c in value_cols + [right_ts]
        ],
    )
    out_cols = [F.col(c) for c in left.columns if c != by] + [F.col(by)]
    keep = filled.where(F.col("_tag") == 1)
    if tolerance_s is not None:
        stale = (
            F.col("_t").cast("double") - F.col(f"_f_{right_ts}").cast("double")
        ) > float(tolerance_s)
        sel = [
            F.when(stale, F.lit(None)).otherwise(F.col(f"_f_{c}")).alias(f"{prefix}{c}")
            for c in value_cols + [right_ts]
        ]
    else:
        sel = [F.col(f"_f_{c}").alias(f"{prefix}{c}") for c in value_cols + [right_ts]]
    return keep.select(*out_cols, *sel)
