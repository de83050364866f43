"""Z-order (Morton) curve layout for multi-dimensional file pruning.

The data-layout lever behind Delta/Iceberg ``OPTIMIZE ZORDER BY``: a table
range-partitioned or sorted by ONE column prunes files only on that
column; sorting by the bit-interleaved Morton code of TWO columns makes
every file a small rectangle in (x, y) space, so min/max file stats prune
on BOTH dimensions at once.  At 100 TB this is the difference between
scanning a full day of crawl for one host and touching two files.

``z_value(x, y, bits)`` is pure integer arithmetic — bit i of x lands at
position 2i, bit i of y at 2i+1 — built from closed-form ``((x >> i) & 1)
<< 2i`` terms, so the DuckDB twin (oracles.zorder_events_sql) computes the
identical codes and the layout is engine-reproducible.  Inputs are
clamped to ``bits`` (default 16 → 32-bit codes, BIGINT-safe).

The pruning win is pinned in tests/test_zorder.py: the same events
written through sources/snapshots.py as (a) z-sorted and (b) arrival-
ordered files, probed with a 2-d box via file stats — the z-sorted layout
prunes strictly more files on the second dimension.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_BITS = 16


def z_value(x: Column, y: Column, bits: int = DEFAULT_BITS) -> Column:
    """Morton code of two non-negative integer columns (clamped to
    ``bits`` bits each; 2·bits-bit result)."""
    cap = (1 << bits) - 1
    xc = F.least(F.greatest(x.cast("long"), F.lit(0)), F.lit(cap))
    yc = F.least(F.greatest(y.cast("long"), F.lit(0)), F.lit(cap))
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftright(xc, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(F.shiftright(yc, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def zorder_layout(
    df: DataFrame, x_col: str, y_col: str, bits: int = DEFAULT_BITS
) -> DataFrame:
    """``df`` sorted by the Morton code of (x_col, y_col) with the code in a
    ``z`` column — ready for a partitioned write whose per-file (x, y)
    min/max stats are tight rectangles.  The sort is the one global
    range-partitioned exchange every layout rewrite pays."""
    return df.withColumn("z", z_value(F.col(x_col), F.col(y_col), bits)).sortWithinPartitions(
        "z"
    ).sort("z")
