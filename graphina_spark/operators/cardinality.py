"""Approximate distinct counting per key — Flajolet-Martin register sketches.

The keyed form of the ANF machinery (operators/distmetrics.py): estimate
``count(DISTINCT val)`` per group in ONE pass with O(k) longs of state per
key, instead of the exact ``groupBy(key, val)`` double shuffle whose first
stage materializes every distinct pair.  At web scale this is the standard
"distinct URLs per host / distinct hosts linking to each host" readout
(Broder's crawl reports; Spark's own approx_count_distinct is the same idea
with HyperLogLog++ — reimplemented here on the *portable* hash family so a
DuckDB twin can pin every register bit, which Spark's builtin cannot).

Per value, register j sets the single bit 2^tz where tz = number of
trailing zeros of the affine+double-quadratic scrambled hash (geometric);
per key, registers merge with ``bit_or`` (one map-side-combinable shuffle).
Readouts per key:

- ``register_mass`` = Σ_j lzb_j — INTEGER, the oracle-gated quantity (pins
  the sketch bit-exactly with zero float-aggregation risk),
- ``approx_distinct`` = 2^(mean_j lzb_j) / φ — the FM §3 estimate, a
  deterministic scalar function of the same registers.

Scale shape: one projection (k register columns per row) + one
``groupBy(key)`` with ``bit_or`` partial aggregation — map-side combine
collapses each partition to one register row per key before the exchange,
so the shuffle moves O(keys × k) longs regardless of row count.  Skewed
keys are absorbed by the same combine (a hot key's billion rows still
reduce to one row per map task).

DuckDB twin: oracles.py::host_distinct_web_sql.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphina_spark.operators.distmetrics import (
    ANF_A,
    ANF_B,
    ANF_P,
    ANF_PHI,
    ANF_REG_BITS,
)


def _register_cols(val: F.Column, k: int) -> list:
    """One FM register column per hash: m_j = 2^(trailing zeros of h_j(val)),
    identical scramble to distmetrics._init_registers (affine + two
    quadratic rounds mod 2^31−1; intermediates < 2^62)."""
    cols = []
    for j in range(k):
        h1 = ((val + 1) * F.lit(ANF_A[j]) + F.lit(ANF_B[j])) % F.lit(ANF_P)
        h2 = (h1 * h1 + F.lit(ANF_A[j])) % F.lit(ANF_P)
        h = (h2 * h2 + F.lit(ANF_B[j])) % F.lit(ANF_P)
        low = h.bitwiseAND(-h)
        tz = F.when(h == 0, F.lit(ANF_REG_BITS - 1)).otherwise(
            F.least(
                F.round(F.log2(low.cast("double"))).cast("int"),
                F.lit(ANF_REG_BITS - 1),
            )
        )
        cols.append(F.pow(F.lit(2.0), tz.cast("double")).cast("long").alias(f"m{j}"))
    return cols


def approx_distinct_by_key(
    df: DataFrame, key_col: str, val_col: str, k: int = 8
) -> DataFrame:
    """(key, register_mass, approx_distinct) — FM distinct-value estimate of
    ``val_col`` (integral) per ``key_col`` group, one pass."""
    if k > len(ANF_A):
        raise ValueError(f"k ≤ {len(ANF_A)} supported (hash family size)")
    reg = df.select(
        F.col(key_col).alias("key"),
        *_register_cols(F.col(val_col).cast("long"), k),
    )
    merged = reg.groupBy("key").agg(
        *[F.bit_or(f"m{j}").alias(f"m{j}") for j in range(k)]
    )

    def _lzb(m):
        return F.round(
            F.log2(F.bitwise_not(m).bitwiseAND(m + 1).cast("double"))
        ).cast("long")

    bits = [_lzb(F.col(f"m{j}")) for j in range(k)]
    mass = sum(bits).cast("long")
    est = F.pow(F.lit(2.0), sum(bits) / F.lit(float(k))) / F.lit(ANF_PHI)
    return merged.select(
        "key",
        mass.alias("register_mass"),
        F.round(est, 6).alias("approx_distinct"),
    )
