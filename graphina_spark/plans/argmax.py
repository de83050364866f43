"""Deterministic per-key argmax without shuffling the full candidate frame.

The LPA-family superstep kernels all need, per round, "for every vertex
take the (score, tie) pair that is max by (score desc, tie asc)".  Four
value-identical formulations, radically different physical plans —
measured in ONE JVM per level over the identical cached input (LPA
superstep argmax, 32M-row symmetric adjacency, 24g heap, median of 3;
BENCH/argmax_bench.py — single-box cross-JVM runs swing ±50%, so only
within-JVM comparisons are trustworthy):

    formulation                  local[2]   local[8]   local[32]
    row_number window              44.9 s     14.3 s    see BENCH
    max(struct(score, -tie))        7.9 s      3.5 s    results_
    packed-long max (this module)   7.7 s      3.0 s    argmax.json
    max-then-min join              65.9 s     21.3 s

What actually matters is PARTIAL AGGREGATION, not sort-vs-hash: the two
aggregate formulations combine map-side, so the Exchange carries at most
|distinct keys| rows per map partition, while the window shuffles AND
sorts every candidate row, and the max-then-min join pays two full
exchanges plus a join.  ``max(struct)`` does plan SortAggregate (a
struct is not a mutable aggregation buffer) — but the sort it adds is
per-map-partition over partially-combined data, a ~15% tax vs the
packed-long HashAggregate, not a disqualifier.  An earlier revision of
this module recommended the max-then-min join as the at-scale fallback
based on cross-JVM A/B timings; the controlled bench shows the join is
strictly the WORST formulation and it has been removed.

Strategy choice (``argmax_long`` with ``strategy=None``):

- **packed** when ``score`` and ``tie`` are non-negative longs whose
  caller-supplied bounds fit 63 bits: pack both orderings into one long,
  ``packed = score·M + (M−1−tie)``, ``M = next_pow2(max_tie+1)``, whose
  natural max is exactly argmax by (score desc, tie asc).  A long buffer
  keeps HashAggregateExec + whole-stage codegen.  Bounds are per-kernel
  invariants (count ≤ max degree, label ∈ vertex ids, partition < k) —
  compute them once per kernel invocation, not per round.
- **struct** otherwise (float scores, unbounded values):
  ``max(struct(score, -tie, *carry))`` — lexicographic struct max,
  SortAggregate with map-side partial combine.
- **window** is kept only as the reference implementation the equality
  tests compare against.

``max_by`` was rejected: it hash-aggregates only on primitive operands
and its behavior on ordering ties is undefined (partition-order
dependent) — unusable under the determinism contract.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

P31 = 1 << 31


def _fits(max_score: int, max_tie: int) -> int | None:
    """Tie modulus M if (max_score, max_tie) packs losslessly into a
    63-bit non-negative long, else None."""
    if max_score < 0 or max_tie < 0:
        return None
    m = 1
    while m <= max_tie:
        m <<= 1
    return m if (max_score + 1) * m <= (1 << 63) else None


def _select(out, key: str, score_col, tie_col, out_score: str | None,
            out_tie: str, extra=()) -> DataFrame:
    cols: list[Column | str] = [key, tie_col.alias(out_tie)]
    if out_score is not None:
        cols.insert(1, score_col.alias(out_score))
    cols.extend(extra)
    return out.select(*cols)


def argmax_long(
    df: DataFrame,
    key: str,
    score: str,
    tie: str,
    out_score: str | None = None,
    out_tie: str = "best",
    max_score: int = P31 - 1,
    max_tie: int = P31 - 1,
    strategy: str | None = None,
) -> DataFrame:
    """(key, [out_score], out_tie): per ``key``, the row max by
    (``score`` desc, ``tie`` asc).  ``score`` and ``tie`` must be
    non-negative longs bounded by ``max_score`` / ``max_tie`` for the
    packed strategy (caller verifies ONCE per kernel invocation — see
    module docstring); ``struct`` and ``window`` have no bounds."""
    if strategy is None:
        strategy = "packed" if _fits(max_score, max_tie) else "struct"
    if strategy == "packed":
        m = _fits(max_score, max_tie)
        if m is None:
            raise ValueError(
                f"packed argmax bounds do not fit 63 bits: "
                f"max_score={max_score} max_tie={max_tie}"
            )
        packed = F.col(score) * F.lit(m) + (F.lit(m - 1) - F.col(tie))
        agg = df.groupBy(key).agg(F.max(packed).alias("_k"))
        return _select(
            agg, key,
            F.shiftright(F.col("_k"), m.bit_length() - 1),
            F.lit(m - 1) - F.col("_k").bitwiseAND(F.lit(m - 1)),
            out_score, out_tie,
        )
    if strategy == "struct":
        return argmax_any(df, key, score, tie, out_score, out_tie)
    if strategy == "window":
        w = Window.partitionBy(key).orderBy(F.desc(score), F.asc(tie))
        out = df.withColumn("_rn", F.row_number().over(w)).where(
            F.col("_rn") == 1
        )
        return _select(out, key, F.col(score), F.col(tie), out_score, out_tie)
    raise ValueError(f"unknown argmax strategy: {strategy}")


def argmax_any(
    df: DataFrame,
    key: str,
    score: str,
    tie: str,
    out_score: str | None = None,
    out_tie: str = "best",
    carry: list[str] | None = None,
    minimize: bool = False,
) -> DataFrame:
    """Sort-free-shuffle argmax by (``score`` desc, ``tie`` asc) for ANY
    orderable score type (doubles included): lexicographic struct
    max/min with map-side partial combine.  ``tie`` must be numeric (it
    is negated to flip its ordering under max).  ``minimize=True`` gives
    argmin by (``score`` asc, ``tie`` asc).  ``carry`` columns ride as
    trailing struct fields; they must be constant per (key, score, tie)
    — with (key, tie) unique per row (true for every kernel here) they
    can never influence the comparison."""
    carry = carry or []
    if minimize:
        fields = [F.col(score), F.col(tie).alias("_t")]
        agg = F.min
        tie_out = F.col("_m._t")
    else:
        fields = [F.col(score), (-F.col(tie)).alias("_nt")]
        agg = F.max
        tie_out = -F.col("_m._nt")
    fields.extend(F.col(c) for c in carry)
    out = df.groupBy(key).agg(agg(F.struct(*fields)).alias("_m"))
    return _select(
        out, key, F.col(f"_m.{score}"), tie_out, out_score, out_tie,
        extra=[F.col(f"_m.{c}").alias(c) for c in carry],
    )


def argmin_any(
    df: DataFrame,
    key: str,
    score: str,
    tie: str,
    out_score: str | None = None,
    out_tie: str = "best",
    carry: list[str] | None = None,
) -> DataFrame:
    """Argmin by (``score`` asc, ``tie`` asc) — see :func:`argmax_any`."""
    return argmax_any(df, key, score, tie, out_score, out_tie, carry,
                      minimize=True)
