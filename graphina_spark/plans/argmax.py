"""Deterministic per-key argmax without a sort.

The LPA-family superstep kernels all need, per round, "for every vertex
take the (score, tie) pair that is max by (score desc, tie asc)".  The
obvious Spark formulations are NOT equal at scale:

1. ``row_number`` window — an Exchange + a full SORT of the candidate
   frame every round.  The sort is memory-bandwidth-bound and was the
   measured scaling bottleneck of the LPA kernel (0.47 efficiency
   local[2]→local[8] on the 32M-edge harness vs 0.86 for the sort-free
   PageRank kernel on the same box).
2. ``max(struct(score, -tie))`` — looks sort-free, but a struct is not a
   mutable aggregation-buffer type, so Spark silently plans
   **SortAggregate** (with a partial-side sort too) — measured *slower*
   than the window (41 s vs 24 s per superstep at local[2]).
   (``max_by`` hash-aggregates only while both operands are primitive,
   and its behavior on ordering ties is undefined — unusable for a
   pinned deterministic tie-break.)
3. **packed-long max** (:func:`argmax_long` strategy ``packed``) — pack
   both orderings into one long,

       packed = score · M + (M − 1 − tie),   M = next_pow2(max_tie + 1)

   whose natural max is exactly argmax by (score desc, tie asc).  A long
   buffer keeps HashAggregateExec + whole-stage codegen + map-side
   partial combine; no sort anywhere.  Exact iff
   ``max_score · M + M − 1 < 2⁶³`` — the caller passes per-kernel bounds
   (vertex-id / degree / weighted-degree maxima, computed ONCE per
   kernel invocation, valid for every round) and the strategy engages
   only when they fit.
4. **max-then-min join** (:func:`argmax_long` strategy ``join``, and
   :func:`argmax_any` for non-integer scores) — two HashAggregates and
   one equi-join: per key take ``max(score)``, join back on
   ``(key, score == max)``, take ``min(tie)``.  Sort-free at ANY scale
   and any score type; both aggregations partial-combine map-side and
   the join + second aggregation reuse the first Exchange's
   ``hashpartitioning(key)``.  This — not the window — is the fallback
   when the packed bounds don't fit (10¹²-vertex ids exceed any 63-bit
   split that also leaves room for the score).

``strategy=None`` picks ``packed`` when the supplied bounds fit, else
``join``.  ``window`` is kept as the reference implementation the
equality tests compare against.
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
            out_tie: str) -> DataFrame:
    cols: list[Column | str] = [key, tie_col.alias(out_tie)]
    if out_score is not None:
        cols.insert(1, score_col.alias(out_score))
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
    non-negative longs bounded by ``max_score`` / ``max_tie`` (caller
    verifies ONCE per kernel invocation — see module docstring)."""
    if strategy is None:
        strategy = "packed" if _fits(max_score, max_tie) else "join"
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
    if strategy == "join":
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
) -> DataFrame:
    """Sort-free argmax by (``score`` desc, ``tie`` asc) for ANY orderable
    score type (doubles included): max-then-min join, two HashAggregates
    sharing one Exchange.  Ties on ``score`` compare the exact stored
    values on both sides of the equi-join, so the result is identical to
    the window formulation (NaN scores are the caller's bug).  ``carry``
    columns MUST be constant per key; they ride through the aggregation."""
    mx = df.groupBy(key).agg(F.max(score).alias("_ms"))
    out = (
        df.join(mx, [key])
        .where(F.col(score) == F.col("_ms"))
        .groupBy(key)
        # _ms (and carry cols) are constant within a key, so max() just
        # carries them through
        .agg(
            F.min(tie).alias("_mt"),
            F.max("_ms").alias("_msv"),
            *[F.max(c).alias(c) for c in carry or []],
        )
    )
    cols: list[Column | str] = [key]
    if out_score is not None:
        cols.append(F.col("_msv").alias(out_score))
    cols.append(F.col("_mt").alias(out_tie))
    cols.extend(carry or [])
    return out.select(*cols)
