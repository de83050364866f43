"""Distributed Bloom filter over vertex/URL keys — the approximate-
membership sketch a 10^12-page crawl frontier needs ("have we already
enqueued this url?") where an exact distinct-join would shuffle the whole
frontier every cycle.

The reference has no sketch surface; the semantics here are the textbook
Bloom filter (Bloom 1970; Broder & Mitzenmacher 2004 survey) built from
the repo's *portable* affine + double-quadratic hash family
(operators/distmetrics.py ANF constants), so the filter's bit array — and
therefore every false positive — is bit-identical in Spark and DuckDB and
the gate can compare raw answers instead of rates.

Scale shape:

- **Build** is one keyed aggregation: each key emits k ``(word_idx,
  mask)`` rows, ``bit_or`` folds them map-side; the result is
  ``m_bits/31`` words — kilobytes, independent of key count.
- **Probe** broadcasts the word table (it is tiny by construction) and
  stays embarrassingly parallel: per-probe k point lookups, one
  ``bool_and`` per id. No shuffle touches the full probe set beyond the
  final per-id agg, which combines map-side.
- At production scale the array is sized m ≈ -n·ln(p)/ln(2)² and split
  into per-partition blocked filters (one filter per key range) so each
  executor holds only its block — the word-table schema here (word_idx →
  word) IS that layout; m_bits is the only knob.

31 bits per word keep every mask and OR-fold positive in a signed 64-bit
lane (DuckDB BIGINT is checked; no unsigned in either engine).

DuckDB twin: oracles.py::bloom_seen_sql.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphina_spark.operators.distmetrics import ANF_A, ANF_B, ANF_P

WORD_BITS = 31
M_BITS = 1 << 16
N_HASHES = 4


def _mask(bit: F.Column) -> F.Column:
    """2^(bit % WORD_BITS) exactly — powers of two ≤ 2^30 are exact doubles
    (F.shiftleft needs a literal shift count, so shift via pow)."""
    return F.pow(F.lit(2.0), (bit % WORD_BITS).cast("double")).cast("long")


def _bit_pos(id_col: F.Column, j: int, m_bits: int) -> F.Column:
    """Portable hash j of a key → bit position in [0, m_bits)."""
    h1 = ((id_col + 1) * F.lit(ANF_A[j]) + F.lit(ANF_B[j])) % F.lit(ANF_P)
    h2 = (h1 * h1 + F.lit(ANF_A[j])) % F.lit(ANF_P)
    return ((h2 * h2 + F.lit(ANF_B[j])) % F.lit(ANF_P)) % F.lit(m_bits)


def bloom_build(
    keys: DataFrame,
    key_col: str = "id",
    m_bits: int = M_BITS,
    k: int = N_HASHES,
) -> DataFrame:
    """(word_idx, word): the filter's 31-bit words, bit_or-folded."""
    if k > len(ANF_A):
        raise ValueError(f"k ≤ {len(ANF_A)} supported (hash family size)")
    pos = keys.select(
        F.explode(
            F.array(*[_bit_pos(F.col(key_col), j, m_bits) for j in range(k)])
        ).alias("bit")
    )
    return pos.select(
        (F.col("bit") / WORD_BITS).cast("long").alias("word_idx"),
        _mask(F.col("bit")).alias("mask"),
    ).groupBy("word_idx").agg(F.bit_or("mask").alias("word"))


def bloom_probe(
    probes: DataFrame,
    words: DataFrame,
    key_col: str = "id",
    m_bits: int = M_BITS,
    k: int = N_HASHES,
) -> DataFrame:
    """(id, hit): hit = every one of the k bits is set (false positives
    possible, false negatives impossible)."""
    pos = probes.select(
        F.col(key_col).alias("id"),
        F.posexplode(
            F.array(*[_bit_pos(F.col(key_col), j, m_bits) for j in range(k)])
        ).alias("j", "bit"),
    ).select(
        "id",
        (F.col("bit") / WORD_BITS).cast("long").alias("word_idx"),
        _mask(F.col("bit")).alias("mask"),
    )
    joined = pos.join(F.broadcast(words), "word_idx", "left")
    checked = joined.select(
        "id",
        (
            F.coalesce(F.col("word"), F.lit(0)).bitwiseAND(F.col("mask")) != 0
        ).alias("set"),
    )
    return checked.groupBy("id").agg(F.bool_and("set").alias("hit"))


def bloom_membership(
    universe: DataFrame,
    seen_mod: int = 2,
    key_col: str = "id",
    m_bits: int = M_BITS,
    k: int = N_HASHES,
) -> DataFrame:
    """Gate composition: build from the ``id % seen_mod == 0`` subset,
    probe every id.  (id, member, hit) — member is ground truth; hit ⊇
    member exactly, and every false positive is hash-deterministic.
    """
    seen = universe.where(F.col(key_col) % seen_mod == 0)
    words = bloom_build(seen, key_col, m_bits, k)
    out = bloom_probe(universe, words, key_col, m_bits, k)
    return out.select(
        "id", (F.col("id") % seen_mod == 0).alias("member"), "hit"
    )
