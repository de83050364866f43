"""Winnowing document fingerprints (MOSS-style local sampling of k-grams).

Schleimer, Wilkerson & Aiken, *Winnowing: Local Algorithms for Document
Fingerprinting* (SIGMOD 2003): slide a window of ``w`` consecutive k-gram
hashes over each document and keep, per window, the **rightmost minimal**
hash.  The selected set is a deterministic, position-robust sample of the
document — guaranteed to share fingerprints with any document that shares a
run of ``w + k - 1`` tokens, at ~2/(w+1) sampling density.  It is the
standard overlap detector (MOSS) and the span-level complement to
operators/substrings.py (which scores *every* position; winnowing samples
positions so the per-doc fingerprint set is small enough to index).

Portable hash convention: a k-gram's hash is its md5 hex digest compared
lexicographically — the same engine-neutral ordering minhash_signature
(functions/textstats.py:110) relies on.  The rightmost-min tie-break is
encoded into the comparison key itself: ``md5 || lpad(10^9 - pos)`` — the
32-char digest dominates, and on equal digests the *larger* position wins
(smaller ``10^9 - pos``), so one ``min()`` over the window frame returns the
winnowing selection with no argmin plumbing.  Both engines compute the
identical string min, so parity is exact (no floats anywhere).

Scale shape: the position table is corpus-token-count rows; selection is a
per-document ordered window (``PARTITION BY id ORDER BY pos ROWS BETWEEN
CURRENT ROW AND w-1 FOLLOWING``) — documents are bounded (a page, not a
corpus), so the per-partition sort is bounded and the work is one keyed
shuffle.  The cross-doc share count is one ``groupBy(hash)`` over the
*selected* fingerprints (~2/(w+1) of positions), never a pair join: a
fingerprint shared by M docs costs one reduce cell of M, not M² rows.

Extension beyond the reference (habedi/graphina has no text pipeline);
tokenization is the frozen convention of functions/textstats.py:36; DuckDB
twin: oracles_text.py::winnow_fingerprint_sql.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from graphina_spark.functions.textstats import tokens_col

DEFAULT_K = 5
DEFAULT_W = 4

#: positions are encoded as 10^9 - pos into the composite min-key; documents
#: are bounded far below this (a 4 GB page is ~10^9 tokens).
_POS_BASE = 1_000_000_000


def winnow_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = DEFAULT_K,
    w: int = DEFAULT_W,
) -> DataFrame:
    """(id, pos, g): the winnowing-selected fingerprints of each document.

    ``pos`` is the 1-based token position of the selected k-gram, ``g`` its
    md5 hex digest.  Documents with fewer than ``k + w - 1`` tokens (no full
    window) emit no rows — the paper's contract (no guarantee below the
    guarantee threshold ``t = w + k - 1``).
    """
    toks = df.select(F.col(id_col).alias("id"), tokens_col(F.col(text_col)).alias("t"))
    grams = toks.select(
        "id",
        F.when(
            F.size("t") >= k,
            F.expr(
                f"transform(sequence(1, size(t) - {k} + 1),"
                f" i -> md5(array_join(slice(t, i, {k}), ' ')))"
            ),
        )
        .otherwise(F.expr("CAST(array() AS array<string>)"))
        .alias("gs"),
    )
    pos = grams.select(
        "id", F.posexplode("gs").alias("off", "g")
    ).select("id", (F.col("off") + 1).alias("pos"), "g")
    # composite min-key: digest first (lexicographic = hash order), then the
    # DESCENDING-encoded position so equal digests resolve to the rightmost.
    key = F.concat(
        F.col("g"), F.lpad((F.lit(_POS_BASE) - F.col("pos")).cast("string"), 10, "0")
    )
    frame = (
        Window.partitionBy("id").orderBy("pos").rowsBetween(0, w - 1)
    )
    n = Window.partitionBy("id")
    sel = (
        pos.withColumn("_key", key)
        .withColumn("_win", F.min("_key").over(frame))
        .withColumn("_n", F.count("*").over(n))
        # only full windows select (window starts 1 .. n_grams - w + 1)
        .where(F.col("pos") <= F.col("_n") - w + 1)
        .select(
            "id",
            (F.lit(_POS_BASE) - F.substring("_win", 33, 10).cast("long")).alias("pos"),
            F.substring("_win", 1, 32).alias("g"),
        )
        .distinct()
    )
    return sel


def fingerprint_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = DEFAULT_K,
    w: int = DEFAULT_W,
) -> DataFrame:
    """(id, n_fingerprints, n_shared, shared_frac) per document.

    ``n_shared`` counts this document's fingerprints whose digest is also
    selected by at least one *other* document — the winnowing overlap signal
    a dedup/plagiarism pass thresholds on.  All-integer until the final
    ratio.
    """
    fp = winnow_fingerprints(df, id_col, text_col, k, w)
    uniq = fp.select("id", "g").distinct()
    docs_per_g = uniq.groupBy("g").agg(F.count("*").alias("nd"))
    flagged = uniq.join(docs_per_g, "g").select(
        "id", (F.col("nd") >= 2).cast("long").alias("sh")
    )
    stats = flagged.groupBy("id").agg(
        F.count("*").alias("n_fingerprints"), F.sum("sh").alias("n_shared")
    )
    ids = df.select(F.col(id_col).alias("id")).distinct()
    return ids.join(stats, "id", "left").select(
        "id",
        F.coalesce("n_fingerprints", F.lit(0)).alias("n_fingerprints"),
        F.coalesce("n_shared", F.lit(0)).alias("n_shared"),
        F.round(
            F.when(
                F.col("n_fingerprints") > 0,
                F.col("n_shared") / F.col("n_fingerprints"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("shared_frac"),
    )
