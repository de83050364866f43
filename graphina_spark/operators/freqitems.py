"""Corpus-wide frequent tokens via two-pass Misra–Gries heavy hitters.

The exact way to list every token whose corpus frequency is at least
num/den of all tokens is a full groupBy over every token occurrence —
a 10^12-row shuffle at crawl scale, almost all of it spent hashing
singletons that can never qualify.  The classic sketch answer
(Misra–Gries 1982; mergeable-summary form Agarwal et al., PODS 2012)
bounds the state at ``k`` counters per partition and never shuffles raw
occurrences:

  pass 1  mapInPandas: each input partition folds the *exact*
          value_counts of each Arrow batch into a k-counter summary
          (add counts, then subtract the (k+1)-th largest and drop
          non-positive — the mergeable shrink).  A summary undercounts
          any token by at most n_i/(k+1) of that partition's n_i
          occurrences, so every token with global count
          > N·num/den is guaranteed to survive in at least one
          partition's summary when k+1 ≥ den/num (pigeonhole).
          Output: ≤ k·P candidate tokens — kilobytes, not terabytes.
  pass 2  exact counts of the candidates only: occurrences semi-join
          the broadcast candidate set, then a groupBy whose key
          cardinality is ≤ k·P.  The threshold filter
          cnt·den ≥ N·num is integer arithmetic — no float compare —
          so the result is EXACTLY the φ-heavy set with exact counts.

The final output is independent of partitioning (the candidate union is
always a superset of the true heavy set; pass 2 is exact), which makes
it gate-able against a plain DuckDB GROUP BY/HAVING oracle
(oracles_text.py::frequent_tokens_sql) even though the intermediate
sketches are partition-dependent.

k defaults to 2·den/num — twice the guarantee minimum, so ties at the
threshold keep headroom.  No reference analogue (graphina is a graph
library); this is training-data-pipeline surface: vocabulary pruning,
boilerplate/stopword discovery, hot-token skew probes before a join.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_shrink(counts: dict, k: int) -> None:
    """In-place mergeable Misra–Gries shrink to at most k entries:
    subtract the (k+1)-th largest count from every entry, drop ≤ 0."""
    if len(counts) <= k:
        return
    pivot = sorted(counts.values(), reverse=True)[k]
    for t in [t for t, c in counts.items() if c <= pivot]:
        del counts[t]
    for t in counts:
        counts[t] -= pivot


def mg_candidates(occurrences: DataFrame, k: int, col: str = "token") -> DataFrame:
    """Per-partition k-counter Misra–Gries sketch over an occurrence
    frame; returns the distinct union of surviving candidate tokens
    (≤ k per input partition).  Superset guarantee: contains every token
    with global count > N/(k+1)."""

    def sketch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts: dict = {}
        for pdf in batches:
            # exact vectorized batch counts folded via the mergeable rule —
            # per-item Python loops would be the slow path
            for tok, c in pdf[col].value_counts().items():
                counts[tok] = counts.get(tok, 0) + int(c)
            _mg_shrink(counts, k)
        yield pd.DataFrame({col: list(counts)})

    return occurrences.mapInPandas(sketch, f"{col} string").distinct()


def frequent_tokens(
    documents: DataFrame,
    num: int = 1,
    den: int = 1000,
    k: int | None = None,
    text_col: str = "text",
) -> DataFrame:
    """(token, cnt): every token whose corpus occurrence count is
    ≥ (num/den)·N where N = total token occurrences — exact counts,
    found without ever shuffling raw occurrences (see module docstring).
    """
    from graphina_spark.functions.textstats import token_count, tokens_col

    if not (0 < num < den):
        raise ValueError("require 0 < num < den (threshold fraction in (0,1))")
    if k is None:
        k = 2 * den // num
    if (k + 1) * num < den:
        raise ValueError(f"k={k} too small for num/den={num}/{den}: need k+1 >= den/num")

    occ = documents.select(F.explode(tokens_col(F.col(text_col))).alias("token"))
    cand = mg_candidates(occ, k)
    total = documents.agg(
        F.coalesce(F.sum(token_count(F.col(text_col))), F.lit(0)).alias("n")
    )
    return (
        occ.join(F.broadcast(cand), "token")
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
        .crossJoin(F.broadcast(total))
        .where(F.col("cnt") * F.lit(den) >= F.col("n") * F.lit(num))
        .select("token", "cnt")
    )
