"""Streaming Misra–Gries heavy hitters via ``applyInPandasWithState``.

:func:`streaming_heavy_hitters` maintains, per group key and ACROSS
micro-batches, a k-counter Misra–Gries summary of a token column — the
streaming twin of operators/freqitems.py (same mergeable fold: exact
vectorized batch value_counts merged into the summary, then the
(k+1)-th-largest shrink).  After processing n items for a key, every
token with true count > n/(k+1) is guaranteed present, and each
estimate undercounts by at most n/(k+1) — emitted as ``err_bound`` so
downstream consumers can threshold honestly (est + err_bound is an
upper bound, est a lower bound).

State per key is O(k) regardless of stream length — the property that
makes this safe on an unbounded crawl where a groupBy(token) would
accumulate the full vocabulary.  Keys idle past ``ttl_minutes`` are
dropped via processing-time timeout (same bounded-state posture as
streaming/stateful.py::running_host_stats).

No reference analogue (batch-only library); training-pipeline surface:
per-host hot-token monitors, live boilerplate detection on an arriving
crawl.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from graphina_spark.operators.freqitems import _mg_shrink

STATE_SCHEMA = "toks array<string>, cnts array<long>, n long"
OUTPUT_SCHEMA = (
    "key string, token string, est long, n long, err_bound long"
)


def streaming_heavy_hitters(
    tokens: DataFrame,
    k: int = 32,
    key_col: str = "key",
    token_col: str = "token",
    ttl_minutes: int = 60,
) -> DataFrame:
    """(key, token) stream → per-key MG summary rows each batch:
    (key, token, est, n, err_bound) with err_bound = n // (k + 1)."""
    if k < 1:
        raise ValueError("k must be >= 1")

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (grp,) = key
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            toks, cnts, n = state.get
            counts = dict(zip(toks, cnts))
        else:
            counts, n = {}, 0
        for pdf in pdfs:
            n += len(pdf)
            for tok, c in pdf[token_col].value_counts().items():
                counts[tok] = counts.get(tok, 0) + int(c)
            _mg_shrink(counts, k)
        items = sorted(counts.items())
        state.update(([t for t, _ in items], [c for _, c in items], n))
        state.setTimeoutDuration(ttl_minutes * 60 * 1000)
        yield pd.DataFrame(
            {
                "key": grp,
                "token": [t for t, _ in items],
                "est": [c for _, c in items],
                "n": n,
                "err_bound": n // (k + 1),
            }
        )

    return tokens.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
