"""Streaming count–min sketch over an unbounded token stream.

The CMS (operators/cms.py, Cormode–Muthukrishnan 2005) is a *mergeable
summary*: cells combine by plain addition.  That makes its streaming twin a
NATIVE Structured Streaming aggregation — explode each arriving token into
its ``depth`` (r, c) hash cells (a projection, no custom state code) and
let the engine's streaming groupBy((r, c)).count() carry the cell matrix
across micro-batches.  State is bounded at depth×width rows REGARDLESS of
stream length or vocabulary size — the whole point of sketching an
unbounded crawl — and the state-store updates are the engine's own
fault-tolerant aggregation state (checkpointable, exactly-once), not a
hand-rolled applyInPandasWithState fold.  Contrast streaming/
heavyhitters.py, where the MG shrink is NOT expressible as an associative
aggregation and the custom stateful op is genuinely required.

Because both the hash cells and the addition are the batch operator's,
the streamed sketch after n micro-batches is BIT-IDENTICAL to
operators/cms.py::cms_sketch over the union of those batches — pinned by
tests/test_streaming_cms.py — so every batch guarantee (est ≥ true,
overcount ≤ εN w.p. 1−δ) transfers to the stream.

Point estimates against the live sketch: snapshot the complete-mode sink
(depth×width rows) and reuse the batch probe join
(operators/cms.py::cms_estimates' broadcast-min lookup).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphina_spark.operators.cms import DEFAULT_DEPTH, DEFAULT_WIDTH, _cell


def streaming_cms_cells(
    tokens: DataFrame,
    token_col: str = "token",
    depth: int = DEFAULT_DEPTH,
    width: int = DEFAULT_WIDTH,
    salt: str = "cms",
) -> DataFrame:
    """Streaming (r, c, cnt) cell frame for a streaming ``token_col`` frame.
    Run with ``outputMode("complete")`` (the sketch is tiny) or "update"
    (emit only touched cells per batch).  Identical hash cells to the batch
    sketch — one stacked projection per depth row, then ONE streaming
    aggregation."""
    toks = tokens.select(F.col(token_col).alias("tok"))
    rows = None
    for j in range(depth):
        part = toks.select(F.lit(j).alias("r"), _cell(j, width, salt).alias("c"))
        rows = part if rows is None else rows.unionAll(part)
    return rows.groupBy("r", "c").agg(F.count("*").alias("cnt"))


def cms_point_estimates(
    spark_cells: DataFrame,
    probes: DataFrame,
    depth: int = DEFAULT_DEPTH,
    width: int = DEFAULT_WIDTH,
    salt: str = "cms",
) -> DataFrame:
    """(token, est) — batch probe lookup against a (snapshotted) cell frame:
    min over the token's depth cells, absent cell = 0.  The cell frame
    broadcasts; probes are never shuffled."""
    p = probes.select("token", F.col("token").alias("tok"))
    est = None
    for j in range(depth):
        cellj = p.select("token", F.lit(j).alias("r"), _cell(j, width, salt).alias("c"))
        est = cellj if est is None else est.unionAll(cellj)
    return (
        est.join(F.broadcast(spark_cells), ["r", "c"], "left")
        .groupBy("token")
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("est"))
    )
