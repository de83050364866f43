"""Count–min sketch over corpus token streams.

Cormode & Muthukrishnan, *An improved data stream summary: the count-min
sketch and its applications* (J. Algorithms 2005): a depth×width integer
matrix; token t increments cell (j, h_j(t)) for each of the ``depth``
independent hash rows; the point estimate is the **minimum** over rows,
which never under-counts and over-counts by ≤ ε·N with probability 1−δ for
width = ⌈e/ε⌉, depth = ⌈ln 1/δ⌉.

Complements the exact-but-candidate-bounded Misra–Gries heavy hitters
(operators/freqitems.py): MG answers "which tokens are frequent", CMS
answers *point queries for any token* in O(depth) with O(depth·width)
state — the right tool when the probe set isn't known up front (e.g.
joining a blocklist's counts against a 100 TB corpus without re-scanning).

Scale shape: one explode → depth rows per token (a projection, not a
shuffle) → one groupBy((r, c)) with map-side partial aggregation — the
sketch *is* the natural "mergeable summary" (cell-wise sum), so partition
partials combine exactly like MG's fold.  The materialized sketch is
depth·width rows regardless of corpus size; estimates are a broadcast
lookup join against it.

Hash rows, engine-portable: h_j(t) = conv(md5('<salt>:j:'‖t)[:8], 16, 10)
mod width — the repo's standard md5-prefix integer (the DuckDB twin spells
the hex→int as the fixed-order digit sum, oracles_text.py).

Extension beyond the reference (no sketches in habedi/graphina).
Tokenization is the frozen convention of functions/textstats.py:36.
DuckDB twins: oracles_text.py::cms_sketch_sql / cms_estimates_sql.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphina_spark.functions.textstats import tokens_col

DEFAULT_DEPTH = 4
DEFAULT_WIDTH = 64


def _tokens(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return df.select(
        F.col(id_col).alias("id"), F.explode(tokens_col(F.col(text_col))).alias("tok")
    )


def _cell(row: int, width: int, salt: str):
    """Hash column index of ``tok`` for sketch row ``row``."""
    hexint = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{salt}:{row}:"), F.col("tok"))), 1, 8),
        16,
        10,
    ).cast("long")
    return (hexint % width).cast("int")


def cms_sketch(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    depth: int = DEFAULT_DEPTH,
    width: int = DEFAULT_WIDTH,
    salt: str = "cms",
) -> DataFrame:
    """(r: int, c: int, cnt: long) — the sketch matrix as sparse cell rows
    (absent cell = 0).  Deterministic: same corpus ⇒ identical cells, in
    any engine, under any partitioning."""
    toks = _tokens(df, id_col, text_col)
    rows = None
    for j in range(depth):
        part = toks.select(F.lit(j).alias("r"), _cell(j, width, salt).alias("c"))
        rows = part if rows is None else rows.unionAll(part)
    return rows.groupBy("r", "c").agg(F.count("*").alias("cnt"))


def cms_estimates(
    df: DataFrame,
    probes: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    depth: int = DEFAULT_DEPTH,
    width: int = DEFAULT_WIDTH,
    salt: str = "cms",
) -> DataFrame:
    """(token: string, est: long) — CMS point estimates for every token in
    ``probes`` (a one-column ``token`` frame).  est ≥ true count always;
    probes never seen estimate whatever their cells collected (possibly 0).
    The sketch broadcasts (depth·width rows) — the probe side is never
    shuffled."""
    sketch = cms_sketch(df, id_col, text_col, depth, width, salt)
    p = probes.select("token", F.col("token").alias("tok"))
    est = None
    for j in range(depth):
        cellj = p.select("token", F.lit(j).alias("r"), _cell(j, width, salt).alias("c"))
        est = cellj if est is None else est.unionAll(cellj)
    return (
        est.join(F.broadcast(sketch), ["r", "c"], "left")
        .groupBy("token")
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("est"))
    )
