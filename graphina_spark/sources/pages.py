"""Deterministic synthetic web-page tables (the input_hint shape).

Authoritative input shape (BASELINE.json input_hint):
    pages(url: string, warc_ts: timestamp, html: binary, text: string,
          lang: string)

Two generators, both pure functions of their arguments (no RNG state, no
wall clock — splitmix64-style integer mixing only), built with Arrow-batched
``mapInPandas`` so page synthesis itself is distributed and vectorized:

``pages_from_ids``
    One page per vertex id with the SAME modular out-link rule as
    ``sources.derived.web_graph`` (3 affine multipliers + a hub rule, dangling
    ids have no anchors) but weightless.  End-to-end property: parsing these
    pages' html through functions/extract.py reproduces exactly the
    arithmetic edge set — which a DuckDB oracle recomputes with pure SQL, so
    the whole html → Arrow-UDF → edges ingestion path sits under the
    correctness gate.

``synth_pages``
    Bench-scale crawl with Zipf(theta)-skewed in-link targets (hub vertices,
    mirroring the reference harness's skew knob,
    /root/reference/comparisons/graphina/README.md RUSTWORKX_COMPARE_SKEW)
    and variable out-degree.  Used by the scaling harness; not SQL-mirrored.

The pages' ``text`` column is produced by the SAME frozen extraction
(functions/extract.py:extract_text_pd) applied to the generated html, so the
byte-identical per-url invariant is testable: re-extracting must reproduce
the stored column exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from graphina_spark.functions.extract import extract_text_pd

PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"
URL_PREFIX = "https://ex.com/p"  # + zero-padded id: lexicographic == numeric order
URL_PAD = 8
EPOCH_2024 = 1704067200  # 2024-01-01T00:00:00Z
TS_MIX = 2654435761  # Knuth multiplicative hash constant
YEAR_S = 31536000

# modular out-link rule — MUST stay in sync with sources/derived.py web_graph
# and the PAGES_EDGES_CTE oracle fragment in derived.py
_MULTIPLIERS = [(7, 3), (13, 5), (31, 17)]
_N_HUBS = 16
_DANGLING_MOD = 23


def _zpad(ids: np.ndarray) -> pd.Series:
    return pd.Series(ids).astype(str).str.zfill(URL_PAD)


def page_url(ids: np.ndarray) -> pd.Series:
    return URL_PREFIX + _zpad(ids)


def _html_from_targets(ids: np.ndarray, tgt: np.ndarray, valid: np.ndarray) -> pd.Series:
    """Assemble html per page from a (rows, k) target-id matrix + validity
    mask.  Columns are assumed pre-sorted; all work is vectorized numpy /
    pandas string kernels."""
    z = _zpad(ids)
    body = (
        "<html><head><title>Page " + z + "</title>"
        "<script>var x = 'ignore&me';</script></head>"
        "<body><h1>Page " + z + "</h1>"
        "<p>Crawled page " + z + " of the synthetic corpus &amp; link graph.</p>"
    )
    for k in range(tgt.shape[1]):
        tz = _zpad(tgt[:, k])
        anchor = '<a href="' + URL_PREFIX + tz + '">link ' + tz + "</a>"
        body = body + pd.Series(np.where(valid[:, k], anchor, ""))
    return body + "</body></html>"


def _finish(ids: np.ndarray, html: pd.Series) -> pd.DataFrame:
    ts = EPOCH_2024 + (ids.astype(np.int64) * TS_MIX) % YEAR_S
    return pd.DataFrame(
        {
            "url": page_url(ids),
            "warc_ts": pd.to_datetime(ts, unit="s"),
            "html": html.str.encode("utf-8"),
            "text": extract_text_pd(html),
            "lang": "en",
        }
    )


def _gen_modular(ids: np.ndarray, n: int) -> pd.DataFrame:
    cands = [(ids * a + b) % n for a, b in _MULTIPLIERS] + [ids % _N_HUBS]
    tgt = np.stack(cands, axis=1)
    tgt.sort(axis=1)
    valid = np.ones_like(tgt, dtype=bool)
    valid &= tgt != ids[:, None]  # no self-links
    valid[:, 1:] &= tgt[:, 1:] != tgt[:, :-1]  # dedupe (sorted columns)
    valid &= (ids % _DANGLING_MOD != 0)[:, None]  # dangling pages: no anchors
    return _finish(ids, _html_from_targets(ids, tgt, valid))


def pages_from_ids(ids_df: DataFrame, n: int | None = None) -> DataFrame:
    """ids(id: long) → pages; out-links follow the modular web_graph rule."""
    if n is None:
        n = ids_df.count()

    def gen(batches):
        for pdf in batches:
            if len(pdf):
                yield _gen_modular(pdf["id"].to_numpy(np.int64), n)

    return ids_df.mapInPandas(gen, PAGES_SCHEMA)


# ------------------------------------------------------------------ zipf bench
def _splitmix64(x: np.ndarray) -> np.ndarray:
    z = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _u01(x: np.ndarray) -> np.ndarray:
    return (_splitmix64(x) >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def synth_pages(
    spark: SparkSession,
    n_pages: int,
    avg_out: int = 8,
    zipf_theta: float = 0.8,
    seed: int = 42,
    partitions: int | None = None,
) -> DataFrame:
    """Bench-scale crawl: page i has 1..2*avg_out out-links whose targets are
    Zipf(theta)-distributed over [0, n) via inverse-CDF (rank = n*u^(1/(1-θ))),
    so low ids become heavy in-degree hubs — the skew the salted CSR shards
    must survive."""
    if not 0.0 < zipf_theta < 1.0:
        raise ValueError("zipf_theta must be in (0,1)")
    inv = 1.0 / (1.0 - zipf_theta)
    s64 = np.uint64(seed)

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["id"].to_numpy(np.int64)
            u64 = ids.astype(np.uint64)
            k = 1 + (_splitmix64(u64 * np.uint64(3) + s64) % np.uint64(2 * avg_out)).astype(
                np.int64
            )
            kmax = int(k.max())
            j = np.arange(kmax, dtype=np.uint64)[None, :]
            h = u64[:, None] * np.uint64(0x100000001B3) + j * np.uint64(0x1000193) + s64
            tgt = np.minimum(
                (n_pages * _u01(h.ravel()).reshape(h.shape) ** inv).astype(np.int64),
                n_pages - 1,
            )
            valid = (j < k[:, None].astype(np.uint64)) & (tgt != ids[:, None])
            tgt = np.where(valid, tgt, -1)
            tgt.sort(axis=1)
            valid = tgt >= 0
            valid[:, 1:] &= tgt[:, 1:] != tgt[:, :-1]
            yield _finish(ids, _html_from_targets(ids, tgt, valid))

    rng = spark.range(n_pages).withColumnRenamed("id", "id")
    if partitions:
        rng = rng.repartition(partitions)
    return rng.mapInPandas(gen, PAGES_SCHEMA)
