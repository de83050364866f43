"""Vectorized Arrow UDFs: text extraction and link parsing from raw html.

North-rule requirement: "byte-identical text extraction and link parsing per
url happen in vectorized Arrow UDFs" — every html-touching operation crosses
the Python↔JVM boundary as Arrow columnar batches (``pandas_udf``), never as
per-row Python UDFs.  Inside a batch, all string work uses pandas ``.str``
vectorized kernels.

``extract_text`` is a FROZEN pure function (TEXT_EXTRACT_VERSION below): no
charset guessing, no external parser whose behavior could drift between
versions.  The rules are fixed so the per-url output bytes are identical
across runs, partitions, and parallelism levels — pinned by golden bytes in
tests/test_pages.py.

Extraction rules (v1), applied in order to the UTF-8-decoded html:
  1. drop <script>...</script> and <style>...</style> blocks (non-greedy,
     case-insensitive, dotall)
  2. replace every remaining tag <...> with a single space
  3. decode the five standard entities &amp; &lt; &gt; &quot; &#39;
     (&amp; last, so "&amp;lt;" becomes "&lt;" not "<")
  4. collapse runs of whitespace to a single space; strip ends

The reference has no html layer (it is a pure graph library); this module is
the ingestion front-end the north star adds on top of the reference's
edge-list reader (/root/reference/src/core/io.rs:59-122), whose role it
plays: turning raw records into (src, dst) edges.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType, StructField, StructType

TEXT_EXTRACT_VERSION = 1

_SCRIPT_RE = r"(?is)<script\b[^>]*>.*?</script>"
_STYLE_RE = r"(?is)<style\b[^>]*>.*?</style>"
_TAG_RE = r"<[^>]*>"
_WS_RE = r"\s+"
# href value of an anchor tag; single or double quoted
_HREF_RE = r"""(?is)<a\s[^>]*?href\s*=\s*["']([^"']*)["']"""


def _decode(html: pd.Series) -> pd.Series:
    """binary → str; strict UTF-8 (fixtures are valid UTF-8 by construction;
    real crawls would pin errors='replace' — still deterministic)."""
    if len(html) and isinstance(html.iloc[0], (bytes, bytearray)):
        return html.str.decode("utf-8", errors="replace")
    return html.astype("string").astype(object)


def extract_text_pd(html: pd.Series) -> pd.Series:
    """The pinned extraction, pandas-level (shared by the Spark UDF and the
    fixture generator so the pages table's ``text`` column IS the extraction
    of its ``html`` column, byte-identical)."""
    s = _decode(html)
    s = s.str.replace(_SCRIPT_RE, " ", regex=True)
    s = s.str.replace(_STYLE_RE, " ", regex=True)
    s = s.str.replace(_TAG_RE, " ", regex=True)
    s = s.str.replace("&lt;", "<", regex=False)
    s = s.str.replace("&gt;", ">", regex=False)
    s = s.str.replace("&quot;", '"', regex=False)
    s = s.str.replace("&#39;", "'", regex=False)
    s = s.str.replace("&amp;", "&", regex=False)
    s = s.str.replace(_WS_RE, " ", regex=True)
    return s.str.strip()


def _resolve(base: str, href: str) -> str:
    """Deterministic minimal URL resolution (no urllib version drift):
    absolute → as-is; scheme-relative → base scheme; root-relative → base
    origin; else relative to base directory.  Fragments dropped."""
    href = href.split("#", 1)[0]
    if not href:
        return base
    if "://" in href[:10]:
        return href
    scheme, rest = base.split("://", 1)
    host = rest.split("/", 1)[0]
    if href.startswith("//"):
        return f"{scheme}:{href}"
    if href.startswith("/"):
        return f"{scheme}://{host}{href}"
    basedir = base.rsplit("/", 1)[0] if "/" in rest else base
    return f"{basedir}/{href}"


def parse_links_pd(html: pd.Series, url: pd.Series) -> pd.Series:
    """Per-page ordered list of resolved out-link urls (duplicates kept —
    multigraph semantics, like repeated edge-list lines in io.rs:86-119)."""
    found = _decode(html).str.findall(_HREF_RE)
    base = url.astype(object)
    out = [
        [_resolve(b, h) for h in hs] if isinstance(hs, list) else []
        for b, hs in zip(base, found)
    ]
    return pd.Series(out, index=html.index)


# anchor tag with href + inner text (non-greedy to the matching </a>)
_ANCHOR_RE = r"""(?is)<a\s[^>]*?href\s*=\s*["']([^"']*)["'][^>]*>(.*?)</a>"""


def _clean_anchor_text(t: str) -> str:
    """Anchor inner text under the same frozen v1 rules as extract_text_pd:
    tags → space, 5 entities decoded (&amp; last), whitespace collapsed."""
    import re

    t = re.sub(_TAG_RE, " ", t)
    for ent, ch in (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&#39;", "'"), ("&amp;", "&")):
        t = t.replace(ent, ch)
    return re.sub(_WS_RE, " ", t).strip()


def parse_anchors_pd(html: pd.Series, url: pd.Series) -> pd.Series:
    """Per-page ordered list of (href, text) anchor structs — the anchor-text
    signal (href resolved like parse_links_pd; text under the frozen v1
    cleanup).  Duplicates kept; pages without anchors yield []."""
    found = _decode(html).str.findall(_ANCHOR_RE)
    base = url.astype(object)
    out = [
        [
            {"href": _resolve(b, h), "text": _clean_anchor_text(t)}
            for h, t in hs
        ]
        if isinstance(hs, list)
        else []
        for b, hs in zip(base, found)
    ]
    return pd.Series(out, index=html.index)


@pandas_udf(StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    return extract_text_pd(html)


@pandas_udf(ArrayType(StringType()))
def parse_links_udf(html: pd.Series, url: pd.Series) -> pd.Series:
    return parse_links_pd(html, url)


_ANCHOR_TYPE = ArrayType(
    StructType(
        [StructField("href", StringType()), StructField("text", StringType())]
    )
)


@pandas_udf(_ANCHOR_TYPE)
def parse_anchors_udf(html: pd.Series, url: pd.Series) -> pd.Series:
    return parse_anchors_pd(html, url)
