"""Pages-table ingestion: frozen text extraction, link parsing, end-to-end
graph build.  Pins the north-rule per-row invariant (byte-identical extracted
text per url) and the html → Arrow-UDF → edge-set equivalence with the
arithmetic edge derivation."""

import glob
import os
import re

import pandas as pd
import pytest
from pyspark.sql import functions as F

from graphina_spark.functions.extract import (
    extract_text_pd,
    extract_text_udf,
    parse_links_pd,
)
from graphina_spark.graph import LinkGraph
from graphina_spark.sources.derived import pages_from_customer, web_graph
from graphina_spark.sources.pages import pages_from_ids, synth_pages

# golden bytes for page id=1 of a 30-page corpus (n=30):
# targets (1*7+3)%30=10, (1*13+5)%30=18, (1*31+17)%30=18(dup), 1%16=1(self)
GOLDEN_TEXT_1 = (
    "Page 00000001 Page 00000001 Crawled page 00000001 of the synthetic "
    "corpus & link graph. link 00000010 link 00000018"
)
# page id=0: dangling (0 % 23 == 0) → no anchors
GOLDEN_TEXT_0 = (
    "Page 00000000 Page 00000000 Crawled page 00000000 of the synthetic "
    "corpus & link graph."
)


def test_extract_text_pure():
    html = pd.Series(
        [
            b"<html><head><script>junk 'x' <b></script></head>"
            b"<body><style>p{}</style><p>A &amp;&lt;tag&gt; &quot;q&#39;</p>"
            b"  <div>two\n\nwords</div></body></html>"
        ]
    )
    assert extract_text_pd(html).iloc[0] == "A &<tag> \"q' two words"


def test_parse_links_resolution():
    html = pd.Series(
        [
            b'<html><a href="https://a.com/x">1</a>'
            b"<a href='/root'>2</a>"
            b'<a href="rel/p#frag">3</a>'
            b'<a href="//cdn.com/y">4</a></html>'
        ]
    )
    url = pd.Series(["https://base.org/dir/page"])
    assert parse_links_pd(html, url).iloc[0] == [
        "https://a.com/x",
        "https://base.org/root",
        "https://base.org/dir/rel/p",
        "https://cdn.com/y",
    ]


def test_pages_golden_bytes(spark):
    ids = spark.range(30)
    rows = {r["url"]: r for r in pages_from_ids(ids, n=30).collect()}
    p1 = rows["https://ex.com/p00000001"]
    assert p1["text"] == GOLDEN_TEXT_1
    assert p1["lang"] == "en"
    assert b'<a href="https://ex.com/p00000010">' in p1["html"]
    p0 = rows["https://ex.com/p00000000"]
    assert p0["text"] == GOLDEN_TEXT_0
    assert b"<a " not in p0["html"]


def test_text_byte_identical_across_partitions(spark):
    """Re-extracting from html reproduces the stored text column exactly,
    independent of partitioning (the per-row invariant)."""
    pages = pages_from_ids(spark.range(50).repartition(7), n=50)
    mismatch = pages.where(
        extract_text_udf(F.col("html")) != F.col("text")
    ).count()
    assert mismatch == 0


def test_from_pages_matches_arithmetic_edges(spark, sf_dir):
    """html-parsed edge set == web_graph's modular edge set (weights aside),
    with identical ids (zero-padded urls sort numerically)."""
    g_pages = LinkGraph.from_pages(pages_from_customer(spark, sf_dir))
    g_web = web_graph(spark, sf_dir)
    parsed = {(r["src"], r["dst"]) for r in g_pages.edges.collect()}
    arith = {(r["src"], r["dst"]) for r in g_web.edges.collect()}
    assert parsed == arith
    assert g_pages.vertices.count() == g_web.vertices.count()


def test_synth_pages_deterministic_and_skewed(spark):
    a = synth_pages(spark, 300, seed=7).orderBy("url").collect()
    b = synth_pages(spark, 300, seed=7, partitions=5).orderBy("url").collect()
    assert [(r["url"], r["html"], r["text"]) for r in a] == [
        (r["url"], r["html"], r["text"]) for r in b
    ]
    g = LinkGraph.from_pages(synth_pages(spark, 300, seed=7))
    indeg = (
        g.edges.groupBy("dst").count().orderBy(F.desc("count")).limit(5).collect()
    )
    # zipf targets: low ids are hubs with far more than avg in-degree
    assert indeg[0]["count"] > 3 * 8
    assert indeg[0]["dst"] < 20


def test_no_row_at_a_time_udfs():
    """input_hint forbids per-row Python: only pandas_udf / mapInPandas may
    appear in the engine source."""
    root = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    bad = []
    for fn in glob.glob(os.path.join(root, "graphina_spark", "**", "*.py"), recursive=True):
        src = open(fn).read()
        # F.udf( or bare udf( but not pandas_udf(
        if re.search(r"(?<!pandas_)\budf\s*\(", src):
            bad.append(fn)
    assert bad == []


@pytest.mark.parametrize("n", [1, 2])
def test_pages_tiny_graphs(spark, n):
    """Degenerate sizes: self-link exclusion can empty the anchor set."""
    pages = pages_from_ids(spark.range(n), n=n).collect()
    assert len(pages) == n
    for r in pages:
        assert r["text"].startswith("Page ")


def test_parse_anchors_pd_cleanup_and_resolution():
    """Anchor text gets the frozen v1 cleanup (inner tags stripped, entities
    decoded, whitespace collapsed); hrefs resolve like parse_links_pd."""
    import pandas as pd

    from graphina_spark.functions.extract import parse_anchors_pd

    html = pd.Series(
        [
            b'<a href="/x">  Click <b>here</b> &amp; now </a>'
            b'<a href="https://other.com/y">plain</a>'
            b"<a href='rel'>q&lt;r</a>",
            b"<p>no anchors</p>",
        ]
    )
    url = pd.Series(["https://a.com/dir/page", "https://a.com/"])
    got = parse_anchors_pd(html, url).tolist()
    assert got[0] == [
        {"href": "https://a.com/x", "text": "Click here & now"},
        {"href": "https://other.com/y", "text": "plain"},
        {"href": "https://a.com/dir/rel", "text": "q<r"},
    ]
    assert got[1] == []
