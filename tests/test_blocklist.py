"""URL blocklist filter (operators/curation.py::url_blocklist_filter)."""

from pyspark.sql import functions as F

from graphina_spark.operators.curation import url_blocklist_filter


def run(spark, urls, rules):
    pages = spark.createDataFrame([(u,) for u in urls], "url string")
    bl = spark.createDataFrame(rules, "kind string, pattern string")
    return {r["url"]: (r["blocked"], r["reason"])
            for r in url_blocklist_filter(pages, bl).collect()}


def test_suffix_blocks_subdomains_not_lookalikes(spark):
    got = run(
        spark,
        [
            "https://bad.example/x",
            "https://a.bad.example/x",
            "https://deep.a.bad.example/x",
            "https://notbad.example/x",     # suffix must respect label boundary
            "https://bad.example.com/x",    # different registrable domain
        ],
        [("host_suffix", "bad.example")],
    )
    assert got["https://bad.example/x"] == (True, "host_suffix:bad.example")
    assert got["https://a.bad.example/x"] == (True, "host_suffix:bad.example")
    assert got["https://deep.a.bad.example/x"] == (True, "host_suffix:bad.example")
    assert got["https://notbad.example/x"] == (False, None)
    assert got["https://bad.example.com/x"] == (False, None)


def test_priority_and_path_prefix(spark):
    got = run(
        spark,
        [
            "https://h.example.com/ads/banner",
            "https://h.example.com/content",
            "https://h.example.com/adsense",  # startswith is on the path string
        ],
        [
            ("path_prefix", "h.example.com/ads"),
            ("host", "h.example.com"),
        ],
    )
    # host rule outranks path rule everywhere on that host
    for u, (b, r) in got.items():
        assert b and r == "host:h.example.com"

    got2 = run(
        spark,
        ["https://h.example.com/ads/banner", "https://h.example.com/content"],
        [("path_prefix", "h.example.com/ads")],
    )
    assert got2["https://h.example.com/ads/banner"] == (
        True, "path_prefix:h.example.com/ads"
    )
    assert got2["https://h.example.com/content"] == (False, None)


def test_garbage_urls_pass_through_unblocked(spark):
    got = run(spark, ["not a url"], [("host", "x.example")])
    assert got["not a url"] == (False, None)
