"""robots.txt parsing + RFC 9309 longest-match evaluation
(operators/crawl.py::parse_robots / robots_allowed)."""

from graphina_spark.operators.crawl import parse_robots, robots_allowed

BODY = """# comment line
User-agent: googlebot
User-agent: graphina
Disallow: /private
Allow: /private/ok

User-agent: *
Disallow: /tmp
Disallow:
"""


def _rules(spark, body=BODY, host="ex.com"):
    robots = spark.createDataFrame([(host, body)], "host string, body string")
    return parse_robots(robots)


def test_parse_groups_and_stacked_agents(spark):
    got = {
        (r["agent"], r["rule"], r["path"])
        for r in _rules(spark).collect()
    }
    assert got == {
        ("googlebot", "disallow", "/private"),
        ("googlebot", "allow", "/private/ok"),
        ("graphina", "disallow", "/private"),
        ("graphina", "allow", "/private/ok"),
        ("*", "disallow", "/tmp"),
    }  # comments dropped, empty Disallow dropped, stacked agents share rules


def test_longest_match_and_agent_selection(spark):
    rules = _rules(spark)
    urls = spark.createDataFrame(
        [
            ("https://ex.com/private/secret",),
            ("https://ex.com/private/ok/page",),
            ("https://ex.com/tmp/x",),
            ("https://ex.com/public",),
        ],
        "url string",
    )
    # specific group exists for graphina -> '*' group ignored (so /tmp allowed)
    got = {r["url"]: (r["allowed"], r["rule_path"])
           for r in robots_allowed(urls, rules, agent="graphina").collect()}
    assert got["https://ex.com/private/secret"] == (False, "/private")
    assert got["https://ex.com/private/ok/page"] == (True, "/private/ok")
    assert got["https://ex.com/tmp/x"] == (True, None)
    assert got["https://ex.com/public"] == (True, None)
    # unknown agent falls back to '*'
    got2 = {r["url"]: r["allowed"]
            for r in robots_allowed(urls, rules, agent="otherbot").collect()}
    assert got2["https://ex.com/tmp/x"] is False
    assert got2["https://ex.com/private/secret"] is True


def test_no_robots_host_is_allowed(spark):
    rules = _rules(spark, host="other.com")
    urls = spark.createDataFrame([("https://ex.com/anything",)], "url string")
    got = robots_allowed(urls, rules).collect()[0]
    assert got["allowed"] is True and got["rule_path"] is None


SITEMAP = """<?xml version="1.0"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc> https://ex.com/a </loc><lastmod>2024-01-02</lastmod></url>
  <url><loc>https://ex.com/private/secret</loc></url>
  <url><loc>https://ex.com/b</loc><lastmod>2024-02-03</lastmod></url>
  <url><badtag>nope</badtag></url>
</urlset>
"""


def test_parse_sitemaps_and_frontier(spark):
    from graphina_spark.operators.crawl import parse_sitemaps, sitemap_frontier

    sm = spark.createDataFrame([("ex.com", SITEMAP)], "host string, body string")
    rows = {r["url"]: r["lastmod"] for r in parse_sitemaps(sm).collect()}
    assert rows == {
        "https://ex.com/a": "2024-01-02",
        "https://ex.com/private/secret": None,
        "https://ex.com/b": "2024-02-03",
    }
    seen = spark.createDataFrame([("https://ex.com/b",)], "url string")
    fresh = sitemap_frontier(parse_sitemaps(sm), seen, rules=_rules(spark),
                             agent="graphina")
    got = {r["url"] for r in fresh.collect()}
    # b is seen; /private/secret robots-blocked for graphina; only /a remains
    assert got == {"https://ex.com/a"}


def test_run_crawl_cycle_job(spark, tmp_path):
    """The spark-submit crawl-cycle entrypoint runs end to end (in-process:
    same code path minus the subprocess)."""
    import subprocess
    import sys as _sys

    out = str(tmp_path / "cycle")
    r = subprocess.run(
        [_sys.executable, "jobs/run_crawl_cycle.py",
         "--sf-dir", "/root/testdata/sf0.001", "--out", out],
        capture_output=True, text=True, cwd="/root/repo", timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    import json as _json

    summary = _json.loads(r.stdout.strip().splitlines()[-1])
    assert summary["frontier_urls"] > 0
    assert summary["recrawl_batch"] > 0
    import os as _os

    assert _os.path.isdir(out + "/frontier") and _os.path.isdir(out + "/recrawl")
