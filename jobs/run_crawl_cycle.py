#!/usr/bin/env python
"""spark-submit entrypoint: one full crawl-cycle decision pass.

Composes the gated crawl-family operators into the per-cycle producer job a
production crawler runs between fetch rounds:

1. **discovery** — parse sitemap feeds, anti-join the seen set
   (operators/crawl.py::parse_sitemaps / sitemap_frontier),
2. **compliance** — robots.txt rules for our agent
   (parse_robots / robots_allowed) and the UT1-style URL blocklist
   (operators/curation.py::url_blocklist_filter),
3. **prioritization** — authority × staleness recrawl ranking with
   per-host politeness caps and a global budget
   (operators/crawl.py::crawl_schedule over the current link graph).

Outputs under --out:
- ``frontier``   (url, host, lastmod)       — new compliant fetch candidates
- ``recrawl``    (host, id, priority, slot) — budgeted recrawl batch
- ``blocked``    (url, reason)              — compliance drops, by rule
- ``summary.json`` printed to stdout

Cluster:
    python jobs/package.py
    spark-submit --master <cluster> --py-files dist/graphina_spark.zip \\
        jobs/run_crawl_cycle.py --sf-dir s3://.../testdata --out s3://.../cycle

Sandbox:
    python jobs/run_crawl_cycle.py --sf-dir /root/testdata/sf0.001 --out /tmp/cycle
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HOST_MOD = 64


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--agent", default="graphina")
    ap.add_argument("--per-host", type=int, default=3)
    ap.add_argument("--budget", type=int, default=100)
    a = ap.parse_args()

    from pyspark.sql import functions as F

    from graphina_spark.operators.crawl import (
        crawl_schedule,
        parse_robots,
        parse_sitemaps,
        robots_allowed,
        sitemap_frontier,
    )
    from graphina_spark.operators.curation import url_blocklist_filter
    from graphina_spark.session import get_spark
    from graphina_spark.sources.derived import web_graph

    t0 = time.time()
    spark = get_spark("crawl_cycle")
    g = web_graph(spark, a.sf_dir)

    pages = g.vertices.select(
        "id",
        F.format_string("h%d.example.com", F.col("id") % HOST_MOD).alias("host"),
        F.format_string(
            "https://h%d.example.com/p/%d", F.col("id") % HOST_MOD, F.col("id")
        ).alias("url"),
    )
    # sitemap feeds + robots bodies: the gate fixtures (deterministic stand-in
    # for fetched /sitemap.xml and /robots.txt blobs)
    entry = F.concat(F.lit("<url><loc>"), F.col("url"), F.lit("</loc></url>"))
    bodies = (
        pages.where(F.col("id") % 5 < 2)
        .select("host", F.struct("id", entry.alias("e")).alias("s"))
        .groupBy("host")
        .agg(F.array_join(
            F.expr("transform(array_sort(collect_list(s)), x -> x.e)"), ""
        ).alias("body"))
    )
    robots = (
        spark.range(HOST_MOD)
        .select(F.col("id").alias("k"))
        .where(F.col("k") % 3 < 2)
        .select(
            F.format_string("h%d.example.com", F.col("k")).alias("host"),
            F.when(
                F.col("k") % 3 == 0,
                F.lit("User-agent: *\nDisallow: /p/1\nAllow: /p/12\n"),
            ).otherwise(
                F.lit("User-agent: graphina\nDisallow: /\n\nUser-agent: *\nAllow: /\n")
            ).alias("body"),
        )
    )
    blocklist = spark.createDataFrame(
        [("host", "h7.example.com"), ("host_suffix", "h9.example.com")],
        "kind string, pattern string",
    )
    rules = parse_robots(robots)
    seen = pages.where(F.col("id") % 2 == 0).select("url")

    frontier = sitemap_frontier(parse_sitemaps(bodies), seen, rules=rules,
                                agent=a.agent)
    bl = url_blocklist_filter(frontier, blocklist)
    frontier_ok = frontier.join(
        bl.where(~F.col("blocked")).select("url"), "url", "left_semi"
    )
    blocked = bl.where(F.col("blocked")).select("url", "reason")
    recrawl = crawl_schedule(g, host_mod=HOST_MOD, per_host=a.per_host,
                             budget=a.budget)

    os.makedirs(a.out, exist_ok=True)
    frontier_ok.write.mode("overwrite").parquet(os.path.join(a.out, "frontier"))
    recrawl.write.mode("overwrite").parquet(os.path.join(a.out, "recrawl"))
    blocked.write.mode("overwrite").parquet(os.path.join(a.out, "blocked"))
    summary = {
        "frontier_urls": frontier_ok.count(),
        "blocked_urls": blocked.count(),
        "recrawl_batch": recrawl.count(),
        "wall_sec": round(time.time() - t0, 2),
    }
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
