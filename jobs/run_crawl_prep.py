#!/usr/bin/env python
"""spark-submit entrypoint: crawl preprocessing — url hygiene to host trust.

pages(url, warc_ts, html, text, lang) parquet in → one output directory:

- ``pages_dedup``  — pages after frozen-v1 url canonicalization + exact
                     canonical-url dedup (min url wins per canonical form)
- ``host_edges``   (src_host, dst_host, n_links, weight) — host-level graph
- ``host_spam``    (host, pr, tr, spam_mass) — host PageRank, TrustRank
                     seeded on the top in-degree hosts, relative spam mass
- ``summary.json`` printed to stdout — dedup rate, host counts, wall time

Cluster:
    python jobs/package.py
    spark-submit --master <cluster> --py-files dist/graphina_spark.zip \\
        jobs/run_crawl_prep.py --pages-parquet s3://.../pages --out s3://.../prep

Sandbox (derives the pages table from the testdata customer ids):
    python jobs/run_crawl_prep.py --sf-dir /root/testdata/sf0.001 --out /tmp/prep
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--pages-parquet", help="pages table (url, html, ...)")
    src.add_argument("--sf-dir", help="testdata dir; derives synthetic pages")
    ap.add_argument("--out", required=True)
    ap.add_argument("--pr-iters", type=int, default=10)
    ap.add_argument("--n-seeds", type=int, default=16)
    a = ap.parse_args()

    from pyspark.sql import functions as F
    from pyspark.sql import Window

    from graphina_spark.functions.urls import canonical_url
    from graphina_spark.graph import LinkGraph, assign_dense_ids
    from graphina_spark.operators.hostgraph import host_links
    from graphina_spark.operators.trustrank import spam_mass
    from graphina_spark.session import get_spark

    spark = get_spark("run_crawl_prep")
    t0 = time.time()
    if a.pages_parquet:
        pages = spark.read.parquet(a.pages_parquet)
    else:
        from graphina_spark.sources.derived import pages_from_customer

        pages = pages_from_customer(spark, a.sf_dir)

    # 1. url hygiene: canonicalize, keep one page per canonical url
    # (deterministic: lexicographically smallest original url wins)
    n_in = pages.count()
    w = Window.partitionBy("canon").orderBy("url")
    dedup = (
        pages.withColumn("canon", canonical_url(F.col("url")))
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    dedup.write.mode("overwrite").parquet(os.path.join(a.out, "pages_dedup"))
    dedup = spark.read.parquet(os.path.join(a.out, "pages_dedup"))
    n_kept = dedup.count()

    # 2. page graph -> host graph
    g = LinkGraph.from_pages(dedup.drop("canon"))
    he = host_links(g.vertices, g.edges)
    he.write.mode("overwrite").parquet(os.path.join(a.out, "host_edges"))
    he = spark.read.parquet(os.path.join(a.out, "host_edges"))

    # 3. host graph as a LinkGraph (dense host ids), TrustRank seeded on
    # the top-in-link hosts (the "vetted directory" stand-in)
    hosts = assign_dense_ids(
        he.select(F.col("src_host").alias("host")).unionAll(
            he.select(F.col("dst_host").alias("host"))
        ),
        key="host",
    )
    hedges = (
        he.join(hosts.withColumnRenamed("host", "src_host"), "src_host")
        .withColumnRenamed("id", "src")
        .join(
            hosts.select(F.col("id").alias("dst"), F.col("host").alias("dst_host")),
            "dst_host",
        )
        .select("src", "dst", F.col("weight").cast("double").alias("weight"))
    )
    hg = LinkGraph.from_edges(hedges, directed=True, vertices=hosts.select("id"))
    seeds = (
        hedges.groupBy(F.col("dst").alias("id"))
        .agg(F.sum("weight").alias("w_in"))
        .orderBy(F.desc("w_in"), "id")
        .limit(a.n_seeds)
        .select("id")
    )
    sm = spam_mass(hg, seeds, fixed_iters=a.pr_iters, tol=None)
    out = sm.join(hosts, "id").select("host", "pr", "tr", "spam_mass")
    out.write.mode("overwrite").parquet(os.path.join(a.out, "host_spam"))

    print(
        json.dumps(
            {
                "out": a.out,
                "pages_in": n_in,
                "pages_kept": n_kept,
                "dup_rate": round(1.0 - n_kept / max(1, n_in), 6),
                "hosts": hosts.count(),
                "host_edges": he.count(),
                "wall_sec": round(time.time() - t0, 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
