#!/usr/bin/env python
"""spark-submit entrypoint: crawl structure report over a pages table.

pages(url, warc_ts, html, text, lang) parquet in → one output directory with
the standard "what does this crawl look like" tables (each a parquet subdir):

- ``bowtie``      (id, cls)           — Broder bow-tie class per page
- ``bowtie_summary`` (cls, n)         — the headline bow-tie shape table
- ``degree_hist`` (deg, n)            — total-degree power-law readout
- ``top_pages``   (id, pr)            — top-k PageRank pages
- ``summary.json`` printed to stdout  — vertex/edge counts, reciprocity,
                                        density, class shares, wall time

Cluster:
    python jobs/package.py
    spark-submit --master <cluster> --py-files dist/graphina_spark.zip \\
        jobs/run_crawl_report.py --pages-parquet s3://.../pages --out s3://.../report

Sandbox (derives the pages table from the testdata customer ids):
    python jobs/run_crawl_report.py --sf-dir /root/testdata/sf0.01 --out /tmp/report
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
    src.add_argument(
        "--sf-dir", help="testdata dir; derives the synthetic pages table"
    )
    ap.add_argument("--out", required=True)
    ap.add_argument("--top-k", type=int, default=100)
    ap.add_argument("--pr-iters", type=int, default=10)
    a = ap.parse_args()

    from pyspark.sql import functions as F

    from graphina_spark.graph import LinkGraph
    from graphina_spark.operators.bowtie import bowtie_classification
    from graphina_spark.operators.metrics import density, reciprocity
    from graphina_spark.operators.metrics import degree_histogram
    from graphina_spark.operators.pagerank import pagerank
    from graphina_spark.session import get_spark

    spark = get_spark("run_crawl_report")
    t0 = time.time()
    if a.pages_parquet:
        pages = spark.read.parquet(a.pages_parquet)
    else:
        from graphina_spark.sources.derived import pages_from_customer

        pages = pages_from_customer(spark, a.sf_dir)
    g = LinkGraph.from_pages(pages)

    cls = bowtie_classification(g)
    cls.write.mode("overwrite").parquet(os.path.join(a.out, "bowtie"))
    cls = spark.read.parquet(os.path.join(a.out, "bowtie"))
    summary = cls.groupBy("cls").agg(F.count("*").alias("n"))
    summary.write.mode("overwrite").parquet(
        os.path.join(a.out, "bowtie_summary")
    )
    degree_histogram(g).write.mode("overwrite").parquet(
        os.path.join(a.out, "degree_hist")
    )
    top = (
        pagerank(g, fixed_iters=a.pr_iters, tol=None)
        .orderBy(F.desc("rank"), "id")
        .limit(a.top_k)
        .select("id", F.col("rank").alias("pr"))
    )
    top.write.mode("overwrite").parquet(os.path.join(a.out, "top_pages"))

    n_v, n_e = g.num_vertices(), g.num_edges()
    shares = {r["cls"]: r["n"] for r in summary.collect()}
    print(
        json.dumps(
            {
                "out": a.out,
                "vertices": n_v,
                "edges": n_e,
                "density": round(density(g), 8),
                "reciprocity": round(reciprocity(g), 8),
                "bowtie": shares,
                "wall_sec": round(time.time() - t0, 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
