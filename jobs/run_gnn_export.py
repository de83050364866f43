#!/usr/bin/env python
"""spark-submit entrypoint: GraphSAGE training-data export.

edges(src, dst) parquet + features(vec_id, embedding array<float>) parquet in
→ two parquet outputs:

    <out>/frontier/   (root, hop, src, dst)      — 2-hop sampled computation
                                                   graph, fixed fanout k1/k2
    <out>/agg/        (id, pos, mean_val, n_sampled) — exact mean feature of
                                                   each vertex's k1-sample

Both exports are fully deterministic (portable edge-hash sampling, exact
float32→double means), so re-running the job on the same inputs is
byte-reproducible — the property a training pipeline needs for data
lineage audits.

Cluster:
    python jobs/package.py
    spark-submit --master <cluster> --py-files dist/graphina_spark.zip \\
        jobs/run_gnn_export.py --edges-parquet s3://.../edges \\
        --features-parquet s3://.../embeddings --out s3://.../gnn

Sandbox (derives the deterministic web graph from testdata):
    python jobs/run_gnn_export.py --sf-dir /root/testdata/sf0.01 --out /tmp/gnn
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
    ap.add_argument("--edges-parquet")
    ap.add_argument("--features-parquet")
    ap.add_argument("--sf-dir", help="derive the web graph + embeddings from testdata")
    ap.add_argument("--out", required=True)
    ap.add_argument("--k1", type=int, default=3)
    ap.add_argument("--k2", type=int, default=2)
    ap.add_argument("--salt-buckets", type=int, default=16)
    a = ap.parse_args()
    if not a.sf_dir and not (a.edges_parquet and a.features_parquet):
        ap.error("pass --sf-dir or both --edges-parquet and --features-parquet")

    from pyspark.sql import functions as F

    from graphina_spark.graph import LinkGraph
    from graphina_spark.operators.gnnprep import (
        sage_neighbor_mean,
        sample_khop_frontier,
    )
    from graphina_spark.session import get_spark

    spark = get_spark("run_gnn_export")
    t0 = time.time()
    if a.sf_dir:
        from graphina_spark.sources.derived import web_graph

        g = web_graph(spark, a.sf_dir)
        feats = spark.read.parquet(f"{a.sf_dir}/embeddings.parquet")
    else:
        edges = spark.read.parquet(a.edges_parquet).select(
            F.col("src").cast("long"), F.col("dst").cast("long")
        )
        g = LinkGraph.from_edges(edges, directed=True)
        feats = spark.read.parquet(a.features_parquet)

    frontier = sample_khop_frontier(
        g, k1=a.k1, k2=a.k2, salt_buckets=a.salt_buckets, directed=False
    )
    frontier.write.mode("overwrite").parquet(os.path.join(a.out, "frontier"))
    agg = sage_neighbor_mean(
        g, feats, k=a.k1, salt_buckets=a.salt_buckets, directed=False
    )
    agg.write.mode("overwrite").parquet(os.path.join(a.out, "agg"))

    nf = spark.read.parquet(os.path.join(a.out, "frontier")).count()
    na = spark.read.parquet(os.path.join(a.out, "agg")).count()
    print(
        json.dumps(
            {
                "job": "run_gnn_export",
                "frontier_rows": nf,
                "agg_rows": na,
                "k1": a.k1,
                "k2": a.k2,
                "wall_s": round(time.time() - t0, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
