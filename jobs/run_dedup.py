#!/usr/bin/env python
"""spark-submit entrypoint: training-data dedup + split pipeline.

documents(doc_id, text) parquet in → out parquet with one row per document:

    (doc_id, exact_group, neardup_group, keep, split)

- exact_group:   md5(text) grouping (byte-identical duplicates)
- neardup_group: transitive closure over MinHash-LSH near-dup pairs,
                 computed on the exact-dedup survivors only (the standard
                 two-tier pipeline: byte dups are cheap to kill first and
                 are exactly what makes LSH band buckets hot)
- keep:          True iff the document is the canonical (min-id) member of
                 its near-dup group AND of its exact group
- split:         deterministic md5-bucket train/valid/test assignment

Cluster:
    python jobs/package.py
    spark-submit --master <cluster> --py-files dist/graphina_spark.zip \\
        jobs/run_dedup.py --docs-parquet s3://.../documents --out s3://.../dedup

Sandbox:
    python jobs/run_dedup.py --docs-parquet /root/testdata/sf0.01/documents.parquet \\
        --out /tmp/dedup
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
    ap.add_argument("--docs-parquet", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--threshold", type=float, default=0.5)
    ap.add_argument("--shingle-k", type=int, default=3)
    ap.add_argument("--num-hashes", type=int, default=12)
    ap.add_argument("--bands", type=int, default=4)
    ap.add_argument("--train", type=float, default=0.8)
    ap.add_argument("--valid", type=float, default=0.1)
    ap.add_argument("--test", type=float, default=0.1)
    a = ap.parse_args()

    from pyspark.sql import functions as F

    from graphina_spark.operators.dedup import (
        exact_dedup,
        minhash_lsh_pairs,
        neardup_groups,
    )
    from graphina_spark.operators.sampling import deterministic_split
    from graphina_spark.session import get_spark

    spark = get_spark("run_dedup")
    t0 = time.time()
    docs = spark.read.parquet(a.docs_parquet).select(
        F.col(a.id_col).cast("long").alias("doc_id"), F.col(a.text_col).alias("text")
    )

    exact = exact_dedup(docs).select(
        F.col("id").alias("doc_id"),
        F.col("group_id").alias("exact_group"),
        F.col("keep").alias("exact_keep"),
    )
    survivors = docs.join(
        exact.where("exact_keep").select("doc_id"), "doc_id"
    )
    pairs = minhash_lsh_pairs(
        survivors,
        k=a.shingle_k,
        num_hashes=a.num_hashes,
        bands=a.bands,
        threshold=a.threshold,
    )
    near = neardup_groups(survivors, pairs).select(
        F.col("id").alias("doc_id"),
        F.col("group_id").alias("neardup_group"),
        F.col("keep").alias("near_keep"),
    )
    splits = deterministic_split(
        docs, weights={"train": a.train, "valid": a.valid, "test": a.test}
    ).withColumnRenamed("id", "doc_id")

    # non-survivors inherit their exact group's canonical near-dup verdict
    out = (
        exact.join(near, "doc_id", "left")
        .join(splits, "doc_id")
        .select(
            "doc_id",
            "exact_group",
            F.coalesce("neardup_group", "exact_group").alias("neardup_group"),
            (F.col("exact_keep") & F.coalesce("near_keep", F.lit(False))).alias(
                "keep"
            ),
            "split",
        )
    )
    out.write.mode("overwrite").parquet(a.out)
    res = spark.read.parquet(a.out)
    n, kept = res.count(), res.where("keep").count()
    print(
        json.dumps(
            {
                "out": a.out,
                "rows": n,
                "kept": kept,
                "dropped": n - kept,
                "wall_sec": round(time.time() - t0, 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
