#!/usr/bin/env python
"""spark-submit entrypoint: end-to-end training-corpus curation.

documents(doc_id, text) parquet in → out parquet with the FINAL kept
training corpus (one row per surviving document):

    (doc_id, n_tokens, quality)

Stage order (operators/curation.py, the oracle-gated composition):
near-dup survivor selection → benchmark carve-out → quality filter →
benchmark decontamination.  A JSON summary (counts per stage boundary,
wall time) is written next to the output.

Cluster:
    python jobs/package.py
    spark-submit --master <cluster> --py-files dist/graphina_spark.zip \\
        jobs/run_curate.py --docs-parquet s3://.../documents --out s3://.../curated

Sandbox:
    python jobs/run_curate.py \\
        --docs-parquet /root/testdata/sf0.01/documents.parquet --out /tmp/curated
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
    ap.add_argument("--bench-mod", type=int, default=97)
    ap.add_argument("--contam-k", type=int, default=4)
    ap.add_argument("--contam-min-frac", type=float, default=0.5)
    ap.add_argument("--dedup-threshold", type=float, default=0.2)
    ap.add_argument("--min-tokens", type=int, default=10)
    ap.add_argument("--max-tokens", type=int, default=None)
    ap.add_argument("--min-quality", type=float, default=0.3)
    ap.add_argument("--langs", default=None, help="comma-separated allowlist")
    a = ap.parse_args()

    from graphina_spark.operators.curation import curation_pipeline
    from graphina_spark.session import get_spark

    spark = get_spark("run_curate")
    t0 = time.time()
    docs = spark.read.parquet(a.docs_parquet)
    n_in = docs.count()
    kept = curation_pipeline(
        docs,
        bench_mod=a.bench_mod,
        contam_k=a.contam_k,
        contam_min_frac=a.contam_min_frac,
        dedup_threshold=a.dedup_threshold,
        min_tokens=a.min_tokens,
        max_tokens=a.max_tokens,
        min_quality=a.min_quality,
        langs=a.langs.split(",") if a.langs else None,
        id_col=a.id_col,
        text_col=a.text_col,
    )
    kept.write.mode("overwrite").parquet(a.out)
    n_out = spark.read.parquet(a.out).count()
    summary = {
        "docs_in": n_in,
        "docs_kept": n_out,
        "kept_frac": round(n_out / max(n_in, 1), 4),
        "wall_s": round(time.time() - t0, 1),
        "params": {
            k: v for k, v in vars(a).items() if k not in ("docs_parquet", "out")
        },
    }
    with open(os.path.join(os.path.dirname(a.out) or ".",
                           os.path.basename(a.out) + ".summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
