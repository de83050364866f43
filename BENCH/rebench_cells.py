#!/usr/bin/env python
"""Within-JVM repeated timing for individual bench cells (VERDICT r4, task
5): the r4 driver bench showed train_classifier_3ep 10.47→12.97 s (1.24×)
and icws_sig_8 1.12→1.38 s (1.24×) with NO kernel change in either — the
same signature as r3's pagerank_10it "regression" that a within-JVM A/B
proved to be cross-JVM interference.

Cross-JVM single-shot timings on this shared box swing ±50% (measured,
BENCH/argmax_bench.py discipline), so the clean estimate for "did the cell
regress?" is min-of-N inside ONE JVM over one cached input — noise only
ever ADDS time.

    python BENCH/rebench_cells.py [--reps 5] [--cells train_classifier_3ep,icws_sig_8]

Writes BENCH/results_rebench.json: per cell, all samples + min + median,
next to the r3/r4 driver-bench values for the verdict.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: driver-bench history for the cells under investigation (BENCH_r0{3,4}.json)
HISTORY = {
    "train_classifier_3ep": {"r3": 10.47, "r4": 12.97},
    "icws_sig_8": {"r3": 1.12, "r4": 1.38},
    # round-5 session check: quiet-box bench.py showed these two >1.2x
    # over their BENCH_r04 values with no kernel change (r3 7.964/0.383,
    # r4 5.714/0.333) — same investigation discipline
    "minhash_lsh": {"r3": 7.964, "r4": 5.714},
    "text_stats": {"r3": 0.383, "r4": 0.333},
}

CELLS = {
    "train_classifier_3ep": "train_classifier",
    "icws_sig_8": "icws_sig",
    "minhash_lsh": "minhash_lsh",
    "text_stats": "text_stats",
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--cells", default=",".join(CELLS))
    a = ap.parse_args()

    from graphina_spark.session import get_spark

    import __spark_entry__ as entry

    spark = get_spark("rebench_cells")
    gated = entry.queries()

    out = {}
    for cell in a.cells.split(","):
        qname = CELLS[cell]
        fn = gated[qname]
        fn(spark, SF_DIR).count()  # warmup: JIT, codegen, parquet cache
        samples = []
        for _ in range(a.reps):
            t0 = time.time()
            fn(spark, SF_DIR).count()
            samples.append(round(time.time() - t0, 3))
        out[cell] = {
            "samples": samples,
            "min_sec": min(samples),
            "median_sec": round(statistics.median(samples), 3),
            "driver_bench": HISTORY.get(cell, {}),
            "verdict": (
                "interference"
                if HISTORY.get(cell, {}).get("r3")
                and min(samples) <= HISTORY[cell]["r3"] * 1.1
                else "investigate"
            ),
        }
        print(cell, json.dumps(out[cell]))

    path = os.path.join(REPO, "BENCH", "results_rebench.json")
    with open(path, "w") as f:
        json.dump({"sf_dir": SF_DIR, "reps": a.reps, "cells": out}, f, indent=2)
    print("wrote", path)
    spark.stop()


if __name__ == "__main__":
    main()
