#!/usr/bin/env python
"""Second-kernel scaling evidence: synchronous label propagation.

Same method as BENCH/scaling.py (taskset-pinned per-level JVMs,
differential superstep timing over the identical synthetic crawl input) but
for the LPA kernel — independent corroboration that the engine's superstep
shape scales, not just the PageRank plan.  Results go to
BENCH/results_scaling_lpa.json; the table in BENCH/BASELINE.md §LPA is
written from it.

    python BENCH/scaling_lpa.py [--pages 2000000] [--avg-out 16]
                                [--iters 6] [--cores 2,8]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def worker(cores: int, pages: int, avg_out: int, iters: int, heap: str) -> None:
    from graphina_spark.graph import LinkGraph
    from graphina_spark.operators.lpa import label_propagation
    from graphina_spark.session import get_spark
    from graphina_spark.sources.pages import synth_pages

    spark = get_spark(
        f"scaling_lpa_c{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=cores,
        # SAME heap at EVERY level (identical config across the pair is
        # the method).  48g is required at local[32] even for the
        # sort-free packed-argmax kernel: the superstep localCheckpoint
        # of the label frame plus the cached symmetrized 2|E| adjacency
        # needs storage memory for 32 concurrent task buffers — a 16g
        # pool dies in LocalRDDCheckpointData.doCheckpoint (measured
        # 2026-08-19; do not retry 16g at 32 cores).
        extra_conf={
            "spark.sql.adaptive.enabled": "false",
            "spark.driver.memory": heap,
        },
    )
    t0 = time.time()
    pgs = synth_pages(spark, pages, avg_out=avg_out, partitions=cores * 2)
    g = LinkGraph.from_pages(pgs.select("url", "html"))
    g.edges = g.edges.repartition(cores).cache()
    n_edges = g.edges.count()
    g.vertices = g.vertices.repartition(cores).cache()
    g.vertices.count()
    build_s = time.time() - t0

    lo, hi = max(1, iters // 3), iters
    label_propagation(g, fixed_iters=1).count()  # warmup
    per_iter = []
    # median of 4 in-JVM differentials: single-box timings drift ±50%
    # across JVMs (BENCH/results_argmax.json notes); more in-JVM reps is
    # the only lever that tightens a level's estimate
    for _ in range(4):
        t0 = time.time()
        label_propagation(g, fixed_iters=lo).count()
        t_lo = time.time() - t0
        t0 = time.time()
        label_propagation(g, fixed_iters=hi).count()
        t_hi = time.time() - t0
        per_iter.append((t_hi - t_lo) / (hi - lo))
    sec = statistics.median(per_iter)
    print(
        "WORKER_JSON:"
        + json.dumps(
            {
                "cores": cores,
                "pages": pages,
                "edges": n_edges,
                "build_sec": round(build_s, 2),
                "superstep_sec": round(sec, 4),
                "edges_per_sec": round(n_edges / sec, 1),
            }
        )
    )
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=2_000_000)
    ap.add_argument("--avg-out", type=int, default=16)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--cores", default="2,8")
    ap.add_argument("--heap", default="16g")
    ap.add_argument("--worker-cores", type=int, default=None, help=argparse.SUPPRESS)
    a = ap.parse_args()
    if a.worker_cores:
        worker(a.worker_cores, a.pages, a.avg_out, a.iters, a.heap)
        return

    results = []
    for c in [int(x) for x in a.cores.split(",")]:
        pin = []
        if os.path.exists("/usr/bin/taskset"):
            pin = ["taskset", "-c", f"0-{c - 1}"]
        cmd = pin + [
            sys.executable,
            os.path.abspath(__file__),
            "--worker-cores", str(c),
            "--pages", str(a.pages),
            "--avg-out", str(a.avg_out),
            "--iters", str(a.iters),
            "--heap", a.heap,
        ]
        out = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO, timeout=3600)
        line = [l for l in out.stdout.splitlines() if l.startswith("WORKER_JSON:")]
        if not line:
            sys.stderr.write(out.stdout[-2000:] + out.stderr[-4000:])
            raise SystemExit(f"worker local[{c}] failed")
        results.append(json.loads(line[-1][len("WORKER_JSON:") :]))
        print(json.dumps(results[-1]))

    path = os.path.join(REPO, "BENCH", "results_scaling_lpa.json")
    if os.path.exists(path):
        with open(path) as f:
            old = json.load(f)
        if old.get("input", {}).get("pages") == a.pages:
            new_cores = {r["cores"] for r in results}
            results = [
                r for r in old.get("levels", []) if r["cores"] not in new_cores
            ] + results
    results.sort(key=lambda r: r["cores"])
    pairs = []
    for lo in results:
        for hi in results:
            if hi["cores"] == 4 * lo["cores"]:
                pairs.append(
                    {
                        "pair": f"local[{lo['cores']}] -> local[{hi['cores']}]",
                        "speedup": round(hi["edges_per_sec"] / lo["edges_per_sec"], 3),
                        "efficiency": round(
                            hi["edges_per_sec"] / lo["edges_per_sec"] / 4.0, 3
                        ),
                    }
                )
    doc = {"input": {"pages": a.pages, "avg_out": a.avg_out}, "levels": results,
           "pairs": pairs}
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps(pairs))


if __name__ == "__main__":
    main()
