"""Plan-hygiene audit over the full driver query surface.

Greps every ``queries()`` entry's PHYSICAL plan for the red flags that mean
"this will not survive 100×":

- ``CartesianProduct`` / ``BroadcastNestedLoopJoin`` — pair-quadratic join
  with no key (allowed only where a documented baseline deliberately
  broadcasts, e.g. the exact ANN scorer);
- ``Exchange SinglePartition`` — a global funnel (allowed only for final
  scalar aggregations, whose input is already partial-aggregated per
  partition, or driver-bounded top-k);
- ``rangepartitioning(... 1 part)`` global sorts.

Any NEW offender (not in the whitelist below) exits 1 — run this after
adding operators the way the parallelism sweep is run.

Usage:
    python jobs/plan_audit.py [sf_dir] [name_filter ...]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: query -> flags that are DOCUMENTED as intentional there.
WHITELIST = {
    # exact brute-force ANN baselines: broadcast nested loop IS the operator
    # (COVERAGE.md rows; the LSH/IVF variants are the scale path)
    "ann_cosine_topk": {"BroadcastNestedLoopJoin"},
    "lsh_recall": {"BroadcastNestedLoopJoin"},
    "quant_recall": {"BroadcastNestedLoopJoin"},
    "pq_recall": {"BroadcastNestedLoopJoin"},
    "opq_recall": {"BroadcastNestedLoopJoin"},
    "matryoshka_recall": {"BroadcastNestedLoopJoin"},
    "hybrid_rrf": {"BroadcastNestedLoopJoin"},
    # k-row broadcast of cluster centroids / seeds joined without a key
    "kmeans_emb": {"BroadcastNestedLoopJoin"},
    "semdedup": {"BroadcastNestedLoopJoin"},
    "silhouette_emb": {"BroadcastNestedLoopJoin"},
    "k_center_embs": {"BroadcastNestedLoopJoin"},
    "coreset_assign_embs": {"BroadcastNestedLoopJoin"},
    "ivf_topk": {"BroadcastNestedLoopJoin"},
    "ivfpq_topk": {"BroadcastNestedLoopJoin"},
    # SCALAR broadcasts: the nested-loop side is a 1-row (or k-row, k a
    # config constant) AGGREGATE — corpus totals, decile boundaries,
    # mixture weights, per-run scalar folds.  Bounded at any corpus size;
    # a keyless join against a 1-row frame always plans as BNLJ.
    "conductance_web": {"BroadcastNestedLoopJoin"},
    "dist_metrics_web": {"BroadcastNestedLoopJoin"},
    "dsir_weights": {"BroadcastNestedLoopJoin"},
    "freq_tokens": {"BroadcastNestedLoopJoin"},
    "generators": {"BroadcastNestedLoopJoin"},
    "graph_diff_web": {"BroadcastNestedLoopJoin"},
    "len_deciles": {"BroadcastNestedLoopJoin"},
    "lm_quality": {"BroadcastNestedLoopJoin"},
    "mixture_docs": {"BroadcastNestedLoopJoin"},
    "motif4_web": {"BroadcastNestedLoopJoin"},
    "source_kl": {"BroadcastNestedLoopJoin"},
    "spectral_clique": {"BroadcastNestedLoopJoin"},  # PIC per-round norm (1 row)
    "sweep_cut_block": {"BroadcastNestedLoopJoin"},  # global volume scalar
    "sweep_cut_web": {"BroadcastNestedLoopJoin"},    # global volume scalar
    "tfidf_terms": {"BroadcastNestedLoopJoin"},      # corpus doc-count (idf N)
}

#: flags every query may carry: scalar/1-row results and driver-bounded
#: top-k funnels are single-partition BY DESIGN at the very end of a plan.
GLOBAL_OK = {"Exchange SinglePartition", "TakeOrderedAndProject"}

FLAG_PATTERNS = [
    ("CartesianProduct", re.compile(r"CartesianProduct")),
    ("BroadcastNestedLoopJoin", re.compile(r"BroadcastNestedLoopJoin")),
    ("Exchange SinglePartition", re.compile(r"Exchange SinglePartition")),
]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    import __spark_entry__ as entry
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    bad = []
    qs = entry.queries()
    for name in sorted(qs):
        if only and name not in only:
            continue
        try:
            plan = qs[name](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # pragma: no cover - surfaced as audit failure
            print(f"{name}: PLAN-ERROR {type(e).__name__}")
            bad.append((name, "plan-error"))
            continue
        flags = {f for f, pat in FLAG_PATTERNS if pat.search(plan)}
        flags -= GLOBAL_OK
        flags -= WHITELIST.get(name, set())
        if flags:
            print(f"{name}: {sorted(flags)}")
            bad.append((name, flags))
        else:
            print(f"{name}: clean")
    print(f"\naudited {len([n for n in qs if not only or n in only])} plans,"
          f" {len(bad)} offenders")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
