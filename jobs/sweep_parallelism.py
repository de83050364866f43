"""Parallelism-independence sweep over the full driver query surface.

Every `queries()` entry must produce value-identical results regardless of
core count and shuffle-partition count — a mismatch means a nondeterministic
tie-break (an unordered `first()`, a `row_number` over an under-specified
window, a hash that depends on partition layout) snuck into an operator.

Runs each query at two parallelism levels (default local[3]/3 shuffle
partitions and local[8]/8 — deliberately a non-power-of-two vs power-of-two
pair so range partitioners and AQE coalescing both change shape), rounds
every float to 9 dp, sorts rows, sha256s the result, and compares.

Usage:
    python jobs/sweep_parallelism.py [--sf-dir /root/testdata/sf0.001]
                                     [--levels 3 8] [--only name1,name2]

Exit code 0 = all queries match; 1 = any mismatch (names printed).
"""

from __future__ import annotations

import argparse
import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _canon(v):
    if isinstance(v, float):
        return round(v, 9)
    if isinstance(v, list):
        return tuple(_canon(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _canon(x)) for k, x in v.items()))
    return v


def _hash_rows(df) -> str:
    rows = sorted(repr(tuple(_canon(v) for v in r)) for r in df.collect())
    h = hashlib.sha256()
    h.update(repr(sorted(df.columns)).encode())
    for r in rows:
        h.update(r.encode())
    return h.hexdigest()


def run_level(cores: int, sf_dir: str, only: list[str] | None) -> dict[str, str]:
    """One Spark session at local[cores] with `cores` shuffle partitions;
    returns {query_name: value_hash}."""
    from pyspark.sql import SparkSession

    import __spark_entry__ as m

    spark = (
        SparkSession.builder.master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(cores))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "4g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    try:
        for name, q in m.queries().items():
            if only and name not in only:
                continue
            try:
                out[name] = _hash_rows(q(spark, sf_dir))
            except Exception as ex:  # record, keep sweeping
                out[name] = f"ERROR:{type(ex).__name__}"
    finally:
        spark.stop()
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--levels", nargs=2, type=int, default=[3, 8])
    ap.add_argument("--only", default=None, help="comma-separated query names")
    args = ap.parse_args()
    only = args.only.split(",") if args.only else None

    a = run_level(args.levels[0], args.sf_dir, only)
    b = run_level(args.levels[1], args.sf_dir, only)
    bad = []
    for name in sorted(a):
        ok = a[name] == b.get(name) and not a[name].startswith("ERROR")
        print(f"{name}: {'OK' if ok else 'MISMATCH ' + a[name][:18] + ' vs ' + str(b.get(name))[:18]}")
        if not ok:
            bad.append(name)
    print(f"swept {len(a)} queries at local[{args.levels[0]}] vs local[{args.levels[1]}]: "
          f"{len(a) - len(bad)} match, {len(bad)} mismatch")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
