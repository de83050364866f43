"""Full replica of the driver's correctness gate, runnable at any sf.

Runs every ``queries()`` entry in a PLAIN Spark session (default driver heap,
AQE on — matching the driver harness, NOT ``session.get_spark``) and compares
against ``oracle_sql()`` in DuckDB with the driver's normalization: columns
sorted by name, floats rounded to 6 dp, order-insensitive row compare.

Usage:
    python jobs/parity_sweep.py [sf_dir] [name_filter ...]

Exit code 0 iff every oracle-gated query matches (rows-only queries must
merely run). Prints one line per query plus a final summary.
"""

import math
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_cell(x):
    if isinstance(x, float):
        if math.isnan(x):
            return "nan"
        # repr, not the float: the driver hashes formatted values, so
        # -0.0 vs 0.0 is a driver mismatch even though -0.0 == 0.0 in
        # Python (the r4 sage hash-red slipped through the old == compare)
        return repr(round(x, 6))
    return x


def norm_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm_cell(r[i]) for i in idx) for r in rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    filters = sys.argv[2:]

    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .config("spark.sql.shuffle.partitions", os.environ.get("SPARK_GRAFT_CPUS", "8"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = sorted(queries)
    if filters:
        names = [n for n in names if any(f in n for f in filters)]

    failed, passed, rows_only = [], 0, 0
    for name in names:
        t0 = time.time()
        try:
            sdf = queries[name](spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            if name not in oracles:
                rows_only += 1
                print(f"{name}: rows-only ok ({len(srows)} rows, {time.time()-t0:.1f}s)", flush=True)
                continue
            cur = con.execute(oracles[name])
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
            if sorted(scols) != sorted(ocols):
                failed.append(name)
                print(f"{name}: SCHEMA MISMATCH {sorted(scols)} vs {sorted(ocols)}", flush=True)
                continue
            if len(srows) != len(orows):
                failed.append(name)
                print(f"{name}: ROWS {len(srows)} vs {len(orows)}", flush=True)
                continue
            a, b = norm_rows(scols, srows), norm_rows(ocols, orows)
            mism = [(x, y) for x, y in zip(a, b) if x != y]
            if mism:
                failed.append(name)
                print(f"{name}: {len(mism)} VALUE MISMATCHES; first {mism[:2]}", flush=True)
            else:
                passed += 1
                print(f"{name}: ok ({len(srows)} rows, {time.time()-t0:.1f}s)", flush=True)
        except Exception:
            failed.append(name)
            print(f"{name}: EXCEPTION\n{traceback.format_exc()}", flush=True)

    print(f"\nSUMMARY: {passed} parity-ok, {rows_only} rows-only, {len(failed)} failed of {len(names)}")
    if failed:
        print("FAILED:", " ".join(failed))
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
