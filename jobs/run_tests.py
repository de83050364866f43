"""Parallel pytest runner — process-level sharding (pytest-xdist is not
installed in this container, so this is the xdist stand-in).

Splits the test FILES into N shards (greedy longest-processing-time using
recorded per-file durations when available, else file size as the proxy),
runs one pytest subprocess per shard concurrently — each gets its own JVM
and session-scoped Spark fixture — and aggregates exit codes.  With 32
cores and local[4] test sessions, 6 shards keep the box busy without
oversubscribing executors.

    python jobs/run_tests.py [--shards 6] [--pytest-args "-q"]

Writes per-file durations to BENCH/test_durations.json after a full run so
the next split is duration-balanced.  A shard failure prints that shard's
tail and the overall exit code is non-zero.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DUR_PATH = os.path.join(REPO, "BENCH", "test_durations.json")


def discover() -> list[str]:
    tdir = os.path.join(REPO, "tests")
    return sorted(
        f"tests/{fn}"
        for fn in os.listdir(tdir)
        if fn.startswith("test_") and fn.endswith(".py")
    )


ORACLE_FILE = "tests/test_oracle_parity.py"
ORACLE_SPLITS = 4  # the one dominant file; its gates shard via ORACLE_SHARD


def split(files: list[str], n: int) -> list[list[str]]:
    """Greedy LPT over (file, env) work units; the oracle-parity file is
    pre-split into ORACLE_SPLITS units that run the same file under
    different ORACLE_SHARD filters."""
    try:
        with open(DUR_PATH) as f:
            dur = json.load(f)
    except FileNotFoundError:
        dur = {}

    def cost(f: str) -> float:
        return dur.get(f) or os.path.getsize(os.path.join(REPO, f)) / 1e4

    units: list[tuple[str, dict, float]] = []
    n_osplits = min(ORACLE_SPLITS, n)
    oracle_units = []
    for f in files:
        if f == ORACLE_FILE:
            for i in range(n_osplits):
                oracle_units.append(
                    (f, {"ORACLE_SHARD": f"{i}/{n_osplits}"},
                     cost(f) / n_osplits)
                )
        else:
            units.append((f, {}, cost(f)))

    shards: list[tuple[float, list]] = [(0.0, []) for _ in range(n)]
    # env-split units must land on DISTINCT shards (one pytest process can
    # carry only one ORACLE_SHARD env value) — seed them first
    for i, u in enumerate(oracle_units):
        shards[i] = (shards[i][0] + u[2], shards[i][1] + [u])
    for u in sorted(units, key=lambda u: u[2], reverse=True):
        i = min(range(n), key=lambda k: shards[k][0])
        shards[i] = (shards[i][0] + u[2], shards[i][1] + [u])
    return [s[1] for s in shards if s[1]]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--shards", type=int, default=6)
    ap.add_argument("--pytest-args", default="-q")
    a = ap.parse_args()

    files = discover()
    shards = split(files, a.shards)
    t0 = time.time()
    procs = []
    for i, shard in enumerate(shards):
        env = dict(os.environ)
        # each shard JVM gets a private tmp so derby/warehouse/scratch files
        # never collide across concurrent sessions
        scratch = os.path.join("/tmp", f"pytest-shard-{os.getpid()}-{i}")
        os.makedirs(scratch, exist_ok=True)
        env["SPARK_LOCAL_DIRS"] = scratch
        # a shard may mix at most ONE env-split unit with plain files; run
        # units with identical extra-env in one pytest invocation
        extra = {}
        for _f, e, _c in shard:
            extra.update(e)
        env.update(extra)
        shard_files = sorted({f for f, _e, _c in shard})
        cmd = (
            [sys.executable, "-m", "pytest"]
            + a.pytest_args.split()
            + ["-p", "no:cacheprovider", "--durations=0", *shard_files]
        )
        procs.append(
            (
                i,
                shard_files,
                subprocess.Popen(
                    cmd, cwd=REPO, env=env,
                    stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                    text=True,
                ),
            )
        )

    rc = 0
    durations: dict[str, float] = {}
    for i, shard, p in procs:
        out, _ = p.communicate()
        status = "ok" if p.returncode == 0 else f"FAILED rc={p.returncode}"
        print(f"shard {i}: {len(shard)} files, {status}")
        if p.returncode != 0:
            rc = 1
            print(out[-4000:])
        # harvest per-test durations → per-file totals for the next split
        for line in out.splitlines():
            parts = line.split()
            # "12.34s call tests/test_x.py::test_y"
            if len(parts) == 3 and parts[0].endswith("s") and parts[1] in (
                "call", "setup", "teardown"
            ):
                try:
                    secs = float(parts[0][:-1])
                except ValueError:
                    continue
                fn = parts[2].split("::")[0]
                durations[fn] = durations.get(fn, 0.0) + secs

    wall = time.time() - t0
    print(f"total wall: {wall:.1f}s across {len(shards)} shards (rc={rc})")
    if rc == 0 and durations:
        with open(DUR_PATH, "w") as f:
            json.dump(dict(sorted(durations.items())), f, indent=1)
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
