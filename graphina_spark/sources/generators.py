"""Seeded graph generators (reference: /root/reference/src/core/generators.rs).

The reference generates with StdRng(seed) (erdos_renyi :57-97, complete
:112-141, bipartite :159-193, star :208-223, cycle :238-256, watts_strogatz
:280-357, barabasi_albert :380-498).  Cross-language RNG streams can't match,
so parity here means *seeded determinism + the same structural contract*
(edge counts, degree laws), not identical edge sets.

Structure-only generators (complete/star/cycle/path) are pure ``spark.range``
arithmetic.  Random ones use splitmix64 counter-mode hashing — deterministic,
partition-independent, no RNG state.  Barabási–Albert is inherently
sequential (each edge depends on the running degree distribution); the
reference only uses it at bench sizes (n ≤ 2000), so it is driver-side numpy
with a documented scale ceiling.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphina_spark.graph import LinkGraph

def _mix_u01(*cols):
    """Deterministic uniform [0,1) from integer columns via xxhash64 — the
    JVM-side counter-mode generator (no Python, no RNG state)."""
    h = F.xxhash64(*cols)
    return (F.pmod(h, F.lit(1 << 40))).cast("double") / float(1 << 40)


def complete_graph(spark: SparkSession, n: int, directed: bool = False) -> LinkGraph:
    a = spark.range(n).select(F.col("id").alias("src"))
    b = spark.range(n).select(F.col("id").alias("dst"))
    e = a.crossJoin(b)
    e = e.where(F.col("src") != F.col("dst")) if directed else e.where(
        F.col("src") < F.col("dst")
    )
    return LinkGraph.from_edges(e, directed=directed, vertices=spark.range(n))


def star_graph(spark: SparkSession, n: int) -> LinkGraph:
    """Center 0, spokes 1..n-1 (generators.rs:208-223)."""
    e = spark.range(1, n).select(F.lit(0).cast("long").alias("src"), F.col("id").alias("dst"))
    return LinkGraph.from_edges(e, directed=False, vertices=spark.range(n))


def cycle_graph(spark: SparkSession, n: int) -> LinkGraph:
    e = spark.range(n).select(
        F.col("id").alias("src"), ((F.col("id") + 1) % n).alias("dst")
    )
    return LinkGraph.from_edges(e, directed=False, vertices=spark.range(n))


def path_graph(spark: SparkSession, n: int) -> LinkGraph:
    e = spark.range(n - 1).select(F.col("id").alias("src"), (F.col("id") + 1).alias("dst"))
    return LinkGraph.from_edges(e, directed=False, vertices=spark.range(n))


def erdos_renyi(
    spark: SparkSession, n: int, p: float, seed: int = 42, directed: bool = False
) -> LinkGraph:
    """G(n, p): pair (i,j) exists iff hash(seed,i,j) < p — distributed over
    the n² candidate grid (generators.rs:57-97)."""
    a = spark.range(n).select(F.col("id").alias("src"))
    b = spark.range(n).select(F.col("id").alias("dst"))
    pairs = a.crossJoin(b)
    pairs = (
        pairs.where(F.col("src") != F.col("dst"))
        if directed
        else pairs.where(F.col("src") < F.col("dst"))
    )
    e = pairs.where(_mix_u01(F.lit(seed), F.col("src"), F.col("dst")) < p)
    return LinkGraph.from_edges(e, directed=directed, vertices=spark.range(n))


def bipartite_random(
    spark: SparkSession, n1: int, n2: int, p: float, seed: int = 42
) -> LinkGraph:
    """Random bipartite: left ids 0..n1-1, right ids n1..n1+n2-1
    (generators.rs:159-193)."""
    left = spark.range(n1).select(F.col("id").alias("src"))
    right = spark.range(n1, n1 + n2).select(F.col("id").alias("dst"))
    e = left.crossJoin(right).where(
        _mix_u01(F.lit(seed), F.col("src"), F.col("dst")) < p
    )
    return LinkGraph.from_edges(e, directed=False, vertices=spark.range(n1 + n2))


def watts_strogatz(
    spark: SparkSession, n: int, k: int, beta: float, seed: int = 42
) -> LinkGraph:
    """Ring lattice (each node to its k/2 clockwise neighbors) with
    probability-β rewiring of the far endpoint (generators.rs:280-357).
    Rewire target = hash-uniform over [0,n), redrawn deterministically;
    self-loops/duplicates dropped (the reference skips invalid rewires too)."""
    if k % 2 != 0 or k >= n:
        raise ValueError("k must be even and < n")
    base = spark.range(n).select(F.col("id").alias("src"))
    offs = spark.range(1, k // 2 + 1).select(F.col("id").alias("off"))
    lattice = base.crossJoin(offs).select(
        "src", ((F.col("src") + F.col("off")) % n).alias("dst"), "off"
    )
    u = _mix_u01(F.lit(seed), F.col("src"), F.col("off"))
    tgt = F.floor(_mix_u01(F.lit(seed + 1), F.col("src"), F.col("off")) * n).cast("long")
    e = (
        lattice.select(
            "src", F.when(u < beta, tgt).otherwise(F.col("dst")).alias("dst")
        )
        .where(F.col("src") != F.col("dst"))
        .select(F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst"))
        .distinct()
    )
    return LinkGraph.from_edges(e, directed=False, vertices=spark.range(n))


def barabasi_albert(
    spark: SparkSession, n: int, m: int, seed: int = 42, max_n: int = 100_000
) -> LinkGraph:
    """Preferential attachment (generators.rs:380-498) — driver-side numpy
    (sequential by nature); refuses beyond ``max_n`` (the reference uses it
    only at micro-bench sizes)."""
    if n > max_n:
        raise ValueError(f"barabasi_albert is driver-side; n > {max_n} unsupported")
    if m < 1 or m >= n:
        raise ValueError("need 1 <= m < n")
    rng = np.random.default_rng(seed)
    repeated: list[int] = list(range(m))
    edges = []
    for v in range(m, n):
        chosen: set[int] = set()
        while len(chosen) < m:
            chosen.add(int(repeated[rng.integers(0, len(repeated))]))
        for t in chosen:
            edges.append((v, t))
            repeated.extend([v, t])
    e = spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges], "src long, dst long"
    )
    return LinkGraph.from_edges(e, directed=False, vertices=spark.range(n))
