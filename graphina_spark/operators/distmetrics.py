"""Distance-based graph metrics: diameter / radius / average path length —
exact (small graphs) and ANF sketch (the 100-TB path).

Reference surface: /root/reference/src/metrics/graph_metrics.rs —
``diameter`` (:40-64), ``radius`` (:74-98), ``average_path_length``
(:224-255).  All three run BFS from every node and return None when any BFS
fails to reach the whole graph (disconnected ⇒ no finite metric).

Two execution modes, same contract:

``distance_metrics`` (exact)
    Aggregates :func:`operators.paths.all_pairs_bfs_lengths` — state is
    O(V²) pair rows, intended for components/samples (the reference itself
    is O(V·(V+E))).  Disconnected ⇒ NULL columns, mirroring Option::None.

``anf_neighborhood_function`` / ``approx_distance_metrics`` (sketch)
    The ANF / HyperANF shape (Palmer et al. KDD'02; Boldi-Rosa-Vigna
    WWW'11): each vertex carries k Flajolet-Martin bitmask registers;
    superstep r ORs each vertex's registers with its out-neighbors' —
    after r rounds register j of v sketches |{u : dist(v,u) ≤ r}|.  One
    shuffle per round, O(k·V) state total, merge is an associative
    ``bit_or`` aggregate (map-side combinable) — this is the plan shape
    that survives 100 TB where all-pairs cannot.

    The per-register bit index uses a *portable affine hash*
    ``((id+1)·A_j + B_j) mod P`` (P = 2^31-1) rather than xxhash64, so the
    DuckDB oracle can replay the identical sketch bit-for-bit
    (oracles.py::anf_web_sql) — the sketch itself is under the correctness
    gate, not just its tolerance envelope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphina_spark.graph import LinkGraph
from graphina_spark.operators.paths import all_pairs_bfs_lengths
from graphina_spark.plans.materialize import local_materialize as _mat

#: affine hash family modulus (prime, fits products in 62 bits)
ANF_P = 2_147_483_647
#: per-register multipliers/offsets, j = 0..k-1
ANF_A = [1_103_515_245, 69_069, 214_013, 1_664_525, 22_695_477, 48_271, 16_807, 69_621]
ANF_B = [12_345, 362_437, 2_531_011, 1_013_904_223, 1, 7, 13, 1_000_003]
#: Flajolet-Martin bias correction
ANF_PHI = 0.77351
#: register width (bit indexes are capped at REG_BITS-1)
ANF_REG_BITS = 62


def distance_metrics(g: LinkGraph, max_depth: int | None = None) -> DataFrame:
    """One row ``(diameter int, radius int, avg_path_length double)`` —
    NULLs when the graph is disconnected (graph_metrics.rs Option::None
    contract; directed graphs use out-edge BFS like petgraph neighbors())."""
    ap = all_pairs_bfs_lengths(g, max_depth=max_depth)
    tot = g.vertices.agg(F.count("*").alias("n"))
    per = ap.groupBy("source").agg(
        F.max("dist").alias("ecc"), F.count("*").alias("reached")
    )
    stats = per.agg(
        F.min("reached").alias("mr"),
        F.count("*").alias("nsrc"),
        F.max("ecc").alias("diam"),
        F.min("ecc").alias("rad"),
    )
    apl = ap.where(F.col("dist") > 0).agg(
        F.sum("dist").alias("td"), F.count("*").alias("pc")
    )
    ok = (F.col("mr") == F.col("n")) & (F.col("nsrc") == F.col("n"))
    return (
        stats.crossJoin(F.broadcast(apl))
        .crossJoin(F.broadcast(tot))
        .select(
            F.when(ok, F.col("diam")).cast("int").alias("diameter"),
            F.when(ok, F.col("rad")).cast("int").alias("radius"),
            F.when(ok, F.col("td") / F.col("pc"))
            .cast("double")
            .alias("avg_path_length"),
        )
    )


def _init_registers(g: LinkGraph, k: int) -> DataFrame:
    """(id, m0..m{k-1}): one FM bit set per register.  Bit index = number of
    trailing zeros of the affine hash (geometric), capped at REG_BITS-1."""
    if k > len(ANF_A):
        raise ValueError(f"k ≤ {len(ANF_A)} supported (hash family size)")
    cols = [F.col("id")]
    for j in range(k):
        # affine map alone leaves arithmetic-progression regularity in the
        # low bits (deterministic multiples of 2^k → FM reads ~1 bit high,
        # a 2-2.6× cardinality overestimate); two quadratic rounds scramble
        # it.  All intermediates < 2^62 — safe for DuckDB's checked BIGINT.
        h1 = ((F.col("id") + 1) * F.lit(ANF_A[j]) + F.lit(ANF_B[j])) % F.lit(ANF_P)
        h2 = (h1 * h1 + F.lit(ANF_A[j])) % F.lit(ANF_P)
        h = (h2 * h2 + F.lit(ANF_B[j])) % F.lit(ANF_P)
        # lowest set bit of h as a power of two; h==0 → cap bucket
        low = h.bitwiseAND(-h)
        tz = F.when(h == 0, F.lit(ANF_REG_BITS - 1)).otherwise(
            F.least(
                F.round(F.log2(low.cast("double"))).cast("int"),
                F.lit(ANF_REG_BITS - 1),
            )
        )
        # 2^tz exactly (powers of two are exact doubles; tz ≤ 61 < long range)
        cols.append(F.pow(F.lit(2.0), tz.cast("double")).cast("long").alias(f"m{j}"))
    return g.vertices.select(*cols)


def _lzb(m: F.Column) -> F.Column:
    """Lowest-zero-bit index of register m.  log2 of an exact power of two
    may come back epsilon-off (computed as ln(x)/ln(2)); round() recovers
    the integer exponent."""
    return F.round(
        F.log2(F.bitwise_not(m).bitwiseAND(m + 1).cast("double"))
    ).cast("long")


def _estimate(reg: DataFrame, k: int) -> F.Column:
    """Proper FM cardinality estimate summed over vertices: per node,
    2^(mean_j lzb_j) / φ — the bit positions are averaged BEFORE
    exponentiating (Flajolet-Martin §3 / ANF §2; an arithmetic mean of
    2^lzb_j instead is upward-biased by the exponential's convexity)."""
    mean_bits = sum(_lzb(F.col(f"m{j}")) for j in range(k)) / F.lit(float(k))
    return F.sum(F.pow(F.lit(2.0), mean_bits) / F.lit(ANF_PHI))


def _register_mass(reg: DataFrame, k: int) -> F.Column:
    """Σ_v Σ_j lzb_j(v) as a plain BIGINT — the oracle-gated readout.  A
    pure-integer function of every register, so it pins the whole sketch
    bit-exactly with zero cross-engine float-aggregation risk; the
    statistical estimator (:func:`_estimate`) is a deterministic function
    of the same registers."""
    return F.sum(sum(_lzb(F.col(f"m{j}")) for j in range(k))).cast("long")


def anf_neighborhood_function(
    g: LinkGraph,
    k: int = 8,
    max_depth: int = 32,
    fixed_rounds: int | None = None,
    readout: str = "estimate",
) -> DataFrame:
    """(r int, nf double): estimated Σ_v |{u : dist(v,u) ≤ r}| for r = 0..R.

    R = ``fixed_rounds`` when given (no convergence probe — the oracle-gated
    mode, every round's curve point emitted so the DuckDB twin can unroll the
    identical rounds); otherwise the loop stops the first round the sketch
    absorbs no new bits (or at ``max_depth``).  Directed graphs sketch
    out-reachability.

    ``readout="estimate"`` emits the FM cardinality estimate;
    ``readout="raw"`` emits the integer register mass (Σ lzb) — the
    float-free quantity the DuckDB gate compares bit-for-bit."""
    spark = g.vertices.sparkSession
    adj = g.symmetric_edges().select("src", "dst").distinct().cache()
    k = int(k)
    read = _estimate if readout == "estimate" else _register_mass
    rounds = fixed_rounds if fixed_rounds is not None else max_depth
    reg = _init_registers(g, k).transform(_mat)
    curve = [(0, float(reg.agg(read(reg, k).alias("nf")).first()["nf"]))]
    for r in range(1, rounds + 1):
        gathered = (
            adj.join(reg.withColumnRenamed("id", "dst"), "dst")
            .groupBy(F.col("src").alias("id"))
            .agg(*[F.bit_or(f"m{j}").alias(f"g{j}") for j in range(k)])
        )
        nxt = (
            reg.join(gathered, "id", "left")
            .select(
                "id",
                *[
                    F.col(f"m{j}")
                    .bitwiseOR(F.coalesce(F.col(f"g{j}"), F.lit(0)))
                    .alias(f"m{j}")
                    for j in range(k)
                ],
            )
            .transform(_mat)
        )
        nf = float(nxt.agg(read(nxt, k).alias("nf")).first()["nf"])
        reg = nxt
        if fixed_rounds is None and nf == curve[-1][1]:
            break
        curve.append((r, nf))
    adj.unpersist()
    if readout == "raw":
        return spark.createDataFrame(
            [(r, int(v)) for r, v in curve], "r int, nf long"
        )
    return spark.createDataFrame(curve, "r int, nf double")


def approx_distance_metrics(
    g: LinkGraph,
    k: int = 8,
    max_depth: int = 32,
    effective_q: float = 0.9,
    fixed_rounds: int | None = None,
    round_to: int | None = None,
) -> DataFrame:
    """One row ``(effective_diameter double, avg_path_length double)``
    estimated from the ANF curve (HyperANF's standard readouts): effective
    diameter = smallest r with NF(r) ≥ q·NF(∞) (linear interpolation,
    Boldi-Rosa-Vigna §4), APL ≈ Σ_r r·(NF(r)−NF(r−1)) / (NF(∞)−NF(0)).

    ``fixed_rounds``/``round_to`` are the oracle-gated mode: a fixed round
    count unrolls identically in SQL (oracles.py::approx_dist_web_sql), and
    pre-rounding the outputs coarser than the driver's 6 dp absorbs the
    engine-specific summation order of the float curve estimates (the
    registers themselves are bit-identical — anf_web pins them).

    The curve is O(diameter) rows — summarizing it on the driver is
    metadata-sized, not a data collect."""
    rows = sorted(
        anf_neighborhood_function(
            g, k=k, max_depth=max_depth, fixed_rounds=fixed_rounds
        ).collect(),
        key=lambda r: r["r"],
    )
    nf = [r["nf"] for r in rows]
    last = nf[-1]
    target = effective_q * last
    eff = float(len(nf) - 1)
    for i in range(len(nf)):
        if nf[i] >= target:
            if i == 0 or nf[i] == nf[i - 1]:
                eff = float(i)
            else:
                eff = (i - 1) + (target - nf[i - 1]) / (nf[i] - nf[i - 1])
            break
    mass = last - nf[0]
    apl = (
        sum(r * (nf[r] - nf[r - 1]) for r in range(1, len(nf))) / mass
        if mass > 0
        else 0.0
    )
    spark = g.vertices.sparkSession
    if round_to is not None:
        eff, apl = round(float(eff), round_to), round(float(apl), round_to)
    return spark.createDataFrame(
        [(float(eff), float(apl))],
        "effective_diameter double, avg_path_length double",
    )


def two_sweep_lower_bound(g: LinkGraph) -> DataFrame:
    """1 row (start, far_node, lower_bound) — the double-BFS ("2-sweep")
    diameter lower bound (Magnien, Latapy & Habib, JEA 2009): BFS from a
    start vertex, take the farthest vertex found, BFS again from it; the
    second eccentricity is a lower bound on the diameter that is exact on
    many real graphs.  The practical companion to the ANF *upper* curve
    (``anf_neighborhood_function``): together they bracket the diameter
    without all-pairs work.

    Determinism: start = the minimum vertex id; "farthest" ties break to
    the smallest id — the same rule both engines apply, so the bound is
    reproducible.  Undirected semantics (the bound argument needs symmetric
    reachability): edges are symmetrized like the WCC kernel.

    Scale shape: exactly two multi-source-BFS runs with a single source
    each (O(diameter) rounds, one keyed shuffle per round) + two 1-row
    argmin readouts.  DuckDB twin: oracles.py::two_sweep_web_sql.
    """
    from graphina_spark.operators.paths import bfs_distances

    und = LinkGraph(
        vertices=g.vertices,
        edges=g.undirected_view().select("src", "dst", "weight"),
        directed=True,
    )
    spark = g.vertices.sparkSession
    start = g.vertices.agg(F.min("id").alias("id"))
    d1 = bfs_distances(und, start.select("id"))
    far = (
        d1.orderBy(F.desc("dist"), F.asc("id"))
        .limit(1)
        .select(F.col("id").alias("far_id"))
    )
    d2 = bfs_distances(und, far.select(F.col("far_id").alias("id")))
    row2 = (
        d2.orderBy(F.desc("dist"), F.asc("id")).limit(1).collect()[0]
    )
    s = start.collect()[0]["id"]
    return spark.createDataFrame(
        [(int(s), int(row2["source"]), int(row2["dist"]))],
        "start long, far_node long, lower_bound long",
    )
