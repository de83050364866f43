"""k-core decomposition — iterative peeling and h-index coreness.

Not present in the reference (graphina has no core decomposition), but a
standard link-graph primitive for crawl analysis (dense-subgraph seeding,
spam-farm detection) and for training-data curation (keep documents whose
pages sit in a well-connected core).  Both operators run over the simple
undirected projection (canonical deduped edges, self-loops dropped) — the
textbook k-core definition.

Two kernels, both pure DataFrame supersteps:

- :func:`k_core` — peel vertices of degree < k until fixpoint.  Each round is
  two semi-joins (restrict edges to surviving endpoints) + one count
  aggregation; survivors only shrink, so round r costs O(|E_r|) and the edge
  frame shrinks monotonically.  Rounds are bounded by the longest "peel
  chain" (≤ V worst case on a path, O(log V)-ish on web graphs).

- :func:`core_number` — full coreness via the distributed h-index iteration
  (Montresor, De Pellegrini, Miorandi, "Distributed k-Core Decomposition",
  IEEE TPDS 2013): init c(v) = deg(v); repeat c(v) ← min(c(v),
  H({c(u) : u ∈ N(v)})) where H is the h-index.  The estimate decreases
  monotonically to the exact coreness.  The h-index is computed without
  per-vertex arrays OR an edge-frame sort: using
  H = max over distinct values v of min(v, #{values ≥ v}), the kernel
  first hash-aggregates neighbor values into a per-vertex histogram
  (groupBy (id, cv) — map-side combine collapses a hub's repeated
  neighbor estimates, and core estimates cluster hard on web graphs),
  then runs the descending suffix-count window over only the DISTINCT
  (id, cv) rows.  The original row_number-over-all-neighbor-rows window
  sorted the full 2|E|-row frame every round — the same
  memory-bandwidth-bound per-round sort that throttled the LPA kernel's
  multi-core scaling (see operators/lpa.py, plans/argmax.py).

Scale notes (100 TB): the peeling path touches only surviving edges and is
the cheap way to answer "the k-core" for one k; coreness pays one window
shuffle + one gather shuffle per round with O(E) rows — the same per-round
cost envelope as PageRank.  Fixed-round variants (``fixed_rounds``) exist so
the DuckDB oracle can unroll the identical trajectory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from graphina_spark.graph import LinkGraph
from graphina_spark.plans.materialize import local_materialize as _mat


def _sym_simple(g: LinkGraph) -> DataFrame:
    """Both orientations of the canonical simple undirected edge set."""
    ce = g.canonical_undirected_edges(dedup=True)
    return ce.unionAll(
        ce.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


def k_core(
    g: LinkGraph, k: int, fixed_rounds: int | None = None, max_iter: int = 10_000
) -> DataFrame:
    """(id) — vertices of the k-core of the simple undirected projection.

    ``fixed_rounds=R`` runs exactly R peel rounds (the oracle-twin mode);
    default runs to fixpoint.  The k-core is the unique maximal subgraph with
    min degree ≥ k; peeling order doesn't affect the result, so synchronous
    whole-round peels are exact."""
    if k < 0:
        raise ValueError("k must be >= 0")
    if k == 0:
        # the 0-core is the whole vertex set (the degree join below would
        # silently drop isolated vertices, which have no edge rows)
        return g.vertices.select("id")
    sym = _sym_simple(g).repartition("src").cache()
    alive = g.vertices.select("id").transform(_mat)
    n_alive = None
    rounds = fixed_rounds if fixed_rounds is not None else max_iter
    for _ in range(rounds):
        deg = (
            sym.join(alive.withColumnRenamed("id", "src"), "src")
            .join(alive.withColumnRenamed("id", "dst"), "dst")
            .groupBy(F.col("src").alias("id"))
            .agg(F.count("*").alias("c"))
        )
        new = deg.where(F.col("c") >= k).select("id").transform(_mat)
        n_new = new.count()
        converged = n_alive is not None and n_new == n_alive
        # zero-degree vertices never reach `deg`, so round 1 always changes
        # the count for k >= 1 unless the graph already is its own k-core
        if n_alive is None:
            converged = False
        alive, n_alive = new, n_new
        if fixed_rounds is None and converged:
            break
    sym.unpersist()
    return alive


def core_number(
    g: LinkGraph, fixed_rounds: int | None = None, max_iter: int = 10_000
) -> DataFrame:
    """(id, core) — exact coreness per vertex (h-index iteration, see module
    docstring).  ``fixed_rounds=R`` runs exactly R update rounds for the
    DuckDB twin; default iterates to fixpoint (guaranteed: estimates are
    integers, monotone non-increasing, bounded below by the true coreness)."""
    sym = _sym_simple(g).repartition("src").cache()
    deg = sym.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("c"))
    cur = (
        g.vertices.select("id")
        .join(deg, "id", "left")
        .select("id", F.coalesce("c", F.lit(0)).cast("long").alias("c"))
        .transform(_mat)
    )
    w = (
        Window.partitionBy("id")
        .orderBy(F.desc("cv"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    rounds = fixed_rounds if fixed_rounds is not None else max_iter
    for _ in range(rounds):
        nbr = sym.join(
            cur.select(F.col("id").alias("dst"), F.col("c").alias("cv")), "dst"
        ).select(F.col("src").alias("id"), "cv")
        # histogram first (hash agg, map-side combine), then the suffix
        # count runs over only the distinct (id, cv) rows:
        # H = max over distinct cv of min(cv, #neighbors with value >= cv)
        hist = nbr.groupBy("id", "cv").agg(F.count("*").alias("k"))
        h = (
            hist.withColumn("ge", F.sum("k").over(w))
            .groupBy("id")
            .agg(F.max(F.least(F.col("cv"), F.col("ge"))).alias("h"))
        )
        new = (
            cur.join(h, "id", "left")
            .select(
                "id",
                F.least("c", F.coalesce("h", F.lit(0))).cast("long").alias("c"),
            )
            .transform(_mat)
        )
        if fixed_rounds is None:
            changed = (
                new.alias("n")
                .join(cur.alias("o"), "id")
                .where(F.col("n.c") != F.col("o.c"))
                .count()
            )
            cur = new
            if changed == 0:
                break
        else:
            cur = new
    sym.unpersist()
    return cur.select("id", F.col("c").alias("core"))


def s_core(
    g: LinkGraph, s: float, fixed_rounds: int | None = None, max_iter: int = 10_000
) -> DataFrame:
    """(id) — vertices of the s-core (weighted k-core; Garas et al. 2012
    "A k-shell decomposition method for weighted networks"): the maximal
    subgraph in which every vertex has incident STRENGTH ≥ s, strength being
    the sum of surviving incident edge weights.

    Edge weights on the undirected projection: parallel/antiparallel directed
    edges between a pair merge by SUM (one groupBy — the natural projection
    of a directed weighted multigraph).  With integer-valued weights the
    per-round strengths are exact in double, so synchronous peeling is
    bit-deterministic; ``fixed_rounds=R`` is the unrolled-oracle contract.

    Scale shape: identical to :func:`k_core` — one alive-semijoin + one
    map-side-combinable sum per round over a monotonically shrinking edge
    set; the merge groupBy happens once up front.
    """
    cew = (
        g.edges.select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
            "weight",
        )
        .where(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.sum("weight").alias("w"))
    )
    sym = (
        cew.unionAll(
            cew.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w")
        )
        .repartition("src")
        .cache()
    )
    alive = g.vertices.select("id").transform(_mat)
    n_alive = None
    rounds = fixed_rounds if fixed_rounds is not None else max_iter
    for _ in range(rounds):
        st = (
            sym.join(alive.withColumnRenamed("id", "src"), "src")
            .join(alive.withColumnRenamed("id", "dst"), "dst")
            .groupBy(F.col("src").alias("id"))
            .agg(F.sum("w").alias("c"))
        )
        new = st.where(F.col("c") >= s).select("id").transform(_mat)
        n_new = new.count()
        converged = n_alive is not None and n_new == n_alive
        if n_alive is None:
            converged = False
        alive, n_alive = new, n_new
        if fixed_rounds is None and converged:
            break
    sym.unpersist()
    return alive


def onion_decomposition(
    g: LinkGraph, fixed_rounds: int | None = None, max_iter: int = 10_000
) -> DataFrame:
    """(id, core, layer) — onion decomposition (Hébert-Dufresne, Grochow,
    Allard, Sci. Rep. 2016): the k-core peel refined with the ROUND at which
    each vertex leaves.  Per round: k rises to the min alive degree when the
    current core is exhausted, every alive vertex with degree ≤ k peels with
    (core=k, layer=round).  The core column provably equals the coreness
    (the h-index kernel above — pinned by a pytest cross-check); the layer
    profile is the paper's topological-anomaly signature (e.g. loopy vs
    tree-like cores) and a finer spam/template signal than coreness alone.

    Scale shape: identical to :func:`k_core` — each round two alive
    semi-joins + one map-side-combinable count over a monotonically
    shrinking edge frame, plus one scalar min() action; rounds = #layers
    (empirically O(polylog V) on heavy-tailed graphs).  ``fixed_rounds=R``
    runs exactly R peel rounds (the unrolled-oracle contract — vertices
    still alive after R rounds emit no row on either engine)."""
    sym = _sym_simple(g).repartition("src").cache()
    alive = g.vertices.select("id").transform(_mat)
    spark = alive.sparkSession
    acc = spark.createDataFrame([], "id long, core long, layer long")
    k_cur = 0
    rounds = fixed_rounds if fixed_rounds is not None else max_iter
    for layer in range(1, rounds + 1):
        deg = (
            sym.join(alive.withColumnRenamed("id", "src"), "src")
            .join(alive.withColumnRenamed("id", "dst"), "dst")
            .groupBy(F.col("src").alias("id"))
            .agg(F.count("*").alias("c"))
        )
        ad = alive.join(deg, "id", "left").select(
            "id", F.coalesce("c", F.lit(0)).cast("long").alias("c")
        ).transform(_mat)
        row = ad.agg(F.min("c").alias("m")).collect()[0]
        if row["m"] is None:
            break
        k_cur = max(k_cur, int(row["m"]))
        acc = acc.unionAll(
            ad.where(F.col("c") <= k_cur).select(
                "id", F.lit(k_cur).cast("long").alias("core"),
                F.lit(layer).cast("long").alias("layer"),
            )
        ).transform(_mat)
        alive = ad.where(F.col("c") > k_cur).select("id").transform(_mat)
    sym.unpersist()
    return acc
