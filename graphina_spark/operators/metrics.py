"""Graph-level metrics: density, average degree/clustering, assortativity.

Reference: /root/reference/src/metrics/graph_metrics.rs — transitivity
(:146-215, in operators/triangles.py), average clustering (:125-139),
assortativity (:264-306, Newman symmetric Pearson with both orderings per
edge).  Diameter/radius/average-path-length (:40-108, :224-253) are all-pairs
BFS — non-goals at web scale (documented in SURVEY §2.2); everything here is
one or two shuffles.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from graphina_spark.graph import LinkGraph


def density(g: LinkGraph) -> float:
    """E/(n(n-1)) directed, 2E/(n(n-1)) undirected; 0 for n < 2."""
    n = g.num_vertices()
    if n < 2:
        return 0.0
    e = g.num_edges()
    d = e / (n * (n - 1))
    return d if g.directed else 2.0 * d


def average_degree(g: LinkGraph) -> float:
    n = g.num_vertices()
    if n == 0:
        return 0.0
    return g.degrees().agg(F.avg("deg")).first()[0] or 0.0


def average_clustering_coefficient(g: LinkGraph) -> float:
    """Mean of per-node local clustering coefficients (graph_metrics.rs:125-139
    — includes degree<2 nodes as 0)."""
    from graphina_spark.operators.triangles import clustering_coefficients

    if g.vertices.isEmpty():
        return 0.0
    return clustering_coefficients(g).agg(F.avg("clustering")).first()[0] or 0.0


def modularity(g: LinkGraph, communities) -> float:
    """Newman modularity Q = Σ_c [ Σin_c/(2m) − (Σtot_c/(2m))² ] over the
    weighted undirected view — the quantity the reference's community oracle
    pins (tests/oracle_community_tests.rs:150, quality not labels).

    ``communities`` is a DataFrame (id, community).  Conventions: m = total
    weight of the symmetrized edge frame / 2; Σtot = weighted degree sum
    (self-loop counts twice); Σin = twice the intra-community weight
    (self-loop twice).
    """
    from pyspark.sql import functions as F  # local alias for clarity

    sym = g.symmetric_edges()
    com = communities.select("id", "community")
    m2 = sym.agg(F.sum("weight")).first()[0] or 0.0  # = 2m
    if m2 == 0:
        return 0.0
    lab = (
        sym.join(com.select(F.col("id").alias("src"), F.col("community").alias("cs")), "src")
        .join(com.select(F.col("id").alias("dst"), F.col("community").alias("cd")), "dst")
    )
    row = lab.agg(
        F.sum(F.when(F.col("cs") == F.col("cd"), F.col("weight"))).alias("w_in")
    ).first()
    w_in = row["w_in"] or 0.0  # already both directions = 2×intra
    tot = (
        sym.groupBy("src")
        .agg(F.sum("weight").alias("dw"))
        .join(com.select(F.col("id").alias("src"), "community"), "src")
        .groupBy("community")
        .agg(F.sum("dw").alias("tot"))
        .agg(F.sum(F.pow(F.col("tot") / F.lit(m2), 2)))
        .first()[0]
        or 0.0
    )
    return w_in / m2 - tot


def assortativity(g: LinkGraph) -> float:
    """Newman degree assortativity — Pearson over the symmetric joint degree
    distribution of edge endpoints, each edge contributing both orderings
    (graph_metrics.rs:264-306).  One edge scan + one degree join."""
    if g.edges.isEmpty():
        return 0.0
    deg = g.degrees().select("id", F.col("deg").cast("double").alias("d"))
    jk = (
        g.edges.select("src", "dst")
        .join(deg.select(F.col("id").alias("src"), F.col("d").alias("j")), "src")
        .join(deg.select(F.col("id").alias("dst"), F.col("d").alias("k")), "dst")
    )
    row = jk.agg(
        F.count("*").alias("e"),
        F.sum(2.0 * F.col("j") * F.col("k")).alias("sum_jk"),
        F.sum(F.col("j") + F.col("k")).alias("sum_j"),
        F.sum(F.col("j") * F.col("j") + F.col("k") * F.col("k")).alias("sum_j2"),
    ).first()
    m = 2.0 * row["e"]
    num = row["sum_jk"] / m - (row["sum_j"] / m) ** 2
    den = row["sum_j2"] / m - (row["sum_j"] / m) ** 2
    if den == 0.0:
        return 0.0
    return num / den


def attribute_assortativity(g: LinkGraph, labels) -> float:
    """Newman categorical-mixing assortativity (Newman 2003 eq. 2) over a
    discrete vertex attribute: r = (Σ_x e_xx − Σ_x a_x·b_x) /
    (1 − Σ_x a_x·b_x), where e_xy is the fraction of edges from label x to
    label y, a = row sums, b = column sums.  Each directed edge contributes
    once; edges with an unlabeled endpoint are ignored.  +1 = every edge
    stays inside its label class (e.g. links never leave a host), 0 = random
    mixing, negative = disassortative.

    Complements ``assortativity`` (degree mixing, the reference's
    graph_metrics.rs:264-306) for the attribute case the reference lacks —
    the standard "do pages link within their own host/language?" readout.

    Scale shape: two label joins onto the edge frame (labels are (id, label),
    broadcast when small), one ``groupBy(la, lb)`` contingency whose size is
    bounded by (#labels)², then three tiny aggs — no self-joins, nothing
    driver-side but the final 3-scalar formula.
    """
    lab = labels.select("id", "label")
    e = (
        g.edges.select("src", "dst")
        .join(lab.select(F.col("id").alias("src"), F.col("label").alias("la")), "src")
        .join(lab.select(F.col("id").alias("dst"), F.col("label").alias("lb")), "dst")
    )
    cont = e.groupBy("la", "lb").agg(F.count("*").alias("n"))
    total = cont.agg(F.sum("n").alias("m"))
    exy = cont.crossJoin(F.broadcast(total)).select(
        "la", "lb", (F.col("n") / F.col("m")).alias("e")
    )
    trace = exy.where(F.col("la") == F.col("lb")).agg(
        F.coalesce(F.sum("e"), F.lit(0.0)).alias("t")
    )
    ab = (
        exy.groupBy("la").agg(F.sum("e").alias("a"))
        .join(
            exy.groupBy("lb").agg(F.sum("e").alias("b")).withColumnRenamed("lb", "la"),
            "la",
            "inner",
        )
        .agg(F.coalesce(F.sum(F.col("a") * F.col("b")), F.lit(0.0)).alias("s"))
    )
    row = trace.crossJoin(ab).first()
    if row is None:
        return 0.0
    t, s = row["t"], row["s"]
    if 1.0 - s == 0.0:
        return 1.0  # single label class: perfectly assortative by convention
    return (t - s) / (1.0 - s)


def reciprocity(g: LinkGraph) -> float:
    """Fraction of directed edges whose reverse edge also exists
    (overall reciprocity; self-loops dropped, parallel edges collapsed).
    1.0 by definition on undirected graphs.

    One distinct + one left-semi self-join keyed on the reversed pair —
    shuffle-partitioned by (src, dst), no fan-out (semi-join emits at most
    the probe side)."""
    if not g.directed:
        return 1.0
    from graphina_spark.plans.materialize import local_materialize as _mat

    e = (
        g.edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .transform(_mat)
    )
    tot = e.count()
    if tot == 0:
        return 0.0
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    rec = e.join(rev, ["src", "dst"], "left_semi").count()
    return rec / tot


def degree_histogram(g: LinkGraph, kind: str = "total"):
    """(deg: long, n: long) — vertex count per degree value (the power-law
    readout every crawl report starts with).  ``kind`` ∈ total|in|out.
    One aggregation over the cached degrees frame."""
    col = {"total": "deg", "in": "in_deg", "out": "out_deg"}[kind]
    return (
        g.degrees()
        .groupBy(F.col(col).cast("long").alias("deg"))
        .agg(F.count("*").alias("n"))
    )


def rich_club(g: LinkGraph, k: int):
    """1 row (n_k, e_k, phi) — rich-club coefficient φ(k) = 2·E_k /
    (N_k·(N_k−1)) over the undirected simple view (Zhou & Mondragón 2004):
    how densely the hubs (degree > k) interconnect.  Shape: one degree
    aggregation + two semi-joins + two counts; φ is a single integer
    division (bit-identical across engines)."""
    from graphina_spark.plans.materialize import local_materialize as _mat

    ce = g.canonical_undirected_edges(dedup=True).transform(_mat)
    deg = (
        ce.select(F.col("src").alias("id"))
        .unionAll(ce.select(F.col("dst").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("d"))
    )
    rich = deg.where(F.col("d") > k).select("id").transform(_mat)
    n_k = rich.count()
    e_k = (
        ce.join(rich.withColumnRenamed("id", "src"), "src", "left_semi")
        .join(rich.withColumnRenamed("id", "dst"), "dst", "left_semi")
        .count()
    )
    phi = (2.0 * e_k) / (n_k * (n_k - 1)) if n_k >= 2 else 0.0
    return g.vertices.sparkSession.createDataFrame(
        [(n_k, e_k, float(phi))], "n_k long, e_k long, phi double"
    )


def average_neighbor_degree(g: LinkGraph):
    """(id, avg_nbr_deg) — mean degree of each vertex's distinct neighbors
    over the undirected simple view (the k_nn assortativity profile's
    per-node form); 0.0 for isolated vertices.  One symmetrize + two hash
    aggregations + one join; the mean is one integer division."""
    ce = g.canonical_undirected_edges(dedup=True)
    sym = ce.unionAll(
        ce.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = sym.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("d"))
    nbr = (
        sym.join(deg.withColumnRenamed("id", "dst"), "dst")
        .groupBy(F.col("src").alias("id"))
        .agg(F.sum("d").alias("sd"), F.count("*").alias("nd"))
    )
    return (
        g.vertices.select("id")
        .join(nbr, "id", "left")
        .select(
            "id",
            F.coalesce(F.col("sd") / F.col("nd"), F.lit(0.0)).alias(
                "avg_nbr_deg"
            ),
        )
    )


def powerlaw_alpha_mle(g: LinkGraph, kmin: int = 5, kind: str = "in"):
    """1 row (kmin, n_tail, alpha, sigma) — continuous-approximation MLE of
    the power-law exponent over the degree tail (Clauset, Shalizi & Newman,
    SIAM Review 2009, eq. 3.7):

        alpha = 1 + n / Σ_{k_i >= kmin} ln(k_i / (kmin − 1/2)),
        sigma = (alpha − 1) / sqrt(n)   (standard error, eq. 3.6).

    The one-scalar readout behind every "the web is a power law with
    α ≈ 2.1" claim (Broder WWW 2000 measures exactly this on the crawl
    in-degree distribution) — fitted here without collecting degrees: the
    whole estimator is one filter + one 2-scalar aggregation over the cached
    degrees frame, so it costs the same at 10¹² vertices as at 10³.
    ``kind`` ∈ total|in|out (web convention: in).  NULL alpha when the tail
    is empty.  DuckDB twin: oracles.py::powerlaw_web_sql.
    """
    col = {"total": "deg", "in": "in_deg", "out": "out_deg"}[kind]
    tail = g.degrees().where(F.col(col) >= kmin)
    return tail.agg(
        F.lit(kmin).cast("long").alias("kmin"),
        F.count("*").alias("n_tail"),
        F.round(
            1.0 + F.count("*") / F.sum(F.log(F.col(col) / (kmin - 0.5))), 6
        ).alias("alpha"),
        F.round(
            (F.count("*") / F.sum(F.log(F.col(col) / (kmin - 0.5))))
            / F.sqrt(F.count("*")),
            6,
        ).alias("sigma"),
    )


def square_count(g: LinkGraph, max_middle_degree: int | None = None):
    """One row ``(squares bigint)`` — the number of 4-cycles (C4 subgraphs,
    chords allowed) in the simple undirected structure:

        #C4 = Σ_{u<v} C(cn(u,v), 2) / 2

    (each square is counted once per diagonal; every 4-cycle has exactly 2).
    The quadrilateral census is the unipartite twin of the bipartite
    butterfly count (operators/butterflies.py) — the standard density
    readout for co-citation/co-linking structure on web graphs.

    Reuses the links family's single-shuffle wedge kernel
    (links._pair_stats), inheriting its middle-degree hub cap (default
    DEFAULT_MAX_MIDDLE_DEGREE; squares through super-hub middles are
    excluded — documented bias, same trade as the links family).  The
    arithmetic stays integer end to end.  DuckDB twin:
    oracles.py::squares_web_sql."""
    from graphina_spark.operators.links import (
        DEFAULT_MAX_MIDDLE_DEGREE,
        _pair_stats,
    )

    if max_middle_degree is None:
        max_middle_degree = DEFAULT_MAX_MIDDLE_DEGREE
    stats = _pair_stats(g, max_middle_degree=max_middle_degree)
    pair_diags = F.sum(
        (F.col("cn") * (F.col("cn") - 1) / F.lit(2)).cast("long")
    )
    return stats.agg(
        (F.coalesce(pair_diags, F.lit(0)) / F.lit(2)).cast("long").alias("squares")
    )


def joint_degree_distribution(g: LinkGraph) -> DataFrame:
    """(k1, k2, n_edges) — the joint degree matrix J(k1, k2): how many
    simple undirected edges connect a degree-k1 vertex to a degree-k2
    vertex, keyed canonically k1 ≤ k2 (each edge counted once).  The full
    degree-correlation object behind the scalar assortativity and the
    k_nn curve (Newman 2002's mixing matrix) — the standard fingerprint
    for comparing a crawl against its null model at the structure level.

    All-integer: one symmetrize, one degree agg, two broadcast-sized maps
    of degree onto endpoints (id-keyed joins), one groupBy((k1, k2)) with
    map-side combine — output rows bounded by distinct degree pairs
    (O(d_max²) worst case, tiny on power-law graphs)."""
    ce = g.canonical_undirected_edges(dedup=True)
    sym = ce.unionAll(
        ce.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = sym.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("d"))
    return (
        ce.join(deg.select(F.col("id").alias("src"), F.col("d").alias("du")), "src")
        .join(deg.select(F.col("id").alias("dst"), F.col("d").alias("dv")), "dst")
        .select(
            F.least("du", "dv").alias("k1"), F.greatest("du", "dv").alias("k2")
        )
        .groupBy("k1", "k2")
        .agg(F.count("*").alias("n_edges"))
    )


def attack_robustness(
    g: LinkGraph, remove_counts: tuple[int, ...] = (0, 10, 50)
) -> DataFrame:
    """(removed, n_left, giant_size, n_components) — targeted-attack
    percolation readout (Albert, Jeong & Barabási, Nature 2000): remove the
    ``k`` highest-degree hubs (ties by min id — deterministic) and measure
    what remains of the undirected graph.  Scale-free crawl graphs are
    famously robust to random failure and fragile to exactly this attack;
    the curve is the standard resilience summary for a web snapshot.

    Composition of gated kernels: hub selection = one global top-k over the
    degree frame (TakeOrderedAndProject); per k, two broadcast anti-joins
    restrict the edge set and the gated hash-min components kernel runs on
    the survivor graph.  Cost: |remove_counts| component runs — each
    O(log d) rounds — over monotonically smaller graphs; nothing here adds
    a new shuffle shape."""
    from graphina_spark.graph import LinkGraph as _LG
    from graphina_spark.operators.components import connected_components

    spark = g.vertices.sparkSession
    # cache once: every k re-reads the canonical edge set and the degrees
    ce = g.canonical_undirected_edges(dedup=True).cache()
    sym = ce.unionAll(
        ce.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = sym.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("d")).cache()
    out_rows = []
    n_total = g.vertices.count()
    for k in remove_counts:
        if k > 0:
            hubs = deg.orderBy(F.desc("d"), F.asc("id")).limit(k).select("id")
            # the degree frame only covers non-isolated vertices, so fewer
            # than k hubs may exist; survivors = n_total - hubs ACTUALLY
            # removed, not n_total - k
            n_removed = hubs.count()
            verts = g.vertices.select("id").join(hubs, "id", "left_anti")
            edges = (
                ce.join(F.broadcast(hubs.withColumnRenamed("id", "src")), "src",
                        "left_anti")
                .join(F.broadcast(hubs.withColumnRenamed("id", "dst")), "dst",
                      "left_anti")
            )
        else:
            n_removed = 0
            verts, edges = g.vertices.select("id"), ce
        sub = _LG.from_edges(
            edges.select("src", "dst"), directed=False, vertices=verts
        )
        comp = connected_components(sub)
        sizes = comp.groupBy("component").agg(F.count("*").alias("n"))
        row = sizes.agg(
            F.max("n").alias("giant"), F.count("*").alias("nc")
        ).collect()[0]
        out_rows.append(
            (k, n_total - n_removed, int(row["giant"] or 0), int(row["nc"] or 0))
        )
    ce.unpersist()
    deg.unpersist()
    return spark.createDataFrame(
        out_rows, "removed int, n_left long, giant_size long, n_components long"
    )


def degree_inequality(g: LinkGraph) -> DataFrame:
    """One row (gini, hhi, top1_share, top10_share, n) — concentration
    readouts of the IN-degree distribution, the crawl-monitoring numbers
    for "how hub-dominated is this snapshot":

    - Gini via the rank formula G = (2·Σ i·d_i)/(n·Σ d_i) − (n+1)/n over
      degrees sorted ascending (i = 1-based rank) — computed with ONE
      global-ordering two-pass prefix rank (the packing/quantiles posture:
      per-partition ranks + broadcast offsets, no single-task window);
      here degrees are small-cardinality so ranks come from a value-keyed
      prefix sum over the degree HISTOGRAM (shuffle carries distinct
      degree values, never vertices);
    - HHI = Σ (d_i / Σd)² (Herfindahl–Hirschman market concentration);
    - top-k share via the same histogram suffix sums (k = 1% / 10% of n).

    All from one in-degree aggregation + one histogram groupBy; exact
    integer arithmetic until the final divisions.
    """
    indeg = g.edges.groupBy(F.col("dst").alias("id")).agg(
        F.count("*").alias("d")
    )
    deg = (
        g.vertices.select("id")
        .join(indeg, "id", "left")
        .select(F.coalesce("d", F.lit(0)).cast("long").alias("d"))
    )
    hist = deg.groupBy("d").agg(F.count("*").alias("c"))
    rows = sorted((r["d"], r["c"]) for r in hist.collect())  # distinct degrees
    n = sum(c for _, c in rows)
    total = sum(d * c for d, c in rows)
    spark = g.vertices.sparkSession
    if n == 0 or total == 0:
        return spark.createDataFrame(
            [(0.0, 0.0, 0.0, 0.0, n)],
            "gini double, hhi double, top1_share double, top10_share double, n long",
        )
    # ascending ranks: a degree-d block of c vertices occupies ranks
    # (start+1 .. start+c); sum of i*d over the block = d*(c*start + c(c+1)/2)
    s_id, start = 0, 0
    for d, c in rows:
        s_id += d * (c * start + c * (c + 1) // 2)
        start += c
    gini = (2.0 * s_id) / (n * total) - (n + 1) / n
    hhi = sum(c * (d / total) ** 2 for d, c in rows)
    def top_share(k: int) -> float:
        left, acc = k, 0
        for d, c in reversed(rows):
            take = min(left, c)
            acc += take * d
            left -= take
            if left == 0:
                break
        return acc / total
    return spark.createDataFrame(
        [(
            round(gini, 6), round(hhi, 6),
            round(top_share(max(1, n // 100)), 6),
            round(top_share(max(1, n // 10)), 6), n,
        )],
        "gini double, hhi double, top1_share double, top10_share double, n long",
    )


def random_failure_robustness(
    g: LinkGraph,
    fractions: tuple[float, ...] = (0.0, 0.25, 0.5),
    salt: str = "fail",
) -> DataFrame:
    """(frac, n_left, giant_size, n_components) — RANDOM-failure
    percolation, the control curve for :func:`attack_robustness` (the
    Albert-Jeong-Barabási contrast: scale-free graphs barely notice random
    loss at fractions that targeted attack turns to dust).  "Random" is the
    repo's deterministic md5-bucket vertex sample (sampling.py convention),
    so both engines drop the identical vertex sets.  Same composition:
    per fraction, two anti-joins + the gated hash-min components kernel."""
    from graphina_spark.graph import LinkGraph as _LG
    from graphina_spark.operators.components import connected_components
    from graphina_spark.operators.sampling import _hex_threshold, split_bucket

    spark = g.vertices.sparkSession
    ce = g.canonical_undirected_edges(dedup=True).cache()
    out_rows = []
    for frac in fractions:
        thr = _hex_threshold(frac)
        dropped = F.substring(
            F.md5(F.concat(F.lit(f"{salt}:"), F.col("id").cast("string"))), 1, 8
        ) < F.lit(thr)
        verts = g.vertices.select("id").where(~dropped)
        keep_src = verts.withColumnRenamed("id", "src")
        keep_dst = verts.withColumnRenamed("id", "dst")
        edges = ce.join(keep_src, "src", "left_semi").join(
            keep_dst, "dst", "left_semi"
        )
        sub = _LG.from_edges(
            edges.select("src", "dst"), directed=False, vertices=verts
        )
        n_left = verts.count()
        if n_left == 0:
            out_rows.append((float(frac), 0, 0, 0))
            continue
        sizes = connected_components(sub).groupBy("component").agg(
            F.count("*").alias("n")
        )
        row = sizes.agg(F.max("n").alias("g"), F.count("*").alias("nc")).collect()[0]
        out_rows.append((float(frac), n_left, int(row["g"] or 0), int(row["nc"] or 0)))
    ce.unpersist()
    return spark.createDataFrame(
        out_rows, "frac double, n_left long, giant_size long, n_components long"
    )
