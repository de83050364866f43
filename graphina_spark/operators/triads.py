"""Directed triad census (Holland–Leinhardt 16 types).

The triad census — counts of all C(n,3) vertex triples by directed
isomorphism class (003, 012, 102, 021D/U/C, 111D/U, 030T/C, 201,
120D/U/C, 210, 300) — is the classic structural readout for directed
social/web graphs, and the natural companion to the reference's triangle
and reciprocity metrics (src/metrics/graph_metrics.rs:146-215,
src/parallel/triangles.rs:32-66).  Naming convention matches the
published standard (Holland & Leinhardt 1976; Batagelj & Mrvar 2001;
the same convention NetworkX's ``triadic_census`` documents):

    021D: A<-B->C      021U: A->B<-C      021C: A->B->C
    111D: A<->B<-C     111U: A<->B->C
    030T: A->B<-C, A->C (transitive)      030C: A->B->C->A (cyclic)
    120D: A<-B->C, A<->C                  120U: A->B<-C, A<->C
    120C: A->B->C, A<->C

Spark formulation — the Batagelj–Mrvar *complement* method, which never
enumerates disconnected or singly-connected triples:

1. dyads: one row per connected unordered pair with a code
   {1: lo->hi, 2: hi->lo, 3: mutual}.  M/A scalars by aggregation.
2. triads with 3 connected dyads = triangles of the *support* graph
   (any-direction edges), enumerated ONCE via the same degree-ordered
   orientation as operators/triangles.py (join fan-out bounded by
   oriented out-degree ~ O(sqrt(m)), hub-safe); each triangle's 6-bit
   adjacency code classifies through a 64-entry lookup built at import
   time from first-principles invariants (not a transcribed constant
   table).
3. triads with exactly 2 connected dyads (wedges): counted WITHOUT pair
   enumeration — per-middle-vertex combinatorics over its mutual (m),
   asym-out (o), asym-in (i) dyad counts:
       021D += C(o,2)   021U += C(i,2)   021C += o*i
       111U += m*o      111D += m*i      201  += C(m,2)
   minus the 3 corner-wedges of every enumerated triangle (each support
   triangle is counted once per corner by the combinatorial pass).
4. triads with exactly 1 connected dyad: per-dyad arithmetic
       (n-2) - (d(u)-1) - (d(v)-1) + cn(u,v)
   summed per dyad code; the sum of common-neighbour counts per code is
   read off the triangle pass (each triangle contributes its 3 pair
   codes).  012 from asymmetric dyads, 102 from mutual dyads.
5. 003 = C(n,3) - everything else.

Everything heavy is joins + aggregations; the driver assembles 16 rows
from a handful of scalar aggregates (same shape as transitivity).
DuckDB twin: oracles.py::triad_census_web_sql (mirrors the identical
math; the classification convention itself is pinned independently by
hand-built fixtures in tests/test_triads.py).
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphina_spark.graph import LinkGraph

TRIAD_NAMES = (
    "003", "012", "102", "021D", "021U", "021C", "111D", "111U",
    "030T", "030C", "201", "120D", "120U", "120C", "210", "300",
)

# wedge classes indexed by (center-relative dyad kind pair); kinds are
# 'o' (asym out of the center), 'i' (asym into the center), 'm' (mutual)
_WEDGE_CLASS = {
    frozenset(("o",)): "021D",   # o+o
    frozenset(("i",)): "021U",   # i+i
    frozenset(("o", "i")): "021C",
    frozenset(("m", "o")): "111U",
    frozenset(("m", "i")): "111D",
    frozenset(("m",)): "201",    # m+m
}


def _classify_bits(bits: int) -> str:
    """Name the isomorphism class of a 3-node digraph given as a 6-bit
    adjacency code over id-ordered vertices (a < b < c):

        bit 1: a->b   bit 2: b->a   bit 4: a->c
        bit 8: c->a   bit 16: b->c  bit 32: c->b

    Classification is by first-principles invariants (dyad-type counts +
    degree structure), the published definitions above — deliberately NOT
    a copied lookup table, so the table we build from it is verifiable.
    """
    edges = set()
    for bit, (s, d) in zip(
        (1, 2, 4, 8, 16, 32),
        ((0, 1), (1, 0), (0, 2), (2, 0), (1, 2), (2, 1)),
    ):
        if bits & bit:
            edges.add((s, d))
    pair_kind = {}
    for u, v in combinations(range(3), 2):
        fwd, back = (u, v) in edges, (v, u) in edges
        pair_kind[(u, v)] = "m" if (fwd and back) else ("a" if (fwd or back) else "n")
    m = sum(1 for k in pair_kind.values() if k == "m")
    a = sum(1 for k in pair_kind.values() if k == "a")
    n = 3 - m - a
    prefix = f"{m}{a}{n}"
    if prefix in ("003", "012", "102", "201", "210", "300"):
        return prefix
    asym = {e for e in edges if pair_kind[tuple(sorted(e))] == "a"}
    out = [sum(1 for s, _ in asym if s == v) for v in range(3)]
    inn = [sum(1 for _, d in asym if d == v) for v in range(3)]
    if prefix == "021":
        if 2 in out:
            return "021D"
        if 2 in inn:
            return "021U"
        return "021C"
    if prefix == "030":
        cyclic = all(out[v] == 1 and inn[v] == 1 for v in range(3))
        return "030C" if cyclic else "030T"
    # one mutual dyad: find the vertex outside it
    (mu, mv) = next(p for p, k in pair_kind.items() if k == "m")
    w = ({0, 1, 2} - {mu, mv}).pop()
    if prefix == "111":
        return "111D" if out[w] == 1 else "111U"
    if prefix == "120":
        if out[w] == 2:
            return "120D"
        if inn[w] == 2:
            return "120U"
        return "120C"
    raise AssertionError(f"unreachable prefix {prefix}")  # pragma: no cover


#: 64-entry tricode -> class-name table, derived (not transcribed)
TRICODE_CLASS = tuple(_classify_bits(code) for code in range(64))


def _dyads(g: LinkGraph) -> DataFrame:
    """(u, v, code) — one row per connected unordered pair, u < v,
    code 1 = u->v only, 2 = v->u only, 3 = mutual.  Self-loops dropped,
    parallel edges collapsed (census is over the simple digraph)."""
    e = g.edges.select("src", "dst").where(F.col("src") != F.col("dst")).distinct()
    return (
        e.select(
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("v"),
            F.when(F.col("src") < F.col("dst"), F.lit(1)).otherwise(F.lit(2)).alias("d"),
        )
        .groupBy("u", "v")
        # 1 and 2 sum to 3 exactly when both directions are present
        .agg(F.sum(F.col("d")).cast("int").alias("code"))
    )


def _support_triangles(dyads: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(triangles, edir_cached): triangles = (a, b, c, code_ab, code_ac,
    code_bc) with a < b < c — each support triangle once, via degree-ordered
    orientation (triangles.py shape).  ``edir_cached`` is the cached oriented
    edge frame the 3-way self-join scans (cached so the deg-agg + orientation
    subtree is computed once, not once per join branch); the caller owns its
    lifecycle — unpersist after materializing the triangles."""
    deg = (
        dyads.select(F.col("u").alias("id"))
        .unionAll(dyads.select(F.col("v").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("deg"))
    )
    e = (
        dyads.join(deg.withColumnRenamed("id", "u"), "u")
        .withColumnRenamed("deg", "du")
        .join(
            deg.select(F.col("id").alias("v"), F.col("deg").alias("dv")), "v"
        )
    )
    lower = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    # oriented from lower to higher (deg, id) rank; keep the canonical
    # (min-id, max-id) dyad code alongside
    edir = e.select(
        F.when(lower, F.col("u")).otherwise(F.col("v")).alias("s"),
        F.when(lower, F.col("v")).otherwise(F.col("u")).alias("d"),
        "code",
    ).cache()
    e1 = edir.select(F.col("s").alias("x"), F.col("d").alias("y"), F.col("code").alias("cxy"))
    e2 = edir.select(F.col("s").alias("y"), F.col("d").alias("z"), F.col("code").alias("cyz"))
    e3 = edir.select(F.col("s").alias("x"), F.col("d").alias("z"), F.col("code").alias("cxz"))
    tri = e1.join(e2, "y").join(e3, ["x", "z"])
    # re-sort the corners by id; route each canonical dyad code to its
    # id-sorted pair via a filter over the 3 (lo, hi, code) structs
    pairs = F.array(
        F.struct(F.least("x", "y").alias("lo"), F.greatest("x", "y").alias("hi"), F.col("cxy").alias("code")),
        F.struct(F.least("y", "z").alias("lo"), F.greatest("y", "z").alias("hi"), F.col("cyz").alias("code")),
        F.struct(F.least("x", "z").alias("lo"), F.greatest("x", "z").alias("hi"), F.col("cxz").alias("code")),
    )
    ids = F.array_sort(F.array("x", "y", "z"))
    a, b, c = ids[0], ids[1], ids[2]

    def _code(lo, hi):
        return F.element_at(
            F.filter(pairs, lambda s: (s["lo"] == lo) & (s["hi"] == hi)), 1
        )["code"]

    return (
        tri.select(
            a.alias("a"),
            b.alias("b"),
            c.alias("c"),
            _code(a, b).alias("code_ab"),
            _code(a, c).alias("code_ac"),
            _code(b, c).alias("code_bc"),
        ),
        edir,
    )


def triad_census(g: LinkGraph) -> DataFrame:
    """16-row ``(triad string, count bigint)`` census over all C(n,3)
    vertex triples of the directed simple graph, in TRIAD_NAMES order.

    See the module docstring for the distributed shape; requires a
    directed graph (an undirected graph's census is degenerate — every
    connected dyad is mutual)."""
    spark = g.edges.sparkSession
    dyads = _dyads(g).persist()
    try:
        n = g.num_vertices()

        # --- dyad scalars ------------------------------------------------
        row = dyads.agg(
            F.coalesce(F.sum(F.when(F.col("code") == 3, 1).otherwise(0)), F.lit(0)).alias("m"),
            F.coalesce(F.sum(F.when(F.col("code") != 3, 1).otherwise(0)), F.lit(0)).alias("a"),
        ).collect()[0]
        n_mutual, n_asym = int(row["m"]), int(row["a"])

        # --- triangles (3 connected dyads), classified --------------------
        tri, edir = _support_triangles(dyads)
        tri = tri.persist()
        tri.count()  # materialize once, then the oriented frame can go
        edir.unpersist()
        tricode = (
            F.when(F.col("code_ab") == 1, 1).when(F.col("code_ab") == 2, 2).otherwise(3)
            + F.when(F.col("code_ac") == 1, 4).when(F.col("code_ac") == 2, 8).otherwise(12)
            + F.when(F.col("code_bc") == 1, 16).when(F.col("code_bc") == 2, 32).otherwise(48)
        )
        lut = F.array(*[F.lit(c) for c in TRICODE_CLASS])
        tri_counts = {
            r["triad"]: int(r["cnt"])
            for r in tri.select(F.element_at(lut, tricode + 1).alias("triad"))
            .groupBy("triad")
            .agg(F.count("*").alias("cnt"))
            .collect()
        }

        # --- per-triangle corner corrections + per-code pair sums ---------
        def _corner_kind(code, is_lo):
            # kind of a dyad relative to one endpoint: canonical code 1 is
            # lo->hi (out of lo, into hi), 2 the reverse, 3 mutual
            return (
                F.when(code == 3, F.lit("m"))
                .when(code == (1 if is_lo else 2), F.lit("o"))
                .otherwise(F.lit("i"))
            )

        def _wclass(k1, k2):
            pair = F.concat(F.least(k1, k2), F.greatest(k1, k2))
            return (
                F.when(pair == "oo", F.lit("021D"))
                .when(pair == "ii", F.lit("021U"))
                .when(pair == "io", F.lit("021C"))
                .when(pair == "mo", F.lit("111U"))
                .when(pair == "im", F.lit("111D"))
                .otherwise(F.lit("201"))  # mm
            )

        corners = tri.select(
            F.explode(
                F.array(
                    _wclass(
                        _corner_kind(F.col("code_ab"), True),
                        _corner_kind(F.col("code_ac"), True),
                    ),
                    _wclass(
                        _corner_kind(F.col("code_ab"), False),
                        _corner_kind(F.col("code_bc"), True),
                    ),
                    _wclass(
                        _corner_kind(F.col("code_ac"), False),
                        _corner_kind(F.col("code_bc"), False),
                    ),
                )
            ).alias("wclass")
        )
        corner_counts = {
            r["wclass"]: int(r["cnt"])
            for r in corners.groupBy("wclass").agg(F.count("*").alias("cnt")).collect()
        }
        pair_sums = tri.agg(
            F.coalesce(
                F.sum(
                    (F.col("code_ab") != 3).cast("long")
                    + (F.col("code_ac") != 3).cast("long")
                    + (F.col("code_bc") != 3).cast("long")
                ),
                F.lit(0),
            ).alias("asym_pairs"),
            F.coalesce(
                F.sum(
                    (F.col("code_ab") == 3).cast("long")
                    + (F.col("code_ac") == 3).cast("long")
                    + (F.col("code_bc") == 3).cast("long")
                ),
                F.lit(0),
            ).alias("mutual_pairs"),
        ).collect()[0]
        cn_asym, cn_mutual = int(pair_sums["asym_pairs"]), int(pair_sums["mutual_pairs"])

        # --- wedge combinatorics per middle vertex -------------------------
        # per-vertex (m, o, i): mutual / asym-out / asym-in incident dyads
        per_end = dyads.select(
            F.col("u").alias("id"),
            F.when(F.col("code") == 3, F.lit("m"))
            .when(F.col("code") == 1, F.lit("o"))
            .otherwise(F.lit("i"))
            .alias("kind"),
        ).unionAll(
            dyads.select(
                F.col("v").alias("id"),
                F.when(F.col("code") == 3, F.lit("m"))
                .when(F.col("code") == 2, F.lit("o"))
                .otherwise(F.lit("i"))
                .alias("kind"),
            )
        )
        moi = per_end.groupBy("id").agg(
            F.sum((F.col("kind") == "m").cast("long")).alias("m"),
            F.sum((F.col("kind") == "o").cast("long")).alias("o"),
            F.sum((F.col("kind") == "i").cast("long")).alias("i"),
        )
        comb = moi.agg(
            F.coalesce(F.sum(F.col("o") * (F.col("o") - 1) / 2), F.lit(0.0)).alias("021D"),
            F.coalesce(F.sum(F.col("i") * (F.col("i") - 1) / 2), F.lit(0.0)).alias("021U"),
            F.coalesce(F.sum(F.col("o") * F.col("i")), F.lit(0.0)).alias("021C"),
            F.coalesce(F.sum(F.col("m") * F.col("o")), F.lit(0.0)).alias("111U"),
            F.coalesce(F.sum(F.col("m") * F.col("i")), F.lit(0.0)).alias("111D"),
            F.coalesce(F.sum(F.col("m") * (F.col("m") - 1) / 2), F.lit(0.0)).alias("201"),
        ).collect()[0]
        wedge_counts = {
            k: int(comb[k]) - corner_counts.get(k, 0)
            for k in ("021D", "021U", "021C", "111U", "111D", "201")
        }

        # --- exactly-one-connected-dyad triples ----------------------------
        sdeg = (
            dyads.select(F.col("u").alias("id"))
            .unionAll(dyads.select(F.col("v").alias("id")))
            .groupBy("id")
            .agg(F.count("*").alias("deg"))
        )
        dsum = (
            dyads.join(sdeg.withColumnRenamed("id", "u"), "u")
            .withColumnRenamed("deg", "du")
            .join(sdeg.select(F.col("id").alias("v"), F.col("deg").alias("dv")), "v")
            .agg(
                F.coalesce(
                    F.sum(F.when(F.col("code") != 3, F.col("du") + F.col("dv") - 2)),
                    F.lit(0),
                ).alias("asym"),
                F.coalesce(
                    F.sum(F.when(F.col("code") == 3, F.col("du") + F.col("dv") - 2)),
                    F.lit(0),
                ).alias("mutual"),
            )
            .collect()[0]
        )
        c012 = n_asym * (n - 2) - int(dsum["asym"]) + cn_asym
        c102 = n_mutual * (n - 2) - int(dsum["mutual"]) + cn_mutual

        counts = dict(tri_counts)
        counts.update(wedge_counts)
        counts["012"] = c012
        counts["102"] = c102
        total = n * (n - 1) * (n - 2) // 6
        counts["003"] = total - sum(counts.values())
        tri.unpersist()
    finally:
        dyads.unpersist()
    return spark.createDataFrame(
        [(name, counts.get(name, 0)) for name in TRIAD_NAMES],
        "triad string, count bigint",
    )
