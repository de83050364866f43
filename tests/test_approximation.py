"""Approximation family: Luby MIS, Israeli-Itai matching, 2-approx vertex
cover, greedy clique.

Reference contracts: /root/reference/src/approximation/ —
independent_set.rs:7-30 (non-empty valid MIS), matching.rs:7-21 (maximal
matching), vertex_cover.rs:22-80 (every edge covered),
clique.rs:80+ (clique witness)."""

from graphina_spark.operators.approximation import (
    large_clique,
    maximal_independent_set,
    maximal_matching,
    vertex_cover,
)
from tests.conftest import make_graph

# a 12-vertex graph: two triangles, a 4-path, a star, one isolated-ish pair
EDGES = [
    (0, 1), (1, 2), (2, 0),
    (3, 4), (4, 5), (5, 3),
    (6, 7), (7, 8), (8, 9),
    (0, 10), (1, 10), (2, 10),
    (10, 11),
]


def _edge_pairs(g):
    return {
        frozenset((r["src"], r["dst"]))
        for r in g.edges.collect()
        if r["src"] != r["dst"]
    }


def test_mis_independent_and_maximal(spark):
    g = make_graph(spark, EDGES, directed=False)
    mis = {r["id"] for r in maximal_independent_set(g).collect()}
    pairs = _edge_pairs(g)
    # independent: no edge internal to the set
    assert not any(p <= mis for p in pairs)
    # maximal: every vertex outside has a neighbor inside
    nbrs = {}
    for p in pairs:
        a, b = tuple(p)
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    for v in range(12):
        if v not in mis:
            assert nbrs.get(v, set()) & mis, f"vertex {v} not dominated"


def test_matching_valid_and_maximal(spark):
    g = make_graph(spark, EDGES, directed=False)
    m = [(r["src"], r["dst"]) for r in maximal_matching(g).collect()]
    used = [v for e in m for v in e]
    assert len(used) == len(set(used))  # vertex-disjoint
    pairs = _edge_pairs(g)
    assert all(frozenset(e) in pairs for e in m)  # real edges
    # maximal: every edge touches a matched vertex
    assert all(p & set(used) for p in pairs)


def test_vertex_cover_covers_every_edge(spark):
    g = make_graph(spark, EDGES, directed=False)
    cover = {r["id"] for r in vertex_cover(g).collect()}
    assert all(p & cover for p in _edge_pairs(g))
    # 2-approximation sanity: the star center graph's optimum here is small
    assert len(cover) <= 2 * 6  # ≤ 2·|max matching possible| (6 on 12 verts)


def test_large_clique_is_clique(spark):
    g = make_graph(spark, EDGES, directed=False)
    cl = {r["id"] for r in large_clique(g).collect()}
    pairs = _edge_pairs(g)
    assert len(cl) >= 3  # triangle 0-1-2(+10 shares 0,1,2) exists
    for a in cl:
        for b in cl:
            if a < b:
                assert frozenset((a, b)) in pairs


def test_clique_finds_k4(spark):
    # 0-1-2-10 form a K4 (triangle + star over it)
    g = make_graph(spark, EDGES, directed=False)
    cl = sorted(r["id"] for r in large_clique(g).collect())
    assert cl == [0, 1, 2, 10]


def test_mis_deterministic_across_runs(spark):
    g = make_graph(spark, EDGES, directed=False)
    a = sorted(r["id"] for r in maximal_independent_set(g).collect())
    b = sorted(r["id"] for r in maximal_independent_set(g).collect())
    assert a == b


def test_fixed_rounds_prefix_of_convergence(spark):
    """Fixed-round runs execute the same schedule: a 1-round MIS is a
    subset of the converged MIS (round-0 winners never get revoked)."""
    g = make_graph(spark, EDGES, directed=False)
    one = {r["id"] for r in maximal_independent_set(g, rounds=1).collect()}
    full = {r["id"] for r in maximal_independent_set(g).collect()}
    assert one <= full


def test_densest_finds_planted_clique(spark):
    """Sparse 40-cycle + planted K8: peeling must surface the clique
    (density 3.5) over the full graph (density ~(40+28)/48 ≈ 1.42)."""
    from graphina_spark.operators.approximation import densest_subgraph

    ring = [(i, (i + 1) % 40) for i in range(40)]
    k8 = [(40 + a, 40 + b) for a in range(8) for b in range(a + 1, 8)]
    g = make_graph(spark, ring + k8, directed=False)
    ids = sorted(r["id"] for r in densest_subgraph(g, epsilon=0.1).collect())
    assert ids == list(range(40, 48))


def test_densest_empty_edges_returns_all(spark):
    from graphina_spark.graph import LinkGraph
    from graphina_spark.operators.approximation import densest_subgraph

    verts = spark.createDataFrame([(i,) for i in range(5)], "id long")
    edges = spark.createDataFrame([], "src long, dst long, weight double")
    g = LinkGraph(vertices=verts, edges=edges, directed=False)
    assert densest_subgraph(g).count() == 5


def test_ramsey_pairing(spark):
    from graphina_spark.operators.approximation import ramsey_r2

    g = make_graph(spark, EDGES, directed=False)
    rows = ramsey_r2(g).collect()
    kinds = {r["kind"] for r in rows}
    assert kinds == {"clique", "independent_set"}


def test_local_node_connectivity_semantics(spark):
    """connectivity.rs:57-102: direct edge -> 1 (count-and-stop), series
    path -> 1, parallel disjoint 2-paths -> their count, s==t -> 0."""
    from graphina_spark.operators.connectivity import local_node_connectivity

    # direct edge
    g1 = make_graph(spark, [(0, 1)], directed=False)
    assert local_node_connectivity(g1, 0, 1) == 1
    # series: one interior
    g2 = make_graph(spark, [(0, 2), (2, 1)], directed=False)
    assert local_node_connectivity(g2, 0, 1) == 1
    # three disjoint 2-paths
    g3 = make_graph(spark, [(0, m) for m in (2, 3, 4)] + [(m, 1) for m in (2, 3, 4)],
                    directed=False)
    assert local_node_connectivity(g3, 0, 1) == 3
    assert local_node_connectivity(g3, 0, 0) == 0


def test_clique_removal_peels_blocks(spark):
    from graphina_spark.operators.approximation import clique_removal

    # two disjoint 5-cliques + a triangle: rounds peel biggest-first,
    # lowest-id-first among equals
    g = make_graph(
        spark,
        [(a, b) for a in range(5) for b in range(a + 1, 5)]
        + [(5 + a, 5 + b) for a in range(5) for b in range(a + 1, 5)]
        + [(10, 11), (11, 12), (12, 10)],
        directed=False,
    )
    rows = clique_removal(g, max_cliques=3).collect()
    by_round = {}
    for r in rows:
        by_round.setdefault(r["round"], set()).add(r["id"])
    assert by_round[0] == set(range(5))
    assert by_round[1] == set(range(5, 10))
    assert by_round[2] == {10, 11, 12}


def test_matching_local_finish_identical_to_distributed(spark, sf_dir):
    from graphina_spark.operators.approximation import maximal_matching
    from graphina_spark.sources.derived import web_graph

    g = web_graph(spark, sf_dir)
    hybrid = sorted(map(tuple, maximal_matching(g).collect()))
    pure = sorted(map(tuple, maximal_matching(g, local_finish=0).collect()))
    assert hybrid == pure


def test_mis_local_finish_identical_to_distributed(spark, sf_dir):
    from graphina_spark.operators.approximation import maximal_independent_set
    from graphina_spark.sources.derived import web_graph

    g = web_graph(spark, sf_dir)
    hybrid = sorted(r["id"] for r in maximal_independent_set(g).collect())
    pure = sorted(
        r["id"] for r in maximal_independent_set(g, local_finish=0).collect()
    )
    assert hybrid == pure
