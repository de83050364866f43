"""Graph metrics, infomap, reaching centrality, Borůvka MSF, edge-list IO."""

import math

import pytest
from pyspark.sql import functions as F

from graphina_spark.operators.infomap import infomap
from graphina_spark.operators.metrics import (
    assortativity,
    average_clustering_coefficient,
    average_degree,
    density,
)
from graphina_spark.operators.mst import boruvka_msf, msf_total_weight
from graphina_spark.operators.reaching import (
    global_reaching_centrality,
    local_reaching_centrality,
)
from graphina_spark.sources.io import (
    load_graph,
    read_edge_list,
    save_graph,
    write_edge_list,
)
from tests.conftest import make_graph


def test_density_and_avg_degree(spark):
    g = make_graph(spark, [(0, 1), (1, 2), (2, 0)], n=4, directed=False)
    assert density(g) == pytest.approx(2 * 3 / (4 * 3))
    dg = make_graph(spark, [(0, 1), (1, 0)], n=3, directed=True)
    assert density(dg) == pytest.approx(2 / 6)
    assert average_degree(g) == pytest.approx((2 + 2 + 2 + 0) / 4)


def test_average_clustering(spark):
    g = make_graph(spark, [(0, 1), (1, 2), (2, 0)], n=3, directed=False)
    assert average_clustering_coefficient(g) == pytest.approx(1.0)
    g2 = make_graph(spark, [(0, 1), (1, 2), (2, 0), (2, 3)], n=4, directed=False)
    # node 2: 1 triangle / C(3,2)=3; node 3 deg 1 → 0
    assert average_clustering_coefficient(g2) == pytest.approx(
        (1 + 1 + 1 / 3 + 0) / 4
    )


def test_assortativity_star_negative(spark):
    """A star is maximally disassortative (-1)."""
    g = make_graph(spark, [(0, i) for i in range(1, 6)], n=6, directed=False)
    assert assortativity(g) == pytest.approx(-1.0, abs=1e-9)
    empty = make_graph(spark, [], n=3, directed=False)
    assert assortativity(empty) == 0.0


def test_assortativity_matches_reference_formula(spark):
    edges = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2)]
    g = make_graph(spark, edges, n=4, directed=False)
    deg = {0: 3, 1: 2, 2: 3, 3: 2}
    m = 2.0 * len(edges)
    s_jk = sum(2.0 * deg[u] * deg[v] for u, v in edges)
    s_j = sum(deg[u] + deg[v] for u, v in edges)
    s_j2 = sum(deg[u] ** 2 + deg[v] ** 2 for u, v in edges)
    num = s_jk / m - (s_j / m) ** 2
    den = s_j2 / m - (s_j / m) ** 2
    assert assortativity(g) == pytest.approx(num / den, abs=1e-9)


def test_infomap_two_cliques(spark):
    clique1 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    clique2 = [(a, b) for a in range(4, 8) for b in range(a + 1, 8)]
    g = make_graph(spark, clique1 + clique2 + [(3, 4)], n=8, directed=False)
    mods = {r["id"]: r["module"] for r in infomap(g, max_iter=20).collect()}
    assert len({mods[i] for i in range(3)}) == 1  # clique 1 one module
    assert len({mods[i] for i in range(5, 8)}) == 1  # clique 2 one module
    assert mods[0] != mods[7]


def test_infomap_errors(spark):
    empty = make_graph(spark, [], n=0, directed=False)
    empty.vertices = empty.vertices.where("id < 0")
    with pytest.raises(ValueError):
        infomap(empty)
    g = make_graph(spark, [(0, 1)], n=2, directed=False)
    with pytest.raises(ValueError):
        infomap(g, max_iter=0)


def test_local_reaching(spark):
    g = make_graph(spark, [(0, 1), (1, 2), (2, 3)], n=5, directed=True)
    r1 = {r["id"]: r["reaching"] for r in local_reaching_centrality(g, 1).collect()}
    assert r1 == {0: 2.0, 1: 2.0, 2: 2.0, 3: 1.0, 4: 1.0}
    r9 = {r["id"]: r["reaching"] for r in global_reaching_centrality(g).collect()}
    assert r9[0] == 4.0 and r9[3] == 1.0


def test_boruvka_simple(spark):
    # classic 4-cycle with diagonal: MST = 3 cheapest non-cycle edges
    g = make_graph(
        spark,
        [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2)],
        n=4,
        directed=False,
        weights=[1.0, 2.0, 3.0, 4.0, 2.5],
    )
    msf = {(r["src"], r["dst"]): r["weight"] for r in boruvka_msf(g).collect()}
    assert set(msf) == {(0, 1), (1, 2), (2, 3)}
    assert msf_total_weight(g) == pytest.approx(1.0 + 2.0 + 3.0)


def test_boruvka_forest_disconnected(spark):
    g = make_graph(
        spark,
        [(0, 1), (1, 2), (3, 4)],
        n=6,
        directed=False,
        weights=[1.0, 2.0, 5.0],
    )
    msf = boruvka_msf(g)
    assert msf.count() == 3  # n - #components = 6 - 3
    assert msf_total_weight(g) == pytest.approx(8.0)


def test_boruvka_ties_deterministic(spark):
    g = make_graph(
        spark,
        [(0, 1), (1, 2), (2, 0)],
        n=3,
        directed=False,
        weights=[1.0, 1.0, 1.0],
    )
    a = sorted(map(tuple, boruvka_msf(g).collect()))
    b = sorted(map(tuple, boruvka_msf(g).collect()))
    assert a == b and len(a) == 2


def test_edge_list_roundtrip(spark, tmp_path):
    g = make_graph(
        spark, [(0, 1), (1, 2)], n=3, directed=True, weights=[2.5, 1.0]
    )
    p = str(tmp_path / "el")
    write_edge_list(g, p)
    g2 = read_edge_list(spark, p, directed=True)
    assert sorted(map(tuple, g2.edges.collect())) == sorted(
        map(tuple, g.edges.collect())
    )


def test_edge_list_comments_and_default_weight(spark, tmp_path):
    p = tmp_path / "graph.txt"
    p.write_text("# a comment\n0,1\n1,2,3.5\n\n# another\n2,0\n")
    g = read_edge_list(spark, str(p), directed=False)
    got = sorted(map(tuple, g.edges.collect()))
    assert got == [(0, 1, 1.0), (1, 2, 3.5), (2, 0, 1.0)]


def test_graph_save_load(spark, tmp_path):
    g = make_graph(spark, [(0, 1), (1, 2)], n=3, directed=False)
    p = str(tmp_path / "gdir")
    save_graph(g, p)
    g2 = load_graph(spark, p)
    assert not g2.directed
    assert g2.num_edges() == 2 and g2.num_vertices() == 3
    with pytest.raises(ValueError):
        load_graph(spark, p, expect_directed=True)
