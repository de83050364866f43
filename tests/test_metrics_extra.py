"""Reciprocity and degree histogram (operators/metrics.py additions)."""

import pytest

from tests.conftest import make_graph


def test_reciprocity_values(spark):
    from graphina_spark.operators.metrics import reciprocity

    # 0<->1 reciprocal, 1->2 and 2->3 not: 2 of 4 directed edges
    g = make_graph(spark, [(0, 1), (1, 0), (1, 2), (2, 3)], directed=True)
    assert reciprocity(g) == 0.5
    g2 = make_graph(spark, [(0, 1), (1, 2)], directed=True)
    assert reciprocity(g2) == 0.0
    g3 = make_graph(spark, [(0, 1)], directed=False)
    assert reciprocity(g3) == 1.0


def test_degree_histogram(spark):
    from graphina_spark.operators.metrics import degree_histogram

    # star: center 0 with 3 out-edges
    g = make_graph(spark, [(0, 1), (0, 2), (0, 3)], n=5, directed=True)
    got = {r["deg"]: r["n"] for r in degree_histogram(g, "total").collect()}
    assert got == {3: 1, 1: 3, 0: 1}
    got_in = {r["deg"]: r["n"] for r in degree_histogram(g, "in").collect()}
    assert got_in == {0: 2, 1: 3}


def test_deterministic_graph_sampling(spark):
    from graphina_spark.operators.sampling import (
        induced_sample_subgraph,
        sample_edges,
        sample_vertices,
    )

    g = make_graph(
        spark, [(i, (i + 1) % 50) for i in range(50)], n=50, directed=True
    )
    v1 = sorted(r["id"] for r in sample_vertices(g, 0.4).collect())
    v2 = sorted(r["id"] for r in sample_vertices(g, 0.4).collect())
    assert v1 == v2 and 0 < len(v1) < 50
    # monotone: a larger fraction keeps a superset
    v3 = sorted(r["id"] for r in sample_vertices(g, 0.8).collect())
    assert set(v1) <= set(v3)
    e1 = sorted((r["src"], r["dst"]) for r in sample_edges(g, 0.4).collect())
    e2 = sorted((r["src"], r["dst"]) for r in sample_edges(g, 0.4).collect())
    assert e1 == e2 and 0 < len(e1) < 50
    sub = induced_sample_subgraph(g, 0.5)
    keep = set(r["id"] for r in sub.vertices.collect())
    for r in sub.edges.collect():
        assert r["src"] in keep and r["dst"] in keep


def test_rich_club(spark):
    from graphina_spark.operators.metrics import rich_club

    # triangle of hubs 0,1,2 each also attached to 2 leaves -> deg 4;
    # leaves have deg 1
    edges = [(0, 1), (1, 2), (0, 2)]
    leaves = []
    nxt = 3
    for h in (0, 1, 2):
        for _ in range(2):
            leaves.append((h, nxt))
            nxt += 1
    g = make_graph(spark, edges + leaves, n=nxt, directed=False)
    row = rich_club(g, k=3).collect()[0]
    assert (row["n_k"], row["e_k"]) == (3, 3)
    assert row["phi"] == 1.0  # the hub triangle is fully connected
    row2 = rich_club(g, k=10).collect()[0]
    assert (row2["n_k"], row2["e_k"], row2["phi"]) == (0, 0, 0.0)


def test_average_neighbor_degree(spark):
    from graphina_spark.operators.metrics import average_neighbor_degree

    # path 0-1-2: deg(0)=deg(2)=1, deg(1)=2; isolated 3
    g = make_graph(spark, [(0, 1), (1, 2)], n=4, directed=False)
    got = {r["id"]: r["avg_nbr_deg"] for r in average_neighbor_degree(g).collect()}
    assert got == {0: 2.0, 1: 1.0, 2: 2.0, 3: 0.0}


def test_component_size_histogram(spark):
    from graphina_spark.operators.components import component_size_histogram

    # components: {0,1,2}, {3,4}, {5}
    g = make_graph(spark, [(0, 1), (1, 2), (3, 4)], n=6, directed=True)
    got = {r["size"]: r["n"] for r in component_size_histogram(g).collect()}
    assert got == {3: 1, 2: 1, 1: 1}


def test_attribute_assortativity(spark):
    from graphina_spark.operators.metrics import attribute_assortativity
    import pyspark.sql.functions as F

    # two label classes; 4 within-class edges, 2 cross-class edges
    # e = [[2/6, 1/6], [1/6, 2/6]]; trace = 4/6; a = b = [0.5, 0.5];
    # sum a*b = 0.5 -> r = (4/6 - 1/2) / (1 - 1/2) = 1/3
    g = make_graph(
        spark, [(0, 1), (1, 2), (3, 4), (4, 5), (2, 3), (5, 0)], n=6
    )
    labels = g.vertices.select(
        "id", F.when(F.col("id") < 3, "x").otherwise("y").alias("label")
    )
    assert attribute_assortativity(g, labels) == pytest.approx(1.0 / 3.0)

    # perfectly assortative: all edges within class
    g2 = make_graph(spark, [(0, 1), (1, 0), (2, 3)], n=4)
    lab2 = g2.vertices.select(
        "id", F.when(F.col("id") < 2, "x").otherwise("y").alias("label")
    )
    assert attribute_assortativity(g2, lab2) == pytest.approx(1.0)

    # single class everywhere -> 1.0 by convention
    lab3 = g2.vertices.select("id", F.lit("only").alias("label"))
    assert attribute_assortativity(g2, lab3) == pytest.approx(1.0)

    # perfectly disassortative 2-class: r = -1
    g3 = make_graph(spark, [(0, 2), (2, 1), (1, 3), (3, 0)], n=4)
    lab4 = g3.vertices.select(
        "id", F.when(F.col("id") < 2, "x").otherwise("y").alias("label")
    )
    assert attribute_assortativity(g3, lab4) == pytest.approx(-1.0)


def test_powerlaw_alpha_mle(spark):
    from graphina_spark.operators.metrics import powerlaw_alpha_mle
    from tests.conftest import make_graph

    # star-ish fixture: hub 0 has in-degree 8; spokes have in-degree 1;
    # with kmin=2 only the hub is in the tail → alpha = 1 + 1/ln(8/1.5)
    import math

    g = make_graph(spark, [(i, 0) for i in range(1, 9)], n=9)
    row = powerlaw_alpha_mle(g, kmin=2, kind="in").collect()[0]
    assert row["kmin"] == 2 and row["n_tail"] == 1
    assert abs(row["alpha"] - (1 + 1 / math.log(8 / 1.5))) < 1e-6
    # empty tail → NULL alpha, zero count
    row2 = powerlaw_alpha_mle(g, kmin=100, kind="in").collect()[0]
    assert row2["n_tail"] == 0 and row2["alpha"] is None


def test_square_count_known_graphs(spark):
    from graphina_spark.operators.metrics import square_count
    from tests.conftest import make_graph

    def squares(edges, n):
        g = make_graph(spark, edges, n=n, directed=False)
        return square_count(g).first()["squares"]

    # C4: exactly one 4-cycle
    assert squares([(0, 1), (1, 2), (2, 3), (3, 0)], 4) == 1
    # K4: 3 distinct 4-cycles (chords allowed)
    k4 = [(i, j) for i in range(4) for j in range(i + 1, 4)]
    assert squares(k4, 4) == 3
    # Q3 cube: n(n-1)·2^(n-3) = 6
    cube = [(0, 1), (1, 2), (2, 3), (3, 0), (4, 5), (5, 6), (6, 7), (7, 4),
            (0, 4), (1, 5), (2, 6), (3, 7)]
    assert squares(cube, 8) == 6
    # C5 and a path: none
    assert squares([(0, 1), (1, 2), (2, 3), (3, 4), (4, 0)], 5) == 0
    assert squares([(0, 1), (1, 2), (2, 3)], 4) == 0


def test_clustering_by_degree_curve(spark):
    """K4 ∪ star: all four K4 vertices have degree 3 and cc 1; the star
    center (degree 3) has cc 0 → avg over the five degree-3 nodes = 0.8;
    leaves (deg < 2) excluded."""
    from graphina_spark.operators.triangles import clustering_by_degree
    from tests.conftest import make_graph

    k4 = [(i, j) for i in range(4) for j in range(i + 1, 4)]
    star = [(10, 11), (10, 12), (10, 13)]
    g = make_graph(spark, k4 + star, n=14, directed=False)
    rows = {r["degree"]: (r["n_nodes"], r["avg_cc"]) for r in
            clustering_by_degree(g).collect()}
    assert rows == {3: (5, 0.8)}


def test_attack_robustness_fragments_hub_tree(spark):
    from conftest import make_graph

    from graphina_spark.operators.metrics import attack_robustness

    # hub 0 connects five 3-node chains: removing the hub shatters the graph
    edges = [(0, i * 10) for i in range(1, 6)]
    for i in range(1, 6):
        edges += [(i * 10, i * 10 + 1), (i * 10 + 1, i * 10 + 2)]
    g = make_graph(spark, edges, n=None, directed=False)
    rows = {r["removed"]: r for r in
            attack_robustness(g, remove_counts=(0, 1)).collect()}
    assert rows[0]["giant_size"] == 16 and rows[0]["n_components"] == 1
    after = rows[1]
    assert after["n_left"] == 15
    assert after["giant_size"] == 3
    assert after["n_components"] == 5


def test_jdd_counts_each_edge_once(spark):
    from conftest import make_graph

    from graphina_spark.operators.metrics import joint_degree_distribution

    # triangle + pendant: degrees 3,2,2,1
    g = make_graph(spark, [(0, 1), (1, 2), (0, 2), (0, 3)], n=4, directed=False)
    got = {(r["k1"], r["k2"]): r["n_edges"]
           for r in joint_degree_distribution(g).collect()}
    assert got == {(2, 3): 2, (2, 2): 1, (1, 3): 1}


def test_degree_inequality_known_values(spark):
    from conftest import make_graph

    from graphina_spark.operators.metrics import degree_inequality

    # star 0<-1,2,3: in-degrees [3,0,0,0] (directed edges point at 0)
    g = make_graph(spark, [(1, 0), (2, 0), (3, 0)], n=4, directed=True)
    r = degree_inequality(g).collect()[0]
    # ascending degrees [0,0,0,3]: G = 2*(4*3)/(4*3) - 5/4 = 0.75
    assert r["gini"] == 0.75
    assert r["hhi"] == 1.0  # all mass on one vertex
    assert r["top10_share"] == 1.0 and r["n"] == 4
    # uniform degrees -> gini 0
    g2 = make_graph(spark, [(0, 1), (1, 2), (2, 3), (3, 0)], n=4, directed=True)
    r2 = degree_inequality(g2).collect()[0]
    assert r2["gini"] == 0.0
    assert r2["hhi"] == 0.25


def test_random_failure_keeps_more_than_attack(spark):
    from conftest import make_graph

    from graphina_spark.operators.metrics import (
        attack_robustness,
        random_failure_robustness,
    )

    # hub-and-spoke: targeted attack on 1 vertex shatters; random 25% mostly
    # hits leaves and keeps a large star intact
    edges = [(0, i) for i in range(1, 40)]
    g = make_graph(spark, edges, n=None, directed=False)
    att = {r["removed"]: r for r in attack_robustness(g, remove_counts=(1,)).collect()}
    fail = {r["frac"]: r for r in
            random_failure_robustness(g, fractions=(0.25,)).collect()}
    assert att[1]["giant_size"] == 1  # hub gone -> isolated leaves
    f = fail[0.25]
    if f["n_left"] > 0:
        # if the hub survived the md5 draw, the giant is the surviving star
        survivors_with_hub = f["giant_size"] == f["n_left"]
        hub_dropped = f["giant_size"] == 1
        assert survivors_with_hub or hub_dropped
