from tests.conftest import make_graph


def test_co_citation_counts(spark):
    from graphina_spark.operators.cocitation import co_citation

    # 0 and 1 both cite {3,4}; 2 cites only 4
    g = make_graph(spark, [(0, 3), (0, 4), (1, 3), (1, 4), (2, 4)], n=5)
    got = {(r["u"], r["v"]): r["n_common"] for r in co_citation(g).collect()}
    assert got == {(3, 4): 2}  # 3,4 co-cited by 0 and 1


def test_bibliographic_coupling_counts(spark):
    from graphina_spark.operators.cocitation import bibliographic_coupling

    g = make_graph(spark, [(0, 3), (0, 4), (1, 3), (1, 4), (2, 4)], n=5)
    got = {
        (r["u"], r["v"]): r["n_common"]
        for r in bibliographic_coupling(g).collect()
    }
    # 0-1 share {3,4}; 0-2 and 1-2 share {4}
    assert got == {(0, 1): 2, (0, 2): 1, (1, 2): 1}


def test_max_degree_drops_hub_centers(spark):
    from graphina_spark.operators.cocitation import co_citation

    # hub 0 cites everyone; 1 and 2 both cite {5,6}
    edges = [(0, t) for t in range(3, 7)] + [(1, 5), (1, 6), (2, 5), (2, 6)]
    g = make_graph(spark, edges, n=7)
    # cap excludes hub 0 (out-degree 4) as a wedge center
    got = {
        (r["u"], r["v"]): r["n_common"]
        for r in co_citation(g, max_degree=3).collect()
    }
    assert got == {(5, 6): 2}  # via 1 and 2 only; hub-0-only pairs gone
    # uncapped: hub 0 contributes all 6 pairs over {3,4,5,6}
    got_full = {
        (r["u"], r["v"]): r["n_common"]
        for r in co_citation(g, max_degree=None).collect()
    }
    assert got_full[(5, 6)] == 3 and len(got_full) == 6
