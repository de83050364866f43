import pytest

from tests.conftest import make_graph


def _scores(df):
    return {r["id"]: (r["hub"], r["authority"]) for r in df.collect()}


def test_salsa_complete_bipartite(spark):
    """Hubs {0,1} each linking to authorities {2,3}: the chains hit their
    fixed point after one round — a = (0,0,.5,.5), h = (.5,.5,0,0)."""
    from graphina_spark.operators.salsa import salsa

    g = make_graph(spark, [(0, 2), (0, 3), (1, 2), (1, 3)], n=4)
    got = _scores(salsa(g, fixed_iters=2))
    assert got[0] == pytest.approx((0.5, 0.0))
    assert got[1] == pytest.approx((0.5, 0.0))
    assert got[2] == pytest.approx((0.0, 0.5))
    assert got[3] == pytest.approx((0.0, 0.5))


def test_salsa_stationary_is_indegree_proportional(spark):
    """Lempel-Moran: within one co-citation component the authority chain's
    stationary mass is proportional to in-degree.  0->2, 0->3, 1->3, 1->4:
    one component, indeg (1,2,1) -> a_inf = (.25,.5,.25)."""
    from graphina_spark.operators.salsa import salsa

    g = make_graph(spark, [(0, 2), (0, 3), (1, 3), (1, 4)], n=5)
    got = _scores(salsa(g, max_iter=200, tol=1e-10))
    assert got[2][1] == pytest.approx(0.25, abs=1e-6)
    assert got[3][1] == pytest.approx(0.50, abs=1e-6)
    assert got[4][1] == pytest.approx(0.25, abs=1e-6)
    # hub chain symmetric: outdeg (2,2) -> h_inf = (.5,.5)
    assert got[0][0] == pytest.approx(0.5, abs=1e-6)
    assert got[1][0] == pytest.approx(0.5, abs=1e-6)


def test_salsa_deterministic(spark):
    from graphina_spark.operators.salsa import salsa

    g = make_graph(
        spark,
        [(0, 1), (1, 2), (2, 0), (0, 3), (3, 1), (2, 4)],
        n=5,
        weights=[1, 2, 3, 1, 2, 5],
    )
    a = sorted(map(tuple, salsa(g, fixed_iters=3).collect()))
    b = sorted(map(tuple, salsa(g, fixed_iters=3).collect()))
    assert a == b
