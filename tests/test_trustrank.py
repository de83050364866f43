import pytest

from tests.conftest import make_graph


def test_trustrank_confined_to_trust_cone(spark):
    """Two 2-cycles: {0,1} (contains the seed) and {2,3} (spam island).
    Trust never reaches the island -> tr = 0 there, spam_mass = 1; inside
    the cone spam_mass < 1 (uniform pr spreads everywhere, trust doesn't)."""
    from graphina_spark.operators.trustrank import spam_mass

    g = make_graph(spark, [(0, 1), (1, 0), (2, 3), (3, 2)], n=4)
    seeds = spark.createDataFrame([(0,)], "id long")
    got = {r["id"]: r for r in spam_mass(g, seeds, fixed_iters=20, tol=None).collect()}
    # the island gets no teleport mass; its uniform-init mass decays d^k —
    # exactly 0.25 * 0.85^20 per vertex after 20 rounds
    residual = 0.25 * 0.85**20
    assert got[2]["tr"] == pytest.approx(residual, rel=1e-9)
    assert got[3]["tr"] == pytest.approx(residual, rel=1e-9)
    # pr is uniform (0.25) by symmetry -> island spam_mass = 1 - residual/pr
    assert got[2]["spam_mass"] == pytest.approx(1.0 - residual / 0.25, rel=1e-9)
    assert got[0]["spam_mass"] < 0.1 and got[1]["spam_mass"] < 0.1
    # total tr mass is 1; everything not stuck on the island is in the cone
    assert got[0]["tr"] + got[1]["tr"] == pytest.approx(1.0 - 2 * residual, abs=1e-9)


def test_trustrank_deterministic(spark):
    from graphina_spark.operators.trustrank import trust_rank

    g = make_graph(
        spark, [(0, 1), (1, 2), (2, 0), (0, 3), (3, 1)], n=5, weights=[1, 2, 3, 1, 2]
    )
    seeds = spark.createDataFrame([(0,), (3,)], "id long")
    a = sorted(map(tuple, trust_rank(g, seeds, fixed_iters=4, tol=None).collect()))
    b = sorted(map(tuple, trust_rank(g, seeds, fixed_iters=4, tol=None).collect()))
    assert a == b
