"""Landmark distance oracle: upper-bound and exactness invariants."""

from pyspark.sql import functions as F

from tests.conftest import make_graph


def test_estimates_are_upper_bounds_and_exact_via_landmark(spark):
    from graphina_spark.operators.distoracle import landmark_distance_estimates
    from graphina_spark.operators.paths import bfs_distances

    # directed ring with chords: 0→1→…→9→0 plus i→(i+3)%10
    edges = [(i, (i + 1) % 10) for i in range(10)] + [
        (i, (i + 3) % 10) for i in range(10)
    ]
    g = make_graph(spark, sorted(set(edges)), n=10, directed=True)
    landmarks = spark.createDataFrame([(0,), (5,)], "id long")
    pairs = spark.createDataFrame(
        [(u, v) for u in range(10) for v in range(10)], "src long, dst long"
    )
    est = {
        (r["src"], r["dst"]): r["est"]
        for r in landmark_distance_estimates(g, landmarks, pairs).collect()
    }
    # exact distances from every vertex
    allsrc = spark.createDataFrame([(i,) for i in range(10)], "id long")
    true = {
        (r["source"], r["id"]): r["dist"]
        for r in bfs_distances(g, allsrc).collect()
    }
    assert len(est) == 100  # strongly connected → every pair estimated
    for (u, v), e in est.items():
        assert e >= true[(u, v)]
        # d(u,l)+d(l,v) for the best landmark must equal the estimate
        best = min(true[(u, l)] + true[(l, v)] for l in (0, 5))
        assert e == best
    # pairs through a landmark are exact: v = 0 ⇒ est(u, 0) = d(u, 0)
    for u in range(10):
        assert est[(u, 0)] == true[(u, 0)]


def test_undirected_reuses_one_bfs(spark):
    from graphina_spark.operators.distoracle import landmark_index

    g = make_graph(spark, [(0, 1), (1, 2), (2, 3)], n=4, directed=False)
    lm = spark.createDataFrame([(0,)], "id long")
    fwd, bwd = landmark_index(g, lm)
    assert fwd is bwd
    d = {r["id"]: r["dist"] for r in fwd.collect()}
    assert d == {0: 0, 1: 1, 2: 2, 3: 3}
