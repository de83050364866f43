"""1-WL refinement: invariance, discrimination, and fingerprint semantics."""

from tests.conftest import make_graph


def _colors(spark, edges, n, rounds=3):
    from graphina_spark.operators.wl import wl_refinement

    g = make_graph(spark, edges, n=n, directed=False)
    return {r["id"]: r["color"] for r in wl_refinement(g, rounds=rounds).collect()}


def test_wl_symmetric_vertices_share_colors(spark):
    """A cycle is vertex-transitive: all vertices one color at any depth."""
    cyc = [(i, (i + 1) % 6) for i in range(6)]
    col = _colors(spark, cyc, 6)
    assert len(set(col.values())) == 1


def test_wl_distinguishes_roles(spark):
    """Path P4: ends vs middles split into exactly two classes at round 1+,
    and the two ends (symmetric) stay identical."""
    col = _colors(spark, [(0, 1), (1, 2), (2, 3)], 4)
    assert col[0] == col[3] and col[1] == col[2] and col[0] != col[1]


def test_wl_histogram_isomorphism_fingerprint(spark):
    """Isomorphic graphs (relabeled) give identical color histograms;
    C6 vs 2×C3 (the classic 1-WL-equivalent pair: both 2-regular) also
    match — documenting the known 1-WL limit; a star differs."""
    from graphina_spark.operators.wl import wl_histogram

    def hist(edges, n):
        g = make_graph(spark, edges, n=n, directed=False)
        return sorted(
            (r["color"], r["n_nodes"]) for r in wl_histogram(g, rounds=3).collect()
        )

    c6 = [(i, (i + 1) % 6) for i in range(6)]
    c6_relab = [((i * 5) % 6, ((i + 1) * 5) % 6) for i in range(6)]
    two_c3 = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3)]
    star = [(0, i) for i in range(1, 6)]
    assert hist(c6, 6) == hist(c6_relab, 6)
    assert hist(c6, 6) == hist(two_c3, 6)  # the documented 1-WL blind spot
    assert hist(c6, 6) != hist(star, 6)


def test_wl_max_list_truncation_deterministic(spark):
    from graphina_spark.operators.wl import wl_refinement

    star = [(0, i) for i in range(1, 8)]
    g = make_graph(spark, star, n=8, directed=False)
    a = {r["id"]: r["color"] for r in wl_refinement(g, rounds=2, max_list=3).collect()}
    b = {r["id"]: r["color"] for r in wl_refinement(g, rounds=2, max_list=3).collect()}
    assert a == b
    full = {r["id"]: r["color"] for r in wl_refinement(g, rounds=2).collect()}
    # leaves all identical under both; center differs from leaves in both
    assert a[1] == a[7] and full[1] == full[7]
    assert a[0] != a[1] and full[0] != full[1]


def test_wl_drift_zero_for_isomorphic(spark):
    from graphina_spark.operators.wl import wl_histogram_drift

    c6 = make_graph(spark, [(i, (i + 1) % 6) for i in range(6)], n=6, directed=False)
    relab = make_graph(
        spark, [((i * 5) % 6, ((i + 1) * 5) % 6) for i in range(6)], n=6,
        directed=False,
    )
    star = make_graph(spark, [(0, i) for i in range(1, 6)], n=6, directed=False)
    r = wl_histogram_drift(c6, relab).first()
    assert r["l1"] == 0 and r["classes_a"] == r["shared_classes"]
    r2 = wl_histogram_drift(c6, star).first()
    assert r2["l1"] > 0
