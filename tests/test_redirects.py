def _redirects(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_resolve_chains(spark):
    from graphina_spark.operators.redirects import resolve_redirects

    # 0->1->2->3 (terminal), 10->3
    r = _redirects(spark, [(0, 1), (1, 2), (2, 3), (10, 3)])
    got = {x["src"]: x["final"] for x in resolve_redirects(r).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 10: 3}


def test_loops_resolve_to_null(spark):
    from graphina_spark.operators.redirects import resolve_redirects

    # 3-cycle 1->2->3->1 (never converges under doubling), a chain feeding
    # it (0->1), and an honest chain 10->11
    r = _redirects(spark, [(1, 2), (2, 3), (3, 1), (0, 1), (10, 11)])
    got = {x["src"]: x["final"] for x in resolve_redirects(r).collect()}
    assert got[10] == 11
    for u in (0, 1, 2, 3):
        assert got[u] is None


def test_duplicate_sources_take_min_target(spark):
    from graphina_spark.operators.redirects import resolve_redirects

    r = _redirects(spark, [(0, 5), (0, 2), (2, 3)])
    got = {x["src"]: x["final"] for x in resolve_redirects(r).collect()}
    assert got[0] == 3  # min dst 2, then 2->3
