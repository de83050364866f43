"""Vertex contraction (quotient graph) tests."""

from pyspark.sql import functions as F

from tests.conftest import make_graph


def test_contract_vertices_sums_weights_and_folds_self_loops(spark):
    from graphina_spark.operators.coarsen import contract_vertices

    # groups: {0,1} -> 10, {2,3} -> 11; edges 0-1 intra, others inter
    g = make_graph(
        spark, [(0, 1), (0, 2), (1, 3), (2, 3)], n=4, directed=True,
        weights=[2.0, 1.0, 1.0, 5.0],
    )
    mapping = spark.createDataFrame(
        [(0, 10), (1, 10), (2, 11), (3, 11)], "id long, group long"
    )
    q = contract_vertices(g, mapping)
    got = {(r["src"], r["dst"]): r["weight"] for r in q.edges.collect()}
    assert got == {(10, 10): 2.0, (10, 11): 2.0, (11, 11): 5.0}
    assert sorted(r["id"] for r in q.vertices.collect()) == [10, 11]
    nl = contract_vertices(g, mapping, keep_self_loops=False)
    assert {(r["src"], r["dst"]) for r in nl.edges.collect()} == {(10, 11)}


def test_contract_partial_mapping_is_identity(spark):
    from graphina_spark.operators.coarsen import contract_vertices

    g = make_graph(spark, [(0, 1), (1, 2)], n=3, directed=True)
    mapping = spark.createDataFrame([(0, 9)], "id long, group long")
    q = contract_vertices(g, mapping)
    got = {(r["src"], r["dst"]) for r in q.edges.collect()}
    assert got == {(9, 1), (1, 2)}
    assert sorted(r["id"] for r in q.vertices.collect()) == [1, 2, 9]


def test_host_of(spark):
    from graphina_spark.operators.coarsen import host_of

    df = spark.createDataFrame(
        [("https://a.example.com/x/y?q=1",), ("http://b.org",),
         ("https://c.net:8080/p",), ("not a url",)],
        "url string",
    )
    got = [r["h"] for r in df.select(host_of(F.col("url")).alias("h")).collect()]
    assert got == ["a.example.com", "b.org", "c.net", None]
