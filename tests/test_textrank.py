"""TextRank keyword salience (operators/textrank.py)."""

from pyspark.sql import functions as F

from graphina_spark.operators.textrank import term_cooccurrence_graph, textrank_terms


def test_hub_term_ranks_top(spark):
    # 'spark' co-occurs with every other term; satellites only with 'spark'
    docs = spark.createDataFrame(
        [
            (1, "spark alpha spark beta spark gamma"),
            (2, "spark delta spark epsilon"),
            (3, "alpha spark zeta"),
        ],
        "doc_id long, text string",
    )
    scores = {r["term"]: r["score"] for r in textrank_terms(docs, iters=8).collect()}
    assert max(scores, key=scores.get) == "spark"
    assert set(scores) == {
        "spark", "alpha", "beta", "gamma", "delta", "epsilon", "zeta"
    }


def test_term_graph_symmetric_weighted(spark):
    docs = spark.createDataFrame(
        [(1, "aaa bbb aaa bbb ccc")], "doc_id long, text string"
    )
    g, terms = term_cooccurrence_graph(docs)
    tmap = {r["id"]: r["term"] for r in terms.collect()}
    edges = {(tmap[r["src"]], tmap[r["dst"]]): r["weight"]
             for r in g.edges.collect()}
    # aaa-bbb adjacency occurs 3x, bbb-ccc once; both directions present
    assert edges[("aaa", "bbb")] == 3.0 and edges[("bbb", "aaa")] == 3.0
    assert edges[("bbb", "ccc")] == 1.0 and edges[("ccc", "bbb")] == 1.0
    # short tokens (len < 3) never enter
    docs2 = spark.createDataFrame([(1, "a bb ccc ddd")], "doc_id long, text string")
    g2, t2 = term_cooccurrence_graph(docs2)
    assert {r["term"] for r in t2.collect()} == {"ccc", "ddd"}
