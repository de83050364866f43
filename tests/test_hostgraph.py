from tests.conftest import make_graph


def _pages(spark, rows):
    return spark.createDataFrame(rows, "id long, url string")


def test_host_links_aggregates(spark):
    from graphina_spark.operators.hostgraph import host_links

    g = make_graph(
        spark, [(0, 1), (0, 2), (1, 2), (2, 0)], n=3, weights=[1, 2, 3, 4]
    )
    pages = _pages(
        spark,
        [
            (0, "https://a.com/x"),
            (1, "https://a.com/y"),
            (2, "https://b.com/z"),
        ],
    )
    got = {
        (r["src_host"], r["dst_host"]): (r["n_links"], r["weight"])
        for r in host_links(pages, g.edges).collect()
    }
    assert got == {
        ("a.com", "a.com"): (1, 1.0),  # 0->1
        ("a.com", "b.com"): (2, 5.0),  # 0->2, 1->2
        ("b.com", "a.com"): (1, 4.0),  # 2->0
    }


def test_host_links_drops_unparseable_and_self(spark):
    from graphina_spark.operators.hostgraph import host_links

    g = make_graph(spark, [(0, 1), (1, 2), (0, 2)], n=3)
    pages = _pages(
        spark,
        [
            (0, "https://a.com/x"),
            (1, "not a url"),  # NULL host -> edges touching 1 drop
            (2, "https://a.com/z"),
        ],
    )
    rows = host_links(pages, g.edges, keep_self=False).collect()
    assert rows == []  # only surviving edge 0->2 is intra-host
    rows = host_links(pages, g.edges, keep_self=True).collect()
    assert [(r["src_host"], r["dst_host"], r["n_links"]) for r in rows] == [
        ("a.com", "a.com", 1)
    ]
