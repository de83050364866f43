from pyspark.sql import functions as F


def _canon(spark, urls):
    from graphina_spark.functions.urls import canonical_url

    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [r["c"] for r in df.select(canonical_url("url").alias("c")).collect()]


def test_canonical_url_rules(spark):
    got = _canon(
        spark,
        [
            "HTTP://WwW.Ex.COM:80/Path/To?q=1#frag",   # case, port, fragment
            "https://a.com:443/",                        # default https port, root slash kept
            "https://a.com/p/?utm_source=x&q=2&fbclid=y",  # tracking dropped, order kept
            "https://a.com/p?utm_source=x&utm_medium=y",   # query emptied -> no '?'
            "http://a.com:8080/p",                       # non-default port kept
            "relative/path",                             # no scheme: pass through
        ],
    )
    assert got == [
        "http://www.ex.com/Path/To?q=1",
        "https://a.com/",
        "https://a.com/p?q=2",
        "https://a.com/p",
        "http://a.com:8080/p",
        "relative/path",
    ]


def test_canonical_url_idempotent(spark):
    urls = [
        "HTTP://WwW.Ex.COM:80/Path/To?q=1&utm_x=2#frag",
        "https://b.org/x/y/?gclid=1",
    ]
    once = _canon(spark, urls)
    twice = _canon(spark, once)
    assert once == twice
