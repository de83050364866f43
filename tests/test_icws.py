"""ICWS weighted MinHash (operators/icws.py)."""

from pyspark.sql import functions as F

from graphina_spark.operators.icws import icws_signatures


def sig_map(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["id"], {})[r["r"]] = (r["tok"], r["tz"])
    return out


def test_identical_docs_identical_signatures(spark):
    text = "alpha beta beta gamma gamma gamma delta"
    docs = spark.createDataFrame([(1, text), (2, text)], "doc_id long, text string")
    s = sig_map(icws_signatures(docs, k=16))
    assert s[1] == s[2]
    assert len(s[1]) == 16


def test_disjoint_docs_never_collide(spark):
    docs = spark.createDataFrame(
        [(1, "aaa bbb ccc ddd"), (2, "eee fff ggg hhh")],
        "doc_id long, text string",
    )
    s = sig_map(icws_signatures(docs, k=16))
    assert all(s[1][r] != s[2][r] for r in range(16))


def test_collision_rate_tracks_weighted_jaccard(spark):
    # doc1: a x4, b x2, c x2 ; doc2: a x4, b x2, d x2
    # J_w = min-sum / max-sum = (4 + 2) / (4 + 2 + 2 + 2) = 0.6
    d1 = "aaa " * 4 + "bbb " * 2 + "ccc " * 2
    d2 = "aaa " * 4 + "bbb " * 2 + "ddd " * 2
    docs = spark.createDataFrame([(1, d1), (2, d2)], "doc_id long, text string")
    k = 64
    s = sig_map(icws_signatures(docs, k=k))
    hits = sum(1 for r in range(k) if s[1][r] == s[2][r]) / k
    assert 0.35 < hits < 0.85  # E = 0.6, sd ~ 0.06 at k=64


def test_weighting_matters_vs_unweighted(spark):
    # same SUPPORT sets, wildly different weights: unweighted MinHash sees
    # J = 1; weighted Jaccard is min/max = (1+1)/(9+9) ~ 0.11
    d1 = "xxx " * 9 + "yyy"
    d2 = "xxx " + "yyy " * 9
    docs = spark.createDataFrame([(1, d1), (2, d2)], "doc_id long, text string")
    k = 64
    s = sig_map(icws_signatures(docs, k=k))
    hits = sum(1 for r in range(k) if s[1][r] == s[2][r]) / k
    assert hits < 0.4  # far from 1.0 — the weighted signal
