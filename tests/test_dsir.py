"""DSIR hashed-bigram importance weights — semantics on a planted two-domain
corpus (the driver's DuckDB gate covers engine parity)."""

import pytest
from pyspark.sql import functions as F

from graphina_spark.operators.dsir import bigram_buckets, dsir_log_weights

# target domain talks about cats; raw pool talks about markets
DOCS = [
    (0, "cat purr cat purr whiskers cat purr", "tgt"),
    (1, "cat whiskers purr cat cat purr tail", "tgt"),
    (2, "market stock price market trade price volume", "raw"),
    (3, "stock market trade volume price stock trade", "raw"),
    (4, "cat purr whiskers cat purr cat tail", "raw"),  # target-like raw doc
    (5, "", "raw"),  # empty → no features, weight 0
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string, source string")


def test_bucket_counts(docs):
    b = bigram_buckets(docs)
    per = {r["id"]: r["s"] for r in b.groupBy("id").agg(F.sum("n").alias("s")).collect()}
    # n tokens → n-1 bigrams
    assert per[0] == 6 and per[2] == 6
    assert 5 not in per


def test_target_like_docs_score_higher(docs):
    w = {
        r["id"]: r["log_weight"]
        for r in dsir_log_weights(docs, F.col("source") == "tgt").collect()
    }
    # the cat-like raw doc outranks every market doc
    assert w[4] > w[2] and w[4] > w[3]
    # target docs themselves score high
    assert min(w[0], w[1]) > max(w[2], w[3])
    # empty doc → exactly 0
    assert w[5] == 0.0


def test_weight_is_scale_consistent(docs):
    # doubling a document's text doubles its feature count and (by linearity
    # of the per-bucket sum) roughly doubles its log weight under the SAME
    # corpus models; verify the per-doc n_feats bookkeeping instead of
    # retraining: n_feats equals the doc's bigram count
    out = {r["id"]: r["n_feats"] for r in dsir_log_weights(docs, F.col("source") == "tgt").collect()}
    assert out[0] == 6 and out[5] == 0
