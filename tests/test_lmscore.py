"""Bigram LM quality (CCNet-style perplexity proxy) — closed-form unit
semantics on hand-built documents (the driver's DuckDB gate covers engine
parity at sf0.01)."""

import math

import pytest

from graphina_spark.operators.lmscore import bigram_positions, lm_quality

DOCS = [
    (0, "a b a b a"),  # bigrams: ab, ba, ab, ba
    (1, "a a b"),  # bigrams: aa, ab
    (2, "c"),  # 1 token -> no bigrams
    (3, ""),  # empty -> no bigrams
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _p(c12, c1, v, k=0.5):
    return (c12 + k) / (c1 + k * v)


def test_bigram_positions(spark, docs):
    pos = bigram_positions(docs).collect()
    got = sorted((r["id"], r["w1"], r["w2"]) for r in pos)
    assert got == [
        (0, "a", "b"),
        (0, "a", "b"),
        (0, "b", "a"),
        (0, "b", "a"),
        (1, "a", "a"),
        (1, "a", "b"),
    ]


def test_lm_quality_closed_form(spark, docs):
    # corpus model: c12 = {ab:3, ba:2, aa:1}; prefix c1 = {a:4, b:2};
    # vocabulary = {a, b, c} -> V = 3
    out = {r["id"]: r for r in lm_quality(docs).collect()}
    v, k = 3, 0.5
    p_ab, p_ba, p_aa = _p(3, 4, v), _p(2, 2, v), _p(1, 4, v)
    exp0 = -(2 * math.log2(p_ab) + 2 * math.log2(p_ba)) / 4
    exp1 = -(math.log2(p_aa) + math.log2(p_ab)) / 2
    assert out[0]["n_bigrams"] == 4
    assert out[0]["xent_bits"] == pytest.approx(exp0, abs=1e-6)
    assert out[1]["n_bigrams"] == 2
    assert out[1]["xent_bits"] == pytest.approx(exp1, abs=1e-6)
    # short/empty docs present with zero bigrams, zero score
    for short_id in (2, 3):
        assert out[short_id]["n_bigrams"] == 0
        assert out[short_id]["xent_bits"] == 0.0


def test_lm_quality_external_train(spark, docs):
    # scoring against an external reference corpus: unseen bigrams fall back
    # to the k / (c1 + kV) floor (c12 = 0, and c1 = 0 for unseen prefixes)
    train = spark.createDataFrame([(100, "a b a b")], "doc_id long, text string")
    out = {r["id"]: r for r in lm_quality(docs, train=train).collect()}
    v, k = 2, 0.5  # train vocab = {a, b}
    # doc 1 bigrams: aa (unseen, prefix a has c1=2), ab (c12=2, c1=2)
    exp1 = -(math.log2(_p(0, 2, v)) + math.log2(_p(2, 2, v))) / 2
    assert out[1]["xent_bits"] == pytest.approx(exp1, abs=1e-6)
    # natural text under its own model scores lower than under a mismatched one
    assert out[0]["xent_bits"] < out[1]["xent_bits"]
