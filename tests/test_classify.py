"""Tests for hashed bag-of-ngram linear classifier inference."""

import hashlib
import math

import pytest


def _bucket(prefix, s):
    return hashlib.md5(f"{prefix}:{s}".encode()).hexdigest()[:2]


def _demo_w(b, salt="clfw", scale=4.0):
    h = int(hashlib.md5(f"{salt}:{b}".encode()).hexdigest()[:8], 16)
    return (h / 4294967296.0 - 0.5) * scale


def _expected(text, bias):
    toks = [t for t in "".join(c if c.isalnum() else " " for c in text.lower()).split() if t]
    feats = [_bucket("u", t) for t in toks] + [
        _bucket("b", f"{a} {b}") for a, b in zip(toks, toks[1:])
    ]
    if not feats:
        return 0, bias
    dot = sum(_demo_w(b) for b in feats)
    return len(feats), bias + dot / len(feats)


class TestClassifierScores:
    def test_matches_pure_python(self, spark):
        from graphina_spark.operators.classify import classifier_scores, demo_weights

        docs = spark.createDataFrame(
            [(1, "the quick brown fox"), (2, "spark spark spark"), (3, "")],
            "doc_id long, text string",
        )
        rows = {
            r["id"]: r
            for r in classifier_scores(docs, demo_weights(spark), bias=-0.05).collect()
        }
        for did, text in [(1, "the quick brown fox"), (2, "spark spark spark"), (3, "")]:
            nf, logit = _expected(text, -0.05)
            assert rows[did]["n_feats"] == nf
            assert rows[did]["logit"] == pytest.approx(round(logit, 6), abs=1e-6)
            prob = 1.0 / (1.0 + math.exp(-logit))
            assert rows[did]["prob"] == pytest.approx(round(prob, 6), abs=1e-6)
            assert rows[did]["label"] == (prob >= 0.5)

    def test_bias_shifts_labels(self, spark):
        from graphina_spark.operators.classify import classifier_scores, demo_weights

        docs = spark.createDataFrame([(1, "hello world")], "doc_id long, text string")
        w = demo_weights(spark)
        hi = classifier_scores(docs, w, bias=50.0).first()
        lo = classifier_scores(docs, w, bias=-50.0).first()
        assert hi["label"] is True and lo["label"] is False

    def test_custom_weight_table(self, spark):
        # a one-bucket model: only the bucket of unigram "good" carries +10
        from graphina_spark.operators.classify import classifier_scores

        b = _bucket("u", "good")
        w = spark.createDataFrame([(b, 10.0)], "b string, w double")
        docs = spark.createDataFrame(
            [(1, "good"), (2, "unrelatedword")], "doc_id long, text string"
        )
        rows = {r["id"]: r for r in classifier_scores(docs, w, bias=0.0).collect()}
        assert rows[1]["logit"] == pytest.approx(10.0)
        assert rows[1]["label"] is True
        # doc 2's single unigram may or may not collide with b; almost surely not
        if _bucket("u", "unrelatedword") != b:
            assert rows[2]["logit"] == pytest.approx(0.0)
