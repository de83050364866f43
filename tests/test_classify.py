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


def test_train_linear_classifier_learns_separation(spark):
    from pyspark.sql import functions as F

    from graphina_spark.operators.classify import (
        classifier_scores,
        train_linear_classifier,
    )

    # two lexically distinct classes
    pos = [(i, "the quick brown fox jumps over the lazy dog again " * 3) for i in range(10)]
    neg = [(i + 10, "zebra xylophone quartz vortex jumble klaxon wizard " * 3) for i in range(10)]
    docs = spark.createDataFrame(pos + neg, "doc_id long, text string")
    labels = docs.select(
        F.col("doc_id").alias("id"), (F.col("doc_id") < 10).cast("double").alias("y")
    )
    w = train_linear_classifier(docs, labels, iters=8, lr=8.0)
    bias = [r["w"] for r in w.where(F.col("b") == "__bias__").collect()][0]
    feats = w.where(F.col("b") != "__bias__")
    scored = classifier_scores(docs, feats, bias=bias)
    got = {r["id"]: r["label"] for r in scored.collect()}
    acc = sum(got[i] == (i < 10) for i in range(20)) / 20
    assert acc == 1.0


def test_train_classifier_deterministic_across_partitioning(spark):
    from pyspark.sql import functions as F

    from graphina_spark.operators.classify import train_linear_classifier

    docs = spark.createDataFrame(
        [(i, f"token{i % 5} alpha beta gamma word{i % 3}") for i in range(30)],
        "doc_id long, text string",
    )
    labels = docs.select(
        F.col("doc_id").alias("id"), (F.col("doc_id") % 2 == 0).cast("double").alias("y")
    )
    w1 = {r["b"]: r["w"] for r in train_linear_classifier(docs, labels, iters=3).collect()}
    w2 = {
        r["b"]: r["w"]
        for r in train_linear_classifier(docs.repartition(7), labels, iters=3).collect()
    }
    assert w1 == w2


def test_classifier_auc_perfect_and_random(spark):
    from pyspark.sql import functions as F

    from graphina_spark.operators.classify import classifier_auc

    # perfectly separating scores
    scored = spark.createDataFrame(
        [(i, 0.9 if i < 5 else 0.1) for i in range(10)], "id long, prob double"
    )
    labels = spark.createDataFrame(
        [(i, 1.0 if i < 5 else 0.0) for i in range(10)], "id long, y double"
    )
    r = classifier_auc(scored, labels).collect()[0]
    assert (r["auc"], r["npos"], r["nneg"]) == (1.0, 5, 5)
    # constant scores -> tie-aware 0.5
    const = scored.select("id", F.lit(0.5).alias("prob"))
    assert classifier_auc(const, labels).collect()[0]["auc"] == 0.5


def test_classifier_calibration_bins(spark):
    from graphina_spark.operators.classify import classifier_calibration

    scored = spark.createDataFrame(
        [(1, 0.05), (2, 0.08), (3, 0.95), (4, 0.99), (5, 1.0)],
        "id long, prob double",
    )
    labels = spark.createDataFrame(
        [(1, 0.0), (2, 0.0), (3, 1.0), (4, 1.0), (5, 1.0)], "id long, y double"
    )
    got = {r["bin"]: r for r in classifier_calibration(scored, labels).collect()}
    assert set(got) == {0, 9}  # prob=1.0 clamps into the top bin
    assert got[0]["n"] == 2 and got[0]["frac_pos"] == 0.0
    assert got[9]["n"] == 3 and got[9]["frac_pos"] == 1.0
