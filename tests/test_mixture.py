"""Data-mixture planning — closed-form semantics on a tiny planted corpus."""

import pytest

from graphina_spark.operators.sampling import mixture_plan

DOCS = [
    # src "a": 10 tokens total; src "b": 5 tokens; src "c": 5 tokens
    (0, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10", "a"),
    (1, "u1 u2 u3 u4 u5", "b"),
    (2, "v1 v2 v3 v4 v5", "c"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string, source string")


def test_plan_renormalizes_over_present_sources(docs):
    # "zz" is absent → its weight is ignored; "c" gets weight 0 → dropped
    plan = {
        r["source"]: r
        for r in mixture_plan(
            docs, {"a": 0.5, "b": 0.5, "zz": 9.0}, token_budget=30
        ).collect()
    }
    assert plan["a"]["available_tokens"] == 10
    assert plan["a"]["target_tokens"] == 15.0 and plan["b"]["target_tokens"] == 15.0
    assert plan["a"]["rate"] == 1.5
    assert plan["b"]["rate"] == 3.0
    assert plan["a"]["epochs"] == 2 and plan["b"]["epochs"] == 3
    assert plan["c"]["rate"] == 0.0 and plan["c"]["epochs"] == 0


def test_epoch_cap(docs):
    plan = {
        r["source"]: r
        for r in mixture_plan(
            docs, {"b": 1.0}, token_budget=1000, max_epochs=4
        ).collect()
    }
    # rate = 1000/5 = 200 → capped at 4 epochs
    assert plan["b"]["rate"] == 200.0
    assert plan["b"]["epochs"] == 4


def test_weighted_sample_determinism_and_bias(spark):
    from graphina_spark.operators.sampling import weighted_sample

    rows = [(i, "x", 1.0 if i < 500 else 100.0) for i in range(600)]
    df = spark.createDataFrame(rows, "doc_id long, text string, w double")
    s1 = weighted_sample(df, k=80, weight_col="w").collect()
    s2 = weighted_sample(df, k=80, weight_col="w").collect()
    # reproducible
    assert sorted(r["id"] for r in s1) == sorted(r["id"] for r in s2)
    assert len(s1) == 80
    # heavy items (100x weight, 1/6 of the pool) dominate the sample
    heavy = sum(1 for r in s1 if r["id"] >= 500)
    assert heavy > 60
    # different salt → different sample
    s3 = weighted_sample(df, k=80, weight_col="w", salt="other").collect()
    assert sorted(r["id"] for r in s3) != sorted(r["id"] for r in s1)


def test_weighted_sample_excludes_nonpositive(spark):
    from graphina_spark.operators.sampling import weighted_sample

    df = spark.createDataFrame(
        [(0, "", 0.0), (1, "", -3.0), (2, "", 1.0)], "doc_id long, text string, w double"
    )
    out = weighted_sample(df, k=10, weight_col="w").collect()
    assert [r["id"] for r in out] == [2]
