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
