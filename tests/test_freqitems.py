"""Two-pass Misra–Gries frequent tokens: exactness, partition
independence, bounded sketch size, superset guarantee at minimum k."""

import pytest
from pyspark.sql import functions as F

from graphina_spark.functions.textstats import tokens_col
from graphina_spark.operators.freqitems import (
    _mg_shrink,
    frequent_tokens,
    mg_candidates,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _exact_heavy(spark, docs, num, den):
    occ = docs.select(F.explode(tokens_col(F.col("text"))).alias("token"))
    n = occ.count()
    return {
        (r["token"], r["cnt"])
        for r in occ.groupBy("token")
        .agg(F.count("*").alias("cnt"))
        .where(F.col("cnt") * den >= n * num)
        .collect()
    }


def test_mg_shrink_bounds_and_undercount():
    counts = {"a": 10, "b": 5, "c": 3, "d": 1}
    _mg_shrink(counts, 2)
    # pivot = 3rd largest (3): a->7, b->2, c and d dropped
    assert counts == {"a": 7, "b": 2}
    small = {"a": 1}
    _mg_shrink(small, 4)
    assert small == {"a": 1}  # under capacity: untouched


def test_matches_exact_counts_any_partitioning(spark):
    texts = (
        ["the cat sat on the mat"] * 20
        + ["dogs and cats and birds"] * 10
        + [f"rare{i} word{i} only once" for i in range(40)]
    )
    docs = _docs(spark, texts)
    want = _exact_heavy(spark, docs, 1, 20)
    assert want  # fixture sanity: some token IS 1/20-heavy
    for parts in (1, 7):
        got = {
            (r["token"], r["cnt"])
            for r in frequent_tokens(
                docs.repartition(parts), num=1, den=20
            ).collect()
        }
        assert got == want, parts


def test_superset_guarantee_at_minimum_k(spark):
    # one planted heavy token among a sea of distinct singletons, with the
    # guarantee-minimum sketch size k = den/num - 1 + 1 = den (num=1)
    texts = ["hot"] * 30 + [f"u{i}" for i in range(170)]
    docs = _docs(spark, texts).repartition(5)
    got = {r["token"]: r["cnt"] for r in
           frequent_tokens(docs, num=1, den=10, k=10).collect()}
    assert got == {"hot": 30}  # 30/200 >= 1/10, exact count survives
    # and the candidate stage never exceeds k per partition
    occ = docs.select(F.explode(tokens_col(F.col("text"))).alias("token"))
    assert mg_candidates(occ, 10).count() <= 10 * 5


def test_parameter_validation(spark):
    docs = _docs(spark, ["a b c"])
    with pytest.raises(ValueError):
        frequent_tokens(docs, num=0, den=10)
    with pytest.raises(ValueError):
        frequent_tokens(docs, num=1, den=100, k=50)  # k+1 < den/num
