"""Decontamination: overlap counting, frac semantics, drop list,
asymmetric broadcast shape stays pair-bounded."""

from pyspark.sql import functions as F

from graphina_spark.operators.contamination import (
    contaminated_ids,
    ngram_contamination,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_overlap_counts_and_frac(spark):
    # bench doc: 6 tokens -> 3 distinct 4-grams
    bench = _df(spark, [(100, "alpha beta gamma delta epsilon zeta")])
    train = _df(
        spark,
        [
            (1, "alpha beta gamma delta UNRELATED"),  # shares gram 1 of 3
            (2, "x alpha beta gamma delta epsilon zeta y"),  # all 3
            (3, "nothing in common here at all"),
        ],
    )
    got = {
        (r["train_id"], r["bench_id"]): (r["shared"], r["bench_grams"], r["frac"])
        for r in ngram_contamination(train, bench, k=4).collect()
    }
    assert got == {
        (1, 100): (1, 3, round(1 / 3, 6)),
        (2, 100): (3, 3, 1.0),
    }


def test_repeated_grams_count_once(spark):
    bench = _df(spark, [(9, "a b c d")])
    train = _df(spark, [(1, "a b c d and again a b c d")])
    row = ngram_contamination(train, bench, k=4).collect()[0]
    assert (row["shared"], row["bench_grams"]) == (1, 1)  # distinct, not 2


def test_drop_list_threshold(spark):
    bench = _df(spark, [(100, "alpha beta gamma delta epsilon zeta")])
    train = _df(
        spark,
        [
            (1, "alpha beta gamma delta UNRELATED"),  # frac 1/3
            (2, "x alpha beta gamma delta epsilon zeta y"),  # frac 1
        ],
    )
    ids = {r["train_id"] for r in
           contaminated_ids(train, bench, k=4, min_frac=0.5).collect()}
    assert ids == {2}


def test_short_docs_emit_nothing(spark):
    bench = _df(spark, [(9, "too short")])
    train = _df(spark, [(1, "also short")])
    assert ngram_contamination(train, bench, k=4).count() == 0
