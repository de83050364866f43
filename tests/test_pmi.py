"""PMI collocation invariants on a closed-form corpus."""

import math


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def test_exact_pmi_small_corpus(spark):
    from graphina_spark.operators.pmi import pmi_bigrams

    # "x y" always adjacent (perfect collocation); "x z" never adjacent
    docs = _docs(spark, ["x y q", "x y r", "q r x y"])
    got = {
        (r["a"], r["b"]): (r["n_ab"], r["pmi"])
        for r in pmi_bigrams(docs, min_count=1).collect()
    }
    # corpus: tokens = x y q / x y r / q r x y → N_uni = 10
    # bigrams: (x y) (y q) / (x y) (y r) / (q r) (r x) (x y) → N_bi = 7
    n_uni, n_bi = 10, 7
    cnt = {"x": 3, "y": 3, "q": 2, "r": 2, "z": 0}
    for (a, b), (n_ab, pmi) in got.items():
        want = math.log(
            (n_ab / n_bi) / ((cnt[a] / n_uni) * (cnt[b] / n_uni))
        )
        assert abs(pmi - round(want, 6)) < 1e-9
    assert got[("x", "y")][0] == 3
    # perfect collocation has the max pmi in this corpus
    assert got[("x", "y")][1] == max(v[1] for v in got.values())


def test_min_count_filters(spark):
    from graphina_spark.operators.pmi import pmi_bigrams

    docs = _docs(spark, ["a b", "a b", "c d"])
    got = {(r["a"], r["b"]) for r in pmi_bigrams(docs, min_count=2).collect()}
    assert got == {("a", "b")}
