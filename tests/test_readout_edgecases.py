"""Adversarial planted fixtures for readout columns — INDEPENDENT of the
DuckDB twins (VERDICT r3, task 6).

Twice (attack_robustness r2, gopher_rules r3) a readout column was wrong in
engine AND SQL twin simultaneously — the parity gate cannot catch a
convention both sides share.  These tests assert what the readout SHOULD
say on planted degenerate inputs: empty / symbol-only / unicode-only docs,
k-exceeds-population removals, zero-edge graphs.  Bug caught by this sweep
and fixed engine+twin together: vocab_stats returned NULL total_tokens /
max_token_freq (instead of 0) on a corpus whose docs tokenize to nothing.
"""

import pytest
from pyspark.sql import functions as F

from tests.conftest import make_graph

DOCS_DDL = "doc_id long, text string"

EMPTY = ""
WHITESPACE = "   \n\t  \n"
SYMBOLS = "#" * 120  # tokenizer drops pure-symbol runs => 0 words
UNICODE_ONLY = "今日は 世界！" * 30  # CJK, 0 ascii tokens
NORMAL = (
    "the quick brown fox jumps over the lazy dog and that is fine to be "
    "here with all of us today because we have words " * 3
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], DOCS_DDL
    )


# ---------------------------------------------------------------- gopher


def test_gopher_rules_degenerate_docs(spark):
    from graphina_spark.operators.curation import gopher_rules

    df = _docs(spark, [EMPTY, WHITESPACE, SYMBOLS, UNICODE_ONLY, NORMAL])
    rows = {r["id"]: r for r in gopher_rules(df).collect()}
    # empty / whitespace: zero words, zero symbols -> ratio 0, fails gate
    for i in (0, 1):
        assert rows[i]["n_words"] == 0
        assert rows[i]["symbol_ratio"] == 0.0
        assert rows[i]["pass"] is False
    # symbol-only: the READOUT must say symbol-spam even though the
    # tokenizer yields no words (the r3 mirrored bug: 0-word docs read 0.0)
    assert rows[2]["n_words"] == 0
    assert rows[2]["symbol_ratio"] >= 0.1
    assert rows[2]["pass"] is False
    # unicode-only: no ascii words -> fails word bound, alpha_frac 0
    assert rows[3]["n_words"] == 0
    assert rows[3]["alpha_word_frac"] == 0.0
    assert rows[3]["pass"] is False
    # sanity: a normal doc passes
    assert rows[4]["pass"] is True


# --------------------------------------------------------- filter_corpus


def test_filter_corpus_degenerate_docs(spark):
    from graphina_spark.operators.sampling import filter_corpus

    df = _docs(spark, [EMPTY, SYMBOLS, UNICODE_ONLY, NORMAL])
    rows = {
        r["id"]: r
        for r in filter_corpus(df, min_tokens=5, langs=["en"]).collect()
    }
    for i in (0, 1, 2):
        assert rows[i]["n_tokens"] == 0
        assert rows[i]["keep"] is False
        assert rows[i]["reject_reason"] == "too_short"
        # lang_pred must never be NULL (a NULL would silently skip the
        # lang rule via three-valued logic AND crash the driver's
        # nullable-string sort)
        assert rows[i]["lang_pred"] == "und"
    assert rows[3]["keep"] is True and rows[3]["reject_reason"] is None


def test_filter_corpus_lang_rule_fires_on_und(spark):
    from graphina_spark.operators.sampling import filter_corpus

    # enough tokens + decent quality but NO stopword hits in any language
    # -> lang_pred 'und'; with langs=['en'] the lang rule must reject it
    text = "zzz qqq xxx vvv kkk jjj www yyy " * 20
    df = _docs(spark, [text])
    row = filter_corpus(df, min_tokens=5, min_quality=0.0, langs=["en"]).collect()[0]
    assert row["lang_pred"] == "und"
    assert row["keep"] is False and row["reject_reason"] == "lang"


# -------------------------------------------------------- doc_repetition


def test_doc_repetition_degenerate_docs(spark):
    from graphina_spark.operators.sampling import doc_repetition

    df = _docs(spark, [EMPTY, "hello", "a a a a a a", NORMAL])
    rows = {r["id"]: r for r in doc_repetition(df).collect()}
    # 0 tokens: ratio denominators floored, everything 0.0 (never NULL)
    assert rows[0]["n_tokens"] == 0
    assert rows[0]["distinct_token_ratio"] == 0.0
    assert rows[0]["top_bigram_frac"] == 0.0
    assert rows[0]["dup_bigram_frac"] == 0.0
    # 1 token: no bigrams exist; fracs 0.0, distinct ratio 1.0
    assert rows[1]["distinct_token_ratio"] == 1.0
    assert rows[1]["top_bigram_frac"] == 0.0
    # fully repeated: the modal bigram is every bigram
    assert rows[2]["top_bigram_frac"] == 1.0
    assert rows[2]["dup_bigram_frac"] == 1.0
    assert rows[2]["distinct_token_ratio"] == pytest.approx(1 / 6)


# ----------------------------------------------------------- vocab_stats


def test_vocab_stats_empty_corpus_is_zero_not_null(spark):
    from graphina_spark.operators.sampling import vocab_stats

    # every doc tokenizes to nothing -> zero-row freq table; the health
    # readout must say 0 everywhere, not NULL (mirrored blind spot: DuckDB
    # sum/max over zero rows is NULL too, so the parity gate can't see it)
    df = _docs(spark, [EMPTY, SYMBOLS, UNICODE_ONLY])
    row = vocab_stats(df).collect()[0]
    assert row["vocab_size"] == 0
    assert row["total_tokens"] == 0
    assert row["hapax_count"] == 0
    assert row["max_token_freq"] == 0


def test_vocab_stats_counts(spark):
    from graphina_spark.operators.sampling import vocab_stats

    df = _docs(spark, ["a b a", "b c"])
    row = vocab_stats(df).collect()[0]
    assert row["vocab_size"] == 3
    assert row["total_tokens"] == 5
    assert row["hapax_count"] == 1  # only 'c'
    assert row["max_token_freq"] == 2


# -------------------------------------------------------------- zipf_fit


def test_zipf_fit_degenerate_corpora(spark):
    from graphina_spark.operators.sampling import zipf_fit

    # single distinct token: slope is 0/0 -> alpha/intercept NULL by
    # documented convention (n_terms still says how many points existed)
    row = zipf_fit(_docs(spark, ["aaa aaa aaa"])).collect()[0]
    assert row["n_terms"] == 1
    assert row["alpha"] is None
    # empty corpus: no points at all
    row = zipf_fit(_docs(spark, [EMPTY, SYMBOLS])).collect()[0]
    assert row["n_terms"] == 0
    assert row["alpha"] is None


# ---------------------------------------------------- attack_robustness


def test_attack_robustness_k_exceeds_population(spark):
    from graphina_spark.operators.metrics import attack_robustness

    # 4-vertex path graph, ask to remove 100 hubs: only the 4 vertices
    # with degree >= 1 can be removed; survivors = n_total - actual
    g = make_graph(spark, [(0, 1), (1, 2), (2, 3)], n=6, directed=False)
    rows = {r["removed"]: r for r in attack_robustness(g, [0, 100]).collect()}
    assert rows[0]["n_left"] == 6
    assert rows[0]["giant_size"] == 4
    # only the 4 non-isolated vertices are removable hubs
    assert rows[100]["n_left"] == 2
    assert rows[100]["giant_size"] == 1  # isolated singletons remain
    assert rows[100]["n_components"] == 2


def test_attack_robustness_zero_edge_graph(spark):
    from graphina_spark.operators.metrics import attack_robustness

    g = make_graph(spark, [], n=5, directed=False)
    rows = {r["removed"]: r for r in attack_robustness(g, [0, 2]).collect()}
    for k in (0, 2):
        # no degrees exist -> nothing removable; all 5 singletons survive
        assert rows[k]["n_left"] == 5
        assert rows[k]["giant_size"] == 1
        assert rows[k]["n_components"] == 5


# --------------------------------------------------------- k_center_seeds


def test_k_center_seeds_k_exceeds_population(spark):
    from graphina_spark.operators.coreset import k_center_seeds

    embs = spark.createDataFrame(
        [(0, [0.0, 0.0]), (5, [1.0, 0.0]), (9, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    rows = k_center_seeds(embs, k=10).orderBy("seed_rank").collect()
    # capped at the population: 3 distinct seeds, never a re-listed point
    assert len(rows) == 3
    assert len({r["vec_id"] for r in rows}) == 3
    assert rows[0]["vec_id"] == 0 and rows[0]["d2"] == 0


def test_k_center_seeds_identical_points_stay_distinct(spark):
    from graphina_spark.operators.coreset import k_center_seeds

    # all vectors land on the same grid cell: every selection radius is 0,
    # but the seeds must still be DISTINCT ids (old code re-picked the
    # min-id point every round — a mirrored blind spot, twin shared it)
    embs = spark.createDataFrame(
        [(i, [0.5, 0.5]) for i in (3, 7, 11, 20)],
        "vec_id long, embedding array<double>",
    )
    rows = k_center_seeds(embs, k=3).orderBy("seed_rank").collect()
    ids = [r["vec_id"] for r in rows]
    assert ids == [3, 7, 11]
    assert all(r["d2"] == 0 for r in rows[1:])
