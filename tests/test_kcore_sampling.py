"""k-core / coreness, near-dup grouping, and deterministic sampling tests."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import make_graph


def _brute_core_numbers(n, edges):
    """Sequential peeling reference: exact coreness per vertex."""
    import collections

    adj = collections.defaultdict(set)
    for s, d in edges:
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    deg = {v: len(adj[v]) for v in range(n)}
    core = dict(deg)
    alive = set(range(n))
    k = 0
    while alive:
        k += 1
        while True:
            peel = [v for v in alive if deg[v] < k]
            if not peel:
                break
            for v in peel:
                core[v] = k - 1
                alive.discard(v)
                for u in adj[v]:
                    if u in alive:
                        deg[u] -= 1
        for v in alive:
            core[v] = k
    return core


# clique {0..3} (core 3), triangle {4,5,6} glued to the clique via 4-0
# (core 2), a tail 7-8 (core 1), and an isolated vertex 9 (core 0)
_EDGES = [
    (0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3),
    (4, 5), (5, 6), (4, 6), (4, 0),
    (7, 8), (7, 0),
]


def test_core_number_matches_bruteforce(spark):
    from graphina_spark.operators.kcore import core_number

    g = make_graph(spark, _EDGES, n=10, directed=False)
    got = {r["id"]: r["core"] for r in core_number(g).collect()}
    assert got == _brute_core_numbers(10, _EDGES)


def test_k_core_membership(spark):
    from graphina_spark.operators.kcore import k_core

    g = make_graph(spark, _EDGES, n=10, directed=False)
    core3 = sorted(r["id"] for r in k_core(g, 3).collect())
    assert core3 == [0, 1, 2, 3]
    core2 = sorted(r["id"] for r in k_core(g, 2).collect())
    assert core2 == [0, 1, 2, 3, 4, 5, 6]
    core0 = sorted(r["id"] for r in k_core(g, 0).collect())
    assert core0 == list(range(10))


def test_k_core_fixed_rounds_reaches_fixpoint(spark):
    from graphina_spark.operators.kcore import k_core

    g = make_graph(spark, _EDGES, n=10, directed=False)
    fix = sorted(r["id"] for r in k_core(g, 2).collect())
    fr = sorted(r["id"] for r in k_core(g, 2, fixed_rounds=8).collect())
    assert fix == fr


def test_core_number_directed_uses_undirected_projection(spark):
    from graphina_spark.operators.kcore import core_number

    # same edges as a directed graph: coreness is defined on the simple
    # undirected projection, so results must be identical
    g = make_graph(spark, _EDGES, n=10, directed=True)
    got = {r["id"]: r["core"] for r in core_number(g).collect()}
    assert got == _brute_core_numbers(10, _EDGES)


def _docs_df(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog again and again"),
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "the quick brown fox jumps over the lazy dog once more today"),
        (3, "completely unrelated text about spark dataframes and shuffles"),
        (4, "another unrelated document concerning parquet column pruning"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_neardup_groups_transitive_and_singletons(spark):
    from graphina_spark.operators.dedup import neardup_groups

    docs = _docs_df(spark)
    # hand-built pair frame: 0-1 (exact dup) and 1-2 (near dup) chain
    pairs = spark.createDataFrame([(0, 1), (1, 2)], "a long, b long")
    got = {r["id"]: (r["group_id"], r["keep"]) for r in
           neardup_groups(docs, pairs).collect()}
    assert got[0] == (0, True)
    assert got[1] == (0, False)
    assert got[2] == (0, False)  # transitive through 1
    assert got[3] == (3, True)   # singleton
    assert got[4] == (4, True)


def test_deterministic_split_is_stable_and_row_order_free(spark):
    from graphina_spark.operators.sampling import deterministic_split

    docs = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    a = {r["id"]: r["split"] for r in deterministic_split(docs).collect()}
    # a subset must get the identical assignment (no dependence on the
    # rest of the corpus, row order, or partitioning)
    sub = docs.where(F.col("doc_id") % 3 == 0).repartition(7)
    b = {r["id"]: r["split"] for r in deterministic_split(sub).collect()}
    assert all(a[k] == v for k, v in b.items())
    # fractions approximately honored
    from collections import Counter

    c = Counter(a.values())
    assert 0.75 < c["train"] / 2000 < 0.85
    assert 0.06 < c["valid"] / 2000 < 0.14
    assert 0.06 < c["test"] / 2000 < 0.14


def test_deterministic_split_requires_two_splits(spark):
    from graphina_spark.operators.sampling import deterministic_split

    docs = spark.range(10).withColumnRenamed("id", "doc_id")
    with pytest.raises(ValueError):
        deterministic_split(docs, weights={"all": 1.0})


def test_corpus_stats_token_sums(spark):
    from graphina_spark.operators.sampling import corpus_stats

    docs = _docs_df(spark)
    rows = corpus_stats(docs).collect()
    assert sum(r["n_docs"] for r in rows) == 5
    # token counts per doc: 12 + 12 + 12 + 8 + 7
    assert sum(r["total_tokens"] for r in rows) == 51
    for r in rows:
        assert 0.0 <= r["avg_quality"] <= 1.0


# --- hypothesis: coreness on random small graphs ---------------------------
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_edge_lists = st.lists(
    st.tuples(st.integers(0, 7), st.integers(0, 7)), min_size=1, max_size=14
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edges=_edge_lists)
def test_core_number_random_graphs_match_bruteforce(spark, edges):
    from graphina_spark.operators.kcore import core_number

    g = make_graph(spark, edges, n=8, directed=False)
    got = {r["id"]: r["core"] for r in core_number(g).collect()}
    assert got == _brute_core_numbers(8, edges)


def test_filter_corpus_rules_and_reasons(spark):
    from graphina_spark.operators.sampling import filter_corpus

    rows = [
        (0, "tiny"),  # too_short
        (1, " ".join(["the cat sat on a mat and it was good"] * 6)),  # keep (en)
        (2, " ".join(["el perro y el gato en la casa por una con"] * 6)),  # lang
        (3, "a! b! c! d! e! f! g! h! i! j! k! l!"),  # punct-heavy -> low_quality
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["id"]: (r["keep"], r["reject_reason"]) for r in filter_corpus(
        docs, min_tokens=10, min_quality=0.1, langs=["en"]
    ).collect()}
    assert got[0] == (False, "too_short")
    assert got[1] == (True, None)
    assert got[2] == (False, "lang")
    assert got[3] == (False, "low_quality")


def test_top_ngrams_counts_and_order(spark):
    from graphina_spark.operators.sampling import top_ngrams

    docs = spark.createDataFrame(
        [(0, "a b a b c"), (1, "a b x y"), (2, "zz")],
        "doc_id long, text string",
    )
    rows = top_ngrams(docs, n=2, k=3).collect()
    assert [(r["ngram"], r["freq"], r["docs"]) for r in rows] == [
        ("a b", 3, 2),   # twice in doc0, once in doc1
        ("b a", 1, 1),
        ("b c", 1, 1),   # freq-1 ties broken by ngram asc
    ]


def test_doc_repetition_signals(spark):
    from graphina_spark.operators.sampling import doc_repetition

    docs = spark.createDataFrame(
        [(0, "a b a b c"), (1, "x"), (2, "")],
        "doc_id long, text string",
    )
    got = {
        r["id"]: (
            r["n_tokens"],
            r["distinct_token_ratio"],
            r["top_bigram_frac"],
            r["dup_bigram_frac"],
        )
        for r in doc_repetition(docs).collect()
    }
    # doc0: bigrams = [a b, b a, a b, b c] -> nb=4, top=2 ("a b"), dup mass=2
    assert got[0] == (5, 3 / 5, 0.5, 0.5)
    assert got[1] == (1, 1.0, 0.0, 0.0)
    assert got[2] == (0, 0.0, 0.0, 0.0)


def test_split_contamination_extremes(spark):
    from graphina_spark.operators.sampling import split_contamination

    same = spark.createDataFrame(
        [(i, "the quick brown fox jumps") for i in range(60)],
        "doc_id long, text string",
    )
    for r in split_contamination(same, k=3).collect():
        assert r["split"] in ("valid", "test")
        if r["n_docs"]:  # every eval doc shares every shingle with train
            assert r["contaminated"] == r["n_docs"] and r["frac"] == 1.0
    uniq = spark.createDataFrame(
        [(i, f"tok{i}a tok{i}b tok{i}c tok{i}d") for i in range(60)],
        "doc_id long, text string",
    )
    for r in split_contamination(uniq, k=3).collect():
        assert r["contaminated"] == 0 and r["frac"] == 0.0


def test_tfidf_top_terms(spark):
    import math

    from graphina_spark.operators.sampling import tfidf_top_terms

    docs = spark.createDataFrame(
        [(0, "apple apple banana"), (1, "banana cherry"), (2, "cherry cherry cherry")],
        "doc_id long, text string",
    )
    rows = tfidf_top_terms(docs, k=2).collect()
    got = {(r["id"], r["rnk"]): (r["term"], r["tfidf"]) for r in rows}
    idf1 = math.log(4 / 2) + 1  # df=1
    idf2 = math.log(4 / 3) + 1  # df=2
    assert got[(0, 1)] == ("apple", round(2 * idf1, 6))
    assert got[(0, 2)] == ("banana", round(1 * idf2, 6))
    assert got[(2, 1)] == ("cherry", round(3 * idf2, 6))


def test_stratified_sample_keep_all_and_drop(spark):
    """frac=1.0 must keep EVERY row of its stratum (regression: the naive
    16^8 hex threshold is 9 chars and lexicographically drops ~94%), and
    strata absent from fracs drop entirely by default."""
    from graphina_spark.operators.sampling import stratified_sample

    df = spark.createDataFrame(
        [(i, "keep" if i % 2 == 0 else "other") for i in range(200)],
        "doc_id long, source string",
    )
    got = stratified_sample(df, "source", {"keep": 1.0}).collect()
    assert len(got) == 100 and all(r["source"] == "keep" for r in got)
    # rerun identical (determinism) and fractional stratum is a subset
    half = stratified_sample(df, "source", {"keep": 0.5})
    a = sorted(r["doc_id"] for r in half.collect())
    b = sorted(r["doc_id"] for r in half.collect())
    assert a == b and set(a) <= {r["doc_id"] for r in got} and 0 < len(a) < 100


def _brute_onion(n, edges):
    """Sequential reference of the onion decomposition (Hébert-Dufresne 2016)."""
    import collections

    adj = collections.defaultdict(set)
    for s, d in edges:
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    alive = set(range(n))
    out, k, layer = {}, 0, 0
    while alive:
        layer += 1
        deg = {v: len(adj[v] & alive) for v in alive}
        k = max(k, min(deg.values()))
        peel = {v for v in alive if deg[v] <= k}
        for v in peel:
            out[v] = (k, layer)
        alive -= peel
    return out


def test_onion_matches_bruteforce(spark):
    from graphina_spark.operators.kcore import onion_decomposition

    g = make_graph(spark, _EDGES, n=10, directed=False)
    got = {r["id"]: (r["core"], r["layer"]) for r in onion_decomposition(g).collect()}
    assert got == _brute_onion(10, _EDGES)


def test_onion_core_equals_coreness(spark):
    import random

    from graphina_spark.operators.kcore import core_number, onion_decomposition

    rng = random.Random(7)
    n = 40
    edges = [(u, v) for u in range(n) for v in range(u + 1, n) if rng.random() < 0.12]
    g = make_graph(spark, edges, n=n, directed=False)
    onion = {r["id"]: r["core"] for r in onion_decomposition(g).collect()}
    core = {r["id"]: r["core"] for r in core_number(g).collect()}
    assert onion == core


def test_onion_fixed_rounds_prefix(spark):
    from graphina_spark.operators.kcore import onion_decomposition

    g = make_graph(spark, _EDGES, n=10, directed=False)
    full = {(r["id"], r["core"], r["layer"])
            for r in onion_decomposition(g).collect()}
    part = {(r["id"], r["core"], r["layer"])
            for r in onion_decomposition(g, fixed_rounds=2).collect()}
    assert part <= full
    assert {t[2] for t in part} <= {1, 2}
