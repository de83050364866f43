"""BPE merge learning: pinned fixtures + classic sequential-trainer parity."""

import re
from collections import Counter

import pytest

from graphina_spark.operators.bpe import apply_bpe, learn_bpe_merges, word_symbol_state


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _tok(text):
    return [w for w in re.split(r"[^a-z0-9]+", text.lower()) if w]


def _py_bpe(texts, k):
    """Classic sequential BPE trainer (Sennrich'16) over word frequencies,
    (count desc, left asc, right asc) tie-break — independent of the
    string-replace formulation."""
    wc = Counter(w for t in texts for w in _tok(t))
    words = {w: list(w) for w in wc}
    out = []
    for step in range(1, k + 1):
        pairs = Counter()
        for w, syms in words.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += wc[w]
        if not pairs:
            break
        (l, r), c = min(pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        out.append((step, l, r, l + r, c))
        for w, syms in words.items():
            i, new = 0, []
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    new.append(l + r)
                    i += 2
                else:
                    new.append(syms[i])
                    i += 1
            words[w] = new
    return out, words, wc


def _learn(spark, texts, k):
    return [tuple(r) for r in learn_bpe_merges(_docs(spark, texts), merges=k).collect()]


def test_pinned_two_merges_then_stop(spark):
    got = _learn(spark, ["aa ab", "aa aa b"], 5)
    assert got == [(1, "a", "a", "aa", 3), (2, "a", "b", "ab", 1)]


def test_overlapping_run_left_to_right(spark):
    # "aaa": pairs (a,a) x2 -> merge; state " aa  a " -> next merge (aa, a)
    got = _learn(spark, ["aaa aaa"], 3)
    assert got == [(1, "a", "a", "aa", 4), (2, "aa", "a", "aaa", 2)]


def test_adjacent_merges_same_pass(spark):
    # "abab": one pass of merge (a,b) must merge BOTH occurrences
    got = _learn(spark, ["abab"], 2)
    assert got[0] == (1, "a", "b", "ab", 2)
    assert got[1] == (2, "ab", "ab", "abab", 1)


def test_matches_sequential_trainer(spark):
    texts = [
        "the theme of the thesis is the best",
        "low lower lowest newer newest",
        "hugs bugs hug bug pugs 123 1234",
        "banana bandana and an antenna",
    ]
    want, _, _ = _py_bpe(texts, 12)
    got = _learn(spark, texts, 12)
    assert got == want


def test_apply_bpe_matches_sequential_encoder(spark):
    texts = ["low lower lowest", "new newer newest", "wider wide widest"]
    merges, words, _ = _py_bpe(texts, 8)
    docs = _docs(spark, texts)
    mt = learn_bpe_merges(docs, merges=8)
    got = {r["id"]: list(r["tokens"]) for r in apply_bpe(docs, mt).collect()}
    for i, t in enumerate(texts):
        want = [s for w in _tok(t) for s in words[w]]
        assert got[i] == want, (i, got[i], want)


def test_symbol_state_shape(spark):
    rows = {r["sym"]: r["cnt"] for r in word_symbol_state(_docs(spark, ["ab ab c"])).collect()}
    assert rows == {" a  b ": 2, " c ": 1}
