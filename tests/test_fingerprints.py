"""Winnowing fingerprints — semantics vs a literal Python reference of the
Schleimer-Wilkerson-Aiken rule (the driver's DuckDB gate covers engine
parity)."""

import hashlib

import pytest

from graphina_spark.operators.fingerprints import (
    fingerprint_stats,
    winnow_fingerprints,
)

DOCS = [
    # 0 and 1 share the full 12-token run → guaranteed shared fingerprints
    (0, "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu"),
    (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu"),
    # 2 shares a 9-token run with 0 (>= t = w + k - 1 = 8 → guarantee fires)
    (2, "xx yy alpha beta gamma delta epsilon zeta eta theta iota zz"),
    # 3 all-unique vocabulary
    (3, "one two three four five six seven eight nine ten eleven twelve"),
    # 4 shorter than k + w - 1 = 8 tokens → no full window, no fingerprints
    (4, "just seven tokens here no full window"),
]
K, W = 5, 4


def _tok(text):
    import re

    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]


def _winnow_py(text, k=K, w=W):
    """Literal reference: rightmost minimal hash per window."""
    t = _tok(text)
    hs = [
        hashlib.md5(" ".join(t[i : i + k]).encode()).hexdigest()
        for i in range(len(t) - k + 1)
    ]
    sel = set()
    for i in range(len(hs) - w + 1):
        win = hs[i : i + w]
        m = min(win)
        j = max(jj for jj, h in enumerate(win) if h == m)
        sel.add((i + j + 1, m))  # 1-based position
    return sel


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_matches_literal_winnowing(docs):
    got = {
        (r["id"], r["pos"], r["g"])
        for r in winnow_fingerprints(docs, k=K, w=W).collect()
    }
    want = set()
    for did, text in DOCS:
        for pos, g in _winnow_py(text):
            want.add((did, pos, g))
    assert got == want


def test_guarantee_and_stats(docs):
    st = {
        r["id"]: (r["n_fingerprints"], r["n_shared"])
        for r in fingerprint_stats(docs, k=K, w=W).collect()
    }
    # identical docs share everything
    assert st[0][0] == st[1][0] > 0
    assert st[0][1] == st[0][0] and st[1][1] == st[1][0]
    # the >= w+k-1 shared run guarantees at least one shared fingerprint
    assert st[2][1] >= 1
    # unique doc shares nothing; short doc selects nothing
    assert st[3] == (st[3][0], 0)
    assert st[4] == (0, 0)


def test_density(spark):
    # winnowing selects ~2/(w+1) of positions on random-ish text; sanity:
    # selection is non-empty and strictly smaller than the position count
    long_doc = spark.createDataFrame(
        [(0, " ".join(f"tok{i * 7919 % 1000}" for i in range(400)))],
        "doc_id long, text string",
    )
    n_pos = 400 - K + 1
    n_sel = winnow_fingerprints(long_doc, k=K, w=W).count()
    assert 0 < n_sel < n_pos
    # loose band around the expected 2/(w+1) density
    assert n_pos * 0.15 < n_sel < n_pos * 0.8
