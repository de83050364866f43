"""Exact-substring (rolling k-gram) duplication stats — unit semantics on
hand-built documents (the driver's DuckDB gate covers engine parity)."""

import pytest

from graphina_spark.operators.substrings import (
    duplicated_kgram_stats,
    kgram_positions,
)

DOCS = [
    # 0 and 1 share the identical 10-token text: every 4-gram position in
    # both is duplicated
    (0, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    # 2 embeds a 6-token span of 0's text inside fresh context: the 4-grams
    # fully inside the copied span are duplicated, the flanks are not
    (2, "one two alpha beta gamma delta epsilon zeta nine ten"),
    # 3 repeats a 4-gram within ITSELF (the suffix-array criterion counts
    # corpus-wide occurrences, including same-doc repeats)
    (3, "red green blue white red green blue white tail word"),
    # 4 is all-unique
    (4, "unrelated totally distinct vocabulary nothing shared anywhere"),
    # 5 is shorter than k → zero grams
    (5, "too short"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_kgram_positions_counts(docs):
    pos = kgram_positions(docs, k=4)
    per = {r["id"]: r["n"] for r in pos.groupBy("id").count().withColumnRenamed("count", "n").collect()}
    # 10 tokens → 7 positions of length-4 windows
    assert per[0] == 7 and per[1] == 7 and per[2] == 7 and per[3] == 7
    assert per[4] == 4  # 7 tokens → 4 positions
    assert 5 not in per  # 2 tokens < k → no rows


def test_duplicated_kgram_stats(docs):
    got = {
        r["id"]: (r["n_grams"], r["dup_grams"], r["dup_frac"])
        for r in duplicated_kgram_stats(docs, k=4).collect()
    }
    # exact dups: all 7 positions duplicated
    assert got[0] == (7, 7, 1.0)
    assert got[1] == (7, 7, 1.0)
    # doc 2: copied span "alpha beta gamma delta epsilon zeta" (6 tokens)
    # contributes 3 duplicated 4-gram positions out of 7
    assert got[2][0] == 7 and got[2][1] == 3
    # doc 3: "red green blue white" occurs twice WITHIN the doc → both
    # positions duplicated, the straddling/tail windows are unique
    assert got[3][0] == 7 and got[3][1] == 2
    # all-unique and too-short docs
    assert got[4] == (7 - 3, 0, 0.0)
    assert got[5] == (0, 0, 0.0)


def test_case_and_punct_folded(spark):
    # tokenization is the frozen convention: lowercase, [^a-z0-9]+ split —
    # so case/punctuation variants of the same token stream ARE duplicates
    df = spark.createDataFrame(
        [
            (0, "Alpha, beta; GAMMA delta epsilon!"),
            (1, "alpha beta gamma delta epsilon"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["id"]: (r["n_grams"], r["dup_grams"])
        for r in duplicated_kgram_stats(df, k=5).collect()
    }
    assert got[0] == (1, 1) and got[1] == (1, 1)


def test_chunk_documents_layout(spark):
    import hashlib

    from graphina_spark.operators.substrings import chunk_documents

    # 10 tokens, size 4, stride 3 → starts 1,4,7,10; tails shortened
    doc = spark.createDataFrame(
        [(0, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"), (1, "")],
        "doc_id long, text string",
    )
    rows = sorted(
        (r["chunk_idx"], r["start_tok"], r["n_tokens"], r["chunk_hash"])
        for r in chunk_documents(doc, size=4, stride=3).collect()
    )
    assert [(r[0], r[1], r[2]) for r in rows] == [
        (0, 1, 4),
        (1, 4, 4),
        (2, 7, 4),
        (3, 10, 1),
    ]
    want = hashlib.md5("t1 t2 t3 t4".encode()).hexdigest()
    assert rows[0][3] == want
    # empty doc emits no chunks
    assert all(True for _ in rows)  # only doc 0 rows present
    assert {r[0] for r in rows} == {0, 1, 2, 3}


def test_chunk_documents_validation(spark):
    import pytest as _pytest

    from graphina_spark.operators.substrings import chunk_documents

    doc = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        chunk_documents(doc, size=4, stride=5)


def test_remove_duplicate_spans_planted(spark):
    from graphina_spark.operators.substrings import remove_duplicate_spans

    boiler = "the quick brown fox jumps over the lazy dog every single day"
    docs = spark.createDataFrame(
        [
            (1, f"alpha beta {boiler} gamma delta epsilon zeta eta theta"),
            (2, f"one two three {boiler} four five six seven eight nine"),
            (3, "completely unique text with no repeated windows at all here ok"),
        ],
        "doc_id long, text string",
    )
    out = {r["id"]: r for r in remove_duplicate_spans(docs, k=6).collect()}
    # the planted 12-token boilerplate is duplicated -> dropped from both docs
    assert out[1]["n_kept"] < out[1]["n_tokens"]
    assert out[2]["n_kept"] < out[2]["n_tokens"]
    # doc 3 shares no 6-gram -> untouched
    assert out[3]["n_kept"] == out[3]["n_tokens"]
    # kept counts: every token covered by a duplicated window is gone; the
    # unique prefix/suffix tokens survive
    assert out[1]["n_kept"] >= 2  # at least "alpha beta" survive
    import hashlib

    kept1 = "alpha beta gamma delta epsilon zeta eta theta"
    # windows extending into the unique tail are NOT duplicated, so only
    # the exact boilerplate tokens drop iff every window covering them is
    # duplicated; recompute with the brute-force rule instead of guessing
    def brute(texts, k=6):
        import re

        tok = {i: [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w] for i, t in texts}
        from collections import Counter

        cnt = Counter()
        for i, ts in tok.items():
            for p in range(len(ts) - k + 1):
                cnt[" ".join(ts[p : p + k])] += 1
        out = {}
        for i, ts in tok.items():
            covered = set()
            for p in range(len(ts) - k + 1):
                if cnt[" ".join(ts[p : p + k])] >= 2:
                    covered.update(range(p, p + k))
            kept = [t for j, t in enumerate(ts) if j not in covered]
            out[i] = (len(ts), len(kept), hashlib.md5(" ".join(kept).encode()).hexdigest())
        return out

    exp = brute([(1, docs.collect()[0]["text"]), (2, docs.collect()[1]["text"]),
                 (3, docs.collect()[2]["text"])])
    for i in (1, 2, 3):
        assert (out[i]["n_tokens"], out[i]["n_kept"], out[i]["clean_md5"]) == exp[i]


def test_cdc_chunks_resynchronize_after_insertion(spark):
    """The CDC property fixed windows lack: prepending text leaves every
    chunk after the first post-edit boundary hash-identical."""
    from graphina_spark.operators.substrings import cdc_chunks, chunk_documents

    base = " ".join(f"w{i * 37}" for i in range(160))
    docs = spark.createDataFrame(
        [(1, base), (2, "intruder tokens inserted here " + base)],
        "doc_id long, text string",
    )
    out = cdc_chunks(docs).collect()
    h1 = [r["chunk_md5"] for r in out if r["id"] == 1]
    h2 = [r["chunk_md5"] for r in out if r["id"] == 2]
    shared = set(h1) & set(h2)
    # nearly all of doc 1's chunks survive the prepend (all but the first)
    assert len(shared) >= len(h1) - 2
    # fixed-size windows share (almost) nothing after a 5-token shift
    fx = chunk_documents(docs, size=8, stride=8).collect()
    f1 = {r["chunk_hash"] for r in fx if r["id"] == 1}
    f2 = {r["chunk_hash"] for r in fx if r["id"] == 2}
    assert len(f1 & f2) <= 1


def test_cdc_chunks_partition_and_cover(spark):
    from graphina_spark.operators.substrings import cdc_chunks

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4)],
        "doc_id long, text string",
    )
    rows = cdc_chunks(docs).collect()
    # chunks partition the token sequence: sizes sum to the token count
    assert sum(r["n_tokens"] for r in rows) == 40
    ids = sorted(r["chunk_id"] for r in rows)
    assert ids == list(range(len(rows)))
