"""Cross-document line dedup: segmentation, frequency rule, reassembly."""

import hashlib

from graphina_spark.operators.linededup import doc_lines, line_dedup


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_fixed_width_segmentation(spark):
    rows = doc_lines(_docs(spark, ["a b c d e"]), words_per_line=2).collect()
    assert [(r["line_no"], r["line"]) for r in sorted(rows, key=lambda r: r[1])] == [
        (0, "a b"), (1, "c d"), (2, "e"),
    ]


def test_shared_line_dropped_everywhere(spark):
    # "x y" appears in both docs → dropped from both; unique tails survive
    out = {
        r["doc_id"]: r
        for r in line_dedup(
            _docs(spark, ["x y p q", "x y r s"]), words_per_line=2
        ).collect()
    }
    assert out[0]["n_lines"] == 2 and out[0]["n_kept"] == 1
    assert out[1]["n_lines"] == 2 and out[1]["n_kept"] == 1
    assert out[0]["clean_md5"] == hashlib.md5(b"p q").hexdigest()
    assert out[1]["clean_md5"] == hashlib.md5(b"r s").hexdigest()


def test_within_doc_repeat_kept_when_unique_to_doc(spark):
    # the same line twice in ONE doc is 1 distinct doc → kept both times
    out = line_dedup(_docs(spark, ["k k k k"]), words_per_line=2).collect()[0]
    assert out["n_kept"] == 2
    assert out["clean_md5"] == hashlib.md5(b"k k\nk k").hexdigest()


def test_all_lines_dropped_yields_empty_md5(spark):
    out = {
        r["doc_id"]: r
        for r in line_dedup(_docs(spark, ["z z", "z z"]), words_per_line=2).collect()
    }
    empty = hashlib.md5(b"").hexdigest()
    assert out[0]["n_kept"] == 0 and out[0]["clean_md5"] == empty


def test_reassembly_preserves_order(spark):
    out = line_dedup(_docs(spark, ["a b c d e f"]), words_per_line=2).collect()[0]
    assert out["clean_md5"] == hashlib.md5(b"a b\nc d\ne f").hexdigest()


def test_max_doc_freq_relaxation(spark):
    # with max_doc_freq=2 a line in two docs survives
    out = line_dedup(
        _docs(spark, ["x y", "x y"]), words_per_line=2, max_doc_freq=2
    ).collect()
    assert all(r["n_kept"] == 1 for r in out)
