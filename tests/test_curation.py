"""End-to-end curation pipeline — each stage's drop reason exercised."""

from graphina_spark.operators.curation import curation_pipeline


def test_each_stage_drops(spark):
    long_good = (
        "the a of and to in is it key agg row scan table value part hash "
        "merge batch window spark order data column agg join small line "
        "the a of and to in is it the a of and to in is it extra tail words"
    )
    docs = spark.createDataFrame(
        [
            # doc 0: bench carve-out (0 % 97 == 0) → excluded from train;
            # its text is DISTINCT so it only contaminates doc 4
            (0, "bench eval question answer choice label option "
                "alpha beta gamma delta epsilon zeta eta theta"),
            # docs 1, 2: exact near-dups; survivor selection keeps ONE
            (1, long_good + " dup pair body"),
            (2, long_good + " dup pair body"),
            # doc 3: too short → quality filter drops
            (3, "short doc"),
            # doc 4: contaminated — contains doc 0's text verbatim inside
            # otherwise-distinct filler (NOT a near-dup of 1/2)
            (4, "the a of and to in is it filler text around the leak "
                "bench eval question answer choice label option "
                "alpha beta gamma delta epsilon zeta eta theta "
                "the a of and to in is it closing filler words here now"),
            # doc 5: clean keeper — fully distinct text (not a near-dup
            # of 1/2, no overlap with bench doc 0)
            (5, "the a of and to in is it stream fast order group value "
                "sort column query big merge customer window five unique "
                "the a of and to in is it body keeps quality high enough"),
        ],
        "doc_id long, text string",
    )
    out = curation_pipeline(
        docs, bench_mod=97, contam_k=4, contam_min_frac=0.5,
        min_tokens=10, min_quality=0.05,
    )
    kept = {r["doc_id"] for r in out.collect()}
    assert 0 not in kept          # bench split
    assert 3 not in kept          # too_short
    assert 4 not in kept          # contaminated vs doc 0
    assert 5 in kept              # clean doc survives
    assert len(kept & {1, 2}) == 1  # exactly one dup survives


def test_gopher_rules_pass_and_fail(spark):
    from graphina_spark.operators.curation import gopher_rules

    good = (
        "the quick brown fox jumps over that lazy dog and runs off to "
        "the hills with great energy every single morning before dawn "
    ) * 5  # ~100 words, normal lengths, stopwords present
    bullets = "\n".join("- item" for _ in range(10))
    symbols = "# " * 80
    short = "tiny doc"
    df = spark.createDataFrame(
        [(1, good), (2, bullets), (3, symbols), (4, short)],
        "doc_id long, text string",
    )
    rows = {r["id"]: r for r in gopher_rules(df).collect()}
    assert rows[1]["pass"] is True
    assert rows[1]["n_stop"] >= 2 and rows[1]["alpha_word_frac"] == 1.0
    assert rows[2]["pass"] is False and rows[2]["bullet_frac"] == 1.0
    assert rows[3]["pass"] is False and rows[3]["symbol_ratio"] >= 0.1
    assert rows[4]["pass"] is False and rows[4]["n_words"] < 50
