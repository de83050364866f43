"""Contrastive pair mining (operators/contrastive.py) on planted clusters."""

import pytest


def test_contrastive_pairs_planted_clusters(spark):
    from graphina_spark.operators.contrastive import contrastive_pairs

    # two tight clusters + one loner; 4-dim unit-ish vectors
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.999, 0.04, 0.0, 0.0]),   # ~cluster A
        (2, [0.0, 1.0, 0.0, 0.0]),
        (3, [0.04, 0.999, 0.0, 0.0]),   # ~cluster B
        (4, [0.0, 0.0, 1.0, 0.0]),      # loner
    ]
    embs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    # exact baseline: near-orthogonal vectors rarely share a sign-LSH
    # bucket, so the recall-exact assertions below need the brute-force
    # candidate generator (the lsh default is tested separately)
    out = contrastive_pairs(
        embs, pos_threshold=0.95, k_neg=2, margin=3, planes=4, tables=3,
        neg_candidates="exact",
    ).collect()
    pos = {(r["anchor"], r["other"]) for r in out if r["kind"] == "pos"}
    assert pos == {(0, 1), (2, 3)}
    negs = {(r["anchor"], r["other"]) for r in out if r["kind"] == "neg"}
    # no negative pair may fall inside a positive group
    assert not any(
        {a, b} in ({0, 1}, {2, 3}) for a, b in negs
    )
    # every anchor gets negatives; the hardest negative of 0 is from B or
    # the loner, never 1
    by_anchor = {}
    for r in out:
        if r["kind"] == "neg" and r["rank"] == 1:
            by_anchor[r["anchor"]] = r["other"]
    assert by_anchor[0] in (2, 3, 4)
    assert by_anchor[4] is not None  # loner is its own group; all others ok
    # ranks are 1..k per anchor, scores non-increasing in rank
    import collections

    ranks = collections.defaultdict(list)
    for r in out:
        if r["kind"] == "neg":
            ranks[r["anchor"]].append((r["rank"], r["score"]))
    for a, rs in ranks.items():
        rs.sort()
        assert [x[0] for x in rs] == list(range(1, len(rs) + 1))
        assert all(rs[i][1] >= rs[i + 1][1] for i in range(len(rs) - 1))


def test_contrastive_margin_bounds_candidates(spark):
    from graphina_spark.operators.contrastive import contrastive_pairs

    # all five vectors near-identical => one big positive group => no
    # negatives exist at all (group filter removes every candidate)
    rows = [(i, [1.0, 0.001 * i, 0.0, 0.0]) for i in range(5)]
    embs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = contrastive_pairs(
        embs, pos_threshold=0.99, k_neg=2, margin=2, planes=4, tables=3
    ).collect()
    assert all(r["kind"] == "pos" for r in out) and len(out) > 0


def test_contrastive_lsh_default_subset_of_exact(spark):
    """The default (lsh) negative path is a recall-reduced variant of the
    exact path: positives are identical between the two (they share one
    generator), no group constraint is ever violated, and per-anchor
    negative ranks stay dense 1..n."""
    import hashlib

    from graphina_spark.operators.contrastive import contrastive_pairs

    def vec(i):
        # deterministic correlated-ish vectors: same quadrant => frequent
        # LSH collisions, unlike the orthogonal planted-cluster toy
        h = hashlib.md5(f"clv:{i}".encode()).digest()
        return [0.5 + (b / 512.0) for b in h[:4]]

    rows = [(i, vec(i)) for i in range(20)]
    embs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    kw = dict(pos_threshold=0.998, k_neg=3, margin=5, planes=3, tables=2)
    lsh = contrastive_pairs(embs, neg_candidates="lsh", **kw).collect()
    exact = contrastive_pairs(embs, neg_candidates="exact", **kw).collect()
    lp = {(r["anchor"], r["other"]) for r in lsh if r["kind"] == "pos"}
    ep = {(r["anchor"], r["other"]) for r in exact if r["kind"] == "pos"}
    assert lp == ep and len(lp) > 0
    lneg = [r for r in lsh if r["kind"] == "neg"]
    assert len(lneg) > 0
    # group constraint: a positive pair may never appear as a negative
    sym_pos = lp | {(b, a) for a, b in lp}
    for r in lneg:
        assert (r["anchor"], r["other"]) not in sym_pos
    # ranks well-formed per anchor
    import collections

    ranks = collections.defaultdict(list)
    for r in lneg:
        ranks[r["anchor"]].append(r["rank"])
    for a, rs in ranks.items():
        assert sorted(rs) == list(range(1, len(rs) + 1))


def test_contrastive_bad_generator_raises(spark):
    from graphina_spark.operators.contrastive import contrastive_pairs

    embs = spark.createDataFrame(
        [(0, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    import pytest as _pt

    with _pt.raises(ValueError, match="neg_candidates"):
        contrastive_pairs(embs, neg_candidates="nope").collect()
