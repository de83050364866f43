"""Neighbourhood MinHash structural near-dup: planted mirrors + replay."""

import pytest

from graphina_spark.graph import LinkGraph
from graphina_spark.operators.approximation import PRI_A1, PRI_A2, PRI_B
from graphina_spark.operators.distmetrics import ANF_P
from graphina_spark.operators.structdup import (
    neighbor_minhash,
    structural_dup_pairs,
)


def _graph(spark, edges, n):
    vdf = spark.createDataFrame([(i,) for i in range(n)], "id long")
    edf = spark.createDataFrame(edges, "src long, dst long")
    return LinkGraph.from_edges(edf, directed=True, vertices=vdf)


def _py_hash(j, x):
    # walks._hop_hash(j, 0, x)
    m1 = ((j + 1) * PRI_A1 + (x + 1) * PRI_B) % ANF_P
    m2 = (m1 * m1 + PRI_A1) % ANF_P
    return (m2 * m2 + PRI_A2) % ANF_P


def test_signature_matches_python_replay(spark):
    edges = [(0, 5), (0, 6), (0, 7), (1, 6), (1, 8)]
    g = _graph(spark, edges, 9)
    got = {r["id"]: [r[f"h{j}"] for j in range(4)] for r in neighbor_minhash(g, k=4).collect()}
    nbrs = {0: [5, 6, 7], 1: [6, 8]}
    for vid, ns in nbrs.items():
        assert got[vid] == [min(_py_hash(j, x) for x in ns) for j in range(4)]
    assert set(got) == {0, 1}  # only vertices with out-neighbours


def test_planted_mirror_found(spark):
    # 0 and 1 are exact mirrors (same 6 out-links); 2 shares half; 3 disjoint
    common = list(range(10, 16))
    edges = (
        [(0, x) for x in common]
        + [(1, x) for x in common]
        + [(2, x) for x in common[:3]] + [(2, 20), (2, 21), (2, 22)]
        + [(3, 30), (3, 31)]
    )
    g = _graph(spark, edges, 32)
    got = {(r["a"], r["b"]): r["jaccard"] for r in structural_dup_pairs(g, min_jaccard=0.9).collect()}
    assert got == {(0, 1): 1.0}
    # lowering the threshold surfaces the half-overlap pair iff it collides
    # in some band; exact mirrors are always caught (identical signatures)
    lo = {(r["a"], r["b"]): r["jaccard"] for r in structural_dup_pairs(g, min_jaccard=0.0).collect()}
    assert lo[(0, 1)] == 1.0
    for (a, b), j in lo.items():
        if (a, b) == (0, 2) or (a, b) == (1, 2):
            assert j == pytest.approx(3 / 9)


def test_bucket_cap_drops_giant_family(spark):
    # 50 pages all linking to the same two targets -> one giant bucket
    edges = [(i, 100) for i in range(50)] + [(i, 101) for i in range(50)]
    g = _graph(spark, edges, 102)
    assert structural_dup_pairs(g, max_bucket=10).count() == 0
    full = structural_dup_pairs(g, max_bucket=None, min_jaccard=1.0)
    assert full.count() == 50 * 49 // 2


def test_k_bands_validation(spark):
    g = _graph(spark, [(0, 1)], 2)
    with pytest.raises(ValueError, match="multiple of bands"):
        structural_dup_pairs(g, k=6, bands=4)


def test_dedup_keep_best_quality_wins(spark):
    from graphina_spark.operators.dedup import dedup_keep_best

    # doc 0 short/low-quality, doc 7 long with stopwords → higher quality;
    # the pair graph links them, so the HIGHER id must win the group
    docs = spark.createDataFrame(
        [
            (0, "key agg row"),
            (7, "the a of and to in is it key agg row scan table value part "
                "hash the a of and to in is it the a of and to key agg row"),
            (3, "unrelated batch window spark order"),
        ],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame([(0, 7)], "a long, b long")
    out = {r["id"]: r for r in dedup_keep_best(docs, pairs).collect()}
    assert out[7]["keep"] is True and out[0]["keep"] is False
    assert out[0]["group_id"] == out[7]["group_id"]
    assert out[3]["keep"] is True  # singleton keeps itself
