"""Property tests (hypothesis) for the round-2 continuation operators."""

import hashlib

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from tests.conftest import make_graph

_SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

token_docs = st.lists(
    st.lists(st.integers(0, 20), min_size=0, max_size=30).map(
        lambda xs: " ".join(f"t{x}" for x in xs)
    ),
    min_size=1,
    max_size=6,
)


def _brute_span_dedup(texts, k):
    import re
    from collections import Counter

    tok = {i: [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]
           for i, t in enumerate(texts)}
    cnt = Counter()
    for ts in tok.values():
        for p in range(len(ts) - k + 1):
            cnt[" ".join(ts[p:p + k])] += 1
    out = {}
    for i, ts in tok.items():
        covered = set()
        for p in range(len(ts) - k + 1):
            if cnt[" ".join(ts[p:p + k])] >= 2:
                covered.update(range(p, p + k))
        kept = [t for j, t in enumerate(ts) if j not in covered]
        out[i] = (len(ts), len(kept),
                  hashlib.md5(" ".join(kept).encode()).hexdigest())
    return out


@settings(**_SETTINGS)
@given(texts=token_docs)
def test_span_dedup_matches_bruteforce(spark, texts):
    from graphina_spark.operators.substrings import remove_duplicate_spans

    docs = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {r["id"]: (r["n_tokens"], r["n_kept"], r["clean_md5"])
           for r in remove_duplicate_spans(docs, k=3).collect()}
    assert got == _brute_span_dedup(texts, k=3)


@settings(**_SETTINGS)
@given(texts=token_docs)
def test_cdc_chunks_partition_tokens(spark, texts):
    from graphina_spark.operators.substrings import cdc_chunks

    docs = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    rows = cdc_chunks(docs).collect()
    import re

    for i, t in enumerate(texts):
        n_tok = len([w for w in re.split(r"[^a-z0-9]+", t.lower()) if w])
        mine = [r for r in rows if r["id"] == i]
        assert sum(r["n_tokens"] for r in mine) == n_tok
        if mine:  # chunk ids are contiguous from 0
            assert sorted(r["chunk_id"] for r in mine) == list(range(len(mine)))


edge_lists = st.lists(
    st.tuples(st.integers(0, 12), st.integers(0, 12)), min_size=1, max_size=40
)


@settings(**_SETTINGS)
@given(edges=edge_lists)
def test_temporal_constant_times_equals_bfs_reach(spark, edges):
    from graphina_spark.operators.paths import (
        bfs_distances,
        temporal_earliest_arrival,
    )

    g = make_graph(spark, edges, n=13, directed=True)
    te = g.edges.select("src", "dst", F.lit(7).alias("t"))
    src = spark.createDataFrame([(0,)], "id long")
    got = {r["id"]: r["arrive"]
           for r in temporal_earliest_arrival(te, src).collect()}
    reach = {r["id"] for r in bfs_distances(g, src, max_depth=20).collect()}
    assert set(got) == reach
    assert got[0] == 0
    assert all(v == 7 for k, v in got.items() if k != 0)


@settings(**_SETTINGS)
@given(edges=edge_lists, seed=st.integers(0, 10))
def test_onion_core_equals_coreness_random(spark, edges, seed):
    from graphina_spark.operators.kcore import core_number, onion_decomposition

    g = make_graph(spark, edges, n=13, directed=False)
    onion = {r["id"]: r["core"] for r in onion_decomposition(g).collect()}
    core = {r["id"]: r["core"] for r in core_number(g).collect()}
    assert onion == core


@settings(**_SETTINGS)
@given(edges=edge_lists)
def test_jdd_total_is_simple_edge_count(spark, edges):
    from graphina_spark.operators.metrics import joint_degree_distribution

    g = make_graph(spark, edges, n=13, directed=True)
    n_simple = g.canonical_undirected_edges(dedup=True).count()
    rows = joint_degree_distribution(g).collect()
    assert sum(r["n_edges"] for r in rows) == n_simple


@settings(**_SETTINGS)
@given(perm=st.permutations(list(range(6))))
def test_rrf_self_fusion_preserves_order(spark, perm):
    from graphina_spark.operators.retrieval import rrf_fuse

    ranking = spark.createDataFrame(
        [(1, doc, rank + 1) for rank, doc in enumerate(perm)],
        "query_id long, neighbor_id long, rank int",
    )
    fused = {r["doc_id"]: r["rank"] for r in rrf_fuse([ranking, ranking]).collect()}
    assert fused == {doc: rank + 1 for rank, doc in enumerate(perm)}
