"""Scalar int8 quantization — code correctness and recall harness."""

import pytest
from pyspark.sql import functions as F

from graphina_spark.operators.quantize import quantization_recall, scalar_quantize


def test_codes_and_roundtrip(spark):
    df = spark.createDataFrame(
        [
            (0, [0.0, -1.0, 5.0]),
            (1, [25.5, 0.0, 5.0]),
            (2, [51.0, 1.0, 5.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    out = {r["id"]: r for r in scalar_quantize(df).collect()}
    # dim 0: min 0, max 51 → scale 0.2; codes 0, 128 (25.5/0.2 = 127.5 → half
    # up), 255.  dim 1: min −1, max 1 → scale 2/255.  dim 2: constant → 0.
    assert out[0]["qvec"] == [0, 0, 0]
    assert out[1]["qvec"][0] == 128 and out[2]["qvec"][0] == 255
    assert out[0]["qvec"][1] == 0 and out[2]["qvec"][1] == 255
    assert [out[i]["qvec"][2] for i in range(3)] == [0, 0, 0]
    # codebook attached and shared
    assert out[0]["mins"] == [0.0, -1.0, 5.0]
    # dequantized max error ≤ scale/2 per dim
    deq0 = out[1]["mins"][0] + out[1]["qvec"][0] * out[1]["scales"][0]
    assert abs(deq0 - 25.5) <= 0.2 / 2 + 1e-12


def test_recall_harness(spark):
    # directionally separated clusters (no zero vectors); int8 noise may
    # reshuffle *within*-cluster ranks, so pin the harness contract — every
    # sampled query reported, hits ≤ k, and aggregate recall well above
    # chance (k/(n−1) ≈ 0.1) — not perfection
    rows = []
    for i in range(30):
        c = i % 3
        rows.append((i, [100.0 * c + 1.0 + 0.01 * i, 50.0 * c + 2.0, 1.0 * (i % 5) + 1.0]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = quantization_recall(df, k=3, query_mod=7).collect()
    assert {r["query_id"] for r in out} == {0, 7, 14, 21, 28}
    assert all(0 <= r["hits"] <= 3 for r in out)
    assert sum(r["recall"] for r in out) / len(out) > 0.5


def test_identical_vectors_perfect_recall(spark):
    # duplicate rings: quantization is value-identical within each ring, so
    # the top-k sets cannot change at all
    rows = [(i, [float(1 + i % 4), float(2 + (i % 4) * 3), 7.0]) for i in range(24)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = quantization_recall(df, k=4, query_mod=6).collect()
    assert all(r["recall"] == 1.0 for r in out)


def test_lsh_recall_bounds_and_sampling(spark):
    """Recall in [0,1]; generous LSH config (many tables, huge buckets)
    reaches recall 1.0; query_mod filters the evaluated query set."""
    import numpy as np

    from graphina_spark.operators.ann import lsh_recall

    rng = np.random.default_rng(5)
    rows = [(i, [float(x) for x in rng.normal(size=8)]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    # generous OR-construction (4 independent 1-plane tables, no bucket
    # cap) must dominate a tight config on mean recall
    full = lsh_recall(df, k=3, planes=1, tables=4, max_bucket=10_000)
    vals = {r["query_id"]: r["recall"] for r in full.collect()}
    assert len(vals) == 40
    assert all(0.0 <= v <= 1.0 for v in vals.values())
    tight = lsh_recall(df, k=3, planes=6, tables=1, max_bucket=4)
    tvals = {r["query_id"]: r["recall"] for r in tight.collect()}
    assert sum(vals.values()) >= sum(tvals.values())
    # realistic config: bounded recall, sampled queries only
    samp = lsh_recall(df, k=3, planes=4, tables=2, max_bucket=8, query_mod=10)
    rows2 = samp.collect()
    assert {r["query_id"] for r in rows2} == {0, 10, 20, 30}
    assert all(0.0 <= r["recall"] <= 1.0 for r in rows2)


def test_matryoshka_full_dims_perfect_recall(spark):
    from graphina_spark.operators.quantize import matryoshka_recall

    rows = [
        (i, [float((i * 7 + d * 3) % 13) + 1.0 for d in range(6)])
        for i in range(20)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    # prefix = full vector → identical index → recall exactly 1.0
    out = matryoshka_recall(df, k=3, dims=6, query_mod=5).collect()
    assert {r["query_id"] for r in out} == {0, 5, 10, 15}
    assert all(r["recall"] == 1.0 for r in out)


def test_matryoshka_prefix_dominant_dims(spark):
    from graphina_spark.operators.quantize import matryoshka_recall

    # all ranking signal lives in the first 2 dims; tail dims zero → the
    # 2-dim prefix cosine equals the full-vector cosine, so recall is 1.0
    rows = [
        (i, [100.0 * (i % 4) + i, 50.0 * (i % 4) + 1.0, 0.0, 0.0, 0.0, 0.0])
        for i in range(24)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = matryoshka_recall(df, k=3, dims=2, query_mod=6).collect()
    assert len(out) == 4
    assert all(r["recall"] == 1.0 for r in out)


def test_product_quantize_shapes(spark):
    from graphina_spark.operators.quantize import product_quantize

    rows = [(i, [float(1 + i % 4), float(2 + (i % 4) * 3), 7.0, float(i % 2)]) for i in range(24)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = product_quantize(df, m=2, ks=8, iters=2).collect()
    assert len(out) == 24
    for r in out:
        assert len(r["code"]) == 2
        assert all(0 <= c < 8 for c in r["code"])
        assert len(r["dvec"]) == 4


def test_product_quantize_bad_m(spark):
    import pytest as _pytest
    from graphina_spark.operators.quantize import product_quantize

    df = spark.createDataFrame(
        [(0, [1.0, 2.0, 3.0])], "vec_id long, embedding array<double>"
    )
    with _pytest.raises(ValueError):
        product_quantize(df, m=2).collect()


def test_pq_identical_vectors_perfect_recall(spark):
    from graphina_spark.operators.quantize import pq_recall

    # duplicate rings: every distinct value lands on (or near) its own
    # centroid, so within-ring top-k is preserved exactly
    rows = [
        (i, [float(1 + i % 4), float(2 + (i % 4) * 3), 7.0, float(10 * (i % 4))])
        for i in range(24)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = pq_recall(df, k=4, m=2, ks=8, iters=2, query_mod=6).collect()
    assert {r["query_id"] for r in out} == {0, 6, 12, 18}
    assert all(r["recall"] == 1.0 for r in out)


def test_ivfpq_topk_contract(spark):
    from graphina_spark.operators.ann import cosine_topk, ivfpq_topk

    # well-separated directional clusters: IVF lists align with clusters,
    # PQ centroids reproduce the duplicated ring values → candidates from
    # the probed lists match brute force on the same ids
    rows = [
        (i, [100.0 * (i % 3) + 1.0, 50.0 * (i % 3) + 2.0, float(10 * (i % 3)) + 1.0, 5.0])
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = ivfpq_topk(df, k=3, n_centroids=6, n_probe=2, m=2, ks=6, iters=2).collect()
    assert len(out) > 0
    by_q = {}
    for r in out:
        assert r["query_id"] != r["neighbor_id"]
        assert 1 <= r["rank"] <= 3
        by_q.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    # every query got some neighbors, none more than k
    assert all(len(v) <= 3 for v in by_q.values())
    # recall vs brute force well above chance on this easy fixture
    exact = cosine_topk(df, k=3)
    ex_by_q = {}
    for r in exact.collect():
        ex_by_q.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = sum(len(by_q.get(q, set()) & s) for q, s in ex_by_q.items())
    total = sum(len(s) for s in ex_by_q.values())
    assert hits / total > 0.5


def test_rotation_matrix_orthonormal():
    from graphina_spark.operators.quantize import rotation_matrix

    d = 8
    R = rotation_matrix(d, rounds=2)
    # R · Rᵀ ≈ I (product of exact Givens rotations, float error only)
    for i in range(d):
        for j in range(d):
            dot = sum(R[i][k] * R[j][k] for k in range(d))
            assert abs(dot - (1.0 if i == j else 0.0)) < 1e-12
    # deterministic: same inputs → bit-identical matrix
    assert R == rotation_matrix(d, rounds=2)
    # the rotation actually mixes dimensions (not a permutation/identity)
    off = sum(abs(R[i][j]) for i in range(d) for j in range(d) if i != j)
    assert off > 1.0


def test_rotate_vectors_preserves_dots(spark):
    from graphina_spark.operators.quantize import rotate_vectors, rotation_matrix

    rows = [(i, [float(i + 1), float(2 * i), 3.0, float(i % 3)]) for i in range(6)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    R = rotation_matrix(4, rounds=2)
    out = {r["vec_id"]: r["embedding"] for r in rotate_vectors(df, R).collect()}
    import math as _m

    for i, x in rows:
        y = out[i]
        assert len(y) == 4
        # norm preserved up to the 6-dp coordinate rounding
        nx = _m.sqrt(sum(v * v for v in x))
        ny = _m.sqrt(sum(v * v for v in y))
        assert abs(nx - ny) < 1e-4


def test_opq_identical_vectors_perfect_recall(spark):
    from graphina_spark.operators.quantize import opq_recall

    # duplicate rings (as in the PQ test): every distinct rotated value
    # lands on (or near) its own centroid → within-ring top-k preserved
    rows = [
        (i, [float(1 + i % 4), float(2 + (i % 4) * 3), 7.0, float(10 * (i % 4))])
        for i in range(24)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = opq_recall(df, k=4, m=2, ks=8, iters=2, rounds=2, query_mod=6).collect()
    assert {r["query_id"] for r in out} == {0, 6, 12, 18}
    assert all(r["recall"] == 1.0 for r in out)
