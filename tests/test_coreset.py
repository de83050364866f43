"""Greedy k-center seeding vs a brute-force Python twin of the exact
quantized farthest-point traversal, plus the 2-approximation coverage
contract on a planted-clusters fixture."""

import math

import pytest

from graphina_spark.operators.coreset import (
    coreset_assign,
    k_center_seeds,
    quantize_embeddings,
)

# three tight planted clusters far apart + one mild outlier
CLUSTERS = {
    0: (0.0, 0.0),
    1: (10.0, 0.0),
    2: (0.0, 10.0),
}
VECS = []
for cid, (cx, cy) in CLUSTERS.items():
    for j in range(4):
        VECS.append((cid * 4 + j, [cx + 0.01 * j, cy - 0.01 * j]))
VECS.append((12, [5.0, 5.0]))  # outlier


def _quant(v, qbits=12):
    return [math.floor(x * (1 << qbits)) for x in v]


def _twin(k, qbits=12):
    q = {vid: _quant(v, qbits) for vid, v in VECS}
    first = min(q)
    seeds = [(0, first, 0)]
    mind = {
        vid: sum((a - b) ** 2 for a, b in zip(qv, q[first])) for vid, qv in q.items()
    }
    for rank in range(1, k):
        vid = max(mind, key=lambda v: (mind[v], -v))
        seeds.append((rank, vid, mind[vid]))
        for v, qv in q.items():
            d = sum((a - b) ** 2 for a, b in zip(qv, q[vid]))
            mind[v] = min(mind[v], d)
    return seeds


@pytest.fixture(scope="module")
def embs(spark):
    return spark.createDataFrame(
        [(vid, [float(x) for x in v]) for vid, v in VECS],
        "vec_id long, embedding array<float>",
    )


def test_seeds_match_python_twin(spark, embs):
    for k in (1, 3, 5):
        got = [
            (r["seed_rank"], r["vec_id"], r["d2"])
            for r in k_center_seeds(embs, k=k).orderBy("seed_rank").collect()
        ]
        assert got == _twin(k), k


def test_first_three_seeds_cover_the_clusters(spark, embs):
    got = {r["vec_id"] for r in k_center_seeds(embs, k=3).collect()}
    assert {vid // 4 for vid in got if vid != 12} == {0, 1, 2}


def test_selection_radius_nonincreasing(spark, embs):
    rows = k_center_seeds(embs, k=5).orderBy("seed_rank").collect()
    ds = [r["d2"] for r in rows][1:]  # rank 0 is 0 by convention
    assert ds == sorted(ds, reverse=True)


def test_assign_nearest_and_total_cover(spark, embs):
    seeds = k_center_seeds(embs, k=3)
    asg = coreset_assign(embs, seeds).collect()
    assert len(asg) == len(VECS)
    q = {vid: _quant(v) for vid, v in VECS}
    seed_ids = sorted(r["vec_id"] for r in seeds.collect())
    for r in asg:
        dists = {
            s: sum((a - b) ** 2 for a, b in zip(q[r["vec_id"]], q[s]))
            for s in seed_ids
        }
        best = min(dists, key=lambda s: (dists[s], s))
        assert (r["seed_vec_id"], r["d2"]) == (best, dists[best]), r


def test_quantization_floor_grid(spark, embs):
    rows = quantize_embeddings(embs).collect()
    for r in rows:
        vid = r["vec_id"]
        exp = _quant(dict(VECS)[vid])
        assert list(r["qv"]) == exp
