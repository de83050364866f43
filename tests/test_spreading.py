"""Label spreading: clamp semantics, symmetric diffusion, sparse
support, argmax prediction with deterministic ties."""

import pytest
from pyspark.sql import functions as F

from graphina_spark.graph import LinkGraph
from graphina_spark.operators.spreading import label_spreading, predict_labels


def _graph(spark, edges, n):
    vdf = spark.createDataFrame([(i,) for i in range(n)], "id long")
    edf = spark.createDataFrame(edges, "src long, dst long")
    return LinkGraph.from_edges(edf, directed=False, vertices=vdf)


def _seeds(spark, pairs):
    return spark.createDataFrame(pairs, "id long, cls long")


def test_matches_dense_reference(spark):
    # path 0-1-2-3, seeds: 0 -> cls 0, 3 -> cls 1
    edges = [(0, 1), (1, 2), (2, 3)]
    g = _graph(spark, edges, 4)
    st = label_spreading(g, _seeds(spark, [(0, 0), (3, 1)]),
                         alpha=0.8, fixed_iters=4)
    got = {(r["cls"], r["id"]): r["f"] for r in st.collect()}

    # dense python twin
    import math
    nbrs = {0: [1], 1: [0, 2], 2: [1, 3], 3: [2]}
    deg = {v: len(ns) for v, ns in nbrs.items()}
    Y = {(0, 0): 1.0, (1, 3): 1.0}
    F_ = dict(Y)
    for _ in range(4):
        nxt = {}
        for c in (0, 1):
            for v in range(4):
                sf = sum(
                    F_.get((c, u), 0.0) / math.sqrt(deg[u] * deg[v])
                    for u in nbrs[v]
                )
                val = 0.8 * sf + 0.2 * Y.get((c, v), 0.0)
                if val > 0:
                    nxt[(c, v)] = val
        F_ = nxt
    assert set(got) == set(F_)
    for key, val in F_.items():
        assert got[key] == pytest.approx(val, abs=1e-12), key


def test_nearest_seed_wins(spark):
    # two hubs far apart: vertices adopt the closer seed's class
    edges = [(0, 1), (1, 2), (3, 4), (4, 5)]
    g = _graph(spark, edges, 6)
    st = label_spreading(g, _seeds(spark, [(0, 7), (5, 9)]),
                         alpha=0.8, fixed_iters=6)
    lab = {r["id"]: r["cls"] for r in predict_labels(st).collect()}
    assert lab[1] == 7 and lab[2] == 7
    assert lab[4] == 9 and lab[3] == 9


def test_sparse_support_never_materializes_unreached(spark):
    edges = [(0, 1), (2, 3)]  # two components; seed only component 1
    g = _graph(spark, edges, 4)
    st = label_spreading(g, _seeds(spark, [(0, 0)]), fixed_iters=5)
    assert {r["id"] for r in st.collect()} == {0, 1}


def test_tie_breaks_to_min_class(spark):
    # vertex 1 equidistant from two seeds of different classes
    g = _graph(spark, [(0, 1), (1, 2)], 3)
    st = label_spreading(g, _seeds(spark, [(0, 5), (2, 3)]), fixed_iters=4)
    lab = {r["id"]: r["cls"] for r in predict_labels(st).collect()}
    assert lab[1] == 3  # exact score tie -> smaller class id


def test_alpha_validation(spark):
    g = _graph(spark, [(0, 1)], 2)
    with pytest.raises(ValueError):
        label_spreading(g, _seeds(spark, [(0, 0)]), alpha=1.0)
