"""Eccentricity, centroid silhouette, and source KL — closed-form fixtures."""

import math

import pytest
from pyspark.sql import functions as F

from tests.conftest import make_graph


def test_eccentricity_path_graph(spark):
    from graphina_spark.operators.paths import eccentricity

    # directed path 0→1→2→3: ecc(0)=3 over 4 reached; 3 reaches only itself
    g = make_graph(spark, [(0, 1), (1, 2), (2, 3)], n=4)
    srcs = spark.createDataFrame([(0,), (3,)], "id long")
    out = {r["source"]: (r["n_reached"], r["eccentricity"]) for r in eccentricity(g, srcs).collect()}
    assert out[0] == (4, 3)
    assert out[3] == (1, 0)


def test_eccentricity_max_depth_caps(spark):
    from graphina_spark.operators.paths import eccentricity

    g = make_graph(spark, [(i, i + 1) for i in range(5)], n=6)
    srcs = spark.createDataFrame([(0,)], "id long")
    out = eccentricity(g, srcs, max_depth=2).collect()[0]
    assert out["n_reached"] == 3 and out["eccentricity"] == 2


def test_silhouette_separated_clusters(spark):
    from graphina_spark.operators.kmeans import centroid_silhouette

    # two tight, well-separated blobs → mean silhouette near 1 in both
    rows = []
    for i in range(8):
        rows.append((i, [0.0 + 0.01 * i, 0.0]))
    for i in range(8, 16):
        rows.append((i, [10.0 + 0.01 * i, 10.0]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = centroid_silhouette(df, k=2, iters=2).collect()
    assert len(out) == 2
    assert all(r["n"] == 8 for r in out)
    assert all(r["mean_silhouette"] > 0.9 for r in out)


def test_source_kl_identical_sources_near_zero(spark):
    from graphina_spark.operators.sampling import source_divergence

    # both sources have the same unigram distribution → KL = 0 exactly
    docs = spark.createDataFrame(
        [
            (0, "a b c a b c", "s1"),
            (1, "a b c a b c", "s2"),
        ],
        "doc_id long, text string, source string",
    )
    out = {r["source"]: r["kl_bits"] for r in source_divergence(docs).collect()}
    assert out["s1"] == 0.0 and out["s2"] == 0.0


def test_source_kl_skewed_source_positive(spark):
    from graphina_spark.operators.sampling import source_divergence

    docs = spark.createDataFrame(
        [
            (0, "x x x x x x x x", "odd"),
            (1, "a b c d e f g h", "base"),
        ],
        "doc_id long, text string, source string",
    )
    out = {r["source"]: r for r in source_divergence(docs).collect()}
    # "odd" is all-x while the corpus is half-x → KL = log2(16/8) = 1 bit
    assert abs(out["odd"]["kl_bits"] - 1.0) < 1e-9
    assert out["odd"]["n_tokens"] == 8
    assert out["base"]["kl_bits"] > 0.0


def test_bidirectional_distance_exact(spark):
    from graphina_spark.operators.paths import bidirectional_distance

    # directed cycle 0→1→2→3→4→0 plus chord 1→3
    g = make_graph(spark, [(0, 1), (1, 2), (2, 3), (3, 4), (4, 0), (1, 3)], n=5)
    pairs = spark.createDataFrame(
        [(0, 3), (3, 0), (0, 0), (2, 1), (0, 4)], "s long, t long"
    )
    out = {(r["s"], r["t"]): r["dist"] for r in bidirectional_distance(g, pairs).collect()}
    assert out[(0, 3)] == 2  # via chord 0→1→3
    assert out[(3, 0)] == 2  # 3→4→0
    assert out[(0, 0)] == 0
    assert out[(2, 1)] == 4  # 2→3→4→0→1
    assert out[(0, 4)] == 3  # 0→1→3→4 via the chord


def test_bidirectional_distance_unreachable_absent(spark):
    from graphina_spark.operators.paths import bidirectional_distance

    g = make_graph(spark, [(0, 1), (2, 3)], n=4)  # two directed components
    pairs = spark.createDataFrame([(0, 3), (1, 0)], "s long, t long")
    out = bidirectional_distance(g, pairs, max_rounds=4).collect()
    assert out == []  # 0→3 cross-component; 1→0 against the edge direction


def test_two_sweep_lower_bound(spark):
    from graphina_spark.operators.distmetrics import two_sweep_lower_bound

    # path 0-1-2-3-4-5 (undirected view): true diameter 5, 2-sweep finds it
    g = make_graph(spark, [(i, i + 1) for i in range(5)], n=6, directed=False)
    r = two_sweep_lower_bound(g).collect()[0]
    assert r["start"] == 0
    assert r["lower_bound"] == 5
    assert r["far_node"] == 5  # farthest from 0, ties to smallest id


def test_zipf_fit_exact_power_law(spark):
    import math

    from graphina_spark.operators.sampling import zipf_fit

    # corpus with f(r) = 2^(10-r) for tokens t1..t6 → ln f = const − ln2·…
    # exact alpha requires f(r) ∝ r^-a; build f(r) = 720/r instead (a = 1)
    words = []
    for r in range(1, 7):
        words += [f"w{r}"] * (720 // r)
    docs = spark.createDataFrame(
        [(0, " ".join(words))], "doc_id long, text string"
    )
    out = zipf_fit(docs, top_n=6).collect()[0]
    assert out["n_terms"] == 6
    assert abs(out["alpha"] - 1.0) < 0.01  # exact harmonic counts
    assert abs(out["intercept"] - math.log(720.0)) < 0.01
