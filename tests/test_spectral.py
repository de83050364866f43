"""Power Iteration Clustering — the distributed stand-in for the
reference's dense spectral clustering (community/spectral.rs)."""

from graphina_spark.operators.spectral import pic_embedding, spectral_clusters
from tests.conftest import make_graph


def _clique(offset, size):
    return [
        (offset + a, offset + b) for a in range(size) for b in range(a + 1, size)
    ]


def test_disconnected_cliques_recovered(spark):
    g = make_graph(spark, _clique(0, 6) + _clique(6, 6) + _clique(12, 6),
                   directed=False)
    cl = {r["id"]: r["cluster"] for r in spectral_clusters(g, k=3, iters=5).collect()}
    assert {cl[i] for i in range(0, 6)} == {0}
    assert {cl[i] for i in range(6, 12)} == {6}
    assert {cl[i] for i in range(12, 18)} == {12}


def test_bridged_cliques_separated(spark):
    # two 8-cliques + one bridge edge: the classic spectral fixture — the
    # embedding plateaus per side long before global mixing
    edges = _clique(0, 8) + _clique(8, 8) + [(0, 8)]
    g = make_graph(spark, edges, directed=False)
    cl = {r["id"]: r["cluster"] for r in spectral_clusters(g, k=2, iters=8).collect()}
    left = {cl[i] for i in range(0, 8)}
    right = {cl[i] for i in range(8, 16)}
    assert len(left) == 1 and len(right) == 1 and left != right


def test_embedding_deterministic_and_normalized(spark):
    g = make_graph(spark, _clique(0, 5) + _clique(5, 5), directed=False)
    a = sorted((r["id"], round(r["score"], 12)) for r in pic_embedding(g, iters=4).collect())
    b = sorted((r["id"], round(r["score"], 12)) for r in pic_embedding(g, iters=4).collect())
    assert a == b
    assert abs(sum(abs(s) for _, s in a) - 1.0) < 1e-9  # L1-normalized


def test_isolated_vertices_keep_init(spark):
    from graphina_spark.graph import LinkGraph
    from pyspark.sql import functions as F

    verts = spark.createDataFrame([(i,) for i in range(4)], "id long")
    edges = spark.createDataFrame(
        [(0, 1, 1.0)], "src long, dst long, weight double"
    )
    g = LinkGraph(vertices=verts, edges=edges, directed=False)
    emb = pic_embedding(g, iters=3)
    assert emb.count() == 4
    assert emb.where(F.col("score").isNull()).count() == 0


def test_girvan_newman_splits_bridge(spark):
    """Two 6-cliques + bridge: GN(target=2) removes the bridge (maximal
    edge betweenness) and returns the two cliques (girvan_newman.rs rule)."""
    from graphina_spark.operators.girvan_newman import girvan_newman

    g = make_graph(spark, _clique(0, 6) + _clique(6, 6) + [(5, 6)],
                   directed=False)
    cl = {r["id"]: r["community"] for r in girvan_newman(g, 2).collect()}
    assert {cl[i] for i in range(0, 6)} == {0}
    assert {cl[i] for i in range(6, 12)} == {6}


def test_girvan_newman_target_already_met(spark):
    from graphina_spark.operators.girvan_newman import girvan_newman

    g = make_graph(spark, _clique(0, 4) + _clique(4, 4), directed=False)
    # 2 components already; target 2 -> zero removals, labels = components
    cl = {r["id"]: r["community"] for r in girvan_newman(g, 2).collect()}
    assert {cl[i] for i in range(0, 4)} == {0}
    assert {cl[i] for i in range(4, 8)} == {4}
