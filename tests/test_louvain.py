"""Louvain: modularity-quality pinning (the reference's own oracle policy,
tests/oracle_community_tests.rs:150) + structural checks on planted
partitions; modularity function pinned against hand computation."""

import pytest

from graphina_spark.operators.louvain import louvain
from graphina_spark.operators.metrics import modularity
from tests.conftest import make_graph


def _planted(spark, k=3, size=5, p_extra=None):
    """k cliques joined in a ring by single bridges."""
    edges = []
    for b in range(k):
        base = b * size
        for i in range(size):
            for j in range(i + 1, size):
                edges.append((base + i, base + j))
        edges.append((base, ((b + 1) % k) * size))  # bridge
    return make_graph(spark, edges, n=k * size, directed=False), edges


def test_modularity_hand_computed(spark):
    # two triangles + bridge: known Q for the natural partition
    edges = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3), (2, 3)]
    g = make_graph(spark, edges, n=6, directed=False)
    com = spark.createDataFrame(
        [(i, 0 if i < 3 else 1) for i in range(6)], "id long, community long"
    )
    m = len(edges)
    # Σin per community = 2*3 (three intra edges each); Σtot: deg sums
    deg = {0: 2, 1: 2, 2: 3, 3: 3, 4: 2, 5: 2}
    q_want = sum(
        (2 * 3) / (2 * m) - (sum(deg[i] for i in mem) / (2 * m)) ** 2
        for mem in ([0, 1, 2], [3, 4, 5])
    )
    assert modularity(g, com) == pytest.approx(q_want, abs=1e-9)


def test_modularity_trivial_partitions(spark):
    g = make_graph(spark, [(0, 1), (1, 2), (2, 0)], n=3, directed=False)
    one = g.vertices.sparkSession.createDataFrame(
        [(i, 0) for i in range(3)], "id long, community long"
    )
    assert modularity(g, one) == pytest.approx(0.0, abs=1e-9)


def test_louvain_recovers_planted_partition(spark):
    g, _ = _planted(spark, k=3, size=5)
    com = {r["id"]: r["community"] for r in louvain(g).collect()}
    # each clique ends up in one community
    for b in range(3):
        mem = {com[b * 5 + i] for i in range(5)}
        assert len(mem) == 1, (b, mem)
    # distinct cliques in distinct communities
    assert len({com[0], com[5], com[10]}) == 3
    # canonical label = min member id
    assert com[0] == 0 and com[5] == 5 and com[10] == 10


def test_louvain_modularity_quality(spark):
    """The reference pins Louvain by modularity-within-slack of an oracle;
    here: Q(louvain) must reach ≥ 95% of the planted partition's Q."""
    g, _ = _planted(spark, k=4, size=4)
    found = louvain(g)
    planted = spark.createDataFrame(
        [(i, i // 4) for i in range(16)], "id long, community long"
    )
    q_found = modularity(g, found)
    q_planted = modularity(g, planted)
    assert q_found >= 0.95 * q_planted


def test_louvain_empty_and_edgeless(spark):
    g = make_graph(spark, [], n=4, directed=False)
    com = {r["id"]: r["community"] for r in louvain(g).collect()}
    assert com == {i: i for i in range(4)}
