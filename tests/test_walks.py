"""Deterministic random-walk corpus tests."""

import pytest

from tests.conftest import make_graph

# every vertex has at least one out-edge (no sinks)
_EDGES = [(0, 1), (0, 2), (1, 2), (2, 3), (3, 0), (3, 1), (4, 0)]


def test_walks_follow_edges_and_are_complete(spark):
    from graphina_spark.operators.walks import random_walks

    g = make_graph(spark, _EDGES, n=5, directed=True)
    rows = random_walks(g, length=4, walks_per_node=2).collect()
    adj = {}
    for s, d in _EDGES:
        adj.setdefault(s, set()).add(d)
    byw = {}
    for r in rows:
        byw.setdefault(r["walk"], {})[r["step"]] = r["id"]
    assert len(byw) == 10  # 5 vertices x 2 walks
    for walk, steps in byw.items():
        assert steps[0] == walk // 2  # start vertex
        # every vertex here has out-edges, so all walks run full length
        assert sorted(steps) == [0, 1, 2, 3, 4]
        for t in range(1, 5):
            assert steps[t] in adj[steps[t - 1]]


def test_walks_terminate_at_sinks(spark):
    from graphina_spark.operators.walks import random_walks

    # 0 -> 1 -> 2, 2 is a sink
    g = make_graph(spark, [(0, 1), (1, 2)], n=3, directed=True)
    rows = random_walks(g, length=5, walks_per_node=1).collect()
    byw = {}
    for r in rows:
        byw.setdefault(r["walk"], []).append((r["step"], r["id"]))
    assert sorted(byw[0]) == [(0, 0), (1, 1), (2, 2)]
    assert sorted(byw[1]) == [(0, 1), (1, 2)]
    assert sorted(byw[2]) == [(0, 2)]


def test_walks_deterministic_across_partitionings(spark):
    from graphina_spark.operators.walks import random_walks
    from graphina_spark.graph import LinkGraph
    from pyspark.sql import functions as F

    g = make_graph(spark, _EDGES, n=5, directed=True)
    a = sorted(map(tuple, random_walks(g, length=6, walks_per_node=3).collect()))
    g2 = LinkGraph.from_edges(
        g.edges.repartition(7, "dst"), directed=True,
        vertices=g.vertices.repartition(3),
    )
    b = sorted(map(tuple, random_walks(g2, length=6, walks_per_node=3).collect()))
    assert a == b


def test_walks_validate_params(spark):
    from graphina_spark.operators.walks import random_walks

    g = make_graph(spark, _EDGES, n=5, directed=True)
    with pytest.raises(ValueError):
        random_walks(g, length=-1)
    with pytest.raises(ValueError):
        random_walks(g, walks_per_node=0)
