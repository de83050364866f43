"""Subgraph extraction, validation predicates, generators, multimodal
plumbing — behavior pinned to the reference files cited in each module."""

import pytest
from pyspark.sql import functions as F

from graphina_spark.functions.multimodal import (
    decode_metadata,
    image_features,
    pack_media,
    sample_frames,
    synth_media,
)
from graphina_spark.operators import validation as V
from graphina_spark.operators.subgraphs import (
    component_subgraph,
    ego_graph,
    filter_edges,
    filter_nodes,
    induced_subgraph,
    k_hop_neighbors,
)
from graphina_spark.sources import generators as G
from tests.conftest import make_graph

# two components: triangle 0-1-2 and path 3-4; 5 isolated
EDGES = [(0, 1), (1, 2), (2, 0), (3, 4)]


@pytest.fixture(scope="module")
def g(spark):
    return make_graph(spark, EDGES, n=6, directed=False)


def test_induced_subgraph(spark, g):
    ids = spark.createDataFrame([(0,), (1,), (3,)], "id long")
    sub = induced_subgraph(g, ids)
    assert sub.num_vertices() == 3
    assert {(r["src"], r["dst"]) for r in sub.edges.collect()} == {(0, 1)}


def test_filter_nodes_edges(spark, g):
    sub = filter_nodes(g, F.col("id") < 3)
    assert sub.num_vertices() == 3 and sub.num_edges() == 3
    fe = filter_edges(g, F.col("src") != 0)
    assert fe.num_vertices() == 6  # node set unchanged
    assert fe.num_edges() == 3  # only (0,1) has src==0


def test_k_hop_and_ego(spark, g):
    src = spark.createDataFrame([(3,)], "id long")
    hops = {r["id"]: r["hops"] for r in k_hop_neighbors(g, src, 2).collect()}
    assert hops == {3: 0, 4: 1}
    ego = ego_graph(g, 0, 1)
    assert {r["id"] for r in ego.vertices.collect()} == {0, 1, 2}
    assert ego.num_edges() == 3  # triangle fully inside the 1-ball


def test_k_hop_directed(spark):
    dg = make_graph(spark, [(0, 1), (1, 2), (2, 3)], n=4, directed=True)
    src = dg.vertices.sparkSession.createDataFrame([(0,)], "id long")
    hops = {r["id"]: r["hops"] for r in k_hop_neighbors(dg, src, 2).collect()}
    assert hops == {0: 0, 1: 1, 2: 2}  # direction respected, 3 out of range


def test_component_subgraph(spark, g):
    sub = component_subgraph(g, 4)
    assert {r["id"] for r in sub.vertices.collect()} == {3, 4}
    assert sub.num_edges() == 1


def test_validation_predicates(spark, g):
    assert not V.is_empty(g)
    assert not V.has_self_loops(g)
    assert not V.has_negative_weights(g)
    assert V.count_components(g) == 3
    assert not V.is_connected(g)
    with pytest.raises(V.GraphValidationError):
        V.require_connected(g, "pagerank")
    loop = make_graph(spark, [(0, 0)], n=1, directed=True)
    assert V.has_self_loops(loop)


def test_is_dag(spark):
    assert V.is_dag(make_graph(spark, [(0, 1), (1, 2), (0, 2)], n=3, directed=True))
    assert not V.is_dag(make_graph(spark, [(0, 1), (1, 2), (2, 0)], n=3, directed=True))
    assert not V.is_dag(make_graph(spark, [(0, 0)], n=1, directed=True))
    assert not V.is_dag(make_graph(spark, [(0, 1)], n=2, directed=False))


def test_is_bipartite(spark):
    assert V.is_bipartite(make_graph(spark, [(0, 1), (1, 2), (2, 3), (3, 0)], n=4, directed=False))
    assert not V.is_bipartite(make_graph(spark, [(0, 1), (1, 2), (2, 0)], n=3, directed=False))
    # disconnected: even cycle + odd cycle → not bipartite
    assert not V.is_bipartite(
        make_graph(spark, [(0, 1), (1, 0), (2, 3), (3, 4), (4, 2)], n=5, directed=False)
    )


def test_generators_structure(spark):
    assert G.complete_graph(spark, 5).num_edges() == 10
    assert G.star_graph(spark, 6).num_edges() == 5
    assert G.cycle_graph(spark, 7).num_edges() == 7
    assert G.path_graph(spark, 7).num_edges() == 6
    er1 = G.erdos_renyi(spark, 30, 0.3, seed=1)
    er2 = G.erdos_renyi(spark, 30, 0.3, seed=1)
    assert sorted(map(tuple, er1.edges.collect())) == sorted(
        map(tuple, er2.edges.collect())
    )
    assert 0 < er1.num_edges() < 30 * 29 / 2
    ws = G.watts_strogatz(spark, 40, 4, 0.2, seed=3)
    assert ws.num_edges() > 40  # ~n*k/2 minus collisions
    ba = G.barabasi_albert(spark, 50, 2, seed=5)
    assert ba.num_edges() == (50 - 2) * 2
    with pytest.raises(ValueError):
        G.watts_strogatz(spark, 10, 3, 0.1)


def test_bipartite_generator_is_bipartite(spark):
    b = G.bipartite_random(spark, 6, 5, 0.5, seed=2)
    assert V.is_bipartite(b)


def test_multimodal_decode_and_features(spark):
    media = synth_media(spark, 12)
    meta = {r["media_id"]: r for r in decode_metadata(media, "blob").collect()}
    assert len(meta) == 12
    assert meta[0]["kind"] == "image" and meta[0]["valid"]
    assert meta[1]["kind"] == "audio"
    assert meta[2]["kind"] == "video" and meta[2]["frames"] > 1
    feats = {r["media_id"]: r for r in image_features(media).collect()}
    assert len(feats[0]["histogram"]) == 8
    assert abs(sum(feats[0]["histogram"]) - 1.0) < 1e-9
    frames = sample_frames(media, every_n=5).collect()
    assert len(frames) > 0
    assert all(r["frame_idx"] % 5 == 0 for r in frames)


def test_multimodal_invalid_blob(spark):
    df = spark.createDataFrame(
        [(0, b"garbage"), (1, pack_media(1, 8, 8, 1, b"\x01\x02"))],
        "media_id long, blob binary",
    )
    meta = {r["media_id"]: r for r in decode_metadata(df, "blob").collect()}
    assert meta[0]["valid"] is False and meta[0]["kind"] == "unknown"
    assert meta[1]["valid"] is True and meta[1]["width"] == 8


def test_multimodal_real_codec_is_marked(spark):
    df = synth_media(spark, 3)
    with pytest.raises(Exception) as ei:
        decode_metadata(df, "blob", codec="real").collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )


def test_deterministic_across_partitions(spark):
    a = G.erdos_renyi(spark, 40, 0.25, seed=9)
    b = G.erdos_renyi(spark, 40, 0.25, seed=9)
    b.edges = b.edges.repartition(7)
    assert sorted(map(tuple, a.edges.collect())) == sorted(map(tuple, b.edges.collect()))


def test_events_cooccurrence_window_cap(spark):
    """A hot window must be bounded at cap^2 pairs, not U^2 (same skew
    lesson as the links-family hub cap): with cap=3, only the 3 smallest
    ids in the single shared window can pair."""
    import datetime as dt

    from graphina_spark.sources.derived import events_cooccurrence_graph
    import tempfile, os

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [(i, t0, i, "view", 1.0, "{}") for i in range(10)]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    )
    d = tempfile.mkdtemp(prefix="graphina_events_")
    df.coalesce(1).write.parquet(os.path.join(d, "events.parquet"))
    g = events_cooccurrence_graph(spark, d, min_shared=1, max_users_per_window=3)
    users = {r["src"] for r in g.edges.collect()} | {
        r["dst"] for r in g.edges.collect()
    }
    assert users <= {0, 1, 2}
    assert g.edges.count() == 6  # 3 canonical pairs, symmetrized
