"""JSON/GraphML interchange — round-trips + reference-format fixtures.

Mirrors /root/reference/src/core/serialization.rs tests: test_json_roundtrip
(:170-189), test_from_serializable (:152-163), directedness strict check
(:127-143), GraphML writer layout (:297-381)."""

import json
import textwrap

import pytest

from graphina_spark.sources.serialization import (
    InterchangeSizeError,
    load_graphml,
    load_interchange,
    load_json,
    save_graphml,
    save_json,
)
from tests.conftest import make_graph

EDGES = [(0, 1), (1, 2), (2, 0)]


def _edge_set(g):
    return {(r["src"], r["dst"], r["weight"]) for r in g.edges.collect()}


def test_json_roundtrip(spark, tmp_path):
    g = make_graph(spark, EDGES, directed=True, weights=[1.5, 2.5, 3.0])
    p = str(tmp_path / "g.json")
    save_json(g, p)
    g2 = load_json(spark, p)
    assert g2.directed is True
    assert g2.vertices.count() == 3
    assert _edge_set(g2) == {(0, 1, 1.5), (1, 2, 2.5), (2, 0, 3.0)}


def test_json_reference_fixture(spark, tmp_path):
    """A document exactly as serde_json emits SerializableGraph
    (serialization.rs:152-163 field layout: tuples are JSON arrays)."""
    doc = {
        "directed": False,
        "nodes": [10, 20, 30],
        "edges": [[0, 1, 1.0], [1, 2, 2.0], [2, 0, 3.0]],
    }
    p = tmp_path / "ref.json"
    p.write_text(json.dumps(doc, indent=2))
    g = load_json(spark, str(p), expect_directed=False)
    assert g.directed is False
    assert g.vertices.count() == 3
    assert {r["value"] for r in g.vertices.collect()} == {"10", "20", "30"}
    assert _edge_set(g) == {(0, 1, 1.0), (1, 2, 2.0), (2, 0, 3.0)}


def test_json_strict_directedness(spark, tmp_path):
    g = make_graph(spark, EDGES, directed=True)
    p = str(tmp_path / "g.json")
    save_json(g, p)
    with pytest.raises(ValueError, match="directed"):
        load_json(spark, p, expect_directed=False)


def test_graphml_roundtrip(spark, tmp_path):
    g = make_graph(spark, EDGES, directed=False, weights=[1.5, 2.5, 3.0])
    p = str(tmp_path / "g.graphml")
    save_graphml(g, p)
    g2 = load_graphml(spark, p, expect_directed=False)
    assert g2.directed is False
    assert _edge_set(g2) == {(0, 1, 1.5), (1, 2, 2.5), (2, 0, 3.0)}


def test_graphml_reference_fixture(spark, tmp_path):
    """Byte layout the reference writer emits (serialization.rs:297-381)."""
    xml = textwrap.dedent("""\
        <?xml version="1.0" encoding="UTF-8"?>
        <graphml xmlns="http://graphml.graphdrawing.org/xmlns"
                 xmlns:xsi="http://www.w3.org/2001/XMLSchema-instance"
                 xsi:schemaLocation="http://graphml.graphdrawing.org/xmlns
                 http://graphml.graphdrawing.org/xmlns/1.0/graphml.xsd">
          <key id="d0" for="node" attr.name="value" attr.type="string"/>
          <key id="d1" for="edge" attr.name="weight" attr.type="double"/>
          <graph id="G" edgedefault="directed">
            <node id="n0">
              <data key="d0">1</data>
            </node>
            <node id="n1">
              <data key="d0">2</data>
            </node>
            <edge id="e0" source="n0" target="n1">
              <data key="d1">1.5</data>
            </edge>
          </graph>
        </graphml>
        """)
    p = tmp_path / "ref.graphml"
    p.write_text(xml)
    g = load_graphml(spark, str(p), expect_directed=True)
    assert g.directed is True
    assert g.vertices.count() == 2
    assert _edge_set(g) == {(0, 1, 1.5)}
    assert {r["value"] for r in g.vertices.collect()} == {"1", "2"}


def test_interchange_dispatch_and_cap(spark, tmp_path):
    g = make_graph(spark, EDGES, directed=True)
    pj = str(tmp_path / "g.json")
    save_json(g, pj)
    assert load_interchange(spark, pj).edges.count() == 3
    with pytest.raises(InterchangeSizeError):
        save_json(g, pj, max_rows=2)
    with pytest.raises(ValueError, match="extension"):
        load_interchange(spark, "g.bin")
