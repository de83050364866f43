"""Reference-format graph interchange: JSON + GraphML read/write.

Reference: /root/reference/src/core/serialization.rs —
``SerializableGraph { directed, nodes: Vec<A>, edges: Vec<(usize, usize, W)> }``
(:27-35), JSON save/load (:159-200), strict directedness validation on load
(:127-143, :193-200), and the GraphML writer (:297-381: keys ``d0`` = node
``value``/string, ``d1`` = edge ``weight``/double, nodes ``n{index}``, edges
``e{i}`` with ``edgedefault`` carrying directedness).

Scale posture: JSON/GraphML are *interchange* formats (Gephi / yEd /
Cytoscape scale) — a single XML or JSON document has no parallel substructure,
so the writer materializes on the driver by design and refuses above
``max_rows``.  At-scale persistence is ``save_graph``/``load_graph`` in
``sources/io.py`` (parquet + manifest).  The readers parse the single file on
the driver and hand the result straight to ``spark.createDataFrame`` so every
downstream operator is distributed.

The binary (bincode) format is NOT implemented: bincode is a Rust-internal
wire encoding with no published cross-language spec; the parquet manifest is
this engine's compact/fast analogue (documented deviation, COVERAGE.md).
"""

from __future__ import annotations

import json
import os
import xml.etree.ElementTree as ET
from xml.sax.saxutils import escape

from pyspark.sql import SparkSession

from graphina_spark.graph import LinkGraph

#: Refuse driver-side materialization above this many vertices+edges.
MAX_INTERCHANGE_ROWS = 5_000_000

_GRAPHML_NS = "http://graphml.graphdrawing.org/xmlns"


class InterchangeSizeError(RuntimeError):
    """Graph too large for a single-document interchange format."""


def _collect_indexed(g: LinkGraph, attr_col: str | None, max_rows: int):
    """Driver-side (attrs, edge-index-triples) in the reference's positional
    layout: nodes ordered by vertex id, edges referencing node positions."""
    n_v = g.vertices.count()
    n_e = g.edges.count()
    if n_v + n_e > max_rows:
        raise InterchangeSizeError(
            f"graph has {n_v} vertices + {n_e} edges > max_rows={max_rows}; "
            "single-document JSON/GraphML is an interchange format — use "
            "sources.io.save_graph (parquet) at scale"
        )
    cols = ["id"] + ([attr_col] if attr_col else [])
    vrows = sorted(g.vertices.select(*cols).collect(), key=lambda r: r["id"])
    idx = {r["id"]: i for i, r in enumerate(vrows)}
    attrs = [r[attr_col] if attr_col else r["id"] for r in vrows]
    erows = g.edges.select("src", "dst", "weight").collect()
    triples = [
        (idx[r["src"]], idx[r["dst"]], r["weight"])
        for r in sorted(erows, key=lambda r: (r["src"], r["dst"], r["weight"]))
    ]
    return attrs, triples


def _check_directed(directed: bool, expect: bool | None, what: str) -> None:
    """serialization.rs:127-143 — loaders reject a directedness mismatch."""
    if expect is not None and directed != expect:
        raise ValueError(
            f"{what} is directed={directed}, expected directed={expect}"
        )


# --------------------------------------------------------------------- JSON
def save_json(
    g: LinkGraph,
    path: str,
    attr_col: str | None = None,
    max_rows: int = MAX_INTERCHANGE_ROWS,
) -> None:
    """Write the reference's SerializableGraph JSON document
    (serialization.rs:159-166): ``{"directed", "nodes", "edges"}`` with
    positional edge triples.  ``attr_col`` selects the vertex column written
    as the node attribute (default: the vertex id itself)."""
    attrs, triples = _collect_indexed(g, attr_col, max_rows)
    doc = {
        "directed": g.directed,
        "nodes": attrs,
        "edges": [list(t) for t in triples],
    }
    with open(path, "w") as f:
        json.dump(doc, f, indent=2)


def load_json(
    spark: SparkSession, path: str, expect_directed: bool | None = None
) -> LinkGraph:
    """Read a SerializableGraph JSON document (reference-produced files load
    as-is).  Node position becomes the vertex id; the attribute lands in a
    ``value`` column.  ``expect_directed`` enforces the strict check
    (serialization.rs load_json_strict, :193-200)."""
    with open(path) as f:
        doc = json.load(f)
    _check_directed(bool(doc["directed"]), expect_directed, f"JSON graph {path}")
    verts = spark.createDataFrame(
        [(i, str(a)) for i, a in enumerate(doc["nodes"])], "id long, value string"
    )
    edges = spark.createDataFrame(
        [(int(s), int(t), float(w)) for s, t, w in doc["edges"]],
        "src long, dst long, weight double",
    )
    return LinkGraph(vertices=verts, edges=edges, directed=bool(doc["directed"]))


# ------------------------------------------------------------------ GraphML
def save_graphml(
    g: LinkGraph,
    path: str,
    attr_col: str | None = None,
    max_rows: int = MAX_INTERCHANGE_ROWS,
) -> None:
    """Write the reference's GraphML layout (serialization.rs:297-381):
    ``d0`` node value, ``d1`` edge weight, ``n{i}``/``e{j}`` ids,
    ``edgedefault`` = directed|undirected.  Values are XML-escaped (the
    reference Display-prints raw — identical output for the numeric attrs it
    ships, safe for arbitrary strings here)."""
    attrs, triples = _collect_indexed(g, attr_col, max_rows)
    kind = "directed" if g.directed else "undirected"
    with open(path, "w") as f:
        f.write('<?xml version="1.0" encoding="UTF-8"?>\n')
        f.write(f'<graphml xmlns="{_GRAPHML_NS}"\n')
        f.write('         xmlns:xsi="http://www.w3.org/2001/XMLSchema-instance"\n')
        f.write(f'         xsi:schemaLocation="{_GRAPHML_NS}\n')
        f.write(f'         {_GRAPHML_NS}/1.0/graphml.xsd">\n')
        f.write(
            '  <key id="d0" for="node" attr.name="value" attr.type="string"/>\n'
        )
        f.write(
            '  <key id="d1" for="edge" attr.name="weight" attr.type="double"/>\n'
        )
        f.write(f'  <graph id="G" edgedefault="{kind}">\n')
        for i, a in enumerate(attrs):
            f.write(f'    <node id="n{i}">\n')
            f.write(f'      <data key="d0">{escape(str(a))}</data>\n')
            f.write("    </node>\n")
        for j, (s, t, w) in enumerate(triples):
            f.write(f'    <edge id="e{j}" source="n{s}" target="n{t}">\n')
            f.write(f'      <data key="d1">{w}</data>\n')
            f.write("    </edge>\n")
        f.write("  </graph>\n")
        f.write("</graphml>\n")


def load_graphml(
    spark: SparkSession, path: str, expect_directed: bool | None = None
) -> LinkGraph:
    """Read GraphML (namespaced or bare) into a LinkGraph.  Node ids of the
    form ``n{i}`` map to vertex id ``i`` (the reference's own layout); other
    id strings get dense ids by document order.  Directedness comes from
    ``edgedefault`` and is strict-checked on request."""
    tree = ET.parse(path)
    root = tree.getroot()

    def _findall(el, tag):
        return el.findall(f"{{{_GRAPHML_NS}}}{tag}") or el.findall(tag)

    graphs = _findall(root, "graph")
    if not graphs:
        raise ValueError(f"{path}: no <graph> element")
    gel = graphs[0]
    directed = gel.get("edgedefault", "directed") == "directed"
    _check_directed(directed, expect_directed, f"GraphML graph {path}")

    # key id → attr.name so files with reordered/renamed key ids still load
    keymap = {
        k.get("id"): k.get("attr.name") for k in _findall(root, "key")
    }

    def _data(el, attr_name, default=None):
        for d in _findall(el, "data"):
            if keymap.get(d.get("key"), d.get("key")) == attr_name:
                return d.text
        return default

    ids: dict[str, int] = {}
    vrows = []
    for el in _findall(gel, "node"):
        raw = el.get("id")
        if raw.startswith("n") and raw[1:].isdigit():
            i = int(raw[1:])
        else:
            i = len(ids)
        ids[raw] = i
        vrows.append((i, str(_data(el, "value", raw))))
    erows = []
    for el in _findall(gel, "edge"):
        s, t = ids[el.get("source")], ids[el.get("target")]
        w = float(_data(el, "weight", 1.0))
        erows.append((s, t, w))
    verts = spark.createDataFrame(vrows, "id long, value string")
    edges = spark.createDataFrame(erows, "src long, dst long, weight double")
    return LinkGraph(vertices=verts, edges=edges, directed=directed)


# ---------------------------------------------------------------- discovery
def load_interchange(
    spark: SparkSession, path: str, expect_directed: bool | None = None
) -> LinkGraph:
    """Extension-dispatched loader (.json / .graphml / .xml)."""
    ext = os.path.splitext(path)[1].lower()
    if ext == ".json":
        return load_json(spark, path, expect_directed)
    if ext in (".graphml", ".xml"):
        return load_graphml(spark, path, expect_directed)
    raise ValueError(f"unknown interchange extension: {path}")
