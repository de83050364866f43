"""Graph IO: edge-list compatibility + parquet graph persistence.

Reference: /root/reference/src/core/io.rs — ``read_edge_list`` (:59-122:
``#`` comments stripped, separator char, optional 3rd-token weight default
1.0, nodes deduped by attribute key) and adjacency-list IO (:221-282);
/root/reference/src/core/serialization.rs — ``SerializableGraph`` JSON/binary
round-trip (:159-320) with a strict directedness check on load (:127-143).

Here: edge lists load through ``spark.read.text`` + JVM-side split/cast
(vertex identity IS the integer attribute key, so ids are stable without an
id-mapper); graph persistence is two parquet directories + a JSON manifest
(the Iceberg-shaped analogue of SerializableGraph).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from graphina_spark.graph import LinkGraph


def read_edge_list(
    spark: SparkSession,
    path: str,
    sep: str = ",",
    directed: bool = True,
    default_weight: float = 1.0,
    comment: str = "#",
) -> LinkGraph:
    """Edge-list text file → LinkGraph (io.rs:59-122 semantics)."""
    lines = spark.read.text(path)
    toks = (
        lines.select(F.trim("value").alias("v"))
        .where((F.col("v") != "") & ~F.col("v").startswith(comment))
        .select(F.split("v", sep).alias("t"))
    )
    edges = toks.select(
        F.trim(F.get(F.col("t"), 0)).cast("long").alias("src"),
        F.trim(F.get(F.col("t"), 1)).cast("long").alias("dst"),
        F.coalesce(
            F.trim(F.get(F.col("t"), 2)).cast("double"), F.lit(default_weight)
        ).alias("weight"),
    ).where(F.col("src").isNotNull() & F.col("dst").isNotNull())
    return LinkGraph.from_edges(edges, directed=directed)


def write_edge_list(g: LinkGraph, path: str, sep: str = ",") -> None:
    g.edges.select(
        F.concat_ws(sep, F.col("src"), F.col("dst"), F.col("weight")).alias("value")
    ).write.mode("overwrite").text(path)


def read_adjacency_list(
    spark: SparkSession,
    path: str,
    sep: str = " ",
    directed: bool = True,
    default_weight: float = 1.0,
) -> LinkGraph:
    """Adjacency-list text file → LinkGraph (io.rs:221-282 semantics).

    Line format: ``<src><sep><nbr><sep><weight><sep><nbr><sep><weight>...``
    — first token is the source node, the rest are (neighbor, weight) token
    pairs; a trailing neighbor without a weight gets ``default_weight``
    (io.rs:254-266).  ``#`` starts a comment (truncated anywhere in the
    line, io.rs:240-242); a line with only a source token declares an
    isolated vertex (io.rs:249-251 adds the node before reading pairs).

    Also accepts the ``<nbr>:<weight>`` colon-pair tokens the reference's
    own ``write_adjacency_list`` emits (io.rs:319-361) — the reference's
    writer output is not parseable by its reader (write emits colon pairs,
    read expects separator pairs); supporting both makes round-trips work
    against files from either producer.

    Scale: one distributed text scan; all splitting/expansion is in-row
    column expressions (no Python UDF), edges come off an explode — no
    shuffle until the vertex distinct.
    """
    lines = spark.read.text(path)
    toks = (
        lines.select(F.trim(F.substring_index("value", "#", 1)).alias("v"))
        .where(F.col("v") != "")
        .select(F.filter(F.split("v", sep), lambda x: F.trim(x) != "").alias("t"))
        .where(F.size("t") > 0)
    )
    # rest tokens after the source; colon mode iff any token contains ':'
    rows = toks.select(
        F.trim(F.get(F.col("t"), 0)).cast("long").alias("src"),
        F.slice("t", 2, F.greatest(F.size("t") - 1, F.lit(0))).alias("rest"),
    ).where(F.col("src").isNotNull())
    pairs = rows.select(
        "src",
        F.when(
            F.exists("rest", lambda x: x.contains(":")),
            F.expr(
                "transform(rest, x -> struct(split(x, ':')[0] as n,"
                " split(x, ':')[1] as w))"
            ),
        )
        .otherwise(
            F.expr(
                "case when size(rest) = 0 then"
                " cast(array() as array<struct<n:string,w:string>>)"
                " else transform(sequence(0, size(rest) - 1, 2),"
                " i -> struct(rest[i] as n,"
                " if(i + 1 < size(rest), rest[i + 1], null) as w)) end"
            )
        )
        .alias("pairs"),
    )
    flat = pairs.select("src", F.explode_outer("pairs").alias("p")).select(
        "src",
        F.trim(F.col("p.n")).cast("long").alias("dst"),
        F.coalesce(F.trim(F.col("p.w")).cast("double"), F.lit(default_weight)).alias(
            "weight"
        ),
    )
    edges = flat.where(F.col("dst").isNotNull())
    vertices = (
        flat.select(F.col("src").alias("id"))
        .unionAll(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    return LinkGraph.from_edges(edges, directed=directed, vertices=vertices)


def write_adjacency_list(g: LinkGraph, path: str, sep: str = " ") -> None:
    """LinkGraph → adjacency-list text (io.rs:319-361 format):
    ``<src><sep><nbr1>:<w1><sep><nbr2>:<w2>...``, one line per vertex,
    isolated vertices as a bare source token.  Neighbor pairs are sorted
    by (dst, weight) so output is deterministic (the reference iterates
    insertion order; a distributed writer has none).  Integral weights are
    printed without the trailing ``.0`` to mirror Rust's ``{}`` float
    Display.  One groupBy(src) shuffle + one left join; text parts are
    written distributed (a directory, like write_edge_list)."""
    adj = g.edges.groupBy("src").agg(
        F.array_sort(F.collect_list(F.struct("dst", "weight"))).alias("ns")
    )
    lines = (
        g.vertices.select(F.col("id").alias("src"))
        .join(adj, "src", "left")
        .select(
            F.concat(
                F.col("src").cast("string"),
                F.coalesce(
                    F.aggregate(
                        "ns",
                        F.lit(""),
                        lambda acc, x: F.concat(
                            acc,
                            F.lit(sep),
                            x["dst"].cast("string"),
                            F.lit(":"),
                            F.regexp_replace(
                                x["weight"].cast("string"), r"\.0$", ""
                            ),
                        ),
                    ),
                    F.lit(""),
                ),
            ).alias("value")
        )
    )
    lines.write.mode("overwrite").text(path)


def save_graph(g: LinkGraph, path: str) -> None:
    """vertices/ + edges/ parquet + manifest.json (SerializableGraph analog)."""
    g.vertices.write.mode("overwrite").parquet(os.path.join(path, "vertices"))
    g.edges.write.mode("overwrite").parquet(os.path.join(path, "edges"))
    manifest = {
        "format": "graphina_spark.graph.v1",
        "directed": g.directed,
        "vertex_columns": g.vertices.columns,
        "edge_columns": g.edges.columns,
    }
    with open(os.path.join(path, "manifest.json"), "w") as f:
        json.dump(manifest, f)


def load_graph(
    spark: SparkSession, path: str, expect_directed: bool | None = None
) -> LinkGraph:
    """Strict directedness check like the reference's loader
    (serialization.rs:127-143): pass ``expect_directed`` to enforce."""
    with open(os.path.join(path, "manifest.json")) as f:
        manifest = json.load(f)
    if expect_directed is not None and manifest["directed"] != expect_directed:
        raise ValueError(
            f"graph at {path} is directed={manifest['directed']}, "
            f"expected directed={expect_directed}"
        )
    return LinkGraph(
        vertices=spark.read.parquet(os.path.join(path, "vertices")),
        edges=spark.read.parquet(os.path.join(path, "edges")),
        directed=manifest["directed"],
    )


def save_bucketed_edges(
    edges,
    table: str,
    path: str,
    buckets: int | None = None,
) -> str:
    """Persist an edge table hash-bucketed (and sorted) by ``src``.

    The scale storage layout for repeated graph workloads: every
    src-keyed join or aggregation against a bucketed edge table reads
    co-located buckets and skips its shuffle entirely (Spark's bucketed
    scan reports the hash partitioning to the planner), the same role
    Iceberg's bucket partition transform plays on a real lakehouse.  A
    bucketed-join plan for two reads of this table contains NO Exchange —
    pinned by tests/test_bucketed_io.py.

    ``path`` makes it an external table (no warehouse dependency); returns
    the table name for ``spark.table``."""
    spark = edges.sparkSession
    if buckets is None:
        buckets = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    (
        edges.write.format("parquet")
        .mode("overwrite")
        .option("path", path)
        .bucketBy(buckets, "src")
        .sortBy("src")
        .saveAsTable(table)
    )
    return table


def load_bucketed_edges(spark: SparkSession, table: str):
    """Read back a bucketed edge table (bucket metadata intact — reading
    the parquet directory directly would lose it)."""
    return spark.table(table)
