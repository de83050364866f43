"""TextRank keyword salience (Mihalcea & Tarau, EMNLP 2004).

The canonical text→graph bridge: tokens become vertices, co-occurrence
within a window becomes (weighted, undirected) edges, and PageRank over
that graph scores term salience — corpus-level keyword extraction with no
training.  This operator builds the term graph as a first-class LinkGraph
and runs the repo's GATED PageRank kernel on it unchanged, so the whole
audited superstep machinery (dangling mass, salted shards if wanted,
materialization schedule) applies to a graph derived from text rather
than hyperlinks.

Determinism / engine parity: term vertex ids are the portable md5-prefix
integer of the term (the repo's standard conv(md5(...)[:8], 16, 10) — the
DuckDB twin computes identical ids, so identical collisions, so identical
graphs); the filtered token sequence is re-indexed per document before
windowing (the paper filters first, then windows).

Scale shape: one tokenize + filter projection, one per-doc ordered window
to re-index positions (doc-bounded, the packing/cdc posture), a
self-join-free adjacent-pair derivation (positions p and p+1 join on one
key), one canonical groupBy for weights, then the O(iters)-shuffle
PageRank kernel.  Nothing is vocabulary-quadratic; a corpus-hot bigram is
one weighted edge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from graphina_spark.functions.textstats import tokens_col
from graphina_spark.graph import LinkGraph

MIN_TOKEN_LEN = 3


def term_id(col):
    """Portable integer vertex id for a term (md5-prefix convention)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def term_cooccurrence_graph(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> tuple[LinkGraph, DataFrame]:
    """(graph, term_map) — adjacent-pair (window=2) co-occurrence graph over
    the length-filtered token stream; edge weight = corpus pair count,
    symmetrized for the directed PageRank kernel (undirected semantics).
    ``term_map`` = (id, term)."""
    toks = df.select(
        F.col(id_col).alias("doc"), F.posexplode(tokens_col(F.col(text_col)))
        .alias("pos", "term"),
    ).where(F.length("term") >= MIN_TOKEN_LEN)
    w = Window.partitionBy("doc").orderBy("pos")
    seq = toks.withColumn("i", F.row_number().over(w))
    a = seq.select("doc", "i", F.col("term").alias("ta"))
    b = seq.select("doc", (F.col("i") - 1).alias("i"), F.col("term").alias("tb"))
    pairs = (
        a.join(b, ["doc", "i"])
        .where(F.col("ta") != F.col("tb"))
        .select(
            F.least("ta", "tb").alias("ta"), F.greatest("ta", "tb").alias("tb")
        )
        .groupBy("ta", "tb")
        .agg(F.count("*").cast("double").alias("weight"))
    )
    terms = (
        seq.select("term").distinct().select(term_id(F.col("term")).alias("id"),
                                             "term")
    )
    e1 = pairs.select(
        term_id(F.col("ta")).alias("src"), term_id(F.col("tb")).alias("dst"),
        "weight",
    )
    edges = e1.unionAll(
        e1.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
    )
    # dedup by the md5-prefix id, not the term string: on an id collision
    # the vertex frame would otherwise carry duplicate ids, skewing the 1/n
    # initialization vs the oracle's SELECT DISTINCT id vertex set
    g = LinkGraph.from_edges(
        edges, directed=True, vertices=terms.select("id").distinct()
    )
    return g, terms


def textrank_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    iters: int = 5,
    damping: float = 0.85,
) -> DataFrame:
    """(term, score) — PageRank salience of every term in the corpus
    co-occurrence graph (6-dp rounded; the gated kernel with fixed
    iterations so the DuckDB twin unrolls the identical trajectory)."""
    from graphina_spark.operators.pagerank import pagerank

    g, terms = term_cooccurrence_graph(df, id_col, text_col)
    pr = pagerank(g, damping=damping, fixed_iters=iters, tol=None)
    return (
        pr.join(terms, "id")
        .select("term", F.round("rank", 6).alias("score"))
    )
