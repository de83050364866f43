"""BM25 lexical retrieval over the documents table.

The lexical counterpart of the ANN family (operators/ann.py): score
documents for a bag-of-words query with Okapi BM25 (Robertson et al.,
TREC-3) using Lucene's non-negative idf variant
``ln(1 + (N - df + 0.5)/(df + 0.5))`` so scores are always ≥ 0.

No reference analogue (graphina is a pure graph library); north-star
addition for the training-data pipeline: corpus-level quality dedup and
eval-retrieval both need a cheap lexical scorer next to the embedding path.

Scale shape (100 TB story):

- Document lengths (``dl``) are one linear explode + groupBy over all
  tokens; in production this is a precomputed corpus statistic — the
  function accepts a cached/persisted token frame via ``tokens=`` so
  repeated queries reuse it.
- Term frequencies are computed AFTER filtering to the query terms — the
  expensive (doc, term) aggregation only ever sees |q| terms per doc, so
  per-query cost is O(matching tokens), not O(corpus vocabulary).
- ``N``/``avgdl``/``df`` are scalar-or-tiny frames joined by broadcast;
  the only wide shuffles are the two groupBys above.
- Pure built-in column expressions; no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

BM25_K1 = 1.2
BM25_B = 0.75


def tokenize(documents: DataFrame) -> DataFrame:
    """(doc_id, term): the repo's frozen token convention
    (functions/textstats.py::tokens_col — lowercase, non-alnum delimiters,
    empty tokens dropped), exploded one row per token occurrence."""
    from graphina_spark.functions.textstats import tokens_col

    return documents.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.explode(tokens_col(F.col("text"))).alias("term"),
    )


def bm25_scores(
    documents: DataFrame,
    query_terms: list[str],
    k1: float = BM25_K1,
    b: float = BM25_B,
    tokens: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, score): BM25 score of every document matching ≥1 query term.

    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)),
    idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)) with df = number of documents
    containing t.
    """
    tok = tokens if tokens is not None else tokenize(documents)
    spark = documents.sparkSession
    dl = tok.groupBy("doc_id").agg(F.count("*").alias("dl"))
    n_docs = documents.count()
    qt = spark.createDataFrame([(t,) for t in sorted(set(query_terms))], "term string")
    tf = (
        tok.join(F.broadcast(qt), "term")
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    idf = df_.select(
        "term",
        F.log(
            F.lit(1.0)
            + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
            / (F.col("df") + F.lit(0.5))
        ).alias("idf"),
    )
    avgdl = float(dl.agg(F.avg("dl")).collect()[0][0])
    part = (
        tf.join(F.broadcast(idf), "term")
        .join(dl, "doc_id")
        .select(
            "doc_id",
            (
                F.col("idf")
                * (F.col("tf") * F.lit(k1 + 1.0))
                / (
                    F.col("tf")
                    + F.lit(k1)
                    * (
                        F.lit(1.0 - b)
                        + F.lit(b) * F.col("dl") / F.lit(avgdl)
                    )
                )
            ).alias("part"),
        )
    )
    return part.groupBy("doc_id").agg(F.sum("part").alias("score"))


def bm25_topk(
    documents: DataFrame,
    query_terms: list[str],
    k: int = 20,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """(doc_id, score, rnk): top-k by score with a deterministic tie-break
    (6-dp-rounded score desc, doc_id asc) so rank order is engine-portable."""
    from pyspark.sql import Window

    s = bm25_scores(documents, query_terms, k1=k1, b=b).select(
        "doc_id", F.round("score", 6).alias("score")
    )
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        s.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
    )


def rrf_fuse(
    rankings: list[DataFrame],
    k: int = 60,
    query_col: str = "query_id",
    doc_col: str = "neighbor_id",
    rank_col: str = "rank",
) -> DataFrame:
    """(query_id, doc_id, rrf, rank) — Reciprocal Rank Fusion (Cormack,
    Clarke & Büttcher SIGIR 2009) of N per-query rankings:
    rrf(d) = Σ_lists 1/(k + rank_list(d)), summed over the lists that
    contain d.  The standard hybrid-retrieval combiner (lexical BM25 +
    dense ANN) because it needs no score calibration — only ranks.

    Determinism (the cosine_topk convention): rrf is rounded to 6 dp
    BEFORE re-ranking — float tie-groups must be engine-identical — and
    ties break by doc id ascending.

    Scale shape: one union of the (already top-k-bounded) ranking frames,
    one map-side-combinable groupBy((query, doc)) sum, then a per-query
    window over ≤ N·topk candidate rows — the window input is bounded by
    the fused lists, never the corpus.
    """
    parts = [
        r.select(
            F.col(query_col).alias("q"),
            F.col(doc_col).alias("d"),
            (F.lit(1.0) / (F.lit(float(k)) + F.col(rank_col))).alias("part"),
        )
        for r in rankings
    ]
    allp = parts[0]
    for p in parts[1:]:
        allp = allp.unionAll(p)
    fused = (
        allp.groupBy("q", "d")
        .agg(F.round(F.sum("part"), 6).alias("rrf"))
    )
    w = Window.partitionBy("q").orderBy(F.desc("rrf"), F.asc("d"))
    return fused.withColumn("rank", F.row_number().over(w)).select(
        F.col("q").alias("query_id"),
        F.col("d").alias("doc_id"),
        "rrf",
        F.col("rank").cast("int").alias("rank"),
    )
