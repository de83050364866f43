"""Bigram language-model quality scores — the CCNet-style perplexity filter.

CCNet (Wenzek et al., LREC 2020) ranks Common-Crawl documents by the
perplexity of a KenLM 5-gram model and keeps the low-perplexity head; the
same signal (cross-entropy of the doc under a corpus n-gram LM) is the
standard "does this read like language or like a tag-soup dump" score in
every web-scale training pipeline.  KenLM itself is a memory-resident
sequential trie — a non-starter at 100 TB — but the *model* is just counts,
and counts are what Spark aggregates best.  This is the Spark-shaped
equivalent, frozen at bigram order with add-k smoothing so a SQL engine can
twin it exactly:

- train: corpus bigram counts c(w1,w2) and *prefix* unigram counts c(w1)
  (count of w1 occurring as a bigram left-hand side), plus vocabulary size
  V = distinct tokens corpus-wide;
- smoothed model: p(w2|w1) = (c(w1,w2) + k) / (c(w1) + k·V), k = 0.5;
- score: per document, the mean over its bigram positions of
  -log2 p(w2|w1) — cross-entropy in bits/bigram (docs with < 2 tokens
  score 0.0 with n_bigrams = 0).

Scale shape: the position table has exactly corpus-token-count rows; it is
pre-aggregated to (doc, w1, w2, n) *before* the model join, so the join
probes once per distinct doc-bigram, not once per token.  Model training is
two ``groupBy`` counts with map-side partial aggregation (the (w1, w2) key
for bigrams, w1 for prefixes); V is a 1-row broadcast.  The model join is a
keyed shuffle on (w1, w2) — hot bigrams ("of the") are one skewed hash cell
each, handled by AQE skew splitting, never a fan-out.  Nothing driver-side,
no self-join, no quadratic candidate set.

Self-scoring caveat (documented contract): the model is trained on the same
frame it scores — exactly CCNet's setup when the reference corpus is the
crawl itself.  Pass a separate ``train`` frame to score against an external
reference corpus.

Extension beyond the reference (habedi/graphina has no text pipeline);
tokenization is the frozen convention of functions/textstats.py:36.
DuckDB twin: oracles_text.py::lm_quality_sql.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphina_spark.functions.textstats import tokens_col

ROUND = 6
DEFAULT_K = 0.5


def bigram_positions(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, w1, w2) — one row per adjacent token pair (bigram position)."""
    toks = df.select(F.col(id_col).alias("id"), tokens_col(F.col(text_col)).alias("t"))
    pairs = toks.select(
        "id",
        F.when(
            F.size("t") >= 2,
            F.expr("transform(sequence(1, size(t) - 1), i -> struct(t[i-1] AS w1, t[i] AS w2))"),
        )
        .otherwise(F.expr("CAST(array() AS array<struct<w1:string,w2:string>>)"))
        .alias("ps"),
    )
    return pairs.select("id", F.explode("ps").alias("p")).select(
        "id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")
    )


def lm_quality(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: float = DEFAULT_K,
    train: DataFrame | None = None,
) -> DataFrame:
    """(id, n_bigrams, xent_bits) per document.

    ``xent_bits`` = mean -log2 p(w2|w1) over the doc's bigram positions
    under the add-k bigram model trained on ``train`` (default: ``df``
    itself — the CCNet self-scoring setup).  Lower = more predictable =
    more natural corpus text; 0.0 (with n_bigrams = 0) for docs shorter
    than 2 tokens.
    """
    pos = bigram_positions(df, id_col, text_col)
    tpos = pos if train is None else bigram_positions(train, id_col, text_col)

    big = tpos.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    uni = tpos.groupBy("w1").agg(F.count("*").alias("c1"))
    tr = df if train is None else train
    vocab = (
        tr.select(F.explode(tokens_col(F.col(text_col))).alias("w"))
        .agg(F.countDistinct("w").alias("v"))
    )

    # pre-aggregate doc bigram multiplicities so the model join is per
    # distinct (doc, bigram), then join counts on the bigram key
    dbg = pos.groupBy("id", "w1", "w2").agg(F.count("*").alias("n"))
    scored = (
        dbg.join(big, ["w1", "w2"], "left")
        .join(uni, "w1", "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            "id",
            "n",
            (
                F.col("n")
                * -F.log2(
                    (F.coalesce("c12", F.lit(0)) + F.lit(k))
                    / (F.coalesce("c1", F.lit(0)) + F.lit(k) * F.col("v"))
                )
            ).alias("bits"),
        )
    )
    st = scored.groupBy("id").agg(
        F.sum("n").alias("n_bigrams"), F.sum("bits").alias("bits")
    )
    ids = df.select(F.col(id_col).alias("id")).distinct()
    return ids.join(st, "id", "left").select(
        "id",
        F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
        F.round(
            F.when(
                F.col("n_bigrams").isNotNull() & (F.col("n_bigrams") > 0),
                F.col("bits") / F.col("n_bigrams"),
            ).otherwise(F.lit(0.0)),
            ROUND,
        ).alias("xent_bits"),
    )
