"""Pointwise mutual information of adjacent word pairs.

The standard collocation / word-association score (Church & Hanks, 1990)
over the corpus bigram and unigram distributions:

    pmi(a, b) = ln( (n_ab / N_bi) / ((n_a / N_uni) · (n_b / N_uni)) )

with n_ab = corpus count of the adjacent bigram "a b", N_bi = total bigram
occurrences, n_x = unigram counts, N_uni = total tokens.  High-PMI pairs
are phrases/boilerplate; near-zero pairs are independent — a corpus-health
probe next to top_ngrams and doc_repetition.

Scale shape: one explode scan for bigrams + one for unigrams, each a
partial+final hash aggregation; the two corpus totals are broadcast
scalars; the unigram joins are broadcast when the vocabulary is small and
plain keyed joins otherwise (vocab-sized, never corpus-sized).  Pure
built-in expressions (frozen token convention).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pmi_bigrams(
    documents: DataFrame, min_count: int = 5, text_col: str = "text"
) -> DataFrame:
    """(a, b, n_ab, pmi): every adjacent token pair occurring at least
    ``min_count`` times, with its corpus PMI (natural log, 6-dp)."""
    from graphina_spark.functions.textstats import ngrams_col, tokens_col

    toks = tokens_col(F.col(text_col))
    big = (
        documents.select(F.explode(ngrams_col(toks, 2)).alias("g"))
        .groupBy("g")
        .agg(F.count("*").alias("n_ab"))
        .where(F.col("n_ab") >= min_count)
        .select(
            F.split(F.col("g"), " ")[0].alias("a"),
            F.split(F.col("g"), " ")[1].alias("b"),
            "n_ab",
        )
    )
    uni = (
        documents.select(F.explode(toks).alias("tk"))
        .groupBy("tk")
        .agg(F.count("*").alias("n"))
    )
    n_uni = uni.agg(F.sum("n")).first()[0]
    n_bi = (
        documents.select(F.size(ngrams_col(toks, 2)).alias("c"))
        .agg(F.sum("c"))
        .first()[0]
    )
    return (
        big.join(uni.select(F.col("tk").alias("a"), F.col("n").alias("n_a")), "a")
        .join(uni.select(F.col("tk").alias("b"), F.col("n").alias("n_b")), "b")
        .select(
            "a",
            "b",
            "n_ab",
            F.round(
                F.log(
                    (F.col("n_ab") / F.lit(float(n_bi)))
                    / (
                        (F.col("n_a") / F.lit(float(n_uni)))
                        * (F.col("n_b") / F.lit(float(n_uni)))
                    )
                ),
                6,
            ).alias("pmi"),
        )
    )
