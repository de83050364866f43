"""Benchmark decontamination: cross-set n-gram overlap.

The standard pre-training hygiene step (GPT-3 appx. C; PaLM; Llama —
all published as k-token n-gram collision tests): a TRAINING document is
contaminated when it shares long token n-grams with an EVALUATION
(benchmark) document, and must be dropped or surgically cleaned before
training.  This is dedup's asymmetric cousin — operators/dedup.py bounds
train×train pairs, this bounds train×bench — and the asymmetry is the
scale story: the benchmark side is test suites (MBs), the training side
is the 100 TB crawl, so the gram inventory of the BENCH side broadcasts
and the train side is never shuffled at all — one scan, a broadcast hash
join on 32-byte md5 gram keys (the frozen convention of
operators/substrings.py::kgram_positions), one aggregation keyed by
(train_id, bench_id) whose cardinality is bounded by actual collisions.

``frac`` is the fraction of the BENCH document's distinct k-grams found
in the train doc — the quantity thresholded in published recipes (a
bench item is "leaked" when most of it appears verbatim).

Granularity: operators/sampling.py::split_contamination answers "how
leaky are my splits" (one summary row per split, any-shingle binary);
this module answers "WHICH train docs leak WHICH bench items and how
badly" — the per-pair overlap a surgical drop list needs.

DuckDB twin: oracles_text.py::contamination_sql (same tokenizer, same
md5 windows, same distinct semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphina_spark.operators.substrings import kgram_positions


def ngram_contamination(
    train: DataFrame,
    bench: DataFrame,
    k: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(train_id, bench_id, shared, bench_grams, frac): for every
    train/bench document pair sharing at least one distinct k-token
    gram — shared = # distinct grams in common, bench_grams = # distinct
    grams of the bench doc, frac = shared / bench_grams (6 dp)."""
    tg = (
        kgram_positions(train, id_col, text_col, k)
        .distinct()
        .withColumnRenamed("id", "train_id")
    )
    bg = (
        kgram_positions(bench, id_col, text_col, k)
        .distinct()
        .withColumnRenamed("id", "bench_id")
    )
    bsize = bg.groupBy("bench_id").agg(F.count("*").alias("bench_grams"))
    hits = (
        tg.join(F.broadcast(bg), "g")
        .groupBy("train_id", "bench_id")
        .agg(F.count("*").alias("shared"))
    )
    return hits.join(F.broadcast(bsize), "bench_id").select(
        "train_id",
        "bench_id",
        "shared",
        "bench_grams",
        F.round(F.col("shared") / F.col("bench_grams"), 6).alias("frac"),
    )


def contaminated_ids(
    train: DataFrame,
    bench: DataFrame,
    k: int = 8,
    min_frac: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(train_id): training documents leaking ≥ ``min_frac`` of any
    single benchmark document's distinct k-grams — the drop list."""
    c = ngram_contamination(train, bench, k, id_col, text_col)
    return c.where(F.col("frac") >= min_frac).select("train_id").distinct()
