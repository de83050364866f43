"""Distributed BPE merge learning (byte-pair-encoding vocabulary trainer).

Tokenizer training is the step every LLM data pipeline runs after dedup
and quality filtering: learn the top-K BPE merges (Sennrich et al., ACL
2016) over the corpus.  The classic trainer is sequential; the
distributed shape here is the standard one (word-level):

1. distinct words + counts — tokenization is the corpus convention
   (textstats.tokens_col: lowercase, split [^a-z0-9]+), so the state
   table has |vocab| rows regardless of corpus size (the 100 TB scan
   happens exactly once, in the word count).
2. per merge round: adjacent symbol-pair counts weighted by word count
   (one groupBy shuffle over the |vocab|-row state), argmax with a
   deterministic (count desc, left asc, right asc) tie-break (one
   driver-side 1-row collect), then the merge applied to every word.

The merge application is the subtle part: BPE replaces non-overlapping
(left, right) symbol adjacencies LEFT TO RIGHT.  Both Spark and DuckDB
apply literal string ``replace`` with exactly those semantics, so the
symbol state is kept as a string — with DOUBLE-SPACE separators:

    word "aab" -> " a  a  b "        (single edge spaces, '  ' between)
    merge (a, a):  replace(" a  a ", " aa ")  ->  " aa  b "

Each match consumes only the INNER half of its two separators, leaving
the outer halves for the neighbouring tokens — which is what makes
consecutive merges ("abab" with pair (a,b)) and overlapping runs
("aaa" with pair (a,a) -> [aa, a]) come out exactly like the sequential
left-to-right scan.  A single-space representation breaks both cases
(the shared delimiter is consumed by the first match).  Symbols are
[a-z0-9]+ substrings of the word, so they never contain spaces and the
patterns are unambiguous.

Everything is built-in string/aggregate expressions (whole-stage
codegen); the only driver traffic is one 1-row argmax per round.
DuckDB twin: oracles_text.py::bpe_merges_sql (same representation, same
replace calls).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphina_spark.functions.textstats import tokens_col
from graphina_spark.plans.materialize import local_materialize as _mat


def word_symbol_state(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(cnt, sym) — one row per distinct corpus word: its count and its
    initial symbol string (characters, double-space separated)."""
    wc = (
        docs.select(F.explode(tokens_col(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )
    sym = F.concat(
        F.lit(" "), F.rtrim(F.regexp_replace(F.col("word"), "(.)", "$1  ")), F.lit(" ")
    )
    return wc.select("cnt", sym.alias("sym"))


def _pair_counts(state: DataFrame) -> DataFrame:
    """(l, r, c) adjacent-symbol-pair counts weighted by word count."""
    toks = F.split(F.trim(F.col("sym")), "  ")
    n = F.size(toks)
    z = F.arrays_zip(
        F.slice(toks, 1, n - 1).alias("l"), F.slice(toks, 2, n - 1).alias("r")
    )
    return (
        state.where(n >= 2)
        .select("cnt", F.explode(z).alias("p"))
        .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        .agg(F.sum("cnt").alias("c"))
    )


def learn_bpe_merges(
    docs: DataFrame, merges: int = 10, text_col: str = "text"
) -> DataFrame:
    """(step, l, r, merged, pair_count) — the first ``merges`` BPE merges
    learned over the corpus, in order (step 1 = most frequent pair).
    Stops early when no adjacent pair remains."""
    if merges < 1:
        raise ValueError("merges must be >= 1")
    spark = docs.sparkSession
    state = _mat(word_symbol_state(docs, text_col))
    out: list[tuple] = []
    for step in range(1, merges + 1):
        top = (
            _pair_counts(state)
            .orderBy(F.col("c").desc(), F.col("l").asc(), F.col("r").asc())
            .limit(1)
            .collect()
        )
        if not top:
            break
        l, r, c = top[0]["l"], top[0]["r"], int(top[0]["c"])
        out.append((step, l, r, l + r, c))
        state = _mat(
            state.select(
                "cnt",
                F.replace(
                    F.col("sym"), F.lit(f" {l}  {r} "), F.lit(f" {l}{r} ")
                ).alias("sym"),
            )
        )
    return spark.createDataFrame(
        out, "step int, l string, r string, merged string, pair_count bigint"
    )


def apply_bpe(
    docs: DataFrame,
    merge_table: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, tokens array<string>) — tokenize each document with a learned
    merge table: per word, apply every merge in step order (the standard
    BPE encoder).  The merge table is collected (K rows — it is a
    vocabulary artifact, not data) and unrolled into K chained replaces,
    all whole-stage codegen."""
    ms = [
        (m["l"], m["r"]) for m in merge_table.orderBy("step").collect()
    ]
    word = F.explode(tokens_col(F.col(text_col))).alias("word")
    base = docs.select(F.col(id_col).alias("id"), word)
    sym = F.concat(
        F.lit(" "), F.rtrim(F.regexp_replace(F.col("word"), "(.)", "$1  ")), F.lit(" ")
    )
    for l, r in ms:
        sym = F.replace(sym, F.lit(f" {l}  {r} "), F.lit(f" {l}{r} "))
    return (
        base.select("id", F.split(F.trim(sym), "  ").alias("word_toks"))
        .groupBy("id")
        .agg(F.flatten(F.collect_list("word_toks")).alias("tokens"))
    )
