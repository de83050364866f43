"""Text-analysis functions for training-data pipelines — all JVM-side.

Every function here is a composition of built-in ``pyspark.sql.functions``
(split/filter/transform/aggregate/md5/...), never a Python UDF: the hot path
stays inside whole-stage codegen, and each has an exact DuckDB SQL twin in
:mod:`graphina_spark.oracles_text` so the whole family sits under the
driver's correctness gate.

Cross-engine determinism rules:
- tokenization = lowercase, split on ``[^a-z0-9]+``, drop empties
- hashes = md5 hex strings (identical bytes in Spark and DuckDB); MinHash
  orders hex strings lexicographically (any total order works for min-hash),
  so no integer-conversion portability traps
- language ID = stopword-hit counts with an explicit CASE tie-break chain

The reference repo has no text layer; these operators are the training-data
extensions the north star grafts onto the link-graph engine (same spirit as
its `text`/`lang` page columns).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "was"],
    "de": ["der", "die", "das", "und", "ist", "ein", "mit", "für", "auf", "nicht"],
    "fr": ["le", "les", "des", "et", "est", "dans", "pour", "une", "sur", "pas"],
    "es": ["el", "los", "las", "y", "es", "en", "para", "una", "por", "con"],
}
LANG_ORDER = ["en", "de", "fr", "es"]  # tie-break priority
PUNCT_CLASS = "[^a-zA-Z0-9 ]"


def tokens_col(text: Column) -> Column:
    return F.filter(F.split(F.lower(text), "[^a-z0-9]+"), lambda x: x != "")


def token_count(text: Column) -> Column:
    return F.size(tokens_col(text))


def ngrams_col(toks: Column, n: int) -> Column:
    """Word n-grams (space-joined) of a token array; empty array when the
    document has fewer than n tokens."""
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(-1)))
    return F.when(
        F.size(toks) >= n,
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n))),
    ).otherwise(F.array())


def punct_count(text: Column) -> Column:
    return F.length(text) - F.length(F.regexp_replace(text, PUNCT_CLASS, ""))


def stopword_hits(text: Column, lang: str) -> Column:
    stop = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(tokens_col(text), lambda x: F.array_contains(stop, x)))


def lang_id(text: Column) -> Column:
    """Greedy stopword-count argmax with CASE-chain tie-break (en>de>fr>es);
    'und' when no stopword hits at all."""
    cnts = {lang: stopword_hits(text, lang) for lang in LANG_ORDER}
    expr = F.lit("und")
    # build the CASE chain back-to-front so earlier langs win ties
    for lang in reversed(LANG_ORDER):
        cond = cnts[lang] > 0
        for other in LANG_ORDER:
            if LANG_ORDER.index(other) < LANG_ORDER.index(lang):
                cond = cond & (cnts[lang] > cnts[other])
            elif other != lang:
                cond = cond & (cnts[lang] >= cnts[other])
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    return expr


def quality_score(text: Column) -> Column:
    """Deterministic [0,1] quality blend: length score × punctuation penalty
    × stopword-density score (formula mirrored exactly in the SQL oracle)."""
    toks = tokens_col(text)
    n_tok = F.size(toks)
    n_chars = F.length(text)
    stop_all = F.array(*[F.lit(w) for lang in LANG_ORDER for w in STOPWORDS[lang]])
    stop_any = F.size(F.filter(toks, lambda x: F.array_contains(stop_all, x)))
    len_score = F.least(F.lit(1.0), n_tok / F.lit(100.0))
    punct_pen = F.lit(1.0) - F.least(
        F.lit(1.0), F.lit(4.0) * punct_count(text) / (n_chars + F.lit(1))
    )
    stop_score = F.least(F.lit(1.0), F.lit(2.0) * stop_any / (n_tok + F.lit(1)))
    return len_score * punct_pen * (F.lit(0.2) + F.lit(0.8) * stop_score)


def fingerprint(text: Column) -> Column:
    """Order-sensitive document fingerprint: md5 of the canonical token
    stream (whitespace-rejoined) — byte-identical across engines."""
    return F.md5(F.concat_ws(" ", tokens_col(text)))


def shingles_col(text: Column, k: int = 3) -> Column:
    """Distinct word k-gram shingles (space-joined), [] when < k tokens."""
    toks = tokens_col(text)
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - k, F.lit(-1)))
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)))
    return F.array_distinct(F.when(F.size(toks) >= k, grams).otherwise(F.array()))


def minhash_signature(sh: Column, num_hashes: int = 12) -> Column:
    """MinHash over md5-hex order: sig[i] = min_{s∈shingles} md5(i:s); NULL
    slots when the shingle set is empty."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda i: F.array_min(
            F.transform(sh, lambda s: F.md5(F.concat(i.cast("string"), F.lit(":"), s)))
        ),
    )


def simhash32(text: Column) -> Column:
    """32-bit SimHash from md5-hex-digit parity per token: bit b is 1 iff
    Σ_tokens ±1 (by parity of md5 hex digit b) is positive."""
    toks = tokens_col(text)
    odd = F.lit("13579bdf")

    def bit(b: int) -> Column:
        vote = F.aggregate(
            toks,
            F.lit(0),
            lambda acc, t: acc
            + F.when(
                F.contains(odd, F.substring(F.md5(t), b + 1, 1)), F.lit(1)
            ).otherwise(F.lit(-1)),
        )
        return F.when(vote > 0, F.lit(1)).otherwise(F.lit(0)) * F.lit(2**b)

    out = F.lit(0).cast("long")
    for b in range(32):
        out = out + bit(b)
    return out


def with_text_stats(df: DataFrame, text: str = "text") -> DataFrame:
    """Attach the full stat family as columns."""
    t = F.col(text)
    return df.withColumns(
        {
            "n_tokens": token_count(t),
            "punct": punct_count(t),
            "lang_pred": lang_id(t),
            "quality": quality_score(t),
            "fingerprint": fingerprint(t),
        }
    )
