"""End-to-end training-corpus curation pipeline — the composition gate.

Every production webtext pipeline chains the same four stages; this module
wires the engine's existing oracle-gated operators into ONE dataframe the
driver can gate end-to-end, proving the stages compose (column contracts,
verdict semantics, determinism) and not just pass in isolation:

1. **near-dup survivor selection** over the full corpus
   (operators/dedup.py::dedup_keep_best over minhash_lsh_pairs) — dedup
   runs FIRST, before any filtering, the standard order (cuts volume for
   every later stage; RefinedWeb/FineWeb run fuzzy dedup before quality
   filters are finalized),
2. **benchmark carve-out**: ``doc_id % bench_mod == 0`` reserved as the
   eval split (the contamination gate's deterministic split),
3. **quality filter** (operators/sampling.py::filter_corpus — length /
   quality-blend / language rules, per-doc verdicts),
4. **decontamination**: drop any surviving train doc leaking ≥
   ``contam_min_frac`` of some benchmark doc's distinct k-grams
   (operators/contamination.py::contaminated_ids).

Because every stage verdict is a PER-DOCUMENT function of full-corpus
computations, the composed result is order-independent to evaluate and the
DuckDB twin (oracles_text.py::curation_pipeline_sql) nests the existing
stage oracles unchanged.

Scale shape: no new kernels — the pipeline inherits each stage's shape
(LSH-banded dedup candidates, components over the tiny pair graph, one
codegen'd filter scan, one broadcast gram join) plus three id-keyed joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def curation_pipeline(
    docs: DataFrame,
    bench_mod: int = 97,
    contam_k: int = 4,
    contam_min_frac: float = 0.5,
    dedup_threshold: float = 0.2,
    min_tokens: int = 10,
    max_tokens: int | None = None,
    min_quality: float = 0.3,
    langs: list[str] | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_tokens, quality) — the final kept training corpus after
    dedup-survivor selection, bench carve-out, quality filtering, and
    benchmark decontamination (module docstring has the stage order)."""
    from graphina_spark.operators.contamination import contaminated_ids
    from graphina_spark.operators.dedup import dedup_keep_best, minhash_lsh_pairs
    from graphina_spark.operators.sampling import filter_corpus

    did = F.col(id_col).cast("long")
    survivors = (
        dedup_keep_best(
            docs,
            minhash_lsh_pairs(docs, threshold=dedup_threshold),
            id_col=id_col,
            text_col=text_col,
        )
        .where("keep")
        .select("id")
    )
    verdicts = filter_corpus(
        docs,
        id_col=id_col,
        text_col=text_col,
        min_tokens=min_tokens,
        max_tokens=max_tokens,
        min_quality=min_quality,
        langs=langs,
    ).where("keep")
    bench = docs.where(did % bench_mod == 0)
    train = docs.where(did % bench_mod != 0)
    dirty = contaminated_ids(
        train, bench, k=contam_k, min_frac=contam_min_frac,
        id_col=id_col, text_col=text_col,
    )
    return (
        verdicts.where(F.col("id") % bench_mod != 0)
        .join(survivors, "id")
        .join(dirty, verdicts["id"] == dirty["train_id"], "left_anti")
        .select(
            F.col("id").alias("doc_id"),
            "n_tokens",
            F.round("quality", 6).alias("quality"),
        )
    )


BLOCK_KIND_PRIORITY = {"host": 0, "host_suffix": 1, "path_prefix": 2}


def url_blocklist_filter(
    pages: DataFrame, blocklist: DataFrame, url_col: str = "url"
) -> DataFrame:
    """(url, blocked, reason) — UT1/production-style URL blocklist pass.

    ``blocklist`` is model-as-data (the classifier-weights posture): rows
    ``(kind, pattern)`` with kind ∈ {'host', 'host_suffix', 'path_prefix'}:

    - ``host``: exact host match;
    - ``host_suffix``: host equals the pattern or ends with '.'+pattern
      (blocks a domain and all its subdomains — the UT1 domain-list rule);
    - ``path_prefix``: pattern 'host/path-prefix' — exact host AND the path
      startswith '/path-prefix' (the UT1 urls-list rule, host-scoped so the
      match is an equi-join + a per-row startswith, never pattern×corpus).

    ``reason`` = '<kind>:<pattern>' of the highest-priority match (host >
    host_suffix > path_prefix, ties by min pattern — deterministic under
    any partitioning); NULL when unblocked.

    Scale shape: every rule family is a BROADCAST equi-join against the
    (small, ~MB) blocklist — host exact on host, suffix on the exploded
    dot-suffix chain (≤ label-count rows per url, bounded), path on the
    pattern's host component.  No nested-loop join, no regex scan of the
    corpus; one final min-struct groupBy per matched url.
    """
    host = F.try_parse_url(F.col(url_col), F.lit("HOST"))
    path = F.coalesce(F.try_parse_url(F.col(url_col), F.lit("PATH")), F.lit(""))
    u = pages.select(
        F.col(url_col).alias("url"), host.alias("h"), path.alias("p")
    ).where(F.col("h").isNotNull())

    bl_host = blocklist.where(F.col("kind") == "host").select(
        F.col("pattern").alias("h"), F.lit("host").alias("kind"), "pattern"
    )
    m_host = u.join(F.broadcast(bl_host), "h").select("url", "kind", "pattern")

    suffixes = F.expr(
        "transform(sequence(1, size(split(h, '\\\\.'))),"
        " i -> array_join(slice(split(h, '\\\\.'), i, size(split(h, '\\\\.')) - i + 1), '.'))"
    )
    bl_suf = blocklist.where(F.col("kind") == "host_suffix").select(
        F.col("pattern").alias("sfx"), F.lit("host_suffix").alias("kind"), "pattern"
    )
    m_suf = (
        u.select("url", F.explode(suffixes).alias("sfx"))
        .join(F.broadcast(bl_suf), "sfx")
        .select("url", "kind", "pattern")
    )

    bl_path = blocklist.where(F.col("kind") == "path_prefix").select(
        F.substring_index(F.col("pattern"), "/", 1).alias("h"),
        F.concat(
            F.lit("/"),
            F.expr("substring(pattern, instr(pattern, '/') + 1)"),
        ).alias("pfx"),
        F.lit("path_prefix").alias("kind"),
        "pattern",
    )
    m_path = (
        u.join(F.broadcast(bl_path), "h")
        .where(F.col("p").startswith(F.col("pfx")))
        .select("url", "kind", "pattern")
    )

    pri = F.when(F.col("kind") == "host", 0).when(
        F.col("kind") == "host_suffix", 1
    ).otherwise(2)
    best = (
        m_host.unionAll(m_suf)
        .unionAll(m_path)
        .select("url", F.struct(pri.alias("pri"), "kind", "pattern").alias("m"))
        .groupBy("url")
        .agg(F.min("m").alias("m"))
        .select(
            "url",
            F.concat(F.col("m.kind"), F.lit(":"), F.col("m.pattern")).alias("reason"),
        )
    )
    return (
        pages.select(F.col(url_col).alias("url"))
        .join(best, "url", "left")
        .select("url", F.col("reason").isNotNull().alias("blocked"), "reason")
    )


# the Gopher rule set's required-stopword list (Rae et al. 2021, §A1.1)
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, n_words, mean_word_len, symbol_ratio, bullet_frac,
    ellipsis_frac, alpha_word_frac, n_stop, pass) — the Gopher hard-filter
    rule family (Rae et al. 2021 §A1.1), the published web-corpus quality
    gate: word-count bounds [50, 100k], mean word length [3, 10], symbol
    ('#' chars + '...' runs) to word ratio < 0.1, < 90% bullet-started
    lines, < 30% ellipsis-ended lines, ≥ 80% words containing a letter,
    and ≥ 2 distinct required stopwords present.

    Pure column expressions over the frozen repo tokenizer
    (textstats.tokens_col) — zero shuffles, zero UDFs; ratios are exact
    integer divisions so the DuckDB twin is bit-identical."""
    from graphina_spark.functions.textstats import tokens_col

    text = F.col(text_col)
    t = tokens_col(text)
    n_words = F.size(t).cast("long")
    word_chars = F.aggregate(
        t, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    )
    mean_wl = F.when(n_words > 0, word_chars / n_words).otherwise(F.lit(0.0))
    hashes = F.length(text) - F.length(F.regexp_replace(text, "#", ""))
    dots = (
        F.length(text) - F.length(F.regexp_replace(text, r"\.\.\.", ""))
    ) / F.lit(3)
    # denominator floors at 1 so a pure-symbol doc (tokenizer yields zero
    # words) still reads as symbol-spam instead of a degenerate 0.0
    symbol_ratio = (hashes + dots) / F.greatest(
        n_words, F.lit(1).cast("long")
    )
    lines = F.filter(F.split(text, "\n"), lambda x: F.trim(x) != "")
    n_lines = F.size(lines)
    bullets = F.size(
        F.filter(lines, lambda x: F.ltrim(x).rlike("^[-*•]"))
    )
    ellipses = F.size(
        F.filter(lines, lambda x: F.rtrim(x).rlike("(\\.\\.\\.|…)$"))
    )
    bullet_frac = F.when(n_lines > 0, bullets / n_lines).otherwise(F.lit(0.0))
    ellipsis_frac = F.when(n_lines > 0, ellipses / n_lines).otherwise(
        F.lit(0.0)
    )
    alpha = F.size(F.filter(t, lambda x: x.rlike("[a-z]")))
    alpha_frac = F.when(n_words > 0, alpha / n_words).otherwise(F.lit(0.0))
    stops = F.array(*[F.lit(s) for s in GOPHER_STOPWORDS])
    n_stop = F.size(F.array_intersect(F.array_distinct(t), stops)).cast("long")
    ok = (
        (n_words >= 50) & (n_words <= 100_000)
        & (mean_wl >= 3.0) & (mean_wl <= 10.0)
        & (symbol_ratio < 0.1)
        & (bullet_frac < 0.9)
        & (ellipsis_frac < 0.3)
        & (alpha_frac >= 0.8)
        & (n_stop >= 2)
    )
    return df.select(
        F.col(id_col).alias("id"),
        n_words.alias("n_words"),
        F.round(mean_wl, 6).alias("mean_word_len"),
        F.round(symbol_ratio, 6).alias("symbol_ratio"),
        F.round(bullet_frac, 6).alias("bullet_frac"),
        F.round(ellipsis_frac, 6).alias("ellipsis_frac"),
        F.round(alpha_frac, 6).alias("alpha_word_frac"),
        n_stop.alias("n_stop"),
        ok.alias("pass"),
    )
