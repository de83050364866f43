"""Exact-substring duplication stats — the "dedup at the span level" signal.

Lee et al., *Deduplicating Training Data Makes Language Models Better*
(ACL 2022) deduplicate at the substring level: any span of >= k tokens that
occurs more than once in the corpus is a duplicate.  The published tool
builds a suffix array — inherently sequential and memory-resident, a
non-starter at 100 TB.  The Spark-shaped equivalent is the rolling k-gram
inventory:

- every document emits one row per token position: the k-token window
  starting there, keyed by ``md5`` of the joined window (fixed-width key so
  the shuffle moves 32-byte digests, not arbitrary-length text);
- a window is *duplicated* iff its total occurrence count across the corpus
  is >= 2 (two docs, or twice within one doc — same as the suffix-array
  criterion);
- per document we report how many of its k-gram positions are duplicated and
  the duplicated fraction — the score a training pipeline thresholds on (or
  uses to route docs to span-level surgery).

Scale shape: the position table has exactly corpus-token-count rows (minus
k-1 per doc); the whole operator is one ``groupBy(gram)`` count plus one
join back on the same key — two shuffles on a fixed-width key, map-side
partial aggregation on both, no self-join and no quadratic candidate set
(contrast operators/dedup.py's pair generators, which bound PAIRS; this op
never forms pairs at all).  A pathological hot gram costs one skewed
reduce cell, not M^2 rows — AQE skew splitting handles it.

This is an extension beyond the reference (habedi/graphina has no text
pipeline); tokenization is the frozen convention of
functions/textstats.py:36 and the DuckDB twin is
oracles_text.py::substring_dup_sql.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from graphina_spark.functions.textstats import tokens_col

DEFAULT_K = 8


def kgram_positions(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = DEFAULT_K
) -> DataFrame:
    """(id, g) — one row per token position; ``g`` = md5 of the k-token
    window starting there.  Documents shorter than k tokens emit no rows."""
    toks = df.select(F.col(id_col).alias("id"), tokens_col(F.col(text_col)).alias("t"))
    grams = toks.select(
        "id",
        F.when(
            F.size("t") >= k,
            F.expr(
                f"transform(sequence(1, size(t) - {k} + 1),"
                f" i -> md5(array_join(slice(t, i, {k}), ' ')))"
            ),
        )
        .otherwise(F.expr("CAST(array() AS array<string>)"))
        .alias("gs"),
    )
    return grams.select("id", F.explode("gs").alias("g"))


def duplicated_kgram_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = DEFAULT_K
) -> DataFrame:
    """(id, n_grams, dup_grams, dup_frac) per document.

    ``dup_grams`` counts positions whose k-gram occurs >= 2 times in the
    whole corpus (including repeats within the same document); ``dup_frac``
    = dup_grams / n_grams (0.0 for docs with fewer than k tokens).
    """
    pos = kgram_positions(df, id_col, text_col, k)
    # corpus-wide occurrence count per gram; duplicated = count >= 2.
    # join back on the same key the count was grouped on — the second
    # shuffle reuses the first's hash partitioning under AQE.
    counts = pos.groupBy("g").agg(F.count("*").alias("c"))
    flagged = pos.join(counts, "g").select(
        "id", (F.col("c") >= 2).cast("long").alias("isdup")
    )
    stats = flagged.groupBy("id").agg(
        F.count("*").alias("n_grams"), F.sum("isdup").alias("dup_grams")
    )
    ids = df.select(F.col(id_col).alias("id")).distinct()
    return ids.join(stats, "id", "left").select(
        "id",
        F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
        F.coalesce("dup_grams", F.lit(0)).alias("dup_grams"),
        F.round(
            F.when(
                F.col("n_grams").isNotNull() & (F.col("n_grams") > 0),
                F.col("dup_grams") / F.col("n_grams"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("dup_frac"),
    )


def chunk_documents(
    df: DataFrame,
    size: int = 32,
    stride: int = 24,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, chunk_idx, start_tok, n_tokens, chunk_hash) — fixed-token-window
    chunking with overlap, the RAG/embedding-pipeline prep step (split every
    document into ``size``-token windows advancing by ``stride``; the final
    short window is kept iff it adds tokens beyond the previous chunk).

    Deterministic layout: chunk boundaries are pure token arithmetic, so the
    chunk table is reproducible across runs/engines and re-chunking after a
    recrawl only touches changed documents.  ``chunk_hash`` = md5 of the
    space-joined window (the 32-byte key downstream dedup/embedding joins
    use instead of shipping text).  Scale shape: one projection with an
    in-row ``transform(sequence(...))`` — zero shuffles, embarrassingly
    parallel, output rows ≈ corpus_tokens / stride.  DuckDB twin:
    oracles_text.py::chunk_docs_sql.
    """
    if size < 1 or stride < 1 or stride > size:
        raise ValueError("need 1 <= stride <= size")
    toks = df.select(F.col(id_col).alias("id"), tokens_col(F.col(text_col)).alias("t"))
    # window starts: 1, 1+stride, ... while start <= n (short tail kept when
    # it starts within the tokens); suppress windows fully contained in the
    # previous one (start + size - 1 <= prev end happens only when stride=0,
    # excluded) — so starts are simply every stride-th position
    chunks = toks.where(F.size("t") > 0).select(
        "id",
        F.expr(
            f"transform(sequence(1, size(t), {stride}),"
            f" (s, i) -> struct(i AS chunk_idx, s AS start_tok,"
            f" least({size}, size(t) - s + 1) AS n_tokens,"
            f" md5(array_join(slice(t, s, {size}), ' ')) AS chunk_hash))"
        ).alias("cs"),
    )
    return chunks.select("id", F.explode("cs").alias("c")).select(
        "id",
        F.col("c.chunk_idx").cast("int").alias("chunk_idx"),
        F.col("c.start_tok").cast("int").alias("start_tok"),
        F.col("c.n_tokens").cast("int").alias("n_tokens"),
        F.col("c.chunk_hash").alias("chunk_hash"),
    )


def remove_duplicate_spans(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = DEFAULT_K
) -> DataFrame:
    """(id, n_tokens, n_kept, clean_md5) — span-level dedup SURGERY, the
    second half of the Lee et al. ACL 2022 criterion: every token covered by
    ANY corpus-duplicated k-token window (count >= 2 across the corpus,
    including twice within one document) is dropped, and the surviving
    tokens reassemble in order.  Overlapping duplicated windows merge into
    maximal removed spans automatically (covered-position union).  The
    output pins md5(space-joined kept tokens) — the repo's scrubbed-text
    convention (linededup.py, pii.py) so the gate carries 32-byte digests,
    never document bodies.

    Scale shape: gram table = one row per token position (fixed-width md5
    keys); ONE groupBy(gram) count + ONE semi-join back = two shuffles on
    32-byte keys, map-side combined, no pair set.  Coverage explodes each
    duplicated position into its k covered token indices — O(dup_positions
    × k) rows, bounded by k × corpus positions, distinct()-folded — then
    one anti-join and one per-doc ordered reassembly (doc-bounded lists,
    the chunk_documents posture).  A boilerplate gram repeated 10^9 times
    is one skewed reduce cell (AQE), never a candidate pair set.
    """
    toks = df.select(
        F.col(id_col).alias("id"), tokens_col(F.col(text_col)).alias("t")
    )
    grams = toks.select(
        "id",
        F.explode(
            F.when(
                F.size("t") >= k,
                F.expr(
                    f"transform(sequence(1, size(t) - {k} + 1),"
                    f" i -> struct(i AS pos, md5(array_join(slice(t, i, {k}), ' ')) AS g))"
                ),
            ).otherwise(F.expr("CAST(array() AS array<struct<pos:int,g:string>>)"))
        ).alias("pg"),
    ).select("id", F.col("pg.pos").alias("pos"), F.col("pg.g").alias("g"))
    dup_grams = grams.groupBy("g").agg(F.count("*").alias("c")).where(F.col("c") >= 2)
    dup_pos = grams.join(dup_grams.select("g"), "g", "left_semi")
    covered = dup_pos.select(
        "id", F.explode(F.expr(f"sequence(pos, pos + {k} - 1)")).alias("tpos")
    ).distinct()
    tpos = toks.select(
        "id", F.posexplode("t").alias("i", "tok")
    ).select("id", (F.col("i") + 1).alias("tpos"), "tok")
    kept = tpos.join(covered, ["id", "tpos"], "left_anti")
    kept_agg = kept.groupBy("id").agg(
        F.count("*").alias("n_kept"),
        F.md5(
            F.array_join(
                F.expr("transform(array_sort(collect_list(struct(tpos, tok))), s -> s.tok)"),
                " ",
            )
        ).alias("clean_md5"),
    )
    empty_md5 = "d41d8cd98f00b204e9800998ecf8427e"  # md5('')
    return (
        toks.select("id", F.size("t").alias("n_tokens"))
        .join(kept_agg, "id", "left")
        .select(
            "id",
            F.col("n_tokens").cast("int").alias("n_tokens"),
            F.coalesce("n_kept", F.lit(0)).cast("int").alias("n_kept"),
            F.coalesce("clean_md5", F.lit(empty_md5)).alias("clean_md5"),
        )
    )


CDC_K = 2          # tokens per boundary-test window
CDC_DIV = 8        # boundary iff hash % CDC_DIV == 0 -> E[chunk] ~ 8 tokens


def cdc_chunks(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = CDC_K,
    div: int = CDC_DIV,
    salt: str = "cdc",
) -> DataFrame:
    """(id, chunk_id, n_tokens, chunk_md5) — CONTENT-DEFINED chunking
    (Muthitacharoen et al. LBFS SOSP 2001 / FastCDC family, token
    granularity): a new chunk starts wherever the rolling window hash
    satisfies ``hash % div == 0``, so boundaries are a function of LOCAL
    content only.  Insert or delete text anywhere and every chunk beyond
    the next surviving boundary keeps its exact hash — the property that
    makes cross-snapshot storage/transfer dedup work, and which the
    fixed-window chunker (:func:`chunk_documents`) structurally lacks
    (pinned by a shift-resynchronization pytest).

    Determinism: the boundary hash is the repo's portable md5 integer over
    the k-token window (same digest arithmetic as the k-gram inventory), so
    chunk ids and hashes are identical across runs, partitionings, and
    engines (DuckDB twin: oracles_text.py::cdc_chunks_sql).

    Scale shape: per-position rows with a precomputed boundary flag (a
    projection off the token array — no shuffle), ONE per-doc ordered
    running-sum window (doc-bounded, the packing/quantiles posture), one
    (id, chunk) reassembly groupBy.  Chunk size is data-dependent with
    mean ≈ div tokens; a pathological boundary-free document yields one
    doc-sized chunk — bounded by the document, never the corpus.
    """
    toks = df.select(
        F.col(id_col).alias("id"), tokens_col(F.col(text_col)).alias("t")
    ).where(F.size("t") > 0)
    # struct rows (pos 1-based, tok, boundary flag); a boundary can only
    # fire while a full k-window exists (positions 2 .. n-k+1 — position 1
    # always starts chunk 0, the LBFS convention)
    hexint = (
        "CAST(conv(substring(md5(concat('" + salt + ":',"
        " array_join(slice(t, i, " + str(k) + "), ' '))), 1, 8), 16, 10) AS BIGINT)"
    )
    rows = toks.select(
        "id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(t)), i -> struct("
                "i AS pos, t[i-1] AS tok,"
                f" CASE WHEN i >= 2 AND i <= size(t) - {k} + 1"
                f" AND {hexint} % {div} = 0 THEN 1 ELSE 0 END AS bnd))"
            )
        ).alias("r"),
    ).select("id", F.col("r.pos").alias("pos"), F.col("r.tok").alias("tok"),
             F.col("r.bnd").alias("bnd"))
    w = (
        Window.partitionBy("id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    chunked = rows.withColumn("chunk_id", F.sum("bnd").over(w))
    return (
        chunked.groupBy("id", "chunk_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.md5(
                F.array_join(
                    F.expr(
                        "transform(array_sort(collect_list(struct(pos, tok))),"
                        " s -> s.tok)"
                    ),
                    " ",
                )
            ).alias("chunk_md5"),
        )
        .select(
            "id",
            F.col("chunk_id").cast("int").alias("chunk_id"),
            F.col("n_tokens").cast("int").alias("n_tokens"),
            "chunk_md5",
        )
    )
