"""Cross-document line-level deduplication — the CCNet/RefinedWeb curation
stage that strips boilerplate lines shared across pages (nav bars, cookie
banners, footers) while keeping each document's unique prose.

The reference has no text surface; this covers the standard webtext
pipeline stage (Wenzek 2020 CCNet §3.1 dedups paragraphs corpus-wide by
hash; Penedo 2023 RefinedWeb runs the same line-level pass) over the north
star's corpus.

A "line" here is a fixed-width window of ``words_per_line`` tokens: the
test corpus carries no newlines, so the segmentation is synthesized
deterministically and identically in both engines (the planted-column
convention) — the *mechanics* (segment → hash → corpus-wide frequency →
drop → reassemble in order) are exactly the production ones, where the
splitter would be ``split(text, '\\n')``.

Scale shape at 10^12 docs:

- segmentation is a per-row JVM expression (split + slice + array_join) —
  no explode until the line table, which is corpus-linear;
- the frequency pass is ONE hash-keyed aggregation (``count(distinct
  doc_id)`` by line hash) — hot boilerplate lines are *counted*, never
  pair-joined, so a banner appearing on 10^9 pages costs one combiner
  cell per partition, not a self-join blowup;
- the verdict join is hash-keyed (line hash) and AQE-skew-splittable;
  reassembly is one doc-keyed aggregation bounded by document length.

DuckDB twin: oracles_text.py::line_dedup_sql.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WORDS_PER_LINE = 10


def doc_lines(
    docs: DataFrame, words_per_line: int = WORDS_PER_LINE
) -> DataFrame:
    """(doc_id, line_no, line): fixed-width token windows in order."""
    arr = F.split(F.col("text"), " ")
    n_lines = F.ceil(F.size(arr) / F.lit(float(words_per_line))).cast("int")
    lines = F.transform(
        F.sequence(F.lit(0), n_lines - 1),
        lambda i: F.array_join(
            F.slice(arr, i * words_per_line + 1, words_per_line), " "
        ),
    )
    return docs.select(
        "doc_id", F.posexplode(lines).alias("line_no", "line")
    )


def line_dedup(
    docs: DataFrame,
    words_per_line: int = WORDS_PER_LINE,
    max_doc_freq: int = 1,
) -> DataFrame:
    """(doc_id, n_lines, n_kept, clean_md5): drop every line whose content
    occurs in more than ``max_doc_freq`` distinct documents (everywhere —
    boilerplate has no canonical owner), reassemble survivors in original
    order, pin the result by md5.
    """
    lines = doc_lines(docs, words_per_line)
    freq = lines.groupBy(F.md5("line").alias("h")).agg(
        F.countDistinct("doc_id").alias("ndocs")
    )
    judged = lines.withColumn("h", F.md5("line")).join(freq, "h").select(
        "doc_id",
        "line_no",
        "line",
        (F.col("ndocs") <= max_doc_freq).alias("keep"),
    )
    kept_struct = F.when(
        F.col("keep"), F.struct("line_no", "line")
    )  # NULL rows vanish from collect_list
    return judged.groupBy("doc_id").agg(
        F.count("*").cast("int").alias("n_lines"),
        F.sum(F.col("keep").cast("int")).cast("int").alias("n_kept"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(kept_struct)),
                    lambda s: s.line,
                ),
                "\n",
            ).cast("binary")
        ).alias("clean_md5"),
    )
