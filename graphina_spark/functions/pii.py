"""PII detection and redaction over document text — pure column
expressions, whole-stage codegen end to end.

The reference has no text-pipeline surface (it is a graph library); this
module covers the standard training-data curation stage the north star's
webtext corpus needs before anything is trained on it: find and mask
emails / IPv4 addresses / phone numbers (cf. the C4 / Dolma / FineWeb
pipelines, which all run exactly this regex pass corpus-wide).

Design constraints at 10^12 documents:

- **One projection, zero shuffles.** Counting and replacing are
  per-row column expressions (`regexp_count` / chained
  `regexp_replace`), so the whole stage fuses into the parquet scan —
  no Python in the loop, no exchange anywhere.
- **Engine-portable regexes.** The patterns avoid lookaround and
  backreferences, so Java's regex (Spark) and RE2 (DuckDB) match the
  identical spans; the gate pins the scrubbed text by md5, making any
  divergence in match semantics a hash mismatch rather than a silent
  drift.
- **Fixed replacement order** (email → IPv4 → phone): replacement
  tokens contain no digits or ``@``, so later passes cannot re-match
  earlier redactions — the composition is confluent.

The test corpus contains no PII, so the gate's query deterministically
*plants* contacts derived from ``doc_id`` (the synthetic-column
convention used by crawl_schedule's age): parity then exercises the full
count + redact mechanics on text where the expected answer is known.

DuckDB twin: oracles_text.py::pii_scrub_sql.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: engine-portable patterns (no lookaround/backrefs — Java regex and RE2
#: agree on every span these can produce)
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\+\d{1,2}-\d{3}-\d{4}"

EMAIL_TOKEN = "<EMAIL>"
IPV4_TOKEN = "<IP>"
PHONE_TOKEN = "<PHONE>"


def plant_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Append deterministic doc_id-derived contacts to every document.

    ``... reach user<id>@example.com or 10.a.b.c or call +1-555-nnnn now``
    with a second email for every third document — so redaction counts are
    not constant across rows.  Test/gate scaffolding only; production text
    carries its own PII.
    """
    i = F.col("doc_id")
    planted = F.concat(
        F.col(text_col),
        F.lit(" reach user"),
        i.cast("string"),
        F.lit("@example.com"),
        F.when(
            i % 3 == 0,
            F.concat(F.lit(" cc admin"), i.cast("string"), F.lit("@mail.test")),
        ).otherwise(F.lit("")),
        F.lit(" or 10."),
        (i % 256).cast("string"),
        F.lit("."),
        ((i * 7) % 256).cast("string"),
        F.lit("."),
        ((i * 13) % 256).cast("string"),
        F.lit(" or call +1-555-"),
        F.lpad(((i * 31) % 10_000).cast("string"), 4, "0"),
        F.lit(" now"),
    )
    return docs.withColumn(text_col, planted)


def scrub_expr(text: Column) -> Column:
    """The redacted text: email → IPv4 → phone, each replaced globally."""
    t = F.regexp_replace(text, EMAIL_RE, EMAIL_TOKEN)
    t = F.regexp_replace(t, IPV4_RE, IPV4_TOKEN)
    return F.regexp_replace(t, PHONE_RE, PHONE_TOKEN)


def pii_scrub(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_emails, n_ips, n_phones, n_redacted_chars, clean_md5).

    Counts are measured on the raw text (the three patterns cannot overlap:
    emails contain ``@``, IPv4 needs three dots between digit runs, phones
    start ``+d``), the md5 is of the fully scrubbed text.
    """
    t = F.col(text_col)
    clean = scrub_expr(t)
    return docs.select(
        "doc_id",
        F.regexp_count(t, F.lit(EMAIL_RE)).cast("int").alias("n_emails"),
        F.regexp_count(t, F.lit(IPV4_RE)).cast("int").alias("n_ips"),
        F.regexp_count(t, F.lit(PHONE_RE)).cast("int").alias("n_phones"),
        (F.length(t) - F.length(clean)).cast("int").alias("n_redacted_chars"),
        F.md5(clean.cast("binary")).alias("clean_md5"),
    )
