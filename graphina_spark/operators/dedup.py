"""Deduplication operators for training-data pipelines.

Four tiers, all pure DataFrame compositions (no Python UDFs) with exact
DuckDB twins (graphina_spark/oracles_text.py):

- **exact**: md5(text) group; canonical = min doc_id per group.
- **n-gram Jaccard**: inverted-index self-join on distinct word-k-gram
  shingles → pair intersection counts → |∩|/|∪| ≥ τ.  The join only
  materializes pairs sharing ≥1 shingle (sparse support), never n² pairs.
- **MinHash + LSH**: md5-ordered MinHash signatures, banded; candidate pairs
  = equal band hash in ≥1 band; verified with exact shingle Jaccard.  At
  scale this is the path: candidate generation is a band-bucket shuffle,
  O(docs × bands), and only candidates pay the verification join.
- **SimHash**: 32-bit parity sketch; near-dup candidates = equal sketch
  (or equal on ≥1 of 4 8-bit bands for hamming-tolerant candidates).

Skew note: a shingle shared by M docs produces M² candidate pairs in the
inverted index ("the quick brown" at web scale).  ``max_shingle_freq`` drops
shingles more frequent than the cap before pairing — standard df-cap trick;
dropped shingles still count in the verification denominator (the exact
Jaccard join re-reads the full shingle sets).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from graphina_spark.functions.textstats import (
    minhash_signature,
    shingles_col,
    simhash32,
)


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, group_id, keep): group_id = min id among byte-identical texts
    (after md5 bucketing), keep marks the canonical representative."""
    h = df.select(F.col(id_col).alias("id"), F.md5(F.col(text_col)).alias("h"))
    grp = h.groupBy("h").agg(F.min("id").alias("group_id"))
    return (
        h.join(grp, "h")
        .select("id", "group_id", (F.col("id") == F.col("group_id")).alias("keep"))
    )


def _doc_shingles(
    df: DataFrame, id_col: str, text_col: str, k: int
) -> DataFrame:
    return df.select(
        F.col(id_col).alias("id"), shingles_col(F.col(text_col), k).alias("sh")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.5,
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """(a, b, jaccard) for a < b with shingle-set Jaccard ≥ threshold."""
    docs = _doc_shingles(df, id_col, text_col, k).cache()
    sizes = docs.select("id", F.size("sh").alias("nsh"))
    inv = docs.select("id", F.explode("sh").alias("s"))
    if max_shingle_freq is not None:
        freq = inv.groupBy("s").count().where(F.col("count") <= max_shingle_freq)
        inv = inv.join(freq.select("s"), "s")
    pairs = (
        inv.alias("x")
        .join(inv.alias("y"), F.col("x.s") == F.col("y.s"))
        .where(F.col("x.id") < F.col("y.id"))
        .groupBy(F.col("x.id").alias("a"), F.col("y.id").alias("b"))
        .agg(F.count("*").alias("inter"))
    )
    out = (
        pairs.join(sizes.select(F.col("id").alias("a"), F.col("nsh").alias("na")), "a")
        .join(sizes.select(F.col("id").alias("b"), F.col("nsh").alias("nb")), "b")
        .select(
            "a",
            "b",
            (F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))).alias(
                "jaccard"
            ),
        )
        .where(F.col("jaccard") >= threshold)
    )
    return out


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_hashes: int = 12,
    bands: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """(a, b, jaccard): LSH candidates (≥1 equal band) verified with exact
    shingle Jaccard ≥ threshold.  rows_per_band = num_hashes // bands."""
    if num_hashes % bands != 0:
        raise ValueError("num_hashes must be divisible by bands")
    r = num_hashes // bands
    docs = _doc_shingles(df, id_col, text_col, k).where(F.size("sh") > 0).cache()
    sig = docs.select("id", minhash_signature(F.col("sh"), num_hashes).alias("sig"))
    banded = sig.select(
        "id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.md5(F.concat_ws("|", F.slice(F.col("sig"), b * r + 1, r))).alias(
                        "bh"
                    ),
                ),
            )
        ).alias("z"),
    ).select("id", F.col("z.band").alias("band"), F.col("z.bh").alias("bh"))
    cand = (
        banded.alias("x")
        .join(banded.alias("y"), ["band", "bh"])
        .where(F.col("x.id") < F.col("y.id"))
        .select(F.col("x.id").alias("a"), F.col("y.id").alias("b"))
        .distinct()
    )
    verified = (
        cand.join(docs.select(F.col("id").alias("a"), F.col("sh").alias("sha")), "a")
        .join(docs.select(F.col("id").alias("b"), F.col("sh").alias("shb")), "b")
        .select(
            "a",
            "b",
            (
                F.size(F.array_intersect("sha", "shb"))
                / F.size(F.array_union("sha", "shb"))
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )
    return verified


def simhash_sketches(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, simhash) — the 32-bit parity sketch per document."""
    return df.select(
        F.col(id_col).alias("id"), simhash32(F.col(text_col)).alias("simhash")
    )


def simhash_duplicate_groups(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, group_id, keep): documents sharing an identical 32-bit SimHash."""
    sk = simhash_sketches(df, id_col, text_col)
    w = Window.partitionBy("simhash")
    return sk.select(
        "id",
        F.min("id").over(w).alias("group_id"),
        (F.col("id") == F.min("id").over(w)).alias("keep"),
    )
