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
Jaccard join re-reads the full shingle sets).  The default cap is FINITE
(``DEFAULT_MAX_SHINGLE_FREQ``) so the skew guard is on in the gated path;
pass ``None`` to disable (exact sparse-support semantics, only safe when the
corpus is known to have no universal shingles).

Cache lifecycle: the per-document shingle frames are ``.cache()``d because
they feed both the inverted index and the verification join.  The cached
blocks live for the session (they are part of the returned DataFrame's
lineage, so they cannot be unpersisted eagerly here); long-lived sessions
running many dedup passes own the lifecycle — call
``df.sparkSession.catalog.clearCache()`` between passes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from graphina_spark.functions.textstats import (
    minhash_signature,
    shingles_col,
    simhash32,
)

# document-frequency cap on shingles entering candidate generation: a shingle
# in M docs makes M² candidate pairs, so an uncapped hot shingle ("the quick
# brown" at web scale) is a quadratic blowup.  1000 caps any single shingle's
# contribution at ~500k pairs while being far above the df of any
# discriminative shingle.
DEFAULT_MAX_SHINGLE_FREQ = 1000


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
    max_shingle_freq: int | None = DEFAULT_MAX_SHINGLE_FREQ,
) -> DataFrame:
    """(a, b, jaccard) for a < b with shingle-set Jaccard ≥ threshold.

    Pairs are generated only from shingles with document frequency ≤
    ``max_shingle_freq`` (skew guard, see module docstring); the Jaccard
    value itself is exact over the FULL shingle sets.  A pair sharing only
    hot shingles is missed — the documented recall bias of the df-cap."""
    docs = _doc_shingles(df, id_col, text_col, k).cache()
    inv = docs.select("id", F.explode("sh").alias("s"))
    if max_shingle_freq is not None:
        freq = inv.groupBy("s").count().where(F.col("count") <= max_shingle_freq)
        inv = inv.join(freq.select("s"), "s")
    # candidate pairs from the (capped) inverted index; the Jaccard value is
    # then verified EXACTLY over the full shingle sets, so the cap only
    # affects recall, never a reported value
    cand = (
        inv.alias("x")
        .join(inv.alias("y"), F.col("x.s") == F.col("y.s"))
        .where(F.col("x.id") < F.col("y.id"))
        .select(F.col("x.id").alias("a"), F.col("y.id").alias("b"))
        .distinct()
    )
    out = (
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
    return out


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_hashes: int = 12,
    bands: int = 4,
    threshold: float = 0.5,
    max_band_freq: int | None = DEFAULT_MAX_SHINGLE_FREQ,
) -> DataFrame:
    """(a, b, jaccard): LSH candidates (≥1 equal band) verified with exact
    shingle Jaccard ≥ threshold.  rows_per_band = num_hashes // bands.

    Skew guard: a band bucket holding M docs emits M² candidates, and at web
    scale exact-duplicate clusters land entire clusters in one bucket.
    Buckets with > ``max_band_freq`` members are dropped from candidate
    generation (run :func:`exact_dedup` first — byte-identical clusters are
    its job, and they are exactly what makes buckets hot).  The shingle sets
    feeding signatures are NOT df-capped: MinHash estimates Jaccard over the
    true set, so capping there would bias every signature."""
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
    if max_band_freq is not None:
        ok = (
            banded.groupBy("band", "bh")
            .count()
            .where(F.col("count") <= max_band_freq)
            .select("band", "bh")
        )
        banded = banded.join(ok, ["band", "bh"])
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


def neardup_groups(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    max_iter: int = 50,
) -> DataFrame:
    """(id, group_id, keep) — the end-to-end dedup decision.

    ``pairs`` is any near-duplicate candidate-pair frame ``(a, b, ...)``
    (:func:`minhash_lsh_pairs`, :func:`ngram_jaccard_pairs`, or the embedding
    variant).  Near-duplication is not transitive, but dedup policy treats it
    as such: documents connected through any chain of near-dup pairs form one
    group, the minimum id is the canonical representative (``keep``), the
    rest are dropped.  This is the hash-min connected-components kernel over
    the pair graph (operators/components.py) — O(log d) label-exchange
    supersteps, one shuffle each — so it scales exactly like WCC: the pair
    graph is tiny relative to the corpus (only near-dup docs appear), and
    every document absent from ``pairs`` is its own singleton group.
    """
    from graphina_spark.graph import LinkGraph
    from graphina_spark.operators.components import connected_components

    ids = df.select(F.col(id_col).cast("long").alias("id")).distinct()
    edges = pairs.select(
        F.col("a").cast("long").alias("src"), F.col("b").cast("long").alias("dst")
    )
    g = LinkGraph.from_edges(edges, directed=False, vertices=ids)
    comp = connected_components(g, max_iter=max_iter)
    return comp.select(
        "id",
        F.col("component").alias("group_id"),
        (F.col("id") == F.col("component")).alias("keep"),
    )


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


def dedup_keep_best(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_iter: int = 50,
) -> DataFrame:
    """(id, group_id, keep) — quality-aware survivor selection: within each
    near-dup group (transitive closure over ``pairs``, as
    :func:`neardup_groups`) keep the HIGHEST-quality document instead of
    the minimum id — the policy production pipelines actually run (e.g.
    CCNet/RefinedWeb keep the best-scoring duplicate).  Quality =
    functions/textstats.py::quality_score rounded to 6 dp before ranking
    (cross-engine float-order safety); ties break to the smaller id.

    Scale shape: the components kernel over the (tiny) pair graph plus ONE
    quality projection and ONE per-group window — the window key is
    group_id, whose cardinality is the number of documents, with group
    sizes bounded by dup-cluster size.
    """
    from pyspark.sql import Window

    from graphina_spark.functions.textstats import quality_score

    groups = neardup_groups(df, pairs, id_col=id_col, max_iter=max_iter).select(
        "id", "group_id"
    )
    q = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.round(quality_score(F.col(text_col)), 6).alias("q"),
    )
    j = groups.join(q, "id")
    w = Window.partitionBy("group_id").orderBy(F.desc("q"), F.asc("id"))
    return (
        j.withColumn("rn", F.row_number().over(w))
        .select("id", "group_id", (F.col("rn") == 1).alias("keep"))
    )
