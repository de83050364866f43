"""Linear text-classifier inference over hashed bag-of-n-gram features.

The quality-classifier stage of modern pretraining pipelines (fastText
model-based filtering in CCNet/RefinedWeb; the FineWeb-Edu educational-value
scorer) is, at serving time, a *linear* model over sparse lexical features:

    logit(doc) = bias + (1/N) · Σ_features  n_f · w_f          (mean pooling)
    prob       = σ(logit),   label = prob ≥ 0.5

Joulin et al., *Bag of Tricks for Efficient Text Classification* (fastText,
EACL 2017) — hashed unigram+bigram features, mean-pooled, linear head.
Training happens offline on a sample; what a 100 TB pipeline needs from the
*engine* is exactly this inference pass, at full corpus scale, with a model
that arrives as data (a weight table), not code.

Feature hashing, engine-portable: bucket = first 2 hex chars of
md5('u:'‖token) / md5('b:'‖tok1‖' '‖tok2) — the same 256-bucket digest-prefix
trick as operators/dsir.py, so DuckDB replays it byte-for-byte.  Real models
use 2^20+ buckets; the bucket count here is a fixture constant, the plan
shape (explode → per-doc bucket counts → broadcast weight join → one agg) is
the production shape and is independent of the bucket count.

Scale shape: per-doc counts = one explode + map-side-combined groupBy
(≤ buckets·docs rows); the weight table joins as a **broadcast** (a 2^20-row
float table is ~8 MB — always under the broadcast threshold); one final
groupBy(id) agg.  Zero driver state, nothing quadratic, no Python UDFs.

Extension beyond the reference (no text pipeline in habedi/graphina).
Tokenization is the frozen convention of functions/textstats.py:36.
DuckDB twin: oracles_text.py::classifier_scores_sql.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from graphina_spark.functions.textstats import tokens_col

#: 2 hex chars of md5 = 256 feature buckets (fixture-sized; see module doc).
N_BUCKETS = 256


def hashed_feature_counts(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, b, n): per-document hashed feature counts — unigram buckets
    md5('u:'‖tok) and bigram buckets md5('b:'‖tok1‖' '‖tok2), 2-hex-prefix."""
    toks = df.select(F.col(id_col).alias("id"), tokens_col(F.col(text_col)).alias("t"))
    uni = F.transform(F.col("t"), lambda x: F.substring(F.md5(F.concat(F.lit("u:"), x)), 1, 2))
    bi = F.when(
        F.size("t") >= 2,
        F.expr(
            "transform(sequence(1, size(t) - 1),"
            " i -> substring(md5(concat('b:', t[i-1], ' ', t[i])), 1, 2))"
        ),
    ).otherwise(F.expr("CAST(array() AS array<string>)"))
    feats = toks.select("id", F.concat(uni, bi).alias("fs"))
    return (
        feats.select("id", F.explode("fs").alias("b"))
        .groupBy("id", "b")
        .agg(F.count("*").alias("n"))
    )


def classifier_scores(
    df: DataFrame,
    weights: DataFrame,
    bias: float = 0.0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_feats, logit, prob, label) for every document in ``df``.

    ``weights`` is a model-as-data frame ``(b: string, w: double)`` keyed by
    feature bucket; missing buckets score 0 (absent from the table).  Mean
    pooling over the document's feature multiset (fastText convention);
    feature-less documents get logit = bias.  ``label`` = prob ≥ 0.5.
    """
    counts = hashed_feature_counts(df, id_col, text_col)
    scored = (
        counts.join(F.broadcast(weights), "b", "left")
        .groupBy("id")
        .agg(
            F.sum("n").alias("n_feats"),
            F.sum(F.col("n") * F.coalesce("w", F.lit(0.0))).alias("dot"),
        )
        .select(
            "id",
            "n_feats",
            (F.lit(bias) + F.col("dot") / F.col("n_feats")).alias("logit"),
        )
    )
    ids = df.select(F.col(id_col).alias("id")).distinct()
    out = ids.join(scored, "id", "left").select(
        "id",
        F.coalesce("n_feats", F.lit(0)).cast("long").alias("n_feats"),
        F.coalesce("logit", F.lit(float(bias))).alias("logit"),
    )
    prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("logit")))
    return out.select(
        "id",
        "n_feats",
        F.round("logit", 6).alias("logit"),
        F.round(prob, 6).alias("prob"),
        (prob >= 0.5).alias("label"),
    )


def demo_weights(spark: SparkSession, salt: str = "clfw", scale: float = 4.0) -> DataFrame:
    """Deterministic md5-derived demo weight table ``(b, w)`` over all 256
    buckets: w = (md5int('<salt>:'‖b)/2^32 − 0.5)·scale — a stand-in for a
    trained model, reproducible in any engine (twin arithmetic in the
    oracle).  Computed driver-side (256 rows) and broadcast."""
    rows = []
    for i in range(N_BUCKETS):
        b = format(i, "02x")
        h = int(hashlib.md5(f"{salt}:{b}".encode()).hexdigest()[:8], 16)
        rows.append((b, (h / 4294967296.0 - 0.5) * scale))
    return spark.createDataFrame(rows, "b string, w double")
