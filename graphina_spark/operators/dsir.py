"""DSIR — Data Selection with Importance Resampling (hashed n-gram weights).

Xie et al., *Data Selection for Language Models via Importance Resampling*
(NeurIPS 2023): fit two bag-of-hashed-n-gram models — one on a small target
corpus (the domain you want more of), one on the raw pool — and score every
raw document by its log importance weight

    log w(doc) = Σ_bucket  n_bucket(doc) · ( ln p_target(bucket)
                                           − ln p_raw(bucket) ),

then sample the pool ∝ w.  The score is the practical knob: a 100 TB
pretraining pipeline ranks/thresholds on it to tilt the mixture toward the
target domain without training a classifier.

Feature hashing, engine-portable: a bigram's bucket is the **first two hex
chars of md5("w1 w2")** — 256 buckets, the same digest-prefix trick the
deterministic splitter uses (operators/sampling.py), so Spark and DuckDB
agree byte-for-byte with no integer-hash plumbing.  Both unigram-smoothed
models use add-α on the same 256-bucket space, so every bucket has positive
mass and the log-ratio is total.

Scale shape: per-doc bucket counts = one explode + groupBy (corpus-token
rows in, ≤ 256·docs rows out, map-side combined); the two models are one
256-row aggregation each (target docs are a *filter* on the same frame —
one pass); scoring joins the ≤256-row log-ratio table (broadcast — never a
shuffle) onto the per-doc counts and sums.  Nothing quadratic, nothing
driver-side but the 256-row model.

Extension beyond the reference (no text pipeline in habedi/graphina);
tokenization is the frozen convention of functions/textstats.py:36; DuckDB
twin: oracles_text.py::dsir_weights_sql.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from graphina_spark.functions.textstats import tokens_col

#: 2 hex chars of md5 = 256 buckets.
N_BUCKETS = 256
DEFAULT_ALPHA = 0.5


def bigram_buckets(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, b, n): per-document hashed-bigram bucket counts; ``b`` is the
    2-hex-char md5 prefix of the space-joined adjacent token pair."""
    toks = df.select(F.col(id_col).alias("id"), tokens_col(F.col(text_col)).alias("t"))
    pairs = toks.select(
        "id",
        F.when(
            F.size("t") >= 2,
            F.expr(
                "transform(sequence(1, size(t) - 1),"
                " i -> substring(md5(concat(t[i-1], ' ', t[i])), 1, 2))"
            ),
        )
        .otherwise(F.expr("CAST(array() AS array<string>)"))
        .alias("bs"),
    )
    return (
        pairs.select("id", F.explode("bs").alias("b"))
        .groupBy("id", "b")
        .agg(F.count("*").alias("n"))
    )


def dsir_log_weights(
    df: DataFrame,
    target: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = DEFAULT_ALPHA,
) -> DataFrame:
    """(id, n_feats, log_weight) for every document in ``df``.

    ``target`` is a boolean Column over ``df``'s rows selecting the target
    corpus (e.g. ``F.col("source").isin("src0", "src1")``).  ``log_weight``
    is the hashed-bigram importance log-ratio Σ n_b·(ln p_t(b) − ln p_r(b));
    documents with no bigram emit weight 0.0 (empty product).  Raw model =
    the WHOLE pool including the target rows (the paper's setup: target ⊂
    pool-universe features).
    """
    flagged = df.withColumn("_tgt", target)
    counts = bigram_buckets(flagged, id_col, text_col)
    tgt_ids = flagged.select(
        F.col(id_col).alias("id"), "_tgt"
    )
    per = counts.join(tgt_ids, "id")
    model = per.groupBy("b").agg(
        F.sum("n").alias("c_raw"),
        F.sum(F.when(F.col("_tgt"), F.col("n")).otherwise(F.lit(0))).alias("c_tgt"),
    )
    tot = model.agg(
        F.sum("c_raw").alias("t_raw"), F.sum("c_tgt").alias("t_tgt")
    )
    ratio = (
        model.crossJoin(F.broadcast(tot))
        .select(
            "b",
            (
                F.log((F.col("c_tgt") + F.lit(alpha)) / (F.col("t_tgt") + F.lit(alpha * N_BUCKETS)))
                - F.log((F.col("c_raw") + F.lit(alpha)) / (F.col("t_raw") + F.lit(alpha * N_BUCKETS)))
            ).alias("lr"),
        )
    )
    scored = (
        counts.join(F.broadcast(ratio), "b")
        .groupBy("id")
        .agg(
            F.sum("n").alias("n_feats"),
            F.sum(F.col("n") * F.col("lr")).alias("lw"),
        )
    )
    ids = df.select(F.col(id_col).alias("id")).distinct()
    return ids.join(scored, "id", "left").select(
        "id",
        F.coalesce("n_feats", F.lit(0)).alias("n_feats"),
        F.round(F.coalesce("lw", F.lit(0.0)), 6).alias("log_weight"),
    )
