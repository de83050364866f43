"""PLSI topic model — deterministic EM over the corpus term table.

Hofmann, *Probabilistic Latent Semantic Indexing* (SIGIR 1999): model
P(w|d) = Σ_k θ_dk · φ_kw and fit θ (doc-topic) and φ (topic-word) by EM:

    E:  r_dwk = θ_dk φ_kw / Σ_k' θ_dk' φ_k'w
    M:  θ_dk ∝ Σ_w n_dw r_dwk       φ_kw ∝ Σ_d n_dw r_dwk

The corpus-scale topic-structure pass (cluster the vocabulary, tag
documents with topic mixtures) the engine was missing; LDA differs only
by Dirichlet smoothing of the same updates, at the cost of a sampler no
two engines could replay — PLSI's EM is PURE arithmetic, so the whole
trajectory is deterministic and the DuckDB twin unrolls it exactly.

Determinism: θ⁰/φ⁰ come from md5-derived uniforms (the sampling.py
convention, keyed by (salt, k, doc) / (salt, k, token)) normalized per
doc / per topic — no RNG, identical across engines, partitionings, runs.

Scale shape per EM round: the responsibility frame is nnz·K rows (nnz =
distinct (doc, token) pairs; K a small constant) built by two broadcast-
friendly keyed joins; the E-step denominator is one groupBy((doc, token))
+ one join back; each M-step is one map-side-combined groupBy + one
normalization join.  Nothing is vocabulary×vocabulary or doc×doc; a 100 TB
corpus streams through each round a constant number of times.  Fixed
iterations (the unrolled-oracle contract); 6-dp rounding on output only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphina_spark.functions.textstats import tokens_col
from graphina_spark.plans.materialize import local_materialize as _mat

ROUND = 6
_U_DEN = float(2**32 + 1)


def _uniform(tag: str, col):
    hexint = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(tag + ":"), col.cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("long")
    return (hexint + 1) / F.lit(_U_DEN)


def plsi_fit(
    df: DataFrame,
    n_topics: int = 4,
    iters: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "plsi",
) -> tuple[DataFrame, DataFrame]:
    """(theta, phi) — theta = (doc, k, t) doc-topic mixtures, phi =
    (k, tok, p) topic-word distributions, both 6-dp rounded, after
    ``iters`` EM rounds from the deterministic md5 init."""
    tf = (
        df.select(
            F.col(id_col).alias("doc"),
            F.explode(tokens_col(F.col(text_col))).alias("tok"),
        )
        .groupBy("doc", "tok")
        .agg(F.count("*").cast("double").alias("n"))
        .transform(_mat)
    )
    docs = tf.select("doc").distinct()
    vocab = tf.select("tok").distinct()
    doc_tot = tf.groupBy("doc").agg(F.sum("n").alias("nd"))

    theta = None
    for k in range(n_topics):
        part = docs.select(
            "doc", F.lit(k).alias("k"),
            _uniform(f"{salt}:theta:{k}", F.col("doc")).alias("u"),
        )
        theta = part if theta is None else theta.unionAll(part)
    tnorm = theta.groupBy("doc").agg(F.sum("u").alias("z"))
    theta = theta.join(tnorm, "doc").select(
        "doc", "k", (F.col("u") / F.col("z")).alias("t")
    ).transform(_mat)

    phi = None
    for k in range(n_topics):
        part = vocab.select(
            F.lit(k).alias("k"), "tok",
            _uniform(f"{salt}:phi:{k}", F.col("tok")).alias("u"),
        )
        phi = part if phi is None else phi.unionAll(part)
    pnorm = phi.groupBy("k").agg(F.sum("u").alias("z"))
    phi = phi.join(pnorm, "k").select(
        "k", "tok", (F.col("u") / F.col("z")).alias("p")
    ).transform(_mat)

    for _ in range(iters):
        num = (
            tf.join(theta, "doc")
            .join(phi, ["k", "tok"])
            .select("doc", "tok", "k", "n", (F.col("t") * F.col("p")).alias("v"))
        )
        den = num.groupBy("doc", "tok").agg(F.sum("v").alias("z"))
        contrib = (
            num.join(den, ["doc", "tok"])
            .select(
                "doc", "tok", "k",
                (F.col("n") * F.col("v") / F.col("z")).alias("c"),
            )
        ).transform(_mat)
        theta = (
            contrib.groupBy("doc", "k")
            .agg(F.sum("c").alias("s"))
            .join(doc_tot, "doc")
            .select("doc", "k", (F.col("s") / F.col("nd")).alias("t"))
            .transform(_mat)
        )
        pw = contrib.groupBy("k", "tok").agg(F.sum("c").alias("s"))
        pz = pw.groupBy("k").agg(F.sum("s").alias("z"))
        phi = pw.join(pz, "k").select(
            "k", "tok", (F.col("s") / F.col("z")).alias("p")
        ).transform(_mat)

    return (
        theta.select("doc", F.col("k").cast("int").alias("k"),
                     F.round("t", ROUND).alias("t")),
        phi.select(F.col("k").cast("int").alias("k"), "tok",
                   F.round("p", ROUND).alias("p")),
    )
