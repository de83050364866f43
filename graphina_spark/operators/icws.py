"""ICWS weighted MinHash — consistent sampling for WEIGHTED Jaccard.

Ioffe, *Improved Consistent Sampling, Weighted Minhash and L1 Sketching*
(ICDM 2010): for weighted sets (here: per-document token tf vectors) the
collision probability of one signature row is EXACTLY the weighted Jaccard
J_w(A, B) = Σ min(a_t, b_t) / Σ max(a_t, b_t) — the quantity the
unweighted MinHash family (operators/dedup.py) cannot see (it treats a
doc saying "free" 100 times like one saying it once).

Per hash row k and token t, three derived constants (functions of (k, t)
ONLY, so they join per distinct token — never per occurrence):

    r  = -ln(u1·u2),   c = -ln(u3·u4),   β = u5            (u_i ~ U(0,1))
    t_z = floor(ln(w)/r + β);  y = exp(r·(t_z − β));  a = c / (y·exp(r))

and the row's sample is the token minimizing ``a``.  Determinism: the
u_i are the repo's md5-derived uniforms (sampling.py convention) keyed by
``(salt, k, i, token)`` — reproducible across runs, partitionings, AND
engines; ``a`` is rounded to 9 dp before the argmin with a token-string
tie-break (the cosine_topk ranking convention — discrete decisions never
ride raw float ulps).

Scale shape: tf = one tokenize + groupBy((doc, token)); the constants
frame is distinct-vocabulary × k rows built by projection (no shuffle);
one join on token + one min_by groupBy((doc, k)) with map-side combine.
Nothing is pairwise — candidate pairs, if wanted, band these signatures
exactly like minhash_lsh_pairs.

DuckDB twin: oracles_text.py::icws_sig_sql.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphina_spark.functions.textstats import tokens_col

DEFAULT_K = 8
_U_DEN = float(2**32 + 1)


def _uniform(tag: str, tok_col):
    """md5-derived U(0,1) from (tag ‖ token) — strictly inside (0, 1)."""
    hexint = F.conv(
        F.substring(F.md5(F.concat(F.lit(tag + ":"), tok_col)), 1, 8), 16, 10
    ).cast("long")
    return (hexint + 1) / F.lit(_U_DEN)


def icws_signatures(
    df: DataFrame,
    k: int = DEFAULT_K,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "icws",
) -> DataFrame:
    """(id, r, tok, tz) — the k-row weighted-MinHash signature of every
    document's tf vector (r = hash row index; tz = the quantized level,
    part of the sample identity in Ioffe's scheme)."""
    tf = (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(tokens_col(F.col(text_col))).alias("tok"),
        )
        .groupBy("id", "tok")
        .agg(F.count("*").cast("double").alias("w"))
    )
    vocab = tf.select("tok").distinct()
    rows = None
    for kk in range(k):
        u1 = _uniform(f"{salt}:{kk}:1", F.col("tok"))
        u2 = _uniform(f"{salt}:{kk}:2", F.col("tok"))
        u3 = _uniform(f"{salt}:{kk}:3", F.col("tok"))
        u4 = _uniform(f"{salt}:{kk}:4", F.col("tok"))
        beta = _uniform(f"{salt}:{kk}:5", F.col("tok"))
        part = vocab.select(
            "tok",
            F.lit(kk).alias("r"),
            (-F.log(u1 * u2)).alias("rr"),
            (-F.log(u3 * u4)).alias("cc"),
            beta.alias("beta"),
        )
        rows = part if rows is None else rows.unionAll(part)
    scored = (
        tf.join(rows, "tok")
        .select(
            "id",
            "r",
            "tok",
            F.floor(F.log("w") / F.col("rr") + F.col("beta")).alias("tz"),
            F.col("rr"),
            F.col("cc"),
            F.col("beta"),
        )
        .select(
            "id",
            "r",
            "tok",
            "tz",
            (
                F.col("cc")
                / (
                    F.exp(F.col("rr") * (F.col("tz") - F.col("beta")))
                    * F.exp(F.col("rr"))
                )
            ).alias("a"),
        )
    )
    return (
        scored.groupBy("id", "r")
        .agg(
            F.min_by(
                F.struct("tok", "tz"), F.struct(F.round("a", 9), "tok")
            ).alias("m")
        )
        .select(
            "id",
            F.col("r").cast("int").alias("r"),
            F.col("m.tok").alias("tok"),
            F.col("m.tz").cast("long").alias("tz"),
        )
    )
