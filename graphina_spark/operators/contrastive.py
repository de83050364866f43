"""Contrastive pair mining for embedding-model training — the
training-data-pipeline step that turns a deduplicated corpus into
(anchor, positive, hard-negative) supervision:

- **positives**: near-duplicate pairs (cosine ≥ ``pos_threshold``) from the
  LSH-bucketed candidate generator (operators/ann.py::embedding_neardup_pairs
  — banded hyperplane buckets, never all-pairs, the gated dedup path);
- **groups**: hash-min connected components over the positive pairs (two
  positives of the same item must not be served as negatives of each other);
- **hard negatives**: each anchor's top-``k_neg`` HIGHEST-cosine neighbors
  OUTSIDE its group, taken from the top-``k_neg + margin`` ANN candidates
  and re-ranked after the group filter.  "Hard" = closest non-duplicate —
  the negatives that actually move a contrastive loss (InfoNCE/triplet).

Scale shape: BOTH candidate generators are bucketed — positives via
``embedding_neardup_pairs`` and negatives via the pluggable
``neg_candidates`` generator (default ``"lsh"`` = ``lsh_cosine_topk``,
``"ivf"`` = ``ivf_cosine_topk``; ``"exact"`` keeps the brute-force
``cosine_topk`` as the test-only exactness baseline — it plans a
BroadcastNestedLoopJoin and must never be the 100 TB path).  The group
closure runs on the (tiny) positive-pair graph; everything else is
id-keyed joins + one windowed re-rank per anchor.  ``margin`` bounds how
many same-group members may crowd an anchor's candidate list before a
negative can be missed — a documented recall cap, mirrored exactly in the
DuckDB twin (oracles_text.contrastive_pairs_sql, which mirrors whichever
generator the gate configuration selects).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def contrastive_pairs(
    embs: DataFrame,
    pos_threshold: float = 0.4,
    k_neg: int = 3,
    margin: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int = 6,
    tables: int = 2,
    max_bucket: int = 4096,
    neg_candidates: str = "lsh",
) -> DataFrame:
    """(anchor, other, kind, score, rank) — 'pos' rows (rank 0, canonical
    anchor < other) and 'neg' rows (rank 1..k_neg per anchor).

    ``neg_candidates`` selects the hard-negative candidate generator:
    ``"lsh"`` (default — bucketed, the scale path, shares the positive
    generator's hyperplanes/tables/cap so the DuckDB twin reuses one
    bucket table), ``"ivf"`` (inverted-list probe), or ``"exact"``
    (brute-force cosine — test baseline only; O(n²))."""
    from graphina_spark.graph import LinkGraph
    from graphina_spark.operators.ann import (
        cosine_topk,
        embedding_neardup_pairs,
        ivf_cosine_topk,
        lsh_cosine_topk,
    )
    from graphina_spark.operators.components import connected_components

    pos = embedding_neardup_pairs(
        embs, threshold=pos_threshold, planes=planes, tables=tables,
        max_bucket=max_bucket, id_col=id_col, vec_col=vec_col,
    ).cache()

    ids = embs.select(F.col(id_col).alias("id"))
    g = LinkGraph.from_edges(
        pos.select(
            F.col("a").alias("src"), F.col("b").alias("dst"),
            F.lit(1.0).alias("weight"),
        ),
        directed=False,
        vertices=ids,
    )
    groups = connected_components(g).select(
        "id", F.col("component").alias("grp")
    )

    if neg_candidates == "lsh":
        cand = lsh_cosine_topk(
            embs, k=k_neg + margin, planes=planes, tables=tables,
            max_bucket=max_bucket, id_col=id_col, vec_col=vec_col,
        )
    elif neg_candidates == "ivf":
        cand = ivf_cosine_topk(
            embs, k=k_neg + margin, id_col=id_col, vec_col=vec_col
        )
    elif neg_candidates == "exact":
        cand = cosine_topk(
            embs, k=k_neg + margin, id_col=id_col, vec_col=vec_col
        )
    else:
        raise ValueError(
            f"neg_candidates must be 'lsh', 'ivf' or 'exact', "
            f"got {neg_candidates!r}"
        )
    ga = groups.select(F.col("id").alias("query_id"), F.col("grp").alias("qg"))
    gb = groups.select(
        F.col("id").alias("neighbor_id"), F.col("grp").alias("ng")
    )
    filtered = (
        cand.join(ga, "query_id")
        .join(gb, "neighbor_id")
        .where(F.col("qg") != F.col("ng"))
    )
    w = Window.partitionBy("query_id").orderBy("rank")
    negs = (
        filtered.withColumn("nrank", F.row_number().over(w))
        .where(F.col("nrank") <= k_neg)
        .select(
            F.col("query_id").alias("anchor"),
            F.col("neighbor_id").alias("other"),
            F.lit("neg").alias("kind"),
            F.col("cosine").alias("score"),
            F.col("nrank").alias("rank"),
        )
    )
    poss = pos.select(
        F.col("a").alias("anchor"),
        F.col("b").alias("other"),
        F.lit("pos").alias("kind"),
        F.col("cosine").alias("score"),
        F.lit(0).alias("rank"),
    )
    return poss.unionByName(negs)
