"""FastRP structural node embeddings (Chen et al., CIKM 2019).

Very-sparse random projection (Achlioptas / Li et al.) iterated through the
graph's transition matrix: R has entries {+sqrt(s), 0, -sqrt(s)} with
probabilities {1/2s, 1-1/s, 1/2s}; the k-th representation is
X_k = (D^-1 A) X_{k-1} with X_0 = R, and the final embedding is the
weighted sum over L2-NORMALIZED iterates  E = sum_k w_k * X_k / ||X_k||_2.
This is the training-free structural-embedding pass production graph
stacks ship (Neo4j GDS "fastRP"): k applications mix k-hop link structure
into a d-dimensional vector usable by the ANN / kmeans / semdedup family.

Determinism (the repo's sampling convention, operators/sampling.py):
projection entries are not random but md5-derived — the sign cell is
``conv(md5('<salt>:<id>:<pos>')[:8], 16, 10) % (2*s)`` with cell 0 → +sqrt(s),
cell 1 → -sqrt(s), else 0 — so embeddings are reproducible across runs,
partitionings, cluster sizes AND engines (DuckDB twin:
oracles.fastrp_web_sql computes the identical cells).

Scale shape (the smoothing.py argument): the projection frame is SPARSE —
only the ~|V|·d/s nonzero cells materialize; each propagation step is one
join of the symmetrized edge frame onto the current sparse rows keyed by
the neighbor id + one (id, pos) groupBy whose shuffle carries map-side
partial sums (never vectors-of-vectors); the L2 norm is one more (id)
groupBy.  A degree-10^6 hub is one skewed reduce cell per dimension (AQE
splits it), not a fan-out.  Total: O(iters) shuffles of O(nnz) rows —
survives 10^12 edges because nothing is ever per-pair or dense.

Reference scope note: graphina has no embedding module; this extends the
north-star data-pipeline surface (SURVEY.md additions) the same way the
ANN / quantization family does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphina_spark.graph import LinkGraph

ROUND = 6
SQRT3 = 1.7320508075688772  # sqrt(s) for the default sparsity s=3


def projection_rows(
    vertices: DataFrame,
    dims: int = 8,
    sparsity: int = 3,
    salt: str = "fastrp",
) -> DataFrame:
    """(id, pos, x) — the NONZERO cells of the deterministic very-sparse
    projection matrix R: cell value +sqrt(s) when md5-cell % 2s == 0,
    -sqrt(s) when == 1, else absent (zero)."""
    root = float(sparsity) ** 0.5
    cell = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit(f"{salt}:"),
                    F.col("id").cast("string"),
                    F.lit(":"),
                    F.col("pos").cast("string"),
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long") % (2 * sparsity)
    return (
        vertices.select(
            "id", F.explode(F.sequence(F.lit(0), F.lit(dims - 1))).alias("pos")
        )
        .select(
            "id",
            F.col("pos").cast("int").alias("pos"),
            F.when(cell == 0, F.lit(root))
            .when(cell == 1, F.lit(-root))
            .otherwise(F.lit(0.0))
            .alias("x"),
        )
        .where(F.col("x") != 0.0)
    )


def fastrp_embedding(
    g: LinkGraph,
    dims: int = 8,
    iters: int = 3,
    weights: tuple[float, ...] = (0.5, 1.0, 2.0),
    sparsity: int = 3,
    salt: str = "fastrp",
) -> DataFrame:
    """(id, pos, v) — dense exploded FastRP embedding over the symmetrized
    (undirected-multiset) graph: v = sum_k weights[k-1] * X_k[id,pos] /
    ||X_k[id,:]||, rounded to 6 dp.  Vertices with no edges embed as the
    zero vector (they never enter a propagation round).

    ``weights`` must have exactly ``iters`` entries; X_0 = R itself is not
    part of the sum (its weight is the paper's usually-zero alpha_0)."""
    if len(weights) != iters:
        raise ValueError("fastrp_embedding: need one weight per iteration")
    sym = g.undirected_view().select("src", "dst")
    deg = sym.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("deg"))
    x = projection_rows(g.vertices, dims=dims, sparsity=sparsity, salt=salt)
    acc = None
    for k in range(iters):
        # X_k = D^-1 A X_{k-1): gather neighbor cells, mean over the FULL
        # degree (absent sparse cells are zeros, so sum/deg == mean)
        x = (
            sym.join(x.withColumnRenamed("id", "dst"), "dst")
            .groupBy(F.col("src").alias("id"), "pos")
            .agg(F.sum("x").alias("s"))
            .join(deg, "id")
            .select("id", "pos", (F.col("s") / F.col("deg")).alias("x"))
        )
        nrm = x.groupBy("id").agg(F.sqrt(F.sum(F.col("x") * F.col("x"))).alias("nrm"))
        term = (
            x.join(nrm, "id")
            .where(F.col("nrm") > 0)
            .select(
                "id", "pos", (F.lit(weights[k]) * F.col("x") / F.col("nrm")).alias("t")
            )
        )
        acc = term if acc is None else acc.unionAll(term)
    emb = acc.groupBy("id", "pos").agg(F.sum("t").alias("v"))
    grid = g.vertices.select(
        "id", F.explode(F.sequence(F.lit(0), F.lit(dims - 1))).alias("pos")
    ).select("id", F.col("pos").cast("int").alias("pos"))
    return grid.join(emb, ["id", "pos"], "left").select(
        "id", "pos", F.round(F.coalesce("v", F.lit(0.0)), ROUND).alias("v")
    )
