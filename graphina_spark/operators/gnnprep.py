"""GNN training-data preparation: deterministic neighbor sampling and
sampled-neighborhood feature aggregation (the GraphSAGE export shape,
Hamilton et al. 2017).

The reference is a batch analytics engine with no feature surface; this is
the Spark-native extension a 100 TB training pipeline needs: given a link
graph and a per-node feature table (an ``array<float>`` embedding column),
emit, for every node, the mean feature vector of a FIXED-SIZE deterministic
sample of its neighbors — the input batch a GraphSAGE/GAT trainer consumes.
Deterministic sampling (a portable hash over the edge, not ``rand()``) makes
the export reproducible across runs, engines, and parallelism levels — the
property the repo's whole correctness gate is built on.

Relation to operators/smoothing.py: that module is the FULL-neighborhood
mean (the SGC/GCN propagation view — per-hub cost grows with degree);
this one is the fixed-fanout SAMPLED view GraphSAGE actually trains on —
per-node cost is O(k·d) regardless of degree, which is what makes the
export feasible when a crawl hub has 10^6 neighbors.

Scale shape (10^12 edges, hub degrees up to 10^6):

- Sampling is **two-phase top-k**: each neighbor is assigned a salt bucket
  (``dst % salt_buckets``); phase 1 takes the top-k within each
  ``(src, salt)`` group, phase 2 the top-k of the ≤ ``salt_buckets·k``
  survivors per src.  A 10^6-degree hub therefore never lands in ONE
  window task — its per-task group is bounded by ``degree/salt_buckets``,
  and phase 2 sees at most ``salt_buckets·k`` rows.  Because top-k under a
  total order (hash, dst) is selection, the two-phase result is exactly the
  single-pass top-k (the DuckDB oracle runs the one-window form).
- Aggregation is one ``posexplode`` + one ``(id, pos)`` groupBy — map-side
  combinable, output exactly n·d rows regardless of degree skew.
- Float exactness: features are float32 upcast to double BEFORE summing;
  a sum of ≤ sample_k ≤ ~100 float32-exact doubles is exact in IEEE double
  (24-bit mantissas, bounded exponent spread), so the mean is bit-identical
  across engines and partitionings — no rounding convention needed, though
  the gate still rounds to 6 dp by repo convention.

Hash: the repo's portable affine + two-quadratic-rounds scramble mod
2^31-1 (operators/approximation.py::_priority family) over the folded edge
key ``(src·A1 + dst) % P``, tie-broken by dst — a total order, identical in
DuckDB BIGINT checked arithmetic (every intermediate < 2^62).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from graphina_spark.graph import LinkGraph
from graphina_spark.operators.approximation import PRI_A1, PRI_A2, PRI_B
from graphina_spark.operators.distmetrics import ANF_P


def _edge_hash(src: F.Column, dst: F.Column) -> F.Column:
    """Portable deterministic per-edge hash: fold the pair mod P, then two
    quadratic scrambles (same family as approximation._priority; all
    intermediates < 2^62 so the DuckDB twin runs in checked BIGINTs)."""
    h1 = (src * F.lit(PRI_A1) + dst + F.lit(PRI_B)) % F.lit(ANF_P)
    h2 = (h1 * h1 + F.lit(PRI_A1)) % F.lit(ANF_P)
    h3 = (h2 * h2 + F.lit(PRI_A2)) % F.lit(ANF_P)
    return h3


def sample_neighbors(
    g: LinkGraph,
    k: int,
    salt_buckets: int = 16,
    directed: bool | None = None,
    roots: DataFrame | None = None,
) -> DataFrame:
    """(src, dst) — for every vertex with ≥1 neighbor, a deterministic
    sample of min(k, degree) distinct neighbors.

    Neighbors are ranked by (edge_hash, dst) — a total order, so the sample
    is unique and parallelism-independent.  ``directed=False`` (default for
    undirected graphs) samples over the union of in- and out-neighbors, the
    standard GraphSAGE message-passing view of a web graph.

    ``roots`` (optional, one ``id`` column) restricts the output to samples
    of those vertices.  Because the sample of ``src`` is a function of
    ``src``'s own neighbor set alone, semi-joining the adjacency on src
    BEFORE the ranking windows yields rows bit-identical to filtering the
    full output — that exactness is what the streaming delta export
    (streaming/gnnexport.py) relies on.
    """
    if directed is None:
        directed = g.directed
    e = g.edges.select("src", "dst").where(F.col("src") != F.col("dst"))
    if not directed:
        e = e.unionAll(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    adj = e.distinct()
    if roots is not None:
        adj = adj.join(
            roots.select(F.col("id").alias("src")), "src", "left_semi"
        )
    ranked = adj.select(
        "src", "dst", _edge_hash(F.col("src"), F.col("dst")).alias("h")
    )
    # phase 1: top-k within (src, salt) — bounds any single window task by
    # degree/salt_buckets even for a crawl hub
    w1 = Window.partitionBy("src", (F.col("dst") % salt_buckets)).orderBy("h", "dst")
    survivors = ranked.withColumn("r1", F.row_number().over(w1)).where(
        F.col("r1") <= k
    )
    # phase 2: global top-k per src over ≤ salt_buckets·k survivors
    w2 = Window.partitionBy("src").orderBy("h", "dst")
    return (
        survivors.withColumn("r", F.row_number().over(w2))
        .where(F.col("r") <= k)
        .select("src", "dst")
    )


def sage_neighbor_mean(
    g: LinkGraph,
    features: DataFrame,
    k: int = 3,
    salt_buckets: int = 16,
    directed: bool | None = None,
    roots: DataFrame | None = None,
) -> DataFrame:
    """(id, pos, mean_val, n_sampled) — per vertex, the elementwise mean of
    the feature vectors of its deterministic k-neighbor sample, exploded to
    one row per vector position (the long-format GNN training export; a
    trainer pivots or ``collect_list`` s it back into vectors downstream).

    ``features`` must have columns (vec_id: long, embedding: array<float>);
    node id → feature row via ``id % |features|`` (the repo's deterministic
    node→vector assignment, shared with the oracle).  Output has exactly
    (#sampled-vertices)·d rows — degree skew never inflates it.
    """
    samp = sample_neighbors(
        g, k=k, salt_buckets=salt_buckets, directed=directed, roots=roots
    )
    n_vec = features.count()
    feat = features.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    joined = samp.join(feat, samp["dst"] % n_vec == feat["vec_id"]).select(
        F.col("src").alias("id"), F.posexplode("emb").alias("pos", "val")
    )
    return joined.groupBy("id", "pos").agg(
        F.avg("val").alias("mean_val"),
        (F.count("*")).alias("n_sampled"),
    )


def sample_khop_frontier(
    g: LinkGraph,
    k1: int,
    k2: int,
    salt_buckets: int = 16,
    directed: bool | None = None,
) -> DataFrame:
    """(root, hop, src, dst) — the edges of the 2-hop sampled computation
    graph every GraphSAGE minibatch consumes: for each root, a deterministic
    k1-sample of its neighbors (hop 1), then for each sampled neighbor u a
    deterministic k2-sample of u's neighbors (hop 2).

    Key scale property: the hop-2 sample of u is a function of u ALONE (the
    portable per-edge hash does not see the root), so u's fan-out is sampled
    ONCE and joined to every root that reached it — the hop-2 work is
    O(#distinct frontier vertices · k2), never O(#roots · k1 · k2) re-sampling.
    Output is ≤ n·k1·(1 + k2) rows by construction — degree skew cannot
    inflate it.
    """
    s1 = sample_neighbors(g, k=k1, salt_buckets=salt_buckets, directed=directed)
    hop1 = s1.select(
        F.col("src").alias("root"), F.lit(1).alias("hop"), "src", "dst"
    )
    s2 = sample_neighbors(g, k=k2, salt_buckets=salt_buckets, directed=directed)
    frontier = s1.select(F.col("src").alias("root"), F.col("dst").alias("u"))
    hop2 = frontier.join(
        s2.select(F.col("src").alias("u"), F.col("dst").alias("w")), "u"
    ).select("root", F.lit(2).alias("hop"), F.col("u").alias("src"), F.col("w").alias("dst"))
    return hop1.unionAll(hop2)
