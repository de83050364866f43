"""Salted, src-bucketed CSR-style adjacency shards — the scale layout.

North-star storage: ``adj(bucket, salt, src, dst_list: array<long>,
w_list: array<double>, degree: long)``.  The reference's analogue is the
position-space CSR snapshot it builds before every hot loop
(/root/reference/src/core/paths.rs:767-801, sprs CsMat round-trip at
types.rs:570-606); ours is a distributed DataFrame with two extra design
points the in-memory version doesn't need:

1. **Row capping** — ``collect_list`` over a 10^6-out-degree hub would
   concentrate one group's entire adjacency in a single aggregation buffer
   and a single join row.  Every (src, salt) row holds at most ``salt_cap``
   neighbors — an exact bound: ``salt = (row_number over src, ordered by
   (dst, weight)) / salt_cap``, so a hub with out-degree D is split across
   exactly ``ceil(D / salt_cap)`` salt rows.  The build-time window sort is a
   one-off cost; the deterministic order also makes shard contents
   reproducible across runs/cluster sizes.

2. **Skew-proof gather** — the per-superstep join replicates each hub's rank
   row once per salt (broadcast hub-salt map + ``explode(sequence(...))`` —
   no shuffle), then joins on (src, salt) so a hub's scatter work spreads
   across as many tasks as it has salt rows.  Message aggregation
   (``groupBy(dst).sum``) gets map-side partial aggregation from Spark, which
   defuses *in*-degree hubs symmetrically.

Why shards beat the plain per-edge join at scale: the rank⋈adjacency join
moves one row per (src, salt) — ~|V| rows — instead of one row per edge
(~|E| = 10–100×|V|), and the edge fan-out happens *after* the join via
``explode(arrays_zip(...))`` inside the same stage (whole-stage codegen,
JVM-side, no Python).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphina_spark.graph import LinkGraph

DEFAULT_SALT_CAP = 100_000


@dataclass
class AdjShards:
    """Materialized adjacency shards + the hub-salt replication map."""

    shards: DataFrame  # (bucket, salt, src, dst_list, w_list, degree, w_out)
    salt_map: DataFrame  # (src, n_salt) — hubs only (n_salt > 1); broadcast side
    wout: DataFrame  # (src, w_out, degree[, _wlo, _whi]) — scatter-active
    # vertices; the underscore cols exist only when the builder auto-
    # detected uniform weights (they rode along on the wout aggregation)
    salt_cap: int
    dangling_sink: bool = False  # True: dangling vertices carry one virtual
    # edge to id -1 w=1.0, so Σ dangling rank rides the gather shuffle as the
    # sink's aggregation group (PageRank's dangling mass, no extra rank pass)
    uniform: bool = False  # True: w_list is NOT stored — every edge of a
    # src carries w_norm = 1/degree (unweighted graphs under normalize=True).
    # Cuts per-superstep adjacency scan traffic to 4 B/edge with compact=True
    # (vs 12 weighted-compact / 16 plain) — the memory-bus term that caps
    # single-box scaling; Common-Crawl link graphs are exactly this shape.

    def unpersist(self) -> None:
        for df in (self.shards, self.salt_map, self.wout):
            try:
                df.unpersist()
            except Exception:
                pass

    def gather(self, ranks: DataFrame, value: str = "rank") -> DataFrame:
        """One superstep's message wave: Σ_{u→v} value[u]·w_norm(u,v) → (id,
        gather).  ``ranks`` is (id, <value>)."""
        replicated = (
            ranks.join(F.broadcast(self.salt_map), ranks["id"] == self.salt_map["src"], "left")
            .select(
                ranks["id"].alias("src"),
                F.col(value).alias("_v"),
                F.explode(
                    F.sequence(F.lit(0), F.coalesce(F.col("n_salt"), F.lit(1)) - 1)
                ).alias("salt"),
            )
        )
        if self.uniform:
            # w_norm = 1/degree computed, never scanned; dangling-sink rows
            # (degree 0, virtual w 1.0) pass the rank through unscaled
            return (
                self.shards.join(replicated, ["src", "salt"])
                .select(
                    F.explode("dst_list").alias("_dst"),
                    F.col("_v"),
                    F.col("degree"),
                )
                .select(
                    F.col("_dst").cast("bigint").alias("id"),
                    F.when(
                        F.col("degree") > 0, F.col("_v") / F.col("degree")
                    ).otherwise(F.col("_v")).alias("_c"),
                )
                .groupBy("id")
                .agg(F.sum("_c").alias("gather"))
            )
        return (
            self.shards.join(replicated, ["src", "salt"])
            .select(
                F.explode(F.arrays_zip("dst_list", "w_list")).alias("z"),
                F.col("_v"),
            )
            .select(
                # compact shards carry int dsts / float weights; the message
                # schema is re-widened here so downstream plans are identical
                F.col("z.dst_list").cast("bigint").alias("id"),
                (F.col("_v") * F.col("z.w_list").cast("double")).alias("_c"),
            )
            .groupBy("id")
            .agg(F.sum("_c").alias("gather"))
        )


def build_adj_shards(
    g: LinkGraph,
    salt_cap: int = DEFAULT_SALT_CAP,
    n_buckets: int | None = None,
    normalize: bool = True,
    dangling_sink: bool = False,
    compact: bool = False,
    uniform: bool | None = None,
) -> AdjShards:
    """Group the (symmetrized) edge set into capped, salted CSR rows.

    ``normalize=True`` stores w_list as w(u,v)/w_out(u) (the PageRank scatter
    weights); ``False`` stores raw weights (matvec kernels: eigenvector/Katz).

    ``dangling_sink=True`` additionally emits one shard row per dangling
    vertex (no out-edges): ``(src=u, salt=0, dst_list=[-1], w_list=[1.0])``.
    A PageRank gather then produces the total dangling mass as the sink id's
    aggregation group inside the normal message shuffle, replacing the
    per-superstep second scan of the rank vector.  ``wout`` is NOT given sink
    rows — dangling vertices keep w_out absent, so vinfo dangling flags stay
    correct.

    ``uniform`` — True: weights are known constant, store no w_list and
    gather with 1/degree; False: always store w_list (skips auto-detect
    entirely — pass this when weights are known non-constant); None
    (default): auto-detect constant weights via per-src extrema folded
    into the wout aggregation (no extra edge scan; one tiny reduce over
    the per-src frame).

    ``compact=True`` stores ``dst_list`` as array<int> and ``w_list`` as
    array<float> — 12 bytes/edge of superstep scan traffic instead of 16 at
    identical row counts (every superstep re-reads the whole cached
    adjacency, so this is the memory-bus term that caps single-box scaling
    at high core counts; on a real cluster it is the network/cache term).
    Requires vertex ids < 2³¹ (validated).  Ids stay EXACT (integers);
    only w_norm is rounded to float32 — per-superstep relative rank error
    ≤ 2⁻²³ ≈ 1.2e-7, and because the PageRank iteration is a contraction
    with factor d the steady-state error is bounded by 1.2e-7/(1−d) ≈
    8e-7 < the north rule's allclose 1e-6 (tests pin agreement ≤ 1e-6
    against the float64 kernel).
    """
    spark = g.edges.sparkSession
    if n_buckets is None:
        n_buckets = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    sym = g.symmetric_edges()
    if uniform and not normalize:
        raise ValueError(
            "uniform shards require normalize=True (w_norm = 1/degree)"
        )
    detect = uniform is None and normalize
    wout_aggs = [
        F.sum("weight").alias("w_out"),
        F.count("*").alias("degree"),
    ]
    if detect:
        # per-src weight extrema piggyback on the wout aggregation, so the
        # constant-weight auto-detect folds into the edge pass that
        # materializes the wout cache anyway — no extra scan of sym
        # (callers that know their weights can skip even the small
        # global reduce below by passing uniform=True/False explicitly)
        wout_aggs += [
            F.min("weight").alias("_wlo"),
            F.max("weight").alias("_whi"),
        ]
    wout = sym.groupBy("src").agg(*wout_aggs).cache()
    if uniform is None:
        # auto-detect: constant edge weight + normalize => w_norm is
        # exactly 1/degree, so w_list need not be stored or scanned
        if detect:
            mm = wout.agg(
                F.min("_wlo").alias("lo"), F.max("_whi").alias("hi")
            ).first()
            uniform = mm["lo"] is not None and mm["lo"] == mm["hi"]
        else:
            uniform = False
    from pyspark.sql import Window

    rn = F.row_number().over(Window.partitionBy("src").orderBy("dst", "weight"))
    e = (
        sym.join(wout, "src")
        .select(
            "src",
            "dst",
            "weight",
            (
                (F.col("weight") / F.col("w_out")) if normalize else F.col("weight")
            ).alias("w_norm"),
            "degree",
            "w_out",
        )
        .withColumn("salt", ((rn - 1) / F.lit(salt_cap)).cast("int"))
        .drop("weight")
    )
    dst_t, w_t = ("int", "float") if compact else ("bigint", "double")
    if compact:
        over = g.vertices.where(
            (F.col("id") >= 2_147_483_648) | (F.col("id") < 0)
        ).limit(1).count()
        if over:
            raise ValueError(
                "build_adj_shards(compact=True) requires vertex ids in "
                "[0, 2^31); use compact=False for wider id spaces"
            )
    aggs = [
        F.collect_list(F.col("dst").cast(dst_t)).alias("dst_list"),
        F.first("degree").alias("degree"),
        F.first("w_out").alias("w_out"),
    ]
    if not uniform:
        aggs.insert(
            1, F.collect_list(F.col("w_norm").cast(w_t)).alias("w_list")
        )
    grouped = e.groupBy("src", "salt").agg(*aggs)
    if dangling_sink:
        sink_cols = [
            F.col("src"),
            F.lit(0).cast("int").alias("salt"),
            F.array(F.lit(-1).cast(dst_t)).alias("dst_list"),
            F.lit(0).cast("long").alias("degree"),
            F.lit(0.0).alias("w_out"),
        ]
        if not uniform:
            sink_cols.insert(
                3, F.array(F.lit(1.0).cast(w_t)).alias("w_list")
            )
        sink_rows = (
            g.vertices.select(F.col("id").alias("src"))
            .join(wout.select("src"), "src", "left_anti")
            .select(*sink_cols)
        )
        grouped = grouped.unionByName(sink_rows)
    shards = (
        grouped.withColumn("bucket", F.pmod(F.hash("src"), F.lit(n_buckets)))
        .repartition(n_buckets, "src", "salt")
        .cache()
    )
    salt_map = (
        wout.where(F.col("degree") > salt_cap)
        .select("src", F.ceil(F.col("degree") / F.lit(salt_cap)).cast("int").alias("n_salt"))
        .cache()
    )
    return AdjShards(
        shards=shards,
        salt_map=salt_map,
        wout=wout,
        salt_cap=salt_cap,
        dangling_sink=dangling_sink,
        uniform=bool(uniform),
    )
