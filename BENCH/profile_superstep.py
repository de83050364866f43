#!/usr/bin/env python
"""One-off profiler: break a PageRank superstep's wall time into plan-build
(Python/Py4J) vs execution, at a small scale where fixed overhead dominates.

Not part of the bench contract; a diagnostic for the round-2 perf pass.
"""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from graphina_spark.session import get_spark
    from graphina_spark.operators.pagerank import pagerank
    from graphina_spark.sources.derived import web_graph

    spark = get_spark("profile_superstep")
    web = web_graph(spark, SF_DIR)
    web.edges = web.edges.cache()
    web.vertices = web.vertices.cache()
    print("edges", web.edges.count(), "verts", web.vertices.count())

    # warmup
    pagerank(web, fixed_iters=1, tol=None).count()
    pagerank(web, fixed_iters=1, tol=None).count()

    # total per-iteration cost at increasing iteration counts
    for iters in (1, 3, 6, 10):
        t0 = time.time()
        pagerank(web, fixed_iters=iters, tol=None).count()
        dt = time.time() - t0
        print(f"fixed_iters={iters}: {dt:.3f}s total, {dt/iters:.3f}s/iter")

    # manual superstep decomposition: build plan vs execute (localCheckpoint)
    from pyspark.sql import functions as F
    from graphina_spark.plans.materialize import local_materialize as _mat

    g = web
    n = g.num_vertices()
    sym = g.symmetric_edges()
    wout = sym.groupBy("src").agg(F.sum("weight").alias("w_out"))
    edges_norm = (
        sym.join(wout, "src")
        .select("src", "dst", (F.col("weight") / F.col("w_out")).alias("w_norm"))
        .repartition("src")
        .cache()
    )
    edges_norm.count()
    vinfo = (
        g.vertices.select("id")
        .join(wout.select(F.col("src").alias("id"), "w_out"), "id", "left")
        .select(
            "id",
            (F.coalesce("w_out", F.lit(0.0)) == 0.0).alias("dangling"),
            F.lit(1.0 / n).alias("p"),
        )
        .repartition("id")
        .cache()
    )
    vinfo.count()
    dangling_ids = vinfo.where("dangling").select("id").cache()
    has_dangling = dangling_ids.count() > 0
    print("has_dangling", has_dangling)
    ranks = _mat(g.vertices.select("id", F.lit(1.0 / n).alias("rank")))

    d = 0.85
    for it in range(6):
        t0 = time.time()
        dang_df = (
            ranks.join(dangling_ids, "id", "left_semi")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dang"))
        )
        gathered = (
            ranks.alias("r")
            .join(edges_norm.alias("e"), F.col("r.id") == F.col("e.src"))
            .select(
                F.col("e.dst").alias("id"),
                (F.col("r.rank") * F.col("e.w_norm")).alias("c"),
            )
            .groupBy("id")
            .agg(F.sum("c").alias("gather"))
        )
        joined = vinfo.join(gathered, "id", "left").crossJoin(F.broadcast(dang_df))
        new_ranks = joined.select(
            "id",
            (
                (1.0 - d) * F.col("p")
                + F.lit(d) * F.col("dang") * F.col("p")
                + F.lit(d) * F.coalesce("gather", F.lit(0.0))
            ).alias("rank"),
        )
        t_build = time.time() - t0
        t0 = time.time()
        nr = new_ranks.localCheckpoint(eager=True)
        t_ck = time.time() - t0
        t0 = time.time()
        try:
            jdf = nr._jdf
            jrdd = jdf.queryExecution().toRdd()
            jspark = nr.sparkSession._jsparkSession
            from pyspark.sql import DataFrame as _DF

            nr = _DF(jspark.internalCreateDataFrame(jrdd, jdf.schema(), False), nr.sparkSession)
        except Exception as e:
            print("wrap failed", e)
        t_wrap = time.time() - t0
        ranks.unpersist()
        ranks = nr
        print(
            f"iter {it}: build={t_build*1000:.0f}ms  checkpoint(exec)={t_ck*1000:.0f}ms  wrap={t_wrap*1000:.0f}ms"
        )

    spark.stop()


if __name__ == "__main__":
    main()
