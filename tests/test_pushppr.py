"""Forward-push PPR: mass invariant, convergence, ACL sweep composition."""

import pytest
from pyspark.sql import functions as F

from graphina_spark.graph import LinkGraph
from graphina_spark.operators.pushppr import forward_push_ppr, local_cluster


def _graph(spark, edges, n):
    vdf = spark.createDataFrame([(i,) for i in range(n)], "id long")
    edf = spark.createDataFrame(edges, "src long, dst long")
    return LinkGraph.from_edges(edf, directed=True, vertices=vdf)


def _seeds(spark, ids):
    return spark.createDataFrame([(i, 1.0) for i in ids], "id long, mass double")


def _two_blocks():
    # dense block {0..4}, dense block {5..9}, one bridge 4-5
    e = []
    for lo, hi in [(0, 5), (5, 10)]:
        ids = list(range(lo, hi))
        e += [(a, b) for a in ids for b in ids if a < b]
    e.append((4, 5))
    return e


def test_mass_invariant(spark):
    g = _graph(spark, _two_blocks(), 10)
    st = forward_push_ppr(g, _seeds(spark, [0]), eps=0.0, rounds=5)
    tot = st.agg(F.sum(F.col("p") + F.col("r"))).first()[0]
    assert tot == pytest.approx(1.0, abs=1e-12)


def test_threshold_free_converges_to_exact_ppr(spark):
    # exact PPR on undirected view via dense power iteration in Python
    edges = _two_blocks()
    g = _graph(spark, edges, 10)
    st = forward_push_ppr(g, _seeds(spark, [0]), alpha=0.15, eps=0.0, rounds=200)
    got = {r["id"]: r["p"] for r in st.collect()}

    nbrs = {i: set() for i in range(10)}
    for a, b in edges:
        nbrs[a].add(b)
        nbrs[b].add(a)
    pr = {0: 1.0}
    # exact: ppr = alpha * sum_k (1-alpha)^k W^k seed  (W = random walk)
    dist, acc = {0: 1.0}, {i: 0.0 for i in range(10)}
    for _ in range(400):
        for v, m in dist.items():
            acc[v] += 0.15 * m
        nxt = {}
        for v, m in dist.items():
            share = 0.85 * m / len(nbrs[v])
            for w in nbrs[v]:
                nxt[w] = nxt.get(w, 0.0) + share
        dist = nxt
    for v in range(10):
        assert got.get(v, 0.0) == pytest.approx(acc[v], abs=1e-9), v


def test_isolated_seed_absorbs(spark):
    g = _graph(spark, [(0, 1)], 3)  # vertex 2 isolated
    st = forward_push_ppr(g, _seeds(spark, [2]), eps=0.0, rounds=3)
    rows = {r["id"]: (r["p"], r["r"]) for r in st.collect()}
    assert rows == {2: (1.0, 0.0)}


def test_eps_threshold_freezes_small_residuals(spark):
    g = _graph(spark, _two_blocks(), 10)
    # eps huge: nothing exceeds eps*deg after the first push -> residuals stay
    st = forward_push_ppr(g, _seeds(spark, [0]), eps=1.0, rounds=4)
    tot_r = st.agg(F.sum("r")).first()[0]
    assert tot_r == pytest.approx(1.0, abs=1e-12)  # nothing ever pushed
    # 30 rounds reaches the eps-fixpoint on this graph (measured: all
    # residuals inactive by round 24); at the fixpoint r <= eps * deg
    st2 = forward_push_ppr(g, _seeds(spark, [0]), eps=1e-3, rounds=30)
    bad = st2.where(F.col("r") > 1e-3 * F.lit(5) + 1e-15).count()
    assert bad == 0


def test_local_cluster_finds_planted_block(spark):
    g = _graph(spark, _two_blocks(), 10)
    row = local_cluster(g, _seeds(spark, [1]), eps=0.0, rounds=40).collect()[0]
    # the sweep's best cut is the bridge: 5 vertices, conductance 1/21
    assert row["n_side"] == 5
    # sweep_cut rounds its conductance column to 6 dp
    assert row["conductance"] == pytest.approx(1 / 21, abs=1e-6)
