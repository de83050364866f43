"""node2vec second-order walks: Python brute-force replica parity,
bias response, and sink termination."""

from pyspark.sql import functions as F

from graphina_spark.operators.approximation import PRI_A1, PRI_A2, PRI_B
from graphina_spark.operators.distmetrics import ANF_P
from tests.conftest import make_graph


def _hash(walk: int, step: int, cur: int) -> int:
    m1 = ((walk + 1) * PRI_A1 + step * PRI_A2 + (cur + 1) * PRI_B) % ANF_P
    m2 = (m1 * m1 + PRI_A1) % ANF_P
    return (m2 * m2 + PRI_A2) % ANF_P


def _brute(edges, starts, length, wr, wc, wf):
    adj = {}
    eset = set(edges)
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
    adj = {s: sorted(ds) for s, ds in adj.items()}
    rows = []
    for v in starts:
        walk, cur, prev = v, v, None
        rows.append((walk, 0, cur))
        for t in range(1, length + 1):
            if cur not in adj:
                break
            nbrs = adj[cur]
            if t == 1:
                nxt = nbrs[_hash(walk, t, cur) % len(nbrs)]
            else:
                ws = [
                    wr if x == prev else (wc if (prev, x) in eset else wf)
                    for x in nbrs
                ]
                tot = sum(ws)
                h = _hash(walk, t, cur)
                cum = 0
                nxt = None
                for x, w in zip(nbrs, ws):
                    cum += w
                    if cum * ANF_P > h * tot:
                        nxt = x
                        break
            rows.append((walk, t, nxt))
            prev, cur = cur, nxt
    return sorted(rows)


def test_brute_force_parity(spark):
    from graphina_spark.operators.walks import node2vec_walks

    # deterministic dense-ish digraph on 12 nodes with a sink (node 11)
    edges = sorted(
        {
            (u, (u * u + 3 * u + k) % 11)
            for u in range(12)
            for k in range(4)
            if u != (u * u + 3 * u + k) % 11
        }
    )
    g = make_graph(spark, edges, n=12, directed=True)
    got = sorted(
        (r["walk"], r["step"], r["id"])
        for r in node2vec_walks(
            g, length=4, walks_per_node=1, w_return=1, w_common=3, w_far=2
        ).collect()
    )
    want = _brute(edges, range(12), 4, 1, 3, 2)
    assert got == want


def test_return_bias_responds(spark):
    from graphina_spark.operators.walks import node2vec_walks

    # undirected path graph: from the middle of an edge the only 2-hop
    # choices are "return" or "continue"; huge w_return must return more
    # often than huge w_far
    edges = [(i, i + 1) for i in range(40)]
    g = make_graph(spark, edges, n=41, directed=False)

    def returns(wr, wf):
        walks = node2vec_walks(
            g, length=2, walks_per_node=1, w_return=wr, w_common=1, w_far=wf
        )
        w = walks.groupBy("walk").pivot("step", [0, 2]).agg(F.first("id"))
        return w.where(F.col("0") == F.col("2")).count()

    assert returns(1000, 1) > returns(1, 1000)


def test_sink_terminates_walk(spark):
    from graphina_spark.operators.walks import node2vec_walks

    g = make_graph(spark, [(0, 1), (1, 2)], n=3, directed=True)
    rows = node2vec_walks(g, length=5, walks_per_node=1).collect()
    # walk from 0: 0→1→2 stop (2 is a sink); walks from 1 and 2 shorter
    by_walk = {}
    for r in rows:
        by_walk.setdefault(r["walk"], []).append((r["step"], r["id"]))
    assert sorted(by_walk[0]) == [(0, 0), (1, 1), (2, 2)]
    assert sorted(by_walk[2]) == [(0, 2)]
