"""Link-prediction operators vs a brute-force neighbor-set reference
(semantics pinned to /root/reference/src/links/*.rs — see operators/links.py)."""

import math
from itertools import combinations

import pytest
from pyspark.sql import functions as F

from graphina_spark.operators import links as L
from tests.conftest import make_graph

EDGES = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 5), (5, 3), (0, 3), (6, 6)]
N = 8  # 7 is isolated, 6 has only a self-loop


def _nbrs():
    nb = {i: set() for i in range(N)}
    for s, d in EDGES:
        if s != d:
            nb[s].add(d)
            nb[d].add(s)
    return nb


def _expected(comm=None, delta=0.001):
    nb = _nbrs()
    out = {}
    for u, v in combinations(range(N), 2):
        common = nb[u] & nb[v]
        cn = len(common)
        aa = sum(1.0 / math.log(len(nb[w])) for w in common if len(nb[w]) > 1)
        ra = sum(1.0 / len(nb[w]) for w in common if len(nb[w]) > 0)
        union = len(nb[u]) + len(nb[v]) - cn
        jac = cn / union if union > 0 else 0.0
        pa = float(len(nb[u]) * len(nb[v]))
        row = {"cn": cn, "aa": aa, "ra": ra, "jaccard": jac, "pa": pa,
               "ccpa": cn ** 0.8}
        if comm is not None:
            sh = [w for w in common if comm[u] == comm[w] and comm[v] == comm[w]]
            row["cn_sh"] = float(len(sh))
            row["ra_sh"] = sum(1.0 / len(nb[w]) for w in sh)
            row["wic"] = (len(sh) + delta) / (cn - len(sh) + delta)
        out[(u, v)] = row
    return out


@pytest.fixture(scope="module")
def g(spark):
    return make_graph(spark, EDGES, n=N, directed=False)


@pytest.fixture(scope="module")
def ebunch(spark):
    pairs = list(combinations(range(N), 2))
    return spark.createDataFrame(pairs, "u long, v long")


def _check(df, col, exp, full=False):
    got = {(r["u"], r["v"]): r[col] for r in df.collect()}
    for pair, row in exp.items():
        want = row[col]
        if pair in got:
            assert got[pair] == pytest.approx(want, abs=1e-9), (col, pair)
        else:
            assert not full and want == pytest.approx(0.0), (col, pair)


def test_links_family_sparse_default(g):
    exp = _expected()
    _check(L.common_neighbors(g), "cn", exp)
    _check(L.jaccard_coefficient(g), "jaccard", exp)
    _check(L.adamic_adar_index(g), "aa", exp)
    _check(L.resource_allocation_index(g), "ra", exp)
    _check(L.common_neighbor_centrality(g), "ccpa", exp)


def test_links_family_explicit_ebunch(g, ebunch):
    exp = _expected()
    _check(L.common_neighbors(g, ebunch), "cn", exp, full=True)
    _check(L.jaccard_coefficient(g, ebunch), "jaccard", exp, full=True)
    _check(L.adamic_adar_index(g, ebunch), "aa", exp, full=True)
    _check(L.preferential_attachment(g, ebunch), "pa", exp, full=True)


def test_links_community_variants(g, spark, ebunch):
    comm = {i: i % 2 for i in range(N)}
    cdf = spark.createDataFrame(list(comm.items()), "id long, community long")
    exp = _expected(comm=comm)
    _check(L.cn_soundarajan_hopcroft(g, cdf, ebunch), "cn_sh", exp, full=True)
    _check(L.ra_index_soundarajan_hopcroft(g, cdf), "ra_sh", exp)
    wic = L.within_inter_cluster(g, cdf)
    got = {(r["u"], r["v"]): r["wic"] for r in wic.collect()}
    for pair, val in got.items():
        assert val == pytest.approx(exp[pair]["wic"], abs=1e-9)
    with pytest.raises(ValueError):
        L.within_inter_cluster(g, cdf, delta=0.0)


def test_self_loop_and_isolated_excluded(g):
    """6 (self-loop only) and 7 (isolated) have empty neighbor sets: no pair
    involving them appears in the sparse support."""
    cn = L.common_neighbors(g)
    assert cn.where((F.col("u").isin(6, 7)) | (F.col("v").isin(6, 7))).count() == 0


def test_negative_edges_are_nonedges_and_deterministic(spark):
    from graphina_spark.operators.links import negative_edges
    from tests.conftest import make_graph

    g = make_graph(spark, [(i, (i + 1) % 20) for i in range(20)], n=20)
    neg = negative_edges(g, per_node=2, oversample=6)
    rows = {(r["src"], r["dst"]) for r in neg.collect()}
    edges = {(i, (i + 1) % 20) for i in range(20)}
    # verified negatives: never a real edge, never a self-loop, valid ids
    assert rows and not (rows & edges)
    assert all(s != d and 0 <= d < 20 for s, d in rows)
    # at most per_node per source
    from collections import Counter

    per = Counter(s for s, _ in rows)
    assert max(per.values()) <= 2
    # reproducible; salt rotates the draw
    again = {(r["src"], r["dst"]) for r in negative_edges(g, per_node=2, oversample=6).collect()}
    assert again == rows
    other = {
        (r["src"], r["dst"])
        for r in negative_edges(g, per_node=2, oversample=6, salt="x").collect()
    }
    assert other != rows


def test_link_prediction_auc_separation(spark):
    """A clique's internal pairs share many common neighbors; negatives into
    the sparse tail share none — AUC must be high, and the hand formula must
    hold on the tie-aware definition."""
    from graphina_spark.operators.links import link_prediction_auc
    from tests.conftest import make_graph

    # K5 clique (ids 0-4, both directions via undirected) + a 10-node path
    clique = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    path = [(i, i + 1) for i in range(5, 14)]
    g = make_graph(spark, clique + path, n=15, directed=False)
    row = link_prediction_auc(g, per_node=2, oversample=6).first()
    assert row["npos"] > 0 and row["nneg"] > 0
    assert 0.0 <= row["auc"] <= 1.0
    # clique pairs all have cn=3; path positives cn>=0; negatives mostly 0 →
    # better than chance
    assert row["auc"] > 0.5


def test_link_prediction_auc_hand_check(spark):
    """Exact tie-aware AUC on a fixture small enough to enumerate."""
    from graphina_spark.operators.links import link_prediction_auc
    from graphina_spark.operators.links import negative_edges, _pair_stats
    from pyspark.sql import functions as F
    from tests.conftest import make_graph

    edges = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4)]
    g = make_graph(spark, edges, n=5, directed=False)
    row = link_prediction_auc(g, per_node=2, oversample=8).first()

    # recompute with plain python
    pos = {tuple(sorted(e)) for e in edges}
    neg = {
        tuple(sorted((r["src"], r["dst"])))
        for r in negative_edges(g, per_node=2, oversample=8).collect()
    } - pos
    stats = {
        (r["u"], r["v"]): r["cn"] for r in _pair_stats(g).collect()
    }
    scored = [(stats.get(p, 0), 1) for p in pos] + [
        (stats.get(p, 0), 0) for p in neg
    ]
    scored.sort()
    # average ranks per tie group
    ranks, i = {}, 0
    while i < len(scored):
        j = i
        while j < len(scored) and scored[j][0] == scored[i][0]:
            j += 1
        avg = (i + 1 + j) / 2.0
        ranks[scored[i][0]] = avg
        i = j
    P = len(pos)
    N = len(neg)
    rpos = sum(ranks[s] for s, lab in scored if lab == 1)
    expect = (rpos - P * (P + 1) / 2.0) / (P * N)
    assert row["npos"] == P and row["nneg"] == N
    assert row["auc"] == pytest.approx(expect, abs=1e-6)


def test_future_link_auc_forward_eval(spark):
    """New edges that close triangles of the old graph (high cn) must be
    ranked above sampled non-edges (cn 0): AUC near 1. Positives must be
    disjoint from the old structure."""
    from graphina_spark.operators.links import future_link_auc
    from tests.conftest import make_graph

    # old: two triangles sharing structure + path tail; new edges close
    # wedges (0-2 via 1, 2-4 via 3), plus all old edges kept
    old_e = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (5, 0), (1, 3)]
    new_e = old_e + [(0, 2), (2, 4)]
    g_old = make_graph(spark, old_e, n=10, directed=False)
    g_new = make_graph(spark, new_e, n=10, directed=False)
    row = future_link_auc(g_old, g_new, per_node=2, oversample=8).first()
    assert row["npos"] == 2  # exactly the two genuinely-new canonical edges
    assert row["nneg"] > 0
    # both positives have cn >= 1 in the old graph; negatives are sampled
    # non-edges with mostly cn 0 → strong separation
    assert row["auc"] > 0.7


def test_future_link_auc_no_new_edges(spark):
    """Identical snapshots → zero positives → the 0.5 convention."""
    from graphina_spark.operators.links import future_link_auc
    from tests.conftest import make_graph

    e = [(0, 1), (1, 2), (2, 0)]
    g = make_graph(spark, e, n=5, directed=False)
    g2 = make_graph(spark, e, n=5, directed=False)
    row = future_link_auc(g, g2, per_node=2, oversample=8).first()
    assert row["npos"] == 0
    assert row["auc"] == 0.5


def test_wedge_hub_cap_bounds_fanout(spark):
    """VERDICT item: a planted hub above max_middle_degree must not emit
    wedges — pair support through the hub is dropped (documented bias),
    bounding the self-join fan-out; low-degree middles still count."""
    from graphina_spark.operators.links import _pair_stats
    from tests.conftest import make_graph

    # hub 0 connected to 1..30 (degree 30); plus a small triangle wedge
    # structure away from the hub: 31-32-33
    edges = [(0, i) for i in range(1, 31)] + [(31, 32), (32, 33)]
    g = make_graph(spark, edges, n=34, directed=False)

    uncapped = _pair_stats(g, max_middle_degree=None)
    capped = _pair_stats(g, max_middle_degree=10)
    # uncapped: C(30,2) hub-middle pairs + 1 pair through middle 32
    assert uncapped.count() == 30 * 29 // 2 + 1
    # capped at 10: the degree-30 hub is excluded as a middle; only the
    # (31, 33) pair through middle 32 survives
    rows = capped.collect()
    assert len(rows) == 1
    assert (rows[0]["u"], rows[0]["v"]) == (31, 33)
    # leaf vertices (degree 1 each) still usable as middles elsewhere;
    # the hub itself can still be an ENDPOINT of scored pairs
    eb = spark.createDataFrame([(0, 31)], "u long, v long")
    from graphina_spark.operators.links import common_neighbors

    assert common_neighbors(g, ebunch=eb, max_middle_degree=10).count() == 1
