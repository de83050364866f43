"""4-motif census vs brute-force subgraph enumeration on small fixtures."""

from itertools import combinations

import pytest

from graphina_spark.operators.motifs import four_motif_census
from tests.conftest import make_graph

# a K4 (0-3), a triangle with a tail (4,5,6 + pendant 7), a path (8-9-10-11)
EDGES = (
    [(a, b) for a in range(4) for b in range(a + 1, 4)]
    + [(4, 5), (5, 6), (6, 4), (6, 7)]
    + [(8, 9), (9, 10), (10, 11)]
    + [(0, 4)]  # bridge
)
N = 12


def _brute(edges, n):
    nb = {i: set() for i in range(n)}
    es = set()
    for s, d in edges:
        if s == d:
            continue
        nb[s].add(d)
        nb[d].add(s)
        es.add((min(s, d), max(s, d)))

    def deg(v):
        return len(nb[v])

    def adj(a, b):
        return (min(a, b), max(a, b)) in es

    tris = [
        t for t in combinations(range(n), 3) if adj(t[0], t[1]) and adj(t[1], t[2]) and adj(t[0], t[2])
    ]
    wedges = sum(deg(v) * (deg(v) - 1) // 2 for v in range(n))
    star3 = sum(deg(v) * (deg(v) - 1) * (deg(v) - 2) // 6 for v in range(n))
    # 3-edge paths as subgraphs: ordered walks a-b-c-d with distinct vertices
    path3 = 0
    for a in range(n):
        for b in nb[a]:
            for c in nb[b]:
                if c == a:
                    continue
                for d in nb[c]:
                    if d not in (a, b):
                        path3 += 1
    path3 //= 2
    tailed = sum(sum(deg(v) - 2 for v in t) for t in tris)
    diamond = sum(
        len(nb[u] & nb[v]) * (len(nb[u] & nb[v]) - 1) // 2 for u, v in es
    )
    k4 = sum(
        1
        for q in combinations(range(n), 4)
        if all(adj(a, b) for a, b in combinations(q, 2))
    )
    return {
        "wedges": wedges,
        "star3": star3,
        "path3": path3,
        "tailed_tri": tailed,
        "diamond": diamond,
        "k4": k4,
        "triangles": len(tris),
    }


def test_census_matches_bruteforce(spark):
    g = make_graph(spark, EDGES, n=N, directed=False)
    row = four_motif_census(g).first().asDict()
    assert row == _brute(EDGES, N)


def test_census_k5_closed_form(spark):
    # K5: wedges = 5*C(4,2)=30, star3 = 5*C(4,3)=20, triangles = C(5,3)=10,
    # k4 = C(5,4)=5, diamond = 10 edges * C(3,2)=3 -> 30,
    # tailed = 10 triangles * 3 vertices * (4-2) = 60,
    # path3 = 5!/2 / 2 ... brute-force checks it anyway
    edges = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    g = make_graph(spark, edges, n=5, directed=False)
    row = four_motif_census(g).first().asDict()
    assert row == _brute(edges, 5)
    assert (row["k4"], row["triangles"], row["star3"]) == (5, 10, 20)


def test_census_directed_projection_and_selfloops(spark):
    # directed multigraph: antiparallel + self-loop collapse to simple edges
    g = make_graph(spark, [(0, 1), (1, 0), (1, 2), (2, 0), (3, 3)], n=4, directed=True)
    row = four_motif_census(g).first().asDict()
    assert row == _brute([(0, 1), (1, 2), (2, 0)], 4)
