"""Tests for k=3 clique percolation and DOULION sampled triangle counts."""

import pytest

from tests.conftest import make_graph


def _members(df):
    return sorted(map(tuple, df.collect()))


class TestTrianglePercolation:
    def test_two_separate_triangles(self, spark):
        # two vertex-disjoint triangles -> two communities
        g = make_graph(
            spark, [(0, 1), (1, 2), (0, 2), (10, 11), (11, 12), (10, 12)], directed=False
        )
        from graphina_spark.operators.percolation import triangle_percolation

        rows = _members(triangle_percolation(g))
        comms = {}
        for vid, c in rows:
            comms.setdefault(c, set()).add(vid)
        assert sorted(map(sorted, comms.values())) == [[0, 1, 2], [10, 11, 12]]

    def test_edge_shared_triangles_merge(self, spark):
        # triangles (0,1,2) and (1,2,3) share edge {1,2} -> one community
        g = make_graph(spark, [(0, 1), (1, 2), (0, 2), (1, 3), (2, 3)], directed=False)
        from graphina_spark.operators.percolation import triangle_percolation

        rows = _members(triangle_percolation(g))
        assert len({c for _, c in rows}) == 1
        assert sorted({v for v, _ in rows}) == [0, 1, 2, 3]

    def test_vertex_shared_triangles_stay_separate(self, spark):
        # bowtie: triangles (0,1,2) and (0,3,4) share only vertex 0 ->
        # two communities, vertex 0 belongs to both (overlap)
        g = make_graph(
            spark, [(0, 1), (1, 2), (0, 2), (0, 3), (3, 4), (0, 4)], directed=False
        )
        from graphina_spark.operators.percolation import triangle_percolation

        rows = _members(triangle_percolation(g))
        comms = {}
        for vid, c in rows:
            comms.setdefault(c, set()).add(vid)
        assert len(comms) == 2
        assert sorted(map(sorted, comms.values())) == [[0, 1, 2], [0, 3, 4]]

    def test_triangle_free_graph_empty(self, spark):
        g = make_graph(spark, [(0, 1), (1, 2), (2, 3)], directed=False)
        from graphina_spark.operators.percolation import triangle_percolation

        assert triangle_percolation(g).count() == 0

    def test_summary_sizes(self, spark):
        # chained pair (4 vertices, 5 edges, all in triangles) + lone triangle
        g = make_graph(
            spark,
            [(0, 1), (1, 2), (0, 2), (1, 3), (2, 3), (7, 8), (8, 9), (7, 9)],
            directed=False,
        )
        from graphina_spark.operators.percolation import percolation_summary

        rows = sorted(map(tuple, percolation_summary(g).collect()))
        sizes = sorted((nv, ne) for _, nv, ne in rows)
        assert sizes == [(3, 3), (4, 5)]


class TestSampledTriangles:
    def test_frac_one_is_exact(self, spark):
        g = make_graph(
            spark, [(0, 1), (1, 2), (0, 2), (1, 3), (2, 3), (7, 8)], directed=False
        )
        from graphina_spark.operators.triangles import sampled_triangle_count

        (m, t, est) = sampled_triangle_count(g, frac=1.0).first()
        assert m == 6 and t == 2 and est == pytest.approx(2.0)

    def test_deterministic_and_subsampled(self, spark):
        edges = [(i, (i * 7 + 1) % 30) for i in range(30)] + [
            (i, (i + 1) % 30) for i in range(30)
        ]
        g = make_graph(spark, edges, directed=False)
        from graphina_spark.operators.triangles import sampled_triangle_count

        a = tuple(sampled_triangle_count(g, frac=0.5).first())
        b = tuple(sampled_triangle_count(g, frac=0.5).first())
        assert a == b  # md5 coin -> run-to-run deterministic
        full = tuple(sampled_triangle_count(g, frac=1.0).first())
        assert a[0] < full[0]  # strictly fewer sampled edges at frac=0.5

    def test_estimate_scales_by_inverse_cube(self, spark):
        g = make_graph(spark, [(0, 1), (1, 2), (0, 2)], directed=False)
        from graphina_spark.operators.triangles import sampled_triangle_count

        (m, t, est) = sampled_triangle_count(g, frac=0.5).first()
        assert est == pytest.approx(t / 0.125)
