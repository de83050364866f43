"""Distance metrics: exact diameter/radius/APL + ANF sketch.

Reference semantics: /root/reference/src/metrics/graph_metrics.rs —
diameter doctest (:27-39 path graph → 2), disconnected → None (:52-55),
average_path_length test (:466-477)."""

import pytest

from graphina_spark.operators.distmetrics import (
    anf_neighborhood_function,
    approx_distance_metrics,
    distance_metrics,
)
from tests.conftest import make_graph


def test_path_graph_exact(spark):
    # 0-1-2 path (graph_metrics.rs:27-39): diameter 2, radius 1, APL 8/6
    g = make_graph(spark, [(0, 1), (1, 2)], directed=False)
    row = distance_metrics(g).first()
    assert row["diameter"] == 2
    assert row["radius"] == 1
    assert row["avg_path_length"] == pytest.approx(8 / 6)


def test_disconnected_returns_nulls(spark):
    # two components → Option::None (graph_metrics.rs:52-55)
    g = make_graph(spark, [(0, 1), (2, 3)], directed=False)
    row = distance_metrics(g).first()
    assert row["diameter"] is None
    assert row["radius"] is None
    assert row["avg_path_length"] is None


def test_directed_uses_out_edges(spark):
    # directed chain is not strongly connected → None, like petgraph BFS
    g = make_graph(spark, [(0, 1), (1, 2)], directed=True)
    assert distance_metrics(g).first()["diameter"] is None
    # directed cycle IS strongly connected: diameter n-1
    c = make_graph(spark, [(0, 1), (1, 2), (2, 0)], directed=True)
    row = distance_metrics(c).first()
    assert row["diameter"] == 2
    assert row["radius"] == 2


def test_max_depth_truncation_guard(spark):
    # depth below the diameter makes far pairs unreachable → nulls, never a
    # silently-wrong finite diameter
    g = make_graph(spark, [(0, 1), (1, 2), (2, 3), (3, 4)], directed=False)
    assert distance_metrics(g, max_depth=2).first()["diameter"] is None
    assert distance_metrics(g, max_depth=4).first()["diameter"] == 4


def test_anf_curve_monotone_and_plateaus(spark):
    # ring of 12: NF strictly grows until the 6-hop cover, then plateaus
    n = 12
    g = make_graph(spark, [(i, (i + 1) % n) for i in range(n)], directed=False)
    curve = sorted(
        anf_neighborhood_function(g, k=8, max_depth=20).collect(),
        key=lambda r: r["r"],
    )
    vals = [r["nf"] for r in curve]
    assert all(b >= a for a, b in zip(vals, vals[1:]))
    assert curve[-1]["r"] <= 8  # plateau detected at ~diameter rounds


def test_anf_estimate_tolerance(spark):
    """Sketch total reachability within a loose FM envelope of exact: on a
    connected 60-ring the true NF(∞) is 60², and k=8 registers keep the
    (bias-corrected) estimate within ±60%."""
    n = 60
    g = make_graph(spark, [(i, (i + 1) % n) for i in range(n)], directed=False)
    curve = anf_neighborhood_function(g, k=8, max_depth=n).collect()
    last = max(r["nf"] for r in curve)
    assert 0.4 * n * n <= last <= 1.6 * n * n


def test_approx_metrics_shape(spark):
    n = 30
    g = make_graph(spark, [(i, (i + 1) % n) for i in range(n)], directed=False)
    row = approx_distance_metrics(g, k=8, max_depth=n).first()
    # ring true diameter 15, APL ~7.76; sketch readouts land in the ballpark
    assert 5.0 <= row["effective_diameter"] <= 16.0
    assert 3.0 <= row["avg_path_length"] <= 13.0


def test_fixed_rounds_emits_every_point(spark):
    g = make_graph(spark, [(0, 1), (1, 2), (2, 0)], directed=False)
    curve = anf_neighborhood_function(g, k=4, fixed_rounds=5).collect()
    assert sorted(r["r"] for r in curve) == [0, 1, 2, 3, 4, 5]
