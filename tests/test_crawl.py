"""crawl_schedule: politeness cap, global budget, deterministic priority."""

from conftest import make_graph

from graphina_spark.operators.crawl import crawl_schedule


def _schedule(spark, edges, n, **kw):
    g = make_graph(spark, edges, n=n)
    return sorted(
        map(tuple, crawl_schedule(g, **kw).collect()),
        key=lambda r: (-r[2], r[1]),
    )


def test_priority_is_indegree_times_age(spark):
    # star onto vertex 1: w_in(1)=3; age(1) = (1*13)%30+1 = 14.
    rows = _schedule(spark, [(0, 1), (2, 1), (3, 1)], n=4,
                     host_mod=64, per_host=10, budget=100)
    by_id = {r[1]: r for r in rows}
    assert by_id[1][2] == 3 * 14
    # vertices with no in-links enter at priority 0 (frontier completeness)
    assert by_id[0][2] == 0 and len(rows) == 4


def test_per_host_cap(spark):
    # host_mod=2: even/odd ids split into two hosts; 6 vertices, cap 2/host.
    edges = [(i, j) for i in range(6) for j in range(6) if i != j]
    rows = _schedule(spark, edges, n=6, host_mod=2, per_host=2, budget=100)
    assert len(rows) == 4
    hosts = [r[0] for r in rows]
    assert hosts.count(0) == 2 and hosts.count(1) == 2
    assert all(r[3] <= 2 for r in rows)  # slot is the within-host rank


def test_global_budget_takes_top_priorities(spark):
    edges = [(0, 1), (2, 1), (3, 1), (0, 2)]  # w_in: 1→3, 2→1
    rows = _schedule(spark, edges, n=4, host_mod=64, per_host=10, budget=1)
    assert len(rows) == 1
    assert rows[0][1] == 1  # highest priority page wins the single slot


def test_deterministic_tiebreak_by_id(spark):
    # all-zero priorities: ordering falls back to id asc within the budget.
    rows = _schedule(spark, [], n=5, host_mod=1, per_host=10, budget=3)
    assert [r[1] for r in rows] == [0, 1, 2]
