"""plans/argmax.py — map-side-combining argmax strategies: equality with
the window reference, tie-break direction, packed-bound dispatch, carry
columns, plan shapes."""

import pytest
from pyspark.sql import functions as F

from graphina_spark.plans.argmax import (
    P31,
    _fits,
    argmax_any,
    argmax_long,
    argmin_any,
)


def _frame(spark, rows):
    return spark.createDataFrame(rows, "key long, score long, tie long")


ROWS = [
    # key 0: clear max
    (0, 5, 9),
    (0, 3, 1),
    # key 1: score tie -> smallest tie wins
    (1, 7, 4),
    (1, 7, 2),
    (1, 6, 0),
    # key 2: single row
    (2, 0, 0),
    # key 3: zero scores, tie-break only
    (3, 0, 8),
    (3, 0, 3),
]
EXPECT = {0: (5, 9), 1: (7, 2), 2: (0, 0), 3: (0, 3)}


@pytest.mark.parametrize("strategy", ["packed", "struct", "window"])
def test_strategies_match_expected(spark, strategy):
    out = argmax_long(_frame(spark, ROWS), "key", "score", "tie",
                      out_score="s", out_tie="t", strategy=strategy)
    got = {r["key"]: (r["s"], r["t"]) for r in out.collect()}
    assert got == EXPECT


def test_fits_dispatch():
    # 31-bit score and tie pack (the default bounds)
    assert _fits(P31 - 1, P31 - 1) == P31
    # trillion-scale tie no longer packs next to a large score
    assert _fits(10**12, 10**12) is None
    # small tie leaves plenty of score headroom
    assert _fits(10**12, 7) == 8
    assert _fits((1 << 62), 1) is None


def test_auto_uses_struct_when_bounds_do_not_fit(spark):
    df = _frame(spark, ROWS)
    out = argmax_long(df, "key", "score", "tie", out_score="s", out_tie="t",
                      max_score=1 << 61, max_tie=1 << 61)
    got = {r["key"]: (r["s"], r["t"]) for r in out.collect()}
    assert got == EXPECT
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan


def test_packed_raises_when_bounds_do_not_fit(spark):
    with pytest.raises(ValueError, match="63 bits"):
        argmax_long(_frame(spark, ROWS), "key", "score", "tie",
                    max_score=1 << 61, max_tie=1 << 61, strategy="packed")


def test_boundary_values(spark):
    # largest representable score/tie at the default 31-bit bounds —
    # packing must stay lossless at the documented boundary
    m = P31 - 1
    rows = [(0, m, m), (0, m, 0), (0, m - 1, m), (1, 0, m), (1, 0, m - 1)]
    out = argmax_long(_frame(spark, rows), "key", "score", "tie",
                      out_score="s", out_tie="t", strategy="packed")
    got = {r["key"]: (r["s"], r["t"]) for r in out.collect()}
    assert got == {0: (m, 0), 1: (0, m - 1)}


def test_wide_score_narrow_tie_packs(spark):
    # dynamic split: a 2^40-scale score still packs when the tie is small
    big = 1 << 40
    rows = [(0, big, 3), (0, big, 1), (0, big - 1, 0)]
    out = argmax_long(_frame(spark, rows), "key", "score", "tie",
                      out_score="s", out_tie="t",
                      max_score=big, max_tie=3, strategy="packed")
    assert [tuple(r) for r in out.collect()] == [(0, big, 1)]


def test_without_score_column(spark):
    out = argmax_long(_frame(spark, ROWS), "key", "score", "tie",
                      out_tie="best")
    got = {r["key"]: r["best"] for r in out.collect()}
    assert got == {k: v[1] for k, v in EXPECT.items()}
    assert out.columns == ["key", "best"]


def test_packed_plan_is_hash_aggregate(spark):
    # the whole point of the packed encoding: HashAggregate, no sort and no
    # window exchange anywhere in the plan
    out = argmax_long(_frame(spark, ROWS), "key", "score", "tie",
                      out_score="s", strategy="packed")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" in plan
    assert "SortAggregate" not in plan
    assert "Window" not in plan


def test_struct_plan_is_partial_aggregate(spark):
    # struct max plans SortAggregate (struct is not a mutable buffer) but
    # MUST keep the partial/final split — the map-side combine is what
    # makes it viable (plans/argmax.py module docstring) — and no Window
    out = argmax_long(_frame(spark, ROWS), "key", "score", "tie",
                      out_score="s", strategy="struct")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("SortAggregate") >= 2  # partial + final
    assert "Window" not in plan


def test_argmax_any_double_scores(spark):
    rows = [(0, 1.5, 9), (0, 1.5, 2), (0, 0.5, 0), (1, -3.25, 7),
            (1, -3.25, 4)]
    df = spark.createDataFrame(rows, "key long, score double, tie long")
    out = argmax_any(df, "key", "score", "tie", out_score="s", out_tie="t")
    got = {r["key"]: (r["s"], r["t"]) for r in out.collect()}
    assert got == {0: (1.5, 2), 1: (-3.25, 4)}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan


def test_argmin_any(spark):
    rows = [(0, 2.5, 9), (0, 2.5, 2), (0, 7.0, 0), (1, -1.0, 4), (1, 0.0, 1)]
    df = spark.createDataFrame(rows, "key long, score double, tie long")
    out = argmin_any(df, "key", "score", "tie", out_score="s", out_tie="t")
    got = {r["key"]: (r["s"], r["t"]) for r in out.collect()}
    assert got == {0: (2.5, 2), 1: (-1.0, 4)}


def test_argmax_any_carry(spark):
    rows = [(0, 1.0, 5, 77), (0, 2.0, 3, 77), (1, 4.0, 8, 42)]
    df = spark.createDataFrame(rows, "key long, score double, tie long, c long")
    out = argmax_any(df, "key", "score", "tie", out_tie="t", carry=["c"])
    got = {r["key"]: (r["t"], r["c"]) for r in out.collect()}
    assert got == {0: (3, 77), 1: (8, 42)}


def test_argmin_any_array_carry(spark):
    # kmeans carries the vector column through the argmin
    rows = [(0, 2.0, 1, [1.0, 2.0]), (0, 1.0, 2, [1.0, 2.0])]
    df = spark.createDataFrame(
        rows, "key long, score double, tie long, v array<double>"
    )
    out = argmin_any(df, "key", "score", "tie", out_tie="t", carry=["v"])
    r = out.collect()[0]
    assert (r["key"], r["t"], list(r["v"])) == (0, 2, [1.0, 2.0])


@pytest.mark.parametrize("seed", [1, 2])
def test_randomized_strategy_equality(spark, seed):
    import random

    rng = random.Random(seed)
    rows = [
        (rng.randrange(20), rng.randrange(1000), rng.randrange(1000))
        for _ in range(400)
    ]
    df = _frame(spark, rows)
    ref = sorted(
        map(tuple, argmax_long(df, "key", "score", "tie", out_score="s",
                               out_tie="t", strategy="window").collect())
    )
    for strategy in ("packed", "struct"):
        got = sorted(
            map(tuple, argmax_long(df, "key", "score", "tie", out_score="s",
                                   out_tie="t", strategy=strategy).collect())
        )
        assert got == ref, strategy
