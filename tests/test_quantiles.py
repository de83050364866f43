"""Exact quantiles: percentile_disc semantics, boundary exactness, ties."""

from graphina_spark.operators.quantiles import exact_quantiles


def _vals(spark, xs):
    return spark.createDataFrame([(int(x),) for x in xs], "v long")


def _q(spark, xs, q=10):
    rows = exact_quantiles(_vals(spark, xs), "v", q=q).collect()
    return {r["k"]: r["value"] for r in rows}


def test_deciles_of_1_to_100(spark):
    # ceil(k*100/10) = 10k → value 10k exactly (the float-ceil trap case)
    got = _q(spark, range(1, 101))
    assert got == {k: 10 * k for k in range(1, 10)}


def test_quartiles_small(spark):
    # n=5, ranks ceil(5k/4) = 2,3,4 → values 2,3,4
    assert _q(spark, [1, 2, 3, 4, 5], q=4) == {1: 2, 2: 3, 3: 4}


def test_ties_collapse_to_same_value(spark):
    got = _q(spark, [7] * 50 + [9] * 50)
    assert got == {k: (7 if k <= 5 else 9) for k in range(1, 10)}


def test_median_of_even_n_is_lower_middle(spark):
    # percentile_disc(0.5) on [1,2,3,4]: rank ceil(2) = 2 → value 2
    assert _q(spark, [1, 2, 3, 4], q=2) == {1: 2}


def test_single_value(spark):
    assert _q(spark, [42]) == {k: 42 for k in range(1, 10)}
