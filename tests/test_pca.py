"""Power-iteration top component — convergence on a planted dominant axis."""

import math

import pytest

from graphina_spark.operators.pca import top_component


def test_recovers_planted_direction(spark):
    # points hugely stretched along (1/sqrt(2))(e0 + e1): the top Gram
    # eigenvector must align with it
    rows = []
    for i in range(40):
        t = (i - 20) * 10.0
        rows.append((i, [t, t, 0.1 * ((i * 7) % 5 - 2), 0.05 * ((i * 3) % 7 - 3)]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["pos"]: r for r in top_component(df, iters=8).collect()}
    v = [out[i]["v"] for i in range(4)]
    s = 1 / math.sqrt(2)
    assert abs(abs(v[0]) - s) < 1e-3 and abs(abs(v[1]) - s) < 1e-3
    assert abs(v[2]) < 1e-2 and abs(v[3]) < 1e-2
    # sign convention: first nonzero coordinate positive
    assert v[0] > 0
    # unit norm
    assert abs(sum(c * c for c in v) - 1.0) < 1e-4
    # eigenvalue ≈ mean squared projection ≈ mean of 2t² over rows
    expect = sum((2 * ((i - 20) * 10.0) ** 2) for i in range(40)) / 40
    assert abs(out[0]["eigenvalue"] - expect) / expect < 1e-2


def test_errors(spark):
    df = spark.createDataFrame([(0, [1.0])], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError):
        top_component(df, iters=0)
