"""As-of join semantics: backward-inclusive, left-outer, tolerance, ties."""

from pyspark.sql import functions as F

from graphina_spark.operators.asof import asof_join


def _mk(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_backward_inclusive_basic(spark):
    left = _mk(
        spark,
        [(1, 5.0, "a"), (1, 10.0, "b"), (1, 2.0, "c"), (2, 7.0, "d")],
        "k long, ts double, tag string",
    )
    right = _mk(
        spark,
        [(1, 5.0, 100.0), (1, 8.0, 200.0), (2, 9.0, 300.0)],
        "k long, ts double, v double",
    )
    out = {
        r["tag"]: (r["asof_v"], r["asof_ts"])
        for r in asof_join(left, right, by="k").collect()
    }
    assert out["a"] == (100.0, 5.0)  # inclusive: equal ts matches
    assert out["b"] == (200.0, 8.0)  # most recent prior
    assert out["c"] == (None, None)  # nothing at-or-before → null (left outer)
    assert out["d"] == (None, None)  # right exists but only later


def test_tolerance_nulls_stale_matches(spark):
    left = _mk(spark, [(1, 100.0, "x"), (1, 20.0, "y")], "k long, ts double, tag string")
    right = _mk(spark, [(1, 10.0, 1.0)], "k long, ts double, v double")
    out = {
        r["tag"]: r["asof_v"]
        for r in asof_join(left, right, by="k", tolerance_s=15).collect()
    }
    assert out["x"] is None  # 90s stale > 15s tolerance
    assert out["y"] == 1.0  # 10s within tolerance


def test_duplicate_right_ts_tie_break_deterministic(spark):
    left = _mk(spark, [(1, 5.0, "a")], "k long, ts double, tag string")
    right = _mk(
        spark,
        [(1, 5.0, 10.0, 111), (1, 5.0, 20.0, 222)],
        "k long, ts double, v double, rid long",
    )
    for _ in range(2):
        rows = asof_join(
            left, right, by="k", value_cols=["v", "rid"], tie_break="rid"
        ).collect()
        assert rows[0]["asof_rid"] == 222 and rows[0]["asof_v"] == 20.0


def test_matches_duckdb_asof_join(spark):
    """Pin the operator against DuckDB's native ASOF LEFT JOIN on a seeded
    random instance — the engine-native oracle, not a mirror of this code."""
    import random

    import duckdb

    rng = random.Random(7)
    lrows = [(rng.randint(1, 5), float(rng.randint(0, 100)), i) for i in range(200)]
    rrows = [(rng.randint(1, 5), float(rng.randint(0, 100)), i, float(i)) for i in range(60)]
    left = _mk(spark, lrows, "k long, ts double, lid long")
    right = _mk(spark, rrows, "k long, ts double, rid long, v double")
    got = sorted(
        (r["lid"], r["asof_rid"], r["asof_v"])
        for r in asof_join(
            left, right, by="k", value_cols=["rid", "v"], tie_break="rid"
        ).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE l(k BIGINT, ts DOUBLE, lid BIGINT)")
    con.execute("CREATE TABLE r0(k BIGINT, ts DOUBLE, rid BIGINT, v DOUBLE)")
    con.executemany("INSERT INTO l VALUES (?,?,?)", lrows)
    con.executemany("INSERT INTO r0 VALUES (?,?,?,?)", rrows)
    want = sorted(
        map(
            tuple,
            con.execute(
                """WITH r AS (
                     SELECT k, ts, rid, v FROM (
                       SELECT *, row_number() OVER (PARTITION BY k, ts
                                                    ORDER BY rid DESC) rn
                       FROM r0) WHERE rn = 1)
                   SELECT l.lid, r.rid, r.v
                   FROM l ASOF LEFT JOIN r ON l.k = r.k AND l.ts >= r.ts"""
            ).fetchall(),
        )
    )
    assert got == want


def test_left_columns_preserved_and_ts_carried(spark):
    left = _mk(spark, [(1, 3.0, "z", 9)], "k long, ts double, tag string, extra long")
    right = _mk(spark, [(1, 1.0, 5.0)], "k long, ts double, v double")
    row = asof_join(left, right, by="k").collect()[0]
    assert row["tag"] == "z" and row["extra"] == 9 and row["ts"] == 3.0
    assert row["asof_ts"] == 1.0 and row["asof_v"] == 5.0
    # weights of determinism: rerun gives identical result
    row2 = asof_join(left, right, by="k").collect()[0]
    assert row.asDict() == row2.asDict()


def test_parallelism_independent(spark):
    import random

    rng = random.Random(3)
    lrows = [(rng.randint(1, 4), float(rng.randint(0, 50)), i) for i in range(300)]
    rrows = [(rng.randint(1, 4), float(rng.randint(0, 50)), i, float(i * 2)) for i in range(80)]
    left = _mk(spark, lrows, "k long, ts double, lid long")
    right = _mk(spark, rrows, "k long, ts double, rid long, v double")

    def run(parts):
        old = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", str(parts))
        try:
            return sorted(
                (r["lid"], r["asof_rid"], r["asof_v"])
                for r in asof_join(
                    left.repartition(parts),
                    right.repartition(parts),
                    by="k",
                    value_cols=["rid", "v"],
                    tie_break="rid",
                ).collect()
            )
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", old)

    assert run(2) == run(7)
