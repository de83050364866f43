"""Cohort retention invariants."""

import datetime as dt

from pyspark.sql import functions as F


def _ev(spark, rows):
    base = dt.datetime(2024, 1, 1)
    return spark.createDataFrame(
        [
            (e, base + dt.timedelta(seconds=s), u, "view", 1.0, "{}")
            for e, u, s in rows
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )


def test_exact_triangle(spark):
    from graphina_spark.operators.retention import cohort_retention

    D = 86_400
    rows = [
        # user 0: days 0, 1, 3  (cohort d0)
        (1, 0, 0), (2, 0, D + 5), (3, 0, 3 * D + 5),
        # user 1: day 0 only
        (4, 1, 10),
        # user 2: days 1, 2     (cohort d1)
        (5, 2, D + 20), (6, 2, 2 * D + 20),
        # user 3: two events same day — counted once per period
        (7, 3, 40), (8, 3, 50),
    ]
    got = {
        (r["cohort"] % 1000, r["offset"]): r["n_users"]
        for r in cohort_retention(_ev(spark, rows), period_s=D).collect()
    }
    # cohorts are absolute day indexes from 2000-01-01; compare mod 1000
    # relative to the base day
    base_day = (dt.datetime(2024, 1, 1) - dt.datetime(2000, 1, 1)).days % 1000
    rel = {(c - base_day, o): n for (c, o), n in got.items()}
    assert rel == {
        (0, 0): 3,  # users 0, 1, 3 first-touch day 0
        (0, 1): 1,  # user 0 active day 1
        (0, 3): 1,  # user 0 active day 3
        (1, 0): 1,  # user 2 cohort day 1
        (1, 1): 1,  # user 2 active day 2
    }


def test_offset0_equals_cohort_sizes(spark, sf_dir):
    from graphina_spark.operators.retention import cohort_retention

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    r = cohort_retention(ev, period_s=86_400)
    offset0 = r.where(F.col("offset") == 0).agg(F.sum("n_users")).first()[0]
    n_users = ev.select("user_id").distinct().count()
    assert offset0 == n_users  # every user appears in exactly one cohort
    assert r.where(F.col("offset") < 0).count() == 0
