"""Funnel semantics: strict order, first-touch, same-second tie-breaks."""

import datetime as dt


def _ev(spark, rows):
    base = dt.datetime(2024, 1, 1)
    return spark.createDataFrame(
        [
            (e, base + dt.timedelta(seconds=s), u, t, 1.0, "{}")
            for e, u, s, t in rows
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )


def test_strict_order_and_first_touch(spark):
    from graphina_spark.operators.funnel import funnel_counts, funnel_stages

    rows = [
        # user 0: full funnel in order
        (1, 0, 10, "a"), (2, 0, 20, "b"), (3, 0, 30, "c"),
        # user 1: b before a — b must not count; reaches only stage 1
        (4, 1, 10, "b"), (5, 1, 20, "a"),
        # user 2: a then c (skips b) — stage 1
        (6, 2, 10, "a"), (7, 2, 20, "c"),
        # user 3: none of the steps
        (8, 3, 10, "x"),
        # user 4: a and b in the SAME second — eid order decides: b(eid 10)
        # after a(eid 9) → counts
        (9, 4, 50, "a"), (10, 4, 50, "b"),
        # user 5: same second but b's eid BEFORE a's → b does not count
        (12, 5, 50, "a"), (11, 5, 50, "b"),
    ]
    st = {
        r["uid"]: r["stage"]
        for r in funnel_stages(_ev(spark, rows), ["a", "b", "c"]).collect()
    }
    assert st == {0: 3, 1: 1, 2: 1, 3: 0, 4: 2, 5: 1}
    fc = {
        r["stage"]: r["n_users"]
        for r in funnel_counts(_ev(spark, rows), ["a", "b", "c"]).collect()
    }
    assert fc == {0: 1, 1: 3, 2: 1, 3: 1}
