"""Clickstream transition-matrix invariants."""

import datetime as dt

from pyspark.sql import functions as F


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


def test_session_boundary_breaks_chain(spark):
    from graphina_spark.operators.transitions import session_transitions

    rows = [
        (1, 0, 0, "a"), (2, 0, 10, "b"),        # a→b in session 1
        (3, 0, 100_000, "c"), (4, 0, 100_010, "a"),  # c→a in session 2
        (5, 1, 0, "b"), (6, 1, 5, "b"),          # b→b other user
    ]
    got = {
        (r["cur"], r["nxt"]): (r["n"], r["p"])
        for r in session_transitions(_ev(spark, rows), gap_s=3600).collect()
    }
    # NO b→c pair (sessions 1/2 of user 0 are separate chains)
    assert got == {
        ("a", "b"): (1, 1.0),
        ("c", "a"): (1, 1.0),
        ("b", "b"): (1, 1.0),
    }


def test_rows_normalize_to_one(spark, sf_dir):
    from graphina_spark.operators.transitions import session_transitions

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    t = session_transitions(ev)
    sums = t.groupBy("cur").agg(F.round(F.sum("p"), 4).alias("s")).collect()
    assert len(sums) > 0
    for r in sums:
        assert abs(r["s"] - 1.0) < 1e-3  # rounded p's still sum to ~1
    # pair count conservation: Σ n = Σ (session length − 1)
    from graphina_spark.operators.sessions import session_stats

    n_pairs = t.agg(F.sum("n")).first()[0]
    st = session_stats(ev)
    want = st.agg(F.sum(F.col("n_events") - 1)).first()[0]
    assert n_pairs == want
