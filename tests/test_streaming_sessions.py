"""Streaming sessionization: session_window aggregation over a file-source
events stream must agree with the batch sessionizer (operators/sessions.py)
on session count, per-session event counts, and durations — on fixtures with
no exact-gap boundary deltas (where the two contracts differ by design, see
streaming/sessions.py docstring)."""

import datetime as dt

from pyspark.sql import functions as F

from graphina_spark.streaming.sessions import (
    stream_events,
    streaming_session_stats,
)

GAP_S = 3600


def _write_events(spark, path: str):
    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # 3 users; sessions split by gaps of 2h (> gap), intra-session deltas
    # of 10-50 min (< gap); no delta is ever exactly 3600s
    for u in range(3):
        t = u * 137
        for sess in range(3):
            for k in range(2 + (u + sess) % 3):
                rows.append((eid, u, t, f"t{k % 2}"))
                eid += 1
                t += 600 + 37 * ((u + k) % 4)
            t += 7200 + 61 * u
    df = spark.createDataFrame(
        [
            (e, base + dt.timedelta(seconds=s), u, ty, 1.0, "{}")
            for e, u, s, ty in rows
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    # two files → two micro-batches
    df.where("event_id % 2 = 0").coalesce(1).write.parquet(path, mode="append")
    df.where("event_id % 2 = 1").coalesce(1).write.parquet(path, mode="append")
    return df


def test_streaming_sessions_match_batch(spark, tmp_path):
    events_dir = str(tmp_path / "events")
    batch_df = _write_events(spark, events_dir)

    agg = streaming_session_stats(
        stream_events(spark, events_dir, max_files=1),
        gap=f"{GAP_S} seconds",
        watermark="0 seconds",
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("sess_test")
        .outputMode("complete")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = spark.sql(
        "SELECT user_id, n_events, duration_s FROM sess_test"
    ).collect()

    from graphina_spark.operators.sessions import session_stats

    want = session_stats(
        spark.read.parquet(events_dir), gap_s=GAP_S
    ).collect()

    def key(rows):
        return sorted((r[0], r[1], r[2]) for r in rows)

    got_k = key([(r["user_id"], r["n_events"], r["duration_s"]) for r in got])
    want_k = key([(r["uid"], r["n_events"], r["duration_s"]) for r in want])
    assert got_k == want_k
    assert len(got_k) == 9  # 3 users × 3 sessions
    # conservation: every event landed in exactly one session
    assert sum(k[1] for k in got_k) == batch_df.count()
