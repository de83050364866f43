"""RFM scoring — closed-form quintiles on a synthetic event log."""

from datetime import datetime

import pytest

from graphina_spark.operators.rfm import rfm_scores


def _ts(day):
    return datetime(2000, 1, 1 + day)


@pytest.fixture(scope="module")
def events(spark):
    rows = []
    eid = 0
    # 10 users; user u has u+1 events, last one on day u, each worth 10.0
    for u in range(10):
        for i in range(u + 1):
            rows.append((eid, _ts(u if i == 0 else 0), u, "click", 10.0, ""))
            eid += 1
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )


def test_metrics_and_quintiles(events):
    out = {r["uid"]: r for r in rfm_scores(events).collect()}
    assert len(out) == 10
    # horizon is day 9 (user 9's last event); user 9 recency 0, user 0 = 9 days
    assert out[9]["recency_days"] == 0 and out[0]["recency_days"] == 9
    assert out[3]["frequency"] == 4
    assert out[5]["monetary"] == 60.0
    # monotone scores: user 9 best on all three axes, user 0 worst
    assert (out[9]["r"], out[9]["f"], out[9]["m"]) == (5, 5, 5)
    assert (out[0]["r"], out[0]["f"], out[0]["m"]) == (1, 1, 1)
    # quintiles over 10 users: exactly 2 users per score value per axis
    for axis in ("r", "f", "m"):
        counts = {}
        for r in out.values():
            counts[r[axis]] = counts.get(r[axis], 0) + 1
        assert counts == {1: 2, 2: 2, 3: 2, 4: 2, 5: 2}
