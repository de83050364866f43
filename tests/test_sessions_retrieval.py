"""Property tests for sessionization, butterfly counting, and BM25.

The driver-gate arithmetic parity lives in test_oracle_parity.py
(session_stats / butterflies_events / bm25_docs); these tests pin the
semantic invariants on hand-built fixtures where the expected answer is
computable by hand or brute force.
"""

import datetime as dt
import math
from itertools import combinations

from pyspark.sql import functions as F


def _events_df(spark, rows):
    """rows: (event_id, user_id, seconds_offset, event_type)."""
    base = dt.datetime(2024, 1, 1)
    data = [
        (int(e), int(u), base + dt.timedelta(seconds=int(s)), t)
        for e, u, s, t in rows
    ]
    return spark.createDataFrame(
        data, "event_id long, user_id long, ts timestamp, event_type string"
    )


class TestSessionize:
    def test_gap_boundaries(self, spark):
        from graphina_spark.operators.sessions import sessionize

        # user 1: gaps of exactly gap (same session) and gap+1 (new session)
        ev = _events_df(
            spark,
            [
                (1, 1, 0, "a"),
                (2, 1, 100, "a"),      # gap 100 <= 100 → same session
                (3, 1, 201, "b"),      # gap 101 > 100 → new session
                (4, 2, 50, "a"),       # other user independent
            ],
        )
        got = {
            (r["eid"], r["session_idx"])
            for r in sessionize(ev, gap_s=100).collect()
        }
        assert got == {(1, 1), (2, 1), (3, 2), (4, 1)}

    def test_sessions_partition_events(self, spark, sf_dir):
        from graphina_spark.operators.sessions import sessionize

        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        s = sessionize(ev, gap_s=3600)
        assert s.count() == ev.count()
        # session_idx is dense 1..max per user
        per_user = s.groupBy("uid").agg(
            F.countDistinct("session_idx").alias("ns"),
            F.max("session_idx").alias("mx"),
            F.min("session_idx").alias("mn"),
        )
        bad = per_user.where(
            (F.col("mn") != 1) | (F.col("mx") != F.col("ns"))
        ).count()
        assert bad == 0

    def test_stats_durations_nonnegative(self, spark, sf_dir):
        from graphina_spark.operators.sessions import session_stats

        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        st = session_stats(ev, gap_s=3600)
        assert st.where(F.col("duration_s") < 0).count() == 0
        assert st.where(F.col("n_events") < 1).count() == 0
        # total events conserved
        total = st.agg(F.sum("n_events")).collect()[0][0]
        assert total == ev.count()


class TestButterflies:
    def test_brute_force_parity(self, spark):
        from graphina_spark.operators.butterflies import user_butterflies

        # deterministic bipartite incidence: user u active in window w
        # iff (u*7 + w*11) % 5 < 2, u in 0..9, w in 0..11
        rows, inc = [], {}
        eid = 0
        for u in range(10):
            for w in range(12):
                if (u * 7 + w * 11) % 5 < 2:
                    rows.append((eid, u, w * 3600 + 5, "a"))
                    inc.setdefault(u, set()).add(w)
                    eid += 1
        ev = _events_df(spark, rows)
        expected = {}
        for u in inc:
            c = 0
            for v in inc:
                if v == u:
                    continue
                shared = len(inc[u] & inc[v])
                c += shared * (shared - 1) // 2
            expected[u] = c
        got = {
            r["id"]: r["butterflies"]
            for r in user_butterflies(ev, window_s=3600).collect()
        }
        assert got == expected

    def test_global_count_even_sum(self, spark, sf_dir):
        # Σ_u butterflies(u) = 2 · (number of butterflies counted per pair)
        from graphina_spark.operators.butterflies import user_butterflies

        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        total = (
            user_butterflies(ev).agg(F.sum("butterflies")).collect()[0][0]
        )
        assert total % 2 == 0


class TestBM25:
    def test_exact_tiny_corpus(self, spark):
        from graphina_spark.operators.retrieval import bm25_scores

        docs = spark.createDataFrame(
            [
                (0, "cat dog cat", "en", "s", 11),
                (1, "dog dog dog dog", "en", "s", 15),
                (2, "fish", "en", "s", 4),
            ],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        got = {
            r["doc_id"]: r["score"]
            for r in bm25_scores(docs, ["cat"], k1=1.2, b=0.75).collect()
        }
        # N=3, df(cat)=1 → idf = ln(1 + 2.5/1.5); doc 0: tf=2, dl=3, avgdl=8/3
        idf = math.log(1 + 2.5 / 1.5)
        dl, avgdl = 3.0, 8.0 / 3.0
        expect = idf * (2 * 2.2) / (2 + 1.2 * (0.25 + 0.75 * dl / avgdl))
        assert set(got) == {0}
        assert abs(got[0] - expect) < 1e-12

    def test_topk_deterministic_and_ordered(self, spark, sf_dir):
        from graphina_spark.operators.retrieval import bm25_topk

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        a = bm25_topk(docs, ["dup", "spark"], k=10).collect()
        b = bm25_topk(docs, ["dup", "spark"], k=10).collect()
        assert [tuple(r) for r in a] == [tuple(r) for r in b]
        scores = [r["score"] for r in sorted(a, key=lambda r: r["rnk"])]
        assert scores == sorted(scores, reverse=True)


def test_rrf_fuse_known_values(spark):
    from pyspark.sql import functions as F

    from graphina_spark.operators.retrieval import rrf_fuse

    a = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3)],
        "query_id long, neighbor_id long, rank int",
    )
    b = spark.createDataFrame(
        [(1, 11, 1), (1, 13, 2), (1, 10, 3)],
        "query_id long, neighbor_id long, rank int",
    )
    got = {r["doc_id"]: (r["rrf"], r["rank"])
           for r in rrf_fuse([a, b], k=60).collect()}
    exp = {
        10: 1 / 61 + 1 / 63,
        11: 1 / 62 + 1 / 61,
        12: 1 / 63,
        13: 1 / 62,
    }
    for d, v in exp.items():
        assert abs(got[d][0] - round(v, 6)) < 1e-9
    # doc 11 (ranks 2+1) outranks doc 10 (ranks 1+3); 13 beats 12
    order = sorted(got, key=lambda d: got[d][1])
    assert order == [11, 10, 13, 12]


def test_rrf_fuse_deterministic_ties(spark):
    from graphina_spark.operators.retrieval import rrf_fuse

    a = spark.createDataFrame(
        [(1, 20, 1), (1, 21, 2)], "query_id long, neighbor_id long, rank int"
    )
    b = spark.createDataFrame(
        [(1, 21, 1), (1, 20, 2)], "query_id long, neighbor_id long, rank int"
    )
    got = {r["doc_id"]: r["rank"] for r in rrf_fuse([a, b], k=60).collect()}
    # equal rrf -> min doc id first
    assert got == {20: 1, 21: 2}
