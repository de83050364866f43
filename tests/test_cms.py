"""Tests for the count-min sketch operator."""


def _exact_counts(docs):
    from collections import Counter

    c = Counter()
    for _, text in docs:
        toks = [
            t
            for t in "".join(ch if ch.isalnum() else " " for ch in text.lower()).split()
            if t
        ]
        c.update(toks)
    return c


class TestCountMinSketch:
    DOCS = [
        (1, "alpha beta gamma alpha"),
        (2, "beta beta delta"),
        (3, "gamma alpha epsilon zeta eta theta iota kappa"),
    ]

    def test_total_mass_per_row(self, spark):
        # every sketch row sums to the total token count N
        from graphina_spark.operators.cms import cms_sketch

        docs = spark.createDataFrame(self.DOCS, "doc_id long, text string")
        cells = cms_sketch(docs, depth=3, width=16).collect()
        n_tokens = sum(_exact_counts(self.DOCS).values())
        by_row = {}
        for r in cells:
            by_row[r["r"]] = by_row.get(r["r"], 0) + r["cnt"]
        assert by_row == {0: n_tokens, 1: n_tokens, 2: n_tokens}

    def test_estimates_never_undercount(self, spark):
        from graphina_spark.operators.cms import cms_estimates

        docs = spark.createDataFrame(self.DOCS, "doc_id long, text string")
        exact = _exact_counts(self.DOCS)
        probes = spark.createDataFrame(
            [(t,) for t in exact] + [("missingtoken",)], "token string"
        )
        est = {r["token"]: r["est"] for r in cms_estimates(docs, probes, depth=4, width=8).collect()}
        for t, c in exact.items():
            assert est[t] >= c
        assert est["missingtoken"] >= 0

    def test_wide_sketch_is_exact(self, spark):
        # width >> vocab: collisions vanish, estimates equal exact counts
        from graphina_spark.operators.cms import cms_estimates

        docs = spark.createDataFrame(self.DOCS, "doc_id long, text string")
        exact = _exact_counts(self.DOCS)
        probes = spark.createDataFrame([(t,) for t in exact], "token string")
        est = {
            r["token"]: r["est"]
            for r in cms_estimates(docs, probes, depth=4, width=4096).collect()
        }
        assert est == dict(exact)

    def test_deterministic(self, spark):
        from graphina_spark.operators.cms import cms_sketch

        docs = spark.createDataFrame(self.DOCS, "doc_id long, text string")
        a = sorted(map(tuple, cms_sketch(docs).collect()))
        b = sorted(map(tuple, cms_sketch(docs).collect()))
        assert a == b
