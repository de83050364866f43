"""Property tests for the round-2 operator additions (hypothesis)."""

import hashlib

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from tests.conftest import make_graph

_SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


labelings = st.lists(st.integers(0, 3), min_size=4, max_size=12)


@settings(**_SETTINGS)
@given(labels=labelings)
def test_ari_self_agreement_and_permutation_invariance(spark, labels):
    from graphina_spark.operators.partitions import adjusted_rand_index

    a = spark.createDataFrame(
        [(i, l) for i, l in enumerate(labels)], "id long, label long"
    )
    assert adjusted_rand_index(a, a) == pytest.approx(1.0)
    # renaming labels (injective map) must not change ARI vs any reference
    remap = spark.createDataFrame(
        [(i, 100 - l) for i, l in enumerate(labels)], "id long, label long"
    )
    planted = spark.createDataFrame(
        [(i, i % 2) for i in range(len(labels))], "id long, label long"
    )
    assert adjusted_rand_index(a, planted) == pytest.approx(
        adjusted_rand_index(remap, planted), abs=1e-12
    )


edge_lists = st.lists(
    st.tuples(st.integers(0, 7), st.integers(0, 7)), min_size=2, max_size=14
)


@settings(**_SETTINGS)
@given(edges=edge_lists)
def test_sweep_cut_bounds(spark, edges):
    from graphina_spark.operators.cuts import sweep_cut

    g = make_graph(spark, edges, n=8, directed=False)
    scores = g.vertices.select("id", F.col("id").alias("score"))
    rows = sweep_cut(g, scores).collect()
    if not rows:  # graphs with no non-trivial prefix (e.g. all self-loops)
        return
    r = rows[0]
    assert 0.0 <= r["conductance"] <= 1.0 + 1e-9
    assert 1 <= r["n_side"] <= 8
    assert r["cut_edges"] >= 0


@settings(**_SETTINGS)
@given(
    run=st.lists(st.integers(0, 50), min_size=8, max_size=8),
    pada=st.lists(st.integers(51, 99), min_size=0, max_size=4),
    padb=st.lists(st.integers(51, 99), min_size=0, max_size=4),
)
def test_winnowing_guarantee(spark, run, pada, padb):
    """Two documents sharing a run of >= w + k - 1 tokens share at least one
    fingerprint — the paper's core guarantee (k=5, w=4 → t=8)."""
    from graphina_spark.operators.fingerprints import winnow_fingerprints

    shared = " ".join(f"s{x}" for x in run)  # 8-token shared run
    da = " ".join(f"a{x}" for x in pada) + " " + shared
    db = shared + " " + " ".join(f"b{x}" for x in padb)
    docs = spark.createDataFrame(
        [(0, da.strip()), (1, db.strip())], "doc_id long, text string"
    )
    fp = winnow_fingerprints(docs, k=5, w=4)
    ga = {r["g"] for r in fp.where("id = 0").collect()}
    gb = {r["g"] for r in fp.where("id = 1").collect()}
    assert ga & gb


@settings(**_SETTINGS)
@given(
    weights=st.dictionaries(
        st.sampled_from(["a", "b", "c"]),
        st.floats(0.1, 5.0),
        min_size=1,
        max_size=3,
    )
)
def test_mixture_plan_spends_full_budget(spark, weights):
    from graphina_spark.operators.sampling import mixture_plan

    docs = spark.createDataFrame(
        [(0, "t1 t2 t3 t4", "a"), (1, "u1 u2 u3", "b"), (2, "v1 v2", "c")],
        "doc_id long, text string, source string",
    )
    plan = mixture_plan(docs, weights, token_budget=900)
    total = plan.agg(F.sum("target_tokens")).first()[0]
    assert total == pytest.approx(900.0, abs=1e-3)


@settings(**_SETTINGS)
@given(vals=st.lists(st.integers(0, 10_000), min_size=1, max_size=60))
def test_fm_sketch_set_semantics(spark, vals):
    """The keyed FM sketch is a function of the SET of values — duplicates
    and ordering never move a register."""
    from graphina_spark.operators.cardinality import approx_distinct_by_key

    a = spark.createDataFrame([(0, v) for v in vals], "k long, v long")
    b = spark.createDataFrame(
        [(0, v) for v in reversed(vals)] + [(0, vals[0])], "k long, v long"
    )
    ra = approx_distinct_by_key(a, "k", "v").collect()[0]
    rb = approx_distinct_by_key(b, "k", "v").collect()[0]
    assert ra["register_mass"] == rb["register_mass"]
    assert ra["approx_distinct"] == rb["approx_distinct"]


@settings(**_SETTINGS)
@given(labels=labelings)
def test_nmi_self_agreement_and_permutation_invariance(spark, labels):
    from graphina_spark.operators.partitions import normalized_mutual_information

    a = spark.createDataFrame(
        [(i, l) for i, l in enumerate(labels)], "id long, label long"
    )
    assert normalized_mutual_information(a, a) == pytest.approx(1.0)
    remap = spark.createDataFrame(
        [(i, 100 - l) for i, l in enumerate(labels)], "id long, label long"
    )
    planted = spark.createDataFrame(
        [(i, i % 2) for i in range(len(labels))], "id long, label long"
    )
    assert normalized_mutual_information(a, planted) == pytest.approx(
        normalized_mutual_information(remap, planted), abs=1e-12
    )


def test_nmi_conventions(spark):
    """Constant-vs-varied → 0 (no information); both constant → 1.0; exact
    value on a hand case (sklearn arithmetic normalization)."""
    import math

    from graphina_spark.operators.partitions import normalized_mutual_information

    const = spark.createDataFrame([(i, 0) for i in range(4)], "id long, label long")
    halves = spark.createDataFrame(
        [(i, i // 2) for i in range(4)], "id long, label long"
    )
    assert normalized_mutual_information(const, halves) == pytest.approx(0.0)
    assert normalized_mutual_information(const, const) == pytest.approx(1.0)
    # hand case: a = {0,1},{2,3}; b = {0},{1,2,3}
    b = spark.createDataFrame(
        [(0, 0), (1, 1), (2, 1), (3, 1)], "id long, label long"
    )
    n = 4.0
    mi = (1 / n) * math.log(n * 1 / (2 * 1)) + (1 / n) * math.log(
        n * 1 / (2 * 3)
    ) + (2 / n) * math.log(n * 2 / (2 * 3))
    ha = -2 * (2 / n) * math.log(2 / n)
    hb = -(1 / n) * math.log(1 / n) - (3 / n) * math.log(3 / n)
    assert normalized_mutual_information(halves, b) == pytest.approx(
        2 * mi / (ha + hb), abs=1e-9
    )
