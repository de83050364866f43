"""PLSI deterministic EM (operators/plsi.py)."""

from collections import defaultdict

from pyspark.sql import functions as F

from graphina_spark.operators.plsi import plsi_fit


def test_distributions_normalize(spark):
    docs = spark.createDataFrame(
        [(1, "apple banana apple"), (2, "car truck car truck road")],
        "doc_id long, text string",
    )
    theta, phi = plsi_fit(docs, n_topics=3, iters=2)
    tsum = {r["doc"]: r["s"] for r in
            theta.groupBy("doc").agg(F.sum("t").alias("s")).collect()}
    assert all(abs(s - 1.0) < 1e-4 for s in tsum.values())
    psum = {r["k"]: r["s"] for r in
            phi.groupBy("k").agg(F.sum("p").alias("s")).collect()}
    assert all(abs(s - 1.0) < 1e-4 for s in psum.values())


def test_em_separates_disjoint_vocabularies(spark):
    fruit = "apple banana cherry grape melon"
    autos = "car truck wheel engine road"
    rows = [(i, fruit) for i in range(8)] + [(10 + i, autos) for i in range(8)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    theta, phi = plsi_fit(docs, n_topics=2, iters=12)
    # per topic, mass on fruit-vocab vs auto-vocab
    mass = defaultdict(lambda: [0.0, 0.0])
    fruit_set = set(fruit.split())
    for r in phi.collect():
        mass[r["k"]][0 if r["tok"] in fruit_set else 1] += r["p"]
    # with disjoint vocabularies EM converges to (near-)pure topics
    purity = {k: max(v) / (v[0] + v[1]) for k, v in mass.items()}
    assert all(p > 0.95 for p in purity.values())
    # and each topic specializes in a DIFFERENT group
    leaders = {k: (0 if v[0] > v[1] else 1) for k, v in mass.items()}
    assert set(leaders.values()) == {0, 1}
    # docs load on the topic of their vocabulary
    th = defaultdict(dict)
    for r in theta.collect():
        th[r["doc"]][r["k"]] = r["t"]
    fruit_topic = next(k for k, g in leaders.items() if g == 0)
    assert th[0][fruit_topic] > 0.9
    assert th[10][fruit_topic] < 0.1


def test_deterministic_across_partitioning(spark):
    docs = spark.createDataFrame(
        [(i, f"w{i % 5} common w{(i * 3) % 7} token") for i in range(20)],
        "doc_id long, text string",
    )
    _, p1 = plsi_fit(docs, n_topics=3, iters=2)
    _, p2 = plsi_fit(docs.repartition(7), n_topics=3, iters=2)
    a = {(r["k"], r["tok"]): r["p"] for r in p1.collect()}
    b = {(r["k"], r["tok"]): r["p"] for r in p2.collect()}
    assert a == b
