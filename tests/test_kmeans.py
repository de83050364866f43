def _emb_df(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_kmeans_separates_planted_blobs(spark):
    """Two tight blobs around (0,0) and (10,10): 2 rounds of Lloyd from the
    sampled init must recover the planted partition exactly."""
    from graphina_spark.operators.kmeans import kmeans

    rows = []
    for i in range(10):
        rows.append((i, [0.0 + i * 0.01, 0.0 - i * 0.01]))  # blob A: ids 0-9
    for i in range(10):
        rows.append((10 + i, [10.0 + i * 0.01, 10.0 - i * 0.01]))  # blob B
    got = {
        r["id"]: r["cluster"]
        for r in kmeans(_emb_df(spark, rows), k=2, iters=2).collect()
    }
    a = {got[i] for i in range(10)}
    b = {got[10 + i] for i in range(10)}
    assert len(a) == 1 and len(b) == 1 and a != b


def test_kmeans_deterministic_rerun(spark):
    from graphina_spark.operators.kmeans import kmeans

    rows = [
        (i, [float((i * 7 + 3) % 11) / 11, float((i * 5 + 1) % 13) / 13])
        for i in range(40)
    ]
    df = _emb_df(spark, rows)
    a = sorted(map(tuple, kmeans(df, k=4, iters=3).collect()))
    b = sorted(map(tuple, kmeans(df.repartition(7), k=4, iters=3).collect()))
    assert a == b


def test_kmeans_empty_cluster_keeps_centroid(spark):
    """k=3 over 3 identical-ish points near one spot: clusters may empty out
    but the run must not crash and every point gets a cluster."""
    from graphina_spark.operators.kmeans import kmeans

    rows = [(0, [0.0, 0.0]), (1, [0.01, 0.0]), (2, [0.0, 0.01])]
    got = kmeans(_emb_df(spark, rows), k=3, iters=2).collect()
    assert len(got) == 3 and all(r["cluster"] is not None for r in got)
