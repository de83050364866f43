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


def test_semdedup_finds_planted_within_cell_dupes(spark):
    """Two far-apart blobs; a planted near-dup pair inside each blob must
    surface, and no cross-blob pair can (cells separate the blobs)."""
    from graphina_spark.operators.kmeans import semdedup_pairs

    rows = []
    for i in range(8):
        rows.append((i, [1.0 + 0.2 * i, 1.0 - 0.2 * i]))
    rows.append((8, [1.0, 1.0]))
    rows.append((9, [1.0001, 1.0]))  # near-dup of 8 within blob A
    for i in range(8):
        rows.append((100 + i, [-50.0 - 0.2 * i, 30.0 + 0.2 * i]))
    rows.append((108, [-50.0, 30.0]))
    rows.append((109, [-50.0, 30.001]))  # near-dup of 108 within blob B
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        (r["a"], r["b"])
        for r in semdedup_pairs(df, k=2, iters=2, threshold=0.9999999).collect()
    }
    assert (8, 9) in got and (108, 109) in got
    for a, b in got:
        assert (a < 100) == (b < 100)  # never a cross-blob pair
