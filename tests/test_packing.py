"""Sequence packing + global prefix-sum invariants."""

from pyspark.sql import functions as F


def test_global_cumsum_matches_serial(spark):
    from graphina_spark.plans.ordered import global_cumsum

    rows = [(i, (i * 37) % 101, (i % 7) + 1) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, k long, v long")
    for p in (2, 7):
        got = {
            r["id"]: r["prefix"]
            for r in global_cumsum(
                df, ["k", "id"], "v", num_partitions=p
            ).collect()
        }
        acc, want = 0, {}
        for i, k, v in sorted(rows, key=lambda r: (r[1], r[0])):
            want[i] = acc
            acc += v
        assert got == want  # independent of partition count


def test_packing_layout_is_contiguous_and_deterministic(spark, sf_dir):
    from graphina_spark.operators.packing import pack_documents

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = pack_documents(docs, seq_len=512).collect()
    b = pack_documents(docs.repartition(13), seq_len=512).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))

    laid = sorted(a, key=lambda r: r["start_tok"])
    pos = 0
    for r in laid:
        assert r["start_tok"] == pos  # no gaps, no overlaps
        assert r["seq_first"] == r["start_tok"] // 512
        assert r["off_first"] == r["start_tok"] % 512
        last = max(r["start_tok"] + r["n_tokens"] - 1, r["start_tok"])
        assert r["seq_last"] == last // 512
        pos += r["n_tokens"]
    total = sum(r["n_tokens"] for r in laid)
    assert pos == total and total > 0
