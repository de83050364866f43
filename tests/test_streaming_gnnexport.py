"""Incremental GraphSAGE export over an edge stream: per-batch delta
recompute must stay bit-identical to the batch sage kernel run on the full
accumulated edge set, and replaying a batch must be a no-op."""

import pytest

from graphina_spark.graph import LinkGraph
from graphina_spark.operators.gnnprep import sage_neighbor_mean
from graphina_spark.streaming.gnnexport import (
    latest_sage_export,
    merge_sage_export,
    run_incremental_sage_export,
)
from graphina_spark.streaming.graphkernels import stream_edge_files

# three files → three micro-batches at maxFilesPerTrigger=1; f3 rewires a
# vertex already exported in f1 (vertex 1 gains neighbor 20), so the delta
# path genuinely replaces rows rather than only appending
F1 = [(0, 1), (1, 2), (2, 3), (0, 3)]
F2 = [(10, 11), (11, 12), (10, 12)]
F3 = [(1, 20), (20, 21)]

FEATS = [
    (0, [1.0, 0.0, 2.0]),
    (1, [0.5, 1.5, 0.0]),
    (2, [2.0, 2.0, 1.0]),
    (3, [0.25, 0.75, 4.0]),
]
K = 2


@pytest.fixture(scope="module")
def features(spark):
    return spark.createDataFrame(
        FEATS, "vec_id long, embedding array<float>"
    ).cache()


def _batch_export(spark, features, edge_lists):
    rows = [e for f in edge_lists for e in f]
    g = LinkGraph.from_edges(
        spark.createDataFrame(rows, "src long, dst long"), directed=False
    )
    return sorted(
        map(
            tuple,
            sage_neighbor_mean(g, features, k=K, directed=False)
            .select("id", "pos", "mean_val", "n_sampled")
            .collect(),
        )
    )


def test_merge_pure_batch_matches_full_recompute(spark, features):
    estore = spark.createDataFrame([], "src long, dst long")
    export = spark.createDataFrame(
        [], "id long, pos int, mean_val double, n_sampled long"
    )
    folded = []
    for f in (F1, F2, F3):
        folded.append(f)
        estore, export = merge_sage_export(
            estore, export, spark.createDataFrame(f, "src long, dst long"),
            features, k=K,
        )
        assert sorted(map(tuple, export.collect())) == _batch_export(
            spark, features, folded
        )


def test_rewired_vertex_rows_replaced(spark, features):
    # k=3 ≥ deg(1): the F3 edge (1, 20) must enter vertex 1's sample
    estore = spark.createDataFrame([], "src long, dst long")
    export = spark.createDataFrame(
        [], "id long, pos int, mean_val double, n_sampled long"
    )
    estore, export = merge_sage_export(
        estore, export, spark.createDataFrame(F1, "src long, dst long"),
        features, k=3,
    )
    before = {r["pos"]: (r["mean_val"], r["n_sampled"])
              for r in export.collect() if r["id"] == 1}
    estore, export = merge_sage_export(
        estore, export, spark.createDataFrame(F3, "src long, dst long"),
        features, k=3,
    )
    rows1 = [r for r in export.collect() if r["id"] == 1]
    # still exactly one row per position (old rows were swapped, not stacked)
    assert len(rows1) == len(FEATS[0][1])
    after = {r["pos"]: (r["mean_val"], r["n_sampled"]) for r in rows1}
    assert before != after  # neighbor 20 entered vertex 1's sample pool
    assert all(n == 3 for _, n in after.values())


def test_replay_is_noop(spark, features):
    estore = spark.createDataFrame([], "src long, dst long")
    export = spark.createDataFrame(
        [], "id long, pos int, mean_val double, n_sampled long"
    )
    e1 = spark.createDataFrame(F1, "src long, dst long")
    estore, export = merge_sage_export(estore, export, e1, features, k=K)
    e2, x2 = merge_sage_export(estore, export, e1, features, k=K)
    assert sorted(map(tuple, x2.collect())) == sorted(map(tuple, export.collect()))
    assert e2.count() == estore.count()


def test_incremental_stream_matches_batch(spark, features, tmp_path):
    edges_dir = str(tmp_path / "edges")
    for f in (F1, F2, F3):
        spark.createDataFrame(f, "src long, dst long").coalesce(1).write.parquet(
            edges_dir, mode="append"
        )
    q = run_incremental_sage_export(
        stream_edge_files(spark, edges_dir, max_files=1),
        features,
        state_base=str(tmp_path / "state"),
        stream_checkpoint=str(tmp_path / "ckpt"),
        k=K,
    )
    q.processAllAvailable()
    q.stop()
    export = latest_sage_export(spark, str(tmp_path / "state"))
    assert export is not None
    assert sorted(map(tuple, export.collect())) == _batch_export(
        spark, features, [F1, F2, F3]
    )


def test_latest_none_before_first_batch(spark, tmp_path):
    assert latest_sage_export(spark, str(tmp_path / "nothing")) is None
