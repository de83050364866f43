"""applyInPandasWithState: per-host running stats accumulate ACROSS
micro-batches with bounded state."""

import pytest

from graphina_spark.sources.pages import pages_from_ids
from graphina_spark.streaming.ingest import stream_edges, stream_pages
from graphina_spark.streaming.stateful import running_host_stats


@pytest.fixture()
def pages_dir(spark, tmp_path):
    d = str(tmp_path / "pages")
    pages = pages_from_ids(spark.range(40), n=40).cache()
    pages.where("url < 'https://ex.com/p00000020'").coalesce(1).write.parquet(
        d, mode="append"
    )
    pages.where("url >= 'https://ex.com/p00000020'").coalesce(1).write.parquet(
        d, mode="append"
    )
    pages.unpersist()
    return d


def test_state_accumulates_across_batches(spark, pages_dir):
    import time

    edges = stream_edges(stream_pages(spark, pages_dir, max_files=1))
    stats = running_host_stats(edges)
    q = (
        stats.writeStream.format("memory")
        .queryName("host_stats")
        .outputMode("update")
        .start()
    )
    # NB: processAllAvailable() never returns for a stateful query with a
    # processing-time timeout (timeout sweeps keep scheduling batches) —
    # poll progress until both data batches + one idle batch have run
    t0 = time.time()
    while time.time() - t0 < 120:
        time.sleep(2)
        assert q.exception() is None, q.exception()
        prog = q.recentProgress
        if (
            sum(p["numInputRows"] > 0 for p in prog) >= 2
            and sum(p["numInputRows"] == 0 for p in prog) >= 1
        ):
            break
    q.stop()
    rows = spark.sql("SELECT * FROM host_stats").collect()
    assert rows, "no state output"
    # multiple updates for the single host (one per micro-batch), counts
    # monotonically growing to the full link count
    per_host: dict[str, list[int]] = {}
    for r in rows:
        per_host.setdefault(r["host"], []).append(r["in_links"])
    assert "ex.com" in per_host
    counts = sorted(per_host["ex.com"])
    assert len(counts) >= 2  # state carried across ≥2 batches
    assert counts[-1] > counts[0]
    # final count equals total parsed links (single host in fixtures)
    total = rows[-1]
    batch_total = max(c for c in counts)
    from graphina_spark.graph import LinkGraph

    g = LinkGraph.from_pages(spark.read.parquet(pages_dir))
    assert batch_total == g.edges.count()
    last = [r for r in rows if r["in_links"] == batch_total][0]
    assert last["approx_distinct_sources"] > 0
    assert last["first_ts"] is not None and last["last_ts"] >= last["first_ts"]
    assert total is not None
