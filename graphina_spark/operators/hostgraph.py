"""Host-level link-graph coarsening — page edges → host edges.

Common-Crawl-scale link analysis runs most queries twice: once on the page
graph (10^12 vertices) and once on its host/domain condensation (10^7-10^8
vertices), where PageRank variants (host rank) and spam-mass heuristics
live.  The reference has generic vertex contraction (our
operators/coarsen.py twins it); this module is the web-specific instance
where the contraction key is *parsed out of the url column* — all JVM-side
(`parse_url`, no Python), so host extraction inlines into the same
whole-stage-codegen span as the aggregation below it.

Scale shape: two shuffle joins keyed by page id (edges ⋈ url-map on src,
then on dst) + one hash aggregation on (src_host, dst_host).  The url map is
a projection of the pages table — at 10^12 pages it does NOT broadcast; the
joins co-partition on id.  Map-side partial aggregation collapses the
(host, host) pairs before the final exchange, so the shuffled volume after
the second join is bounded by the number of distinct host pairs per
partition, not by |E|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def host_of(url: F.Column | str) -> F.Column:
    """Host component of a url column (JVM built-in; NULL on garbage —
    ``try_parse_url``, since plain parse_url raises INVALID_URL under
    Spark 4 ANSI mode and one malformed crawl url must not kill a job)."""
    return F.try_parse_url(
        F.col(url) if isinstance(url, str) else url, F.lit("HOST")
    )


def host_links(
    pages: DataFrame,
    edges: DataFrame,
    keep_self: bool = True,
) -> DataFrame:
    """(src_host, dst_host, n_links, weight) — page edge list aggregated to
    the host graph.

    ``pages`` is (id, url); ``edges`` is (src, dst, weight) over page ids.
    Rows whose url fails to parse (NULL host) are dropped on whichever side
    fails.  ``keep_self=False`` drops intra-host edges (the usual host-rank
    preprocessing; default keeps them so callers can measure intra/inter
    ratios)."""
    hosts = pages.select(
        F.col("id"), host_of("url").alias("host")
    ).where(F.col("host").isNotNull())
    out = (
        edges.join(hosts.withColumnsRenamed({"id": "src", "host": "src_host"}), "src")
        .join(hosts.withColumnsRenamed({"id": "dst", "host": "dst_host"}), "dst")
        .groupBy("src_host", "dst_host")
        .agg(
            F.count("*").alias("n_links"),
            F.sum("weight").alias("weight"),
        )
    )
    if not keep_self:
        out = out.where(F.col("src_host") != F.col("dst_host"))
    return out
