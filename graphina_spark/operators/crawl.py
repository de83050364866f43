"""Crawl scheduling: priority-ranked recrawl batches under per-host
politeness caps and a global fetch budget.

The reference is an analytics library, not a crawler, but the north star's
input is a continuously-recrawled web corpus, and deciding WHAT to fetch
next is the canonical producer-side query over exactly the link-graph
state this engine maintains (cf. OPIC, Cho & Garcia-Molina recrawl
scheduling; every production crawler runs this shape per cycle):

- **priority** — link authority × staleness.  Here: integer in-link weight
  × integer days-since-last-crawl, so the ranking is bit-exact across
  engines (a float scorer would make tie groups engine-dependent — the
  repo's ranking-gate convention).
- **politeness** — at most ``per_host`` pages of one host per batch (the
  per-host ``row_number`` window; window state is one host's pages).
- **budget** — the global top-``budget`` fetches over the capped set,
  totally ordered by (priority desc, id asc).

Scale shape: one in-degree aggregation (shuffle keyed by dst), one
id-keyed left join against the vertex set, one window shuffle keyed by
host, then a distributed partial top-k (``orderBy().limit()`` compiles to
TakeOrderedAndProject — per-partition heads merged on the driver, never a
single-partition global sort).  At 10^12 pages every exchange is keyed by
a bounded- or corpus-partitioned key; nothing is pair-quadratic.

DuckDB twin: oracles.py::crawl_schedule_sql.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from graphina_spark.graph import LinkGraph

AGE_MULT = 13
AGE_MOD = 30


def crawl_schedule(
    g: LinkGraph,
    host_mod: int = 64,
    per_host: int = 3,
    budget: int = 100,
    age_mult: int = AGE_MULT,
    age_mod: int = AGE_MOD,
) -> DataFrame:
    """(host, id, priority, slot) — the next recrawl batch.

    ``age`` (days since last fetch) is synthesized deterministically as
    ``(id·age_mult) % age_mod + 1`` — the stand-in for a real
    ``datediff(now, last_fetch)`` column, keeping the gate reproducible;
    pages with no in-links still enter at priority 0 (frontier
    completeness), ranked by id within their host.
    """
    indeg = g.edges.groupBy(F.col("dst").alias("id")).agg(
        F.sum("weight").cast("long").alias("w_in")
    )
    pages = (
        g.vertices.select("id")
        .join(indeg, "id", "left")
        .select(
            (F.col("id") % host_mod).cast("long").alias("host"),
            "id",
            (
                F.coalesce("w_in", F.lit(0))
                * ((F.col("id") * age_mult) % age_mod + 1)
            ).alias("priority"),
        )
    )
    w = Window.partitionBy("host").orderBy(F.desc("priority"), F.asc("id"))
    capped = (
        pages.withColumn("slot", F.row_number().over(w).cast("int"))
        .where(F.col("slot") <= per_host)
    )
    return capped.orderBy(F.desc("priority"), F.asc("id")).limit(budget)
