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


def parse_robots(robots: DataFrame, host_col: str = "host",
                 body_col: str = "body") -> DataFrame:
    """(host, agent, rule, path) — robots.txt parsed to rule rows.

    Implements the REP subset production crawlers rely on (RFC 9309):
    ``User-agent`` group headers (CONSECUTIVE user-agent lines share the
    following rule block), ``Allow`` / ``Disallow`` path rules, case-
    insensitive directives, ``#`` comments and blank lines ignored,
    empty-path ``Disallow:`` dropped (it means allow-all).  Everything is
    column expressions over per-line rows — one posexplode projection, two
    doc-bounded windows (group id = running count of group starts; agent
    membership via a within-group self-join), no Python in the loop.
    """
    lines = robots.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(body_col), "\n")).alias("pos", "line"),
    ).select(
        "host",
        "pos",
        F.trim(F.regexp_replace("line", "#.*$", "")).alias("line"),
    ).where(F.col("line") != "")
    parsed = lines.select(
        "host",
        "pos",
        F.lower(F.trim(F.regexp_extract("line", "^([^:]+):", 1))).alias("dir"),
        F.trim(F.regexp_extract("line", "^[^:]+:(.*)$", 1)).alias("val"),
    ).where(F.col("dir").isin("user-agent", "allow", "disallow"))
    w = Window.partitionBy("host").orderBy("pos")
    grouped = parsed.withColumn(
        "is_agent", (F.col("dir") == "user-agent").cast("int")
    ).withColumn(
        # a user-agent line STARTS a new group unless the previous directive
        # line was also user-agent (stacked agents share one group)
        "starts",
        (
            (F.col("is_agent") == 1)
            & (F.coalesce(F.lag("dir").over(w), F.lit("")) != "user-agent")
        ).cast("int"),
    ).withColumn("grp", F.sum("starts").over(w))
    agents = grouped.where(F.col("is_agent") == 1).select(
        "host", "grp", F.lower(F.col("val")).alias("agent")
    )
    rules = grouped.where(
        (F.col("is_agent") == 0) & (F.col("val") != "")
    ).select("host", "grp", F.col("dir").alias("rule"), F.col("val").alias("path"))
    return agents.join(rules, ["host", "grp"]).select("host", "agent", "rule", "path")


def robots_allowed(
    urls: DataFrame, rules: DataFrame, agent: str = "*", url_col: str = "url"
) -> DataFrame:
    """(url, allowed, rule_path) — RFC 9309 evaluation of each url against
    parsed rules: per host the single MOST-SPECIFIC matching agent group
    applies (our agent's rules if that host defines any, else '*'); within
    it the LONGEST-path matching rule wins, allow beating disallow on
    equal length; no matching rule (or no robots at all) ⇒ allowed.
    Rule paths are literal prefixes (the pre-RFC subset every crawler
    accepts); '*'/'$' wildcards are out of scope and treated literally.

    Scale shape: urls join rules keyed by host (per-host rule sets are
    file-bounded), one per-url max-struct aggregation — the links/argmax
    posture, nothing corpus-quadratic."""
    a = agent.lower()
    host = F.try_parse_url(F.col(url_col), F.lit("HOST"))
    path = F.coalesce(F.try_parse_url(F.col(url_col), F.lit("PATH")), F.lit("/"))
    u = urls.select(F.col(url_col).alias("url"), host.alias("host"),
                    path.alias("p")).where(F.col("host").isNotNull())
    # per host: does a specific group for our agent exist?
    specific = rules.where(F.col("agent") == a).select("host").distinct()
    eff = (
        rules.where(F.col("agent").isin(a, "*"))
        .join(specific.select(F.col("host"), F.lit(1).alias("has_spec")),
              "host", "left")
        .where(
            ((F.col("has_spec") == 1) & (F.col("agent") == a))
            | (F.col("has_spec").isNull() & (F.col("agent") == "*"))
        )
        .select("host", "rule", "path")
    )
    verdict = (
        u.join(eff, "host")
        .where(F.col("p").startswith(F.col("path")))
        .select(
            "url",
            F.struct(
                F.length("path").alias("l"),
                # allow outranks disallow at equal length: allow=1 > 0
                (F.col("rule") == "allow").cast("int").alias("a"),
                F.col("path").alias("path"),
            ).alias("m"),
        )
        .groupBy("url")
        .agg(F.max("m").alias("m"))
        .select(
            "url",
            (F.col("m.a") == 1).alias("allowed"),
            F.col("m.path").alias("rule_path"),
        )
    )
    return (
        urls.select(F.col(url_col).alias("url"))
        .join(verdict, "url", "left")
        .select(
            "url",
            F.coalesce("allowed", F.lit(True)).alias("allowed"),
            "rule_path",
        )
    )


def parse_sitemaps(sitemaps: DataFrame, host_col: str = "host",
                   body_col: str = "body") -> DataFrame:
    """(host, url, lastmod) — sitemap XML parsed to URL rows (sitemaps.org
    protocol subset: ``<url><loc>…</loc><lastmod>…</lastmod></url>``
    entries; lastmod optional → NULL; whitespace-tolerant).  Pure column
    expressions: one regexp_extract_all per document + one posexplode —
    no XML library, no Python row loop (the protocol's fixed element names
    make regex extraction exact for well-formed feeds, and a malformed
    entry yields no row rather than an error).
    """
    urls = F.expr(
        f"regexp_extract_all({body_col}, '<url>(.*?)</url>', 1)"
    )
    entries = sitemaps.select(
        F.col(host_col).alias("host"), F.posexplode(urls).alias("i", "entry")
    )
    loc = F.trim(F.regexp_extract("entry", "<loc>\\s*(.*?)\\s*</loc>", 1))
    lastmod = F.regexp_extract("entry", "<lastmod>\\s*(.*?)\\s*</lastmod>", 1)
    return (
        entries.select(
            "host",
            loc.alias("url"),
            F.when(lastmod != "", lastmod).alias("lastmod"),
        )
        .where(F.col("url") != "")
    )


def sitemap_frontier(
    sitemap_urls: DataFrame,
    seen: DataFrame,
    rules: DataFrame | None = None,
    agent: str = "*",
) -> DataFrame:
    """(url, host, lastmod) — crawl frontier candidates: sitemap-announced
    urls not yet fetched (anti-join on the seen set) and, when robots
    ``rules`` are given, allowed for ``agent`` (the robots_allowed
    verdict).  The discovery half of the crawl loop — crawl_schedule ranks
    what this feeds.  Scale shape: one anti-join + the robots host-keyed
    join; nothing beyond the gated pieces."""
    cand = sitemap_urls.select("url", "host", "lastmod")
    fresh = cand.join(seen.select("url").distinct(), "url", "left_anti")
    if rules is None:
        return fresh
    verdict = robots_allowed(fresh.select("url"), rules, agent=agent)
    return fresh.join(
        verdict.where(F.col("allowed")).select("url"), "url", "left_semi"
    )
