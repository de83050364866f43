"""Deterministic graphs derived from the driver's testdata tables.

The correctness gate compares our Spark operators against DuckDB oracle SQL
over the same parquet tables, so the *edge derivation itself* must be exactly
reproducible in both engines.  We therefore derive edges from the ``customer``
table (contiguous keys 0..n-1) with pure modular arithmetic — no hashing, no
RNG — and ship the identical formulas twice:

- as Spark DataFrame expressions (:func:`web_graph`, :func:`block_graph`)
- as DuckDB SQL CTE fragments (``WEB_EDGES_CTE``, ``BLOCK_EDGES_CTE``)

Two shapes:

``web_graph``
    A skewed directed "web-like" graph: 3 affine multiplier rings + a hub rule
    (``dst = id % 16`` → 16 hubs with in-degree ~n/16, a stand-in for Zipf
    hub skew), deterministic integer weights 1..5, and dangling vertices
    (every ``id % 23 == 0`` has its out-edges removed) so PageRank's
    dangling-mass redistribution path is exercised
    (reference semantics: src/centrality/pagerank.rs:93-100).

``block_graph``
    100-vertex blocks, each a ring + chord (connected within, disconnected
    across) → exactly ``n/100`` components/communities, for connected
    components and label propagation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphina_spark.graph import LinkGraph

MULTIPLIERS = [(7, 3), (13, 5), (31, 17)]
N_HUBS = 16
DANGLING_MOD = 23
BLOCK = 100


def _customer_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        F.col("c_custkey").cast("long").alias("id")
    )


def web_graph(spark: SparkSession, sf_dir: str) -> LinkGraph:
    ids = _customer_ids(spark, sf_dir)
    n = ids.agg(F.count("*").alias("n"))
    v = ids.crossJoin(F.broadcast(n))
    parts = [
        v.select(F.col("id").alias("src"), ((F.col("id") * a + b) % F.col("n")).alias("dst"))
        for a, b in MULTIPLIERS
    ]
    parts.append(ids.select(F.col("id").alias("src"), (F.col("id") % N_HUBS).alias("dst")))
    e0 = parts[0]
    for p in parts[1:]:
        e0 = e0.unionAll(p)
    edges = (
        e0.where((F.col("src") != F.col("dst")) & (F.col("src") % DANGLING_MOD != 0))
        .distinct()
        .select(
            "src",
            "dst",
            ((F.col("src") + F.col("dst")) % 5 + 1).cast("double").alias("weight"),
        )
    )
    return LinkGraph(vertices=ids, edges=edges, directed=True)


def block_graph(spark: SparkSession, sf_dir: str) -> LinkGraph:
    ids = _customer_ids(spark, sf_dir)
    n = ids.agg(F.count("*").alias("n"))
    g = F.floor(F.col("id") / BLOCK)
    pos = F.col("id") % BLOCK
    ring = ids.select(
        F.col("id").alias("src"), (g * BLOCK + (pos + 1) % BLOCK).alias("dst")
    )
    chord = ids.select(
        F.col("id").alias("src"), (g * BLOCK + (pos * 7 + 3) % BLOCK).alias("dst")
    )
    edges = (
        ring.unionAll(chord)
        .crossJoin(F.broadcast(n))
        # partial trailing block: drop edges pointing past the vertex range
        .where((F.col("src") != F.col("dst")) & (F.col("dst") < F.col("n")))
        .select(F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst"))
        .distinct()
        .withColumn("weight", F.lit(1.0))
    )
    return LinkGraph(vertices=ids, edges=edges, directed=False)


def pages_from_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The input_hint-shaped pages table derived from customer ids: one web
    page per id, html anchors following the same modular rule as
    :func:`web_graph` (weightless).  Parsing these pages through the Arrow
    UDFs reproduces the arithmetic edge set — the DuckDB oracle twin is
    PAGES_EDGES_CTE / PAGES_TEXT_CTE below."""
    from graphina_spark.sources.pages import pages_from_ids

    ids = _customer_ids(spark, sf_dir)
    return pages_from_ids(ids, n=None)


RECRAWL_ROT = (3, 7, 11)  # drop edges with (src*3 + dst*7) % 11 == 0
RECRAWL_NEW = (19, 11)  # new discovered ring dst = (id*19 + 11) % n


def web_graph_recrawl(spark: SparkSession, sf_dir: str) -> LinkGraph:
    """The "second crawl" snapshot of :func:`web_graph`: same candidate
    rules plus a newly-discovered affine ring (``RECRAWL_NEW``), minus
    link-rot (``RECRAWL_ROT`` drops ~1/11 of pairs uniformly), under the
    identical self-loop/dangling/distinct/weight rules — deterministic in
    both engines (twin: the snapshot-B CTE in oracles.graph_diff_web_sql)."""
    ra, rb, rm = RECRAWL_ROT
    na, nb = RECRAWL_NEW
    ids = _customer_ids(spark, sf_dir)
    n = ids.agg(F.count("*").alias("n"))
    v = ids.crossJoin(F.broadcast(n))
    parts = [
        v.select(
            F.col("id").alias("src"),
            ((F.col("id") * a + b) % F.col("n")).alias("dst"),
        )
        for a, b in MULTIPLIERS + [RECRAWL_NEW]
    ]
    parts.append(
        ids.select(F.col("id").alias("src"), (F.col("id") % N_HUBS).alias("dst"))
    )
    e0 = parts[0]
    for p in parts[1:]:
        e0 = e0.unionAll(p)
    edges = (
        e0.where(
            (F.col("src") != F.col("dst"))
            & (F.col("src") % DANGLING_MOD != 0)
            & ((F.col("src") * ra + F.col("dst") * rb) % rm != 0)
        )
        .distinct()
        .select(
            "src",
            "dst",
            ((F.col("src") + F.col("dst")) % 5 + 1).cast("double").alias("weight"),
        )
    )
    return LinkGraph(vertices=ids, edges=edges, directed=True)


# ---------------------------------------------------------------- DuckDB side
# CTE fragments; the driver pre-registers `customer` as a view.

_mult_selects = "\n      UNION ALL ".join(
    f"SELECT id AS src, (id*{a}+{b}) % n AS dst FROM v, nn" for a, b in MULTIPLIERS
)

WEB_EDGES_CTE = f"""
  v AS (SELECT CAST(c_custkey AS BIGINT) AS id FROM customer),
  nn AS (SELECT count(*) AS n FROM v),
  e0 AS (
      {_mult_selects}
      UNION ALL SELECT id AS src, id % {N_HUBS} AS dst FROM v
  ),
  edges AS (
      SELECT DISTINCT src, dst, CAST((src+dst) % 5 + 1 AS DOUBLE) AS weight
      FROM e0 WHERE src <> dst AND src % {DANGLING_MOD} <> 0
  )"""

# weightless twin of WEB_EDGES_CTE — what link parsing recovers from the html
PAGES_EDGES_CTE = f"""
  v AS (SELECT CAST(c_custkey AS BIGINT) AS id FROM customer),
  nn AS (SELECT count(*) AS n FROM v),
  e0 AS (
      {_mult_selects}
      UNION ALL SELECT id AS src, id % {N_HUBS} AS dst FROM v
  ),
  edges AS (
      SELECT DISTINCT src, dst, 1.0 AS weight
      FROM e0 WHERE src <> dst AND src % {DANGLING_MOD} <> 0
  )"""

# the frozen text extraction (functions/extract.py v1) applied to the
# generated html, reproduced as pure string SQL: title + h1 + body paragraph
# (&amp; decoded) + anchor texts in sorted-target order, single-space joined
PAGES_TEXT_CTE = (
    PAGES_EDGES_CTE
    + """,
  z AS (SELECT id, lpad(CAST(id AS VARCHAR), 8, '0') AS pz FROM v),
  anchors AS (
      SELECT src AS id,
             string_agg(' link ' || lpad(CAST(dst AS VARCHAR), 8, '0'), ''
                        ORDER BY dst) AS links
      FROM edges GROUP BY src
  ),
  page_text AS (
      SELECT 'https://ex.com/p' || z.pz AS url,
             'Page ' || z.pz || ' Page ' || z.pz || ' Crawled page ' || z.pz
             || ' of the synthetic corpus & link graph.'
             || coalesce(a.links, '') AS text
      FROM z LEFT JOIN anchors a ON z.id = a.id
  )"""
)

BLOCK_EDGES_CTE = f"""
  v AS (SELECT CAST(c_custkey AS BIGINT) AS id FROM customer),
  nn AS (SELECT count(*) AS n FROM v),
  e0 AS (
      SELECT id AS src, (id // {BLOCK}) * {BLOCK} + (id % {BLOCK} + 1) % {BLOCK} AS dst FROM v
      UNION ALL
      SELECT id AS src, (id // {BLOCK}) * {BLOCK} + ((id % {BLOCK}) * 7 + 3) % {BLOCK} AS dst FROM v
  ),
  edges AS (
      SELECT DISTINCT least(src, dst) AS src, greatest(src, dst) AS dst, 1.0 AS weight
      FROM e0, nn WHERE src <> dst AND dst < n
  )"""


CLIQUE_BLOCK = 25


def clique_blocks_graph(spark: SparkSession, sf_dir: str) -> LinkGraph:
    """Disconnected complete blocks of CLIQUE_BLOCK vertices — the spectral
    fixture shape (the reference's own spectral tests cluster cliques):
    within-block mixing is O(1) power steps, so fixed-iteration PIC
    plateaus cleanly per block.  Edges (i < j, same block, weight 1)."""
    ids = _customer_ids(spark, sf_dir)
    a = ids.select(F.col("id").alias("x"), F.floor(F.col("id") / CLIQUE_BLOCK).alias("blk"))
    edges = (
        a.alias("l")
        .join(a.alias("r"), "blk")
        .where(F.col("l.x") < F.col("r.x"))
        .select(
            F.col("l.x").alias("src"),
            F.col("r.x").alias("dst"),
            F.lit(1.0).alias("weight"),
        )
    )
    return LinkGraph(vertices=ids, edges=edges, directed=False)


CLIQUE_EDGES_CTE = f"""
  v AS (SELECT CAST(c_custkey AS BIGINT) AS id FROM customer),
  edges AS (
      SELECT l.id AS src, r.id AS dst, 1.0 AS weight
      FROM v l JOIN v r
        ON l.id // {CLIQUE_BLOCK} = r.id // {CLIQUE_BLOCK} AND l.id < r.id
  )"""


N_BRIDGES = 3


def bridged_cliques_graph(spark: SparkSession, sf_dir: str) -> LinkGraph:
    """Clique blocks plus N_BRIDGES single bridge edges chaining blocks
    0..N_BRIDGES — the Girvan-Newman fixture: bridges carry maximal edge
    betweenness by construction, so GN's removal order is structural, not
    float-luck.  Undirected; canonical (src < dst) edges."""
    g = clique_blocks_graph(spark, sf_dir)
    n = g.vertices.count()
    bridges = [
        ((b + 1) * CLIQUE_BLOCK - 1, (b + 1) * CLIQUE_BLOCK)
        for b in range(N_BRIDGES)
        if (b + 1) * CLIQUE_BLOCK < n
    ]
    bdf = g.vertices.sparkSession.createDataFrame(
        [(a, b, 1.0) for a, b in bridges], "src long, dst long, weight double"
    )
    return LinkGraph(
        vertices=g.vertices, edges=g.edges.unionAll(bdf), directed=False
    )


BRIDGED_EDGES_CTE = f"""
  v AS (SELECT CAST(c_custkey AS BIGINT) AS id FROM customer),
  nn AS (SELECT count(*) AS n FROM v),
  edges AS (
      SELECT l.id AS src, r.id AS dst, 1.0 AS weight
      FROM v l JOIN v r
        ON l.id // {CLIQUE_BLOCK} = r.id // {CLIQUE_BLOCK} AND l.id < r.id
      UNION ALL
      SELECT (b + 1) * {CLIQUE_BLOCK} - 1 AS src, (b + 1) * {CLIQUE_BLOCK} AS dst, 1.0
      FROM range({N_BRIDGES}) t(b), nn
      WHERE (b + 1) * {CLIQUE_BLOCK} < nn.n
  )"""


COOC_WINDOW_S = 3600
COOC_MIN_SHARED = 3
#: per-window distinct-user cap: a window with U active users emits U²
#: candidate pairs, so one hot window (flash crowd) at web scale is a
#: quadratic blowup — the same lesson as the links-family hub cap.  Users
#: beyond the cap (by ascending id, deterministic) are dropped from that
#: window's pairing only (documented bias); 5000 caps any window at ~12.5M
#: pairs while far exceeding normal window occupancy.
COOC_MAX_USERS_PER_WINDOW = 5000


def events_cooccurrence_graph(
    spark: SparkSession, sf_dir: str,
    window_s: int = COOC_WINDOW_S, min_shared: int = COOC_MIN_SHARED,
    max_users_per_window: int = COOC_MAX_USERS_PER_WINDOW,
) -> LinkGraph:
    """Temporal co-occurrence graph over the ``events`` table: users are
    linked when they emit events in the same tumbling time window in at
    least ``min_shared`` distinct windows (weight = shared-window count).

    Windows are ``floor(seconds-since-2000-01-01 / window_s)`` computed
    with ``timestampdiff`` on the NTZ column — timezone-free in both
    engines (the anchor predates all data, so the positive delta floors
    identically: Spark truncates toward zero, DuckDB counts second
    boundaries).  The edge list is emitted symmetrized (both directions)
    so directed kernels (PageRank with dangling users) run unchanged."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.col("user_id").cast("long").alias("uid"),
        F.expr(
            "timestampdiff(SECOND, TIMESTAMP_NTZ'2000-01-01 00:00:00', ts)"
        ).alias("es"),
    )
    from pyspark.sql import Window as W

    w = ev.select(
        "uid", F.floor(F.col("es") / F.lit(float(window_s))).alias("win")
    ).distinct()
    wcap = W.partitionBy("win").orderBy(F.asc("uid"))
    w = (
        w.withColumn("rn", F.row_number().over(wcap))
        .where(F.col("rn") <= max_users_per_window)
        .select("uid", "win")
    )
    pairs = (
        w.alias("a")
        .join(w.alias("b"), "win")
        .where(F.col("a.uid") < F.col("b.uid"))
        .groupBy(F.col("a.uid").alias("src"), F.col("b.uid").alias("dst"))
        .agg(F.count("*").alias("shared"))
        .where(F.col("shared") >= min_shared)
        .select("src", "dst", F.col("shared").cast("double").alias("weight"))
    )
    edges = pairs.unionAll(
        pairs.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"
        )
    )
    verts = ev.select(F.col("uid").alias("id")).distinct()
    return LinkGraph(vertices=verts, edges=edges, directed=True)


EVENTS_EDGES_CTE = f"""
  ev AS (SELECT CAST(user_id AS BIGINT) AS uid,
                date_diff('second', TIMESTAMP '2000-01-01 00:00:00', ts) AS es
         FROM events),
  w0 AS (SELECT DISTINCT uid, CAST(floor(es / {COOC_WINDOW_S}.0) AS BIGINT) AS win
        FROM ev),
  w AS (SELECT uid, win FROM (SELECT uid, win,
          row_number() OVER (PARTITION BY win ORDER BY uid) AS rn FROM w0)
        WHERE rn <= {COOC_MAX_USERS_PER_WINDOW}),
  v AS (SELECT DISTINCT uid AS id FROM ev),
  half AS (SELECT a.uid AS src, b.uid AS dst, CAST(count(*) AS DOUBLE) AS weight
           FROM w a JOIN w b ON a.win = b.win AND a.uid < b.uid
           GROUP BY a.uid, b.uid HAVING count(*) >= {COOC_MIN_SHARED}),
  edges AS (SELECT src, dst, weight FROM half
            UNION ALL SELECT dst AS src, src AS dst, weight FROM half)"""


def bowtie_graph(spark: SparkSession, sf_dir: str) -> LinkGraph:
    """Planted bow-tie fixture (Broder WWW 2000 shape) over customer ids.

    With n ids and c1 = n // 4:  ids [0, c1) form a directed ring PLUS a
    doubling chord i → (2i+1) mod c1 (the CORE SCC; the chord keeps both the
    forward and reverse BFS diameters logarithmic, so the SCC kernel's
    backward gather doesn't walk the ring one superstep per vertex),
    [c1, 2c1) each point into the core (IN), [2c1, 3c1) are pointed at
    from the core (OUT), and the remainder r = id - 3c1 cycles through
    TENDRIL (r % 3 == 0: reached from IN, sink), TUBE (r % 3 == 1: reached
    from IN and pointing into OUT, core-avoiding), DISC (r % 3 == 2:
    isolated).  Every class of the decomposition is populated, and the
    expected class is a closed-form function of id — the oracle needs no
    graph traversal at all (bowtie_planted_sql)."""
    ids = _customer_ids(spark, sf_dir)
    n = ids.agg(F.count("*").alias("n"))
    v = ids.crossJoin(F.broadcast(n))
    c1 = F.floor(F.col("n") / 4).cast("long")
    i, r = F.col("id"), F.col("id") - 3 * c1
    w = F.lit(1.0).alias("weight")
    core = v.where(i < c1).select(i.alias("src"), ((i + 1) % c1).alias("dst"), w)
    chord = v.where((i < c1) & ((2 * i + 1) % c1 != i)).select(
        i.alias("src"), ((2 * i + 1) % c1).alias("dst"), w
    )
    ins = v.where((i >= c1) & (i < 2 * c1)).select(
        i.alias("src"), (i - c1).alias("dst"), w
    )
    outs = v.where((i >= 2 * c1) & (i < 3 * c1)).select(
        (i - 2 * c1).alias("src"), i.alias("dst"), w
    )
    hang = v.where((i >= 3 * c1) & (r % 3 != 2)).select(
        (c1 + r % c1).alias("src"), i.alias("dst"), w
    )
    tube_out = v.where((i >= 3 * c1) & (r % 3 == 1)).select(
        i.alias("src"), (2 * c1 + r % c1).alias("dst"), w
    )
    edges = (
        core.unionAll(chord)
        .unionAll(ins)
        .unionAll(outs)
        .unionAll(hang)
        .unionAll(tube_out)
    )
    return LinkGraph(vertices=ids, edges=edges, directed=True)


BOWTIE_EDGES_CTE = """
  v AS (SELECT CAST(c_custkey AS BIGINT) AS id FROM customer),
  nn AS (SELECT CAST(floor(count(*) / 4.0) AS BIGINT) AS c1 FROM v),
  edges AS (
      SELECT id AS src, (id + 1) % c1 AS dst, 1.0 AS weight
      FROM v, nn WHERE id < c1
      UNION ALL SELECT id, (2*id + 1) % c1, 1.0 FROM v, nn
        WHERE id < c1 AND (2*id + 1) % c1 <> id
      UNION ALL SELECT id, id - c1, 1.0 FROM v, nn
        WHERE id >= c1 AND id < 2*c1
      UNION ALL SELECT id - 2*c1, id, 1.0 FROM v, nn
        WHERE id >= 2*c1 AND id < 3*c1
      UNION ALL SELECT c1 + (id - 3*c1) % c1, id, 1.0 FROM v, nn
        WHERE id >= 3*c1 AND (id - 3*c1) % 3 <> 2
      UNION ALL SELECT id, 2*c1 + (id - 3*c1) % c1, 1.0 FROM v, nn
        WHERE id >= 3*c1 AND (id - 3*c1) % 3 = 1
  )"""
