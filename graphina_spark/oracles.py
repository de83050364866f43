"""DuckDB oracle SQL builders for the driver's correctness gate.

Each function returns ANSI SQL (DuckDB dialect) computing the same result as
the matching Spark operator over the same parquet tables.  Iterative kernels
are expressed as *unrolled fixed-iteration* CTE chains — the Spark side runs
the engine with ``fixed_iters`` matching, so both sides follow the identical
trajectory and only float summation order differs (absorbed by round(..., 6)).

The edge derivations (WEB_EDGES_CTE / BLOCK_EDGES_CTE) are the same modular
arithmetic the Spark side computes in graphina_spark/sources/derived.py.
"""

from __future__ import annotations

from graphina_spark.sources.derived import BLOCK_EDGES_CTE, WEB_EDGES_CTE

PR_ITERS = 5
PR_DAMPING = 0.85
ROUND = 6


def pagerank_web_sql(iters: int = PR_ITERS, d: float = PR_DAMPING) -> str:
    """Unrolled weighted PageRank with dangling-mass redistribution
    (reference semantics, src/centrality/pagerank.rs:92-128)."""
    ctes = [
        WEB_EDGES_CTE.strip(),
        "verts AS (SELECT id FROM v)",
        "nn2 AS (SELECT count(*) AS n FROM verts)",
        "wout AS (SELECT src AS id, sum(weight) AS w_out FROM edges GROUP BY src)",
        "en AS (SELECT e.src, e.dst, e.weight / w.w_out AS w_norm"
        " FROM edges e JOIN wout w ON e.src = w.id)",
        "r0 AS (SELECT id, 1.0 / n AS pr FROM verts, nn2)",
    ]
    for k in range(1, iters + 1):
        p, c = f"r{k - 1}", f"r{k}"
        ctes.append(
            f"d{k} AS (SELECT coalesce(sum(r.pr), 0.0) AS dang FROM {p} r"
            f" LEFT JOIN wout w ON r.id = w.id WHERE w.id IS NULL)"
        )
        ctes.append(
            f"g{k} AS (SELECT en.dst AS id, sum(r.pr * en.w_norm) AS gather"
            f" FROM {p} r JOIN en ON r.id = en.src GROUP BY en.dst)"
        )
        ctes.append(
            f"{c} AS (SELECT vv.id,"
            f" {1.0 - d} / nn2.n + {d} * d{k}.dang / nn2.n"
            f" + {d} * coalesce(g{k}.gather, 0.0) AS pr"
            f" FROM verts vv LEFT JOIN g{k} ON vv.id = g{k}.id, nn2, d{k})"
        )
    return (
        "WITH " + ",\n".join(ctes) + f"\nSELECT id, round(pr, {ROUND}) AS pr FROM r{iters}"
    )


def degree_web_sql(kind: str = "total") -> str:
    """Raw degree counts on the directed web graph (degree.rs:50-114)."""
    out = "SELECT src AS id, count(*) AS c FROM edges GROUP BY src"
    inn = "SELECT dst AS id, count(*) AS c FROM edges GROUP BY dst"
    if kind == "out":
        expr, sub = "coalesce(o.c, 0)", f"LEFT JOIN ({out}) o ON vv.id = o.id"
    elif kind == "in":
        expr, sub = "coalesce(o.c, 0)", f"LEFT JOIN ({inn}) o ON vv.id = o.id"
    else:
        expr = "coalesce(o.c, 0) + coalesce(i.c, 0)"
        sub = f"LEFT JOIN ({out}) o ON vv.id = o.id LEFT JOIN ({inn}) i ON vv.id = i.id"
    return (
        f"WITH {WEB_EDGES_CTE.strip()}\n"
        f"SELECT vv.id, CAST({expr} AS DOUBLE) AS degree FROM v vv {sub}"
    )
