"""Graph validation predicates — scalar aggregations + short iterative checks.

Reference: /root/reference/src/core/validation.rs — is_empty (:16),
is_connected (:24-55, BFS reachability; follows both directions on digraphs),
has_negative_weights (:57), has_self_loops (:67), is_dag (:77-130, Kahn
peeling), is_bipartite (:132-171, BFS 2-coloring), count_components (:173),
require_*/validate_* raising on violation (:203-410).

Spark shapes: one-pass aggregates where possible; is_dag = iterative
zero-in-degree peeling (O(longest path) supersteps); is_bipartite = parity
of BFS level via hash-min-style propagation; component counts reuse the CC
kernel.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from graphina_spark.graph import LinkGraph
from graphina_spark.plans.materialize import local_materialize as _mat


class GraphValidationError(ValueError):
    """Mirror of GraphinaError::InvalidGraph."""


def is_empty(g: LinkGraph) -> bool:
    return g.vertices.isEmpty()


def has_self_loops(g: LinkGraph) -> bool:
    return not g.edges.where(F.col("src") == F.col("dst")).isEmpty()


def has_negative_weights(g: LinkGraph) -> bool:
    return not g.edges.where(F.col("weight") < 0).isEmpty()


def count_components(g: LinkGraph) -> int:
    from graphina_spark.operators.components import weakly_connected_components

    labels = weakly_connected_components(g)
    return labels.select("component").distinct().count()


def is_connected(g: LinkGraph) -> bool:
    """Single (weak) component; empty graph is connected (validation.rs:24-33
    returns true for empty)."""
    if is_empty(g):
        return True
    return count_components(g) == 1


def is_dag(g: LinkGraph) -> bool:
    """Kahn peeling: repeatedly delete zero-in-degree vertices; acyclic iff
    everything peels (validation.rs:77-130).  Undirected graphs with ≥1 edge
    are never DAGs (an undirected edge is a 2-cycle under petgraph's
    definition — matches the reference, which only peels digraphs; we pin
    is_dag(undirected)=False unless edgeless)."""
    if not g.directed:
        return g.edges.isEmpty()
    remaining = (
        g.edges.where(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .transform(_mat)
    )
    if not g.edges.where(F.col("src") == F.col("dst")).isEmpty():
        return False
    while not remaining.isEmpty():
        # sources = vertices with outgoing edges but no incoming ones
        srcs = remaining.select("src").distinct()
        dsts = remaining.select(F.col("dst").alias("src")).distinct()
        zero_in = srcs.join(dsts, "src", "left_anti")
        if zero_in.isEmpty():
            return False  # every remaining vertex has an in-edge → cycle
        remaining = remaining.join(zero_in, "src", "left_anti").localCheckpoint(
            eager=True
        )
    return True


def is_bipartite(g: LinkGraph, max_iter: int = 100_000) -> bool:
    """Synchronous BFS 2-coloring over the symmetrized edges
    (validation.rs:132-171): color = parity of BFS level from the component's
    min vertex; conflict (an edge with equal colors after convergence) →
    not bipartite.  Implemented as hash-min level propagation: each vertex
    tracks (root, level); a smaller root or same-root-smaller-level wins.

    The parity-conflict check is only valid on a CONVERGED labeling, so the
    loop runs to fixpoint (``changed == 0``); if the safety cap ``max_iter``
    (≥ the max BFS eccentricity) is hit first, a ConvergenceError is raised
    rather than returning a possibly-wrong answer."""
    from graphina_spark.operators.centrality import ConvergenceError

    if g.edges.where(F.col("src") == F.col("dst")).count() > 0:
        return False  # self-loop = odd cycle
    sym = g.undirected_view().select("src", "dst").distinct().repartition("src").cache()
    state = g.vertices.select(
        "id", F.col("id").alias("root"), F.lit(0).alias("level")
    ).transform(_mat)
    converged = False
    for _ in range(max_iter):
        cand = (
            state.join(sym, state["id"] == sym["src"])
            .select(
                F.col("dst").alias("id"),
                F.col("root"),
                (F.col("level") + 1).alias("level"),
            )
            .unionAll(state)
            .groupBy("id")
            .agg(F.min(F.struct("root", "level")).alias("s"))
            .select("id", F.col("s.root").alias("root"), F.col("s.level").alias("level"))
            .transform(_mat)
        )
        changed = (
            cand.alias("a")
            .join(state.alias("b"), "id")
            .where(
                (F.col("a.root") != F.col("b.root"))
                | (F.col("a.level") != F.col("b.level"))
            )
            .count()
        )
        state = cand
        if changed == 0:
            converged = True
            break
    if not converged:
        sym.unpersist()
        raise ConvergenceError(
            f"is_bipartite: level labeling did not converge within {max_iter} rounds"
        )
    conflicts = (
        sym.join(state.select(F.col("id").alias("src"), F.col("level").alias("ls")), "src")
        .join(state.select(F.col("id").alias("dst"), F.col("level").alias("ld")), "dst")
        .where((F.col("ls") + F.col("ld")) % 2 == 0)
        .count()
    )
    sym.unpersist()
    return conflicts == 0


def require_non_empty(g: LinkGraph, algo: str = "") -> None:
    if is_empty(g):
        raise GraphValidationError(f"{algo}: graph is empty")


def require_connected(g: LinkGraph, algo: str = "") -> None:
    if not is_connected(g):
        raise GraphValidationError(f"{algo}: graph is not connected")


def require_non_negative_weights(g: LinkGraph, algo: str = "") -> None:
    if has_negative_weights(g):
        raise GraphValidationError(f"{algo}: graph has negative weights")


def require_no_self_loops(g: LinkGraph, algo: str = "") -> None:
    if has_self_loops(g):
        raise GraphValidationError(f"{algo}: graph has self-loops")


def require_dag(g: LinkGraph, algo: str = "") -> None:
    if not is_dag(g):
        raise GraphValidationError(f"{algo}: graph is not a DAG")


def validate_for_algorithm(g: LinkGraph, algo: str) -> None:
    """non-empty + connected + non-negative weights (validation.rs:322-335)."""
    require_non_empty(g, algo)
    require_connected(g, algo)
    require_non_negative_weights(g, algo)
