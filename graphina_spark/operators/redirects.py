"""Redirect-chain resolution — follow 301 chains to their final target.

Crawl-graph preprocessing: a link to u must be credited to redirect-final(u)
before any ranking runs, or chains of 301s siphon rank into dead hops.  The
redirect map is a *functional* graph (one out-edge per source), so chain
following is pointer jumping — f(u) ← f(f(u)) — which resolves a chain of
length L in ⌈log₂ L⌉ rounds, each one self-join + materialize (the same
doubling kernel as operators/components.py's label compression).

Loops (a→b→a — real crawls have them) can't be chased to a terminal; under
doubling they stabilize pointing *inside* the cycle, so after the fixpoint
we flag any final that still has an outgoing redirect: those rows get
``final = NULL`` rather than a silently-wrong target.

Scale shape: O(log L) self-joins on the redirect frame (|redirects| ≪ |V| —
only redirecting pages have rows), each materialized via
``local_materialize`` to keep lineage flat; the `changed` fixpoint check is
one count per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphina_spark.plans.materialize import local_materialize as _mat


def resolve_redirects(redirects: DataFrame, max_rounds: int = 64) -> DataFrame:
    """(src, final) — final target of each redirect source; NULL for
    sources whose chain enters a redirect loop.

    ``redirects`` is (src, dst); duplicate sources collapse to the smallest
    dst (deterministic).  ``max_rounds`` bounds doubling (64 covers chains
    of length 2^64 — effectively any input; the loop exits early at the
    fixpoint)."""
    f = (
        redirects.groupBy("src")
        .agg(F.min("dst").alias("dst"))
        .transform(_mat)
    )
    srcs = f.select(F.col("src").alias("_r")).transform(_mat)
    prev_unresolved = None
    for _ in range(max_rounds):
        nxt = f.select(F.col("src").alias("_s"), F.col("dst").alias("_d"))
        f2 = (
            f.join(nxt, f["dst"] == nxt["_s"], "left")
            .select("src", F.coalesce("_d", "dst").alias("dst"))
            .transform(_mat)
        )
        f.unpersist()
        f = f2
        # Stop on the *unresolved* count (rows whose dst still redirects):
        # it is monotone non-increasing (a terminal dst stays terminal) and
        # strictly decreases while any terminal-bound chain row remains
        # (every dyadic distance interval of a live chain is populated), so
        # a plateau means exactly the loop-bound rows are left.  `changed`
        # is NOT a sound stop — a ≥3-cycle never converges under doubling
        # (f squares a cyclic permutation forever), and its on/off activity
        # could mask chain progress in a raw changed-count.
        unresolved = f.join(
            srcs, f["dst"] == srcs["_r"], "left_semi"
        ).count()
        if unresolved == 0 or unresolved == prev_unresolved:
            break
        prev_unresolved = unresolved
    # a final that still redirects somewhere is inside a loop
    out = f.join(srcs, f["dst"] == srcs["_r"], "left").select(
        "src",
        F.when(F.col("_r").isNull(), F.col("dst")).alias("final"),
    )
    return out
