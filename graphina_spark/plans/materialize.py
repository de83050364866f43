"""Superstep materialization that does not inherit exploding statistics.

``DataFrame.localCheckpoint`` preserves the parent plan's *computed*
statistics into the new ``LogicalRDD`` leaf (originStats).  Catalyst's
size-only estimator multiplies child sizes at every join, so in an iterative
kernel the leaf size becomes S^(k^rounds) — the BigInteger carrying it
doubles in bit-length k× per round and after ~10 rounds the stats
computation itself OOMs the driver (observed: Louvain/Borůvka under default
1 GiB heap; every superstep kernel here walks the same cliff at enough
iterations).

:func:`local_materialize` checkpoints eagerly, then re-wraps the
materialized RDD in a fresh ``LogicalRDD`` WITHOUT origin stats (constant
``defaultSizeInBytes``), so per-round stats work is O(1) forever.  The
trade: checkpointed frames lose their inherited "small" size and are no
longer auto-broadcast — the right default for web-scale supersteps (a rank
vector never broadcasts at 10^12 vertices; sessions from
``graphina_spark.session.get_spark`` prefer shuffled-hash joins instead).

Falls back to the plain checkpoint if the JVM-internal constructor is
unavailable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def local_materialize(df: DataFrame) -> DataFrame:
    """Eagerly materialize ``df`` with flat lineage and non-inherited stats."""
    ck = df.localCheckpoint(eager=True)
    try:
        jdf = ck._jdf
        jrdd = jdf.queryExecution().toRdd()
        jspark = df.sparkSession._jsparkSession
        fresh = jspark.internalCreateDataFrame(jrdd, jdf.schema(), False)
        return DataFrame(fresh, df.sparkSession)
    except Exception:  # pragma: no cover - Spark-internal API drift
        return ck
