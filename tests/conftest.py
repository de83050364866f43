import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from graphina_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("graphina_spark_tests", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


def make_graph(spark, edges, n=None, directed=True, weights=None):
    """Tiny fixture helper: edge list of (src, dst) pairs → LinkGraph."""
    from graphina_spark.graph import LinkGraph

    rows = [
        (int(s), int(d), float(weights[i]) if weights else 1.0)
        for i, (s, d) in enumerate(edges)
    ]
    e = spark.createDataFrame(rows, "src long, dst long, weight double")
    v = None
    if n is not None:
        v = spark.range(n).withColumnRenamed("id", "id")
    return LinkGraph.from_edges(e, directed=directed, vertices=v)
