"""Shared Spark fixture for the test suite.

One session per pytest run (Spark startup ~10 s); small shuffle-partition
count so tiny-fixture shuffles stay fast.  local[4] is plenty for unit
tests; the bench harness (bench.py) is the place where parallelism scaling
is measured.
"""

from __future__ import annotations

import pytest

from csd363_sin_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="csd363-sin-spark-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.sql.autoBroadcastJoinThreshold": "10MB"},
    )
    yield s


def graph_to_networkx(graph):
    """Collect a (small, test-only) Graph into networkx for oracle checks."""
    import networkx as nx

    g = nx.Graph()
    for row in graph.vertices.collect():
        g.add_node(int(row["vertex_id"]))
    for row in graph.edges.collect():
        g.add_edge(int(row["src"]), int(row["dst"]), weight=float(row["weight"]))
    return g
