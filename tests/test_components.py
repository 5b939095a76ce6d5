"""Connected components (large-star/small-star) vs networkx oracle."""

from __future__ import annotations

import networkx as nx
import pytest

from csd363_sin_spark.operators.components import (
    component_sizes,
    connected_components,
    largest_component,
)
from csd363_sin_spark.plans.induce import Graph, graph_from_edges
from csd363_sin_spark.sources.synth import synth_transcripts
from csd363_sin_spark.plans.induce import induce_graph

from tests.conftest import graph_to_networkx


def _assert_matches_nx(graph):
    # both dispatch paths: driver-side union-find (default for small
    # graphs) and the distributed large-star/small-star rounds (forced
    # with local_edges_threshold=0) must produce the identical labeling
    comp = {r["vertex_id"]: r["comp_id"] for r in connected_components(graph).collect()}
    dist = {
        r["vertex_id"]: r["comp_id"]
        for r in connected_components(graph, local_edges_threshold=0).collect()
    }
    nxg = graph_to_networkx(graph)
    expected = {}
    for cc in nx.connected_components(nxg):
        root = min(cc)
        for v in cc:
            expected[v] = root
    assert comp == expected
    assert dist == expected


def test_cc_forest_with_isolates(spark):
    # 4 components incl. 2 isolates (FIXTURES.md F5 `forest`)
    g = graph_from_edges(spark, [(0, 1), (1, 2), (5, 6), (10, 11), (11, 12), (12, 10)])
    iso = spark.createDataFrame(
        [(20, "v:20", "v"), (21, "v:21", "v")], "vertex_id long, actor string, kind string"
    )
    g = Graph(vertices=g.vertices.unionByName(iso), edges=g.edges)
    comp = {r["vertex_id"]: r["comp_id"] for r in connected_components(g).collect()}
    assert comp[20] == 20 and comp[21] == 21
    assert comp[0] == comp[1] == comp[2] == 0
    assert comp[5] == comp[6] == 5
    assert comp[10] == comp[11] == comp[12] == 10


def test_cc_chain(spark):
    g = graph_from_edges(spark, [(i, i + 1) for i in range(9)])
    _assert_matches_nx(g)


def test_cc_two_triangles_bridge(spark):
    g = graph_from_edges(spark, [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)])
    _assert_matches_nx(g)


def test_cc_induced_graph(spark):
    t = synth_transcripts(spark, n_convs=60, n_tools=12, n_clusters=3, seed=42)
    g = induce_graph(t)
    _assert_matches_nx(g)


def test_largest_component_focus(spark):
    g = graph_from_edges(spark, [(0, 1), (1, 2), (0, 2), (10, 11)])
    comp = connected_components(g)
    big = largest_component(g, comp)
    assert sorted(r["vertex_id"] for r in big.vertices.collect()) == [0, 1, 2]
    assert big.edges.count() == 3
    sizes = {r["comp_id"]: r["size"] for r in component_sizes(comp).collect()}
    assert sizes == {0: 3, 10: 2}
