"""Core numbers: exact vs nx.core_number, both dispatch paths identical."""

from __future__ import annotations

import networkx as nx

from csd363_sin_spark.operators.kcore import core_number, k_core
from csd363_sin_spark.plans.induce import graph_from_edges, induce_graph
from csd363_sin_spark.sources.synth import synth_transcripts

from tests.conftest import graph_to_networkx


def _collect(df):
    return {r["vertex_id"]: r["core"] for r in df.collect()}


def test_core_number_vs_networkx_both_paths(spark):
    t = synth_transcripts(spark, n_convs=60, n_tools=12, n_clusters=3, seed=17)
    g = induce_graph(t)
    expected = nx.core_number(graph_to_networkx(g))
    driver = _collect(core_number(g))
    dist = _collect(core_number(g, local_edges_threshold=0))
    assert driver == expected
    assert dist == expected  # bit-identical integer math on both paths


def test_core_number_shapes(spark):
    # triangle + pendant + isolate-ish chain: known cores
    # 0-1-2 triangle (core 2), 3 pendant on 2 (core 1), 4-5 edge (core 1)
    g = graph_from_edges(spark, [(0, 1), (1, 2), (0, 2), (2, 3), (4, 5)])
    assert _collect(core_number(g)) == {0: 2, 1: 2, 2: 2, 3: 1, 4: 1, 5: 1}
    assert _collect(core_number(g, local_edges_threshold=0)) == {
        0: 2, 1: 2, 2: 2, 3: 1, 4: 1, 5: 1,
    }


def test_k_core_subgraph(spark):
    g = graph_from_edges(spark, [(0, 1), (1, 2), (0, 2), (2, 3), (4, 5)])
    sub = k_core(g, 2)
    assert {r["vertex_id"] for r in sub.vertices.collect()} == {0, 1, 2}
    assert {(r["src"], r["dst"]) for r in sub.edges.collect()} == {
        (0, 1), (1, 2), (0, 2),
    }
    # k above the max core: empty
    assert k_core(g, 3).vertices.isEmpty()
