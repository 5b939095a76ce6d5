"""Bridges / 2-edge-connected components vs networkx, both dispatch paths."""

from __future__ import annotations

import networkx as nx

from csd363_sin_spark.operators.bridges import (
    bridge_decomposition,
    bridges,
    two_edge_components,
)
from csd363_sin_spark.plans.induce import Graph, graph_from_edges
from csd363_sin_spark.sources.synth import synth_transcripts
from csd363_sin_spark.plans.induce import induce_graph

from tests.conftest import graph_to_networkx


def _nx_bridges(graph):
    nxg = graph_to_networkx(graph)
    return sorted((min(a, b), max(a, b)) for a, b in nx.bridges(nxg))


def _nx_tec(graph):
    nxg = graph_to_networkx(graph)
    out = {}
    for comp in nx.k_edge_components(nxg, 2):
        root = min(comp)
        for v in comp:
            out[v] = root
    return out


def _assert_matches_nx(graph):
    expected_b = _nx_bridges(graph)
    expected_t = _nx_tec(graph)
    for threshold in (100_000, 0):  # driver path, then forced-distributed
        dec = bridge_decomposition(graph, local_edges_threshold=threshold)
        got_b = sorted((r["src"], r["dst"]) for r in dec.bridges.collect())
        got_t = {r["vertex_id"]: r["tec_id"] for r in dec.tec.collect()}
        assert got_b == expected_b, f"threshold={threshold}"
        assert got_t == expected_t, f"threshold={threshold}"


def test_bridges_two_triangles_joined(spark):
    # two triangles joined by one bridge (2,3): exactly one bridge
    g = graph_from_edges(
        spark, [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]
    )
    _assert_matches_nx(g)


def test_bridges_path_graph_all_bridges(spark):
    g = graph_from_edges(spark, [(i, i + 1) for i in range(8)])
    _assert_matches_nx(g)


def test_bridges_cycle_has_none(spark):
    g = graph_from_edges(spark, [(i, (i + 1) % 7) for i in range(7)])
    assert bridges(g).count() == 0
    assert bridges(g, local_edges_threshold=0).count() == 0
    _assert_matches_nx(g)


def test_bridges_forest_with_isolates(spark):
    # forest (every edge a bridge) + two isolated vertices
    g = graph_from_edges(spark, [(0, 1), (1, 2), (5, 6), (10, 11)])
    iso = g.vertices.sparkSession.createDataFrame(
        [(20, "v:20", "v"), (21, "v:21", "v")],
        "vertex_id long, actor string, kind string",
    )
    g = Graph(vertices=g.vertices.unionByName(iso), edges=g.edges)
    _assert_matches_nx(g)
    tec = {r["vertex_id"]: r["tec_id"] for r in two_edge_components(g).collect()}
    assert tec[20] == 20 and tec[21] == 21


def test_bridges_barbell_with_chain(spark):
    # K4 -- chain of 3 -- K4: the chain edges are the bridges, the K4s
    # are the non-trivial 2ECCs
    k4a = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    k4b = [(a + 10, b + 10) for a in range(4) for b in range(a + 1, 4)]
    chain = [(3, 6), (6, 7), (7, 10)]
    g = graph_from_edges(spark, k4a + k4b + chain)
    _assert_matches_nx(g)
    b = sorted((r["src"], r["dst"]) for r in bridges(g).collect())
    assert b == [(3, 6), (6, 7), (7, 10)]


def test_bridges_cross_edge_bfs_tree(spark):
    # even cycle: the BFS tree from 0 has a CROSS edge between the two
    # deepest vertices (same depth) — the case a naive DFS-low-link port
    # over a BFS tree gets wrong; the crossing-sum test must not
    g = graph_from_edges(spark, [(0, 1), (0, 2), (1, 3), (2, 4), (3, 5), (4, 5)])
    _assert_matches_nx(g)
    assert bridges(g).count() == 0


def test_bridges_on_synth_transcript_graph(spark):
    # the engine's own induced graph at small synth scale, both paths
    g = induce_graph(synth_transcripts(spark, n_convs=60, seed=7))
    _assert_matches_nx(g)


def test_bridges_random_graphs_vs_networkx(spark):
    import random

    rng = random.Random(42)
    for trial in range(3):
        n = 24
        edges = set()
        for _ in range(30):
            a, b = rng.randrange(n), rng.randrange(n)
            if a != b:
                edges.add((min(a, b), max(a, b)))
        g = graph_from_edges(spark, sorted(edges))
        _assert_matches_nx(g)
