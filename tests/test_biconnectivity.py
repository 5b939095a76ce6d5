"""Biconnected components / articulation points vs networkx, both paths."""

from __future__ import annotations

import networkx as nx

from csd363_sin_spark.operators.biconnectivity import (
    articulation_points,
    bcc_decomposition,
)
from csd363_sin_spark.plans.induce import Graph, graph_from_edges
from csd363_sin_spark.sources.synth import synth_transcripts
from csd363_sin_spark.plans.induce import induce_graph

from tests.conftest import graph_to_networkx


def _nx_expected(graph):
    nxg = graph_to_networkx(graph)
    rows = set()
    for block in nx.biconnected_component_edges(nxg):
        edges = sorted((min(a, b), max(a, b)) for a, b in block)
        ls, ld = min(edges)
        rows.update((s, d, ls, ld) for s, d in edges)
    aps = sorted(nx.articulation_points(nxg))
    return sorted(rows), aps


def _assert_matches_nx(graph):
    expected_blocks, expected_aps = _nx_expected(graph)
    for threshold in (100_000, 0):  # driver Tarjan, then aux-graph kernel
        dec = bcc_decomposition(graph, local_edges_threshold=threshold)
        got_blocks = sorted(
            (r["src"], r["dst"], r["bcc_src"], r["bcc_dst"])
            for r in dec.blocks.collect()
        )
        got_aps = sorted(r["vertex_id"] for r in dec.articulation.collect())
        assert got_blocks == expected_blocks, f"threshold={threshold}"
        assert got_aps == expected_aps, f"threshold={threshold}"


def test_bcc_two_triangles_shared_vertex(spark):
    # bowtie: two triangles sharing vertex 2 -> two blocks, AP = {2}
    g = graph_from_edges(spark, [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (2, 4)])
    _assert_matches_nx(g)
    aps = sorted(r["vertex_id"] for r in articulation_points(g).collect())
    assert aps == [2]


def test_bcc_path_every_edge_own_block(spark):
    g = graph_from_edges(spark, [(i, i + 1) for i in range(6)])
    _assert_matches_nx(g)


def test_bcc_cycle_single_block_no_aps(spark):
    g = graph_from_edges(spark, [(i, (i + 1) % 8) for i in range(8)])
    _assert_matches_nx(g)
    assert articulation_points(g).count() == 0


def test_bcc_barbell_with_chain(spark):
    # K4 -- chain -- K4: blocks = two K4s + three chain edges;
    # APs = chain endpoints + interior
    k4a = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    k4b = [(a + 10, b + 10) for a in range(4) for b in range(a + 1, 4)]
    g = graph_from_edges(spark, k4a + k4b + [(3, 6), (6, 7), (7, 10)])
    _assert_matches_nx(g)
    aps = sorted(r["vertex_id"] for r in articulation_points(g).collect())
    assert aps == [3, 6, 7, 10]


def test_bcc_cross_edge_bfs_tree(spark):
    # even cycle + chord: BFS tree from 0 has cross edges (equal-depth
    # non-tree endpoints) — the case DFS-low-link-over-BFS gets wrong
    g = graph_from_edges(
        spark, [(0, 1), (0, 2), (1, 3), (2, 4), (3, 5), (4, 5), (3, 4)]
    )
    _assert_matches_nx(g)


def test_bcc_ap_without_bridge(spark):
    # two cycles sharing one vertex: an articulation point with NO
    # bridges anywhere (pure 2-edge-connected graph)
    c1 = [(0, 1), (1, 2), (2, 0)]
    c2 = [(0, 3), (3, 4), (4, 0)]
    g = graph_from_edges(spark, c1 + c2)
    _assert_matches_nx(g)
    aps = sorted(r["vertex_id"] for r in articulation_points(g).collect())
    assert aps == [0]


def test_bcc_forest_and_isolates(spark):
    g = graph_from_edges(spark, [(0, 1), (1, 2), (5, 6)])
    iso = g.vertices.sparkSession.createDataFrame(
        [(20, "v:20", "v")], "vertex_id long, actor string, kind string"
    )
    g = Graph(vertices=g.vertices.unionByName(iso), edges=g.edges)
    _assert_matches_nx(g)


def test_bcc_on_synth_transcript_graph(spark):
    g = induce_graph(synth_transcripts(spark, n_convs=60, seed=7))
    _assert_matches_nx(g)


def test_bcc_random_graphs_vs_networkx(spark):
    import random

    rng = random.Random(7)
    for trial in range(3):
        n = 20
        edges = set()
        for _ in range(26):
            a, b = rng.randrange(n), rng.randrange(n)
            if a != b:
                edges.add((min(a, b), max(a, b)))
        g = graph_from_edges(spark, sorted(edges))
        _assert_matches_nx(g)


def test_block_cut_tree(spark):
    from csd363_sin_spark.operators.biconnectivity import block_cut_tree
    import networkx as nx
    from csd363_sin_spark.plans.induce import graph_from_edges

    # bowtie + tail: blocks {tri1, tri2, tail edge}, APs {2, 4}
    g = graph_from_edges(
        spark, [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (2, 4), (4, 9)]
    )
    nxg = graph_to_networkx(g)
    expected = set()
    aps = set(nx.articulation_points(nxg))
    for block in nx.biconnected_component_edges(nxg):
        edges = sorted((min(a, b), max(a, b)) for a, b in block)
        ls, ld = min(edges)
        verts = {v for e in edges for v in e}
        expected.update((v, ls, ld) for v in verts & aps)
    for thr in (100_000, 0):
        got = {
            (r["vertex_id"], r["bcc_src"], r["bcc_dst"])
            for r in block_cut_tree(g, local_edges_threshold=thr).collect()
        }
        assert got == expected, f"threshold={thr}"
    # the block-cut tree here: 2 APs x their incident blocks = 2+2 rows
    assert len(expected) == 4
