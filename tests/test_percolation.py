"""Clique percolation (k=3) vs networkx k_clique_communities, both paths."""

from __future__ import annotations

import networkx as nx

from csd363_sin_spark.operators.percolation import clique_percolation
from csd363_sin_spark.plans.induce import graph_from_edges
from csd363_sin_spark.sources.synth import synth_transcripts
from csd363_sin_spark.plans.induce import induce_graph

from tests.conftest import graph_to_networkx


def _nx_communities(graph):
    nxg = graph_to_networkx(graph)
    return {frozenset(c) for c in nx.community.k_clique_communities(nxg, 3)}


def _assert_matches_nx(graph):
    expected = _nx_communities(graph)
    results = []
    for thr in (100_000, 0):  # driver union-find, then triangle-graph CC
        rows = sorted(
            map(tuple, clique_percolation(graph, local_edges_threshold=thr).collect())
        )
        results.append(rows)
        by_label: dict = {}
        for v, a, b, c in rows:
            by_label.setdefault((a, b, c), set()).add(v)
        assert {frozenset(s) for s in by_label.values()} == expected, f"thr={thr}"
        # each label is the lexicographically smallest member triangle
        for (a, b, c), members in by_label.items():
            assert {a, b, c} <= members and a < b < c
    assert results[0] == results[1]  # byte-identical across dispatch paths


def test_cpm_two_triangle_chain(spark):
    # triangles (0,1,2) and (1,2,3) share edge (1,2): ONE community;
    # triangle (5,6,7) is its own; edge (3,5) joins nothing
    g = graph_from_edges(
        spark,
        [(0, 1), (1, 2), (0, 2), (1, 3), (2, 3), (5, 6), (6, 7), (5, 7), (3, 5)],
    )
    _assert_matches_nx(g)


def test_cpm_overlapping_vertex(spark):
    # bowtie: vertex 2 belongs to BOTH communities (the overlap CPM
    # exists for — partitioning operators cannot express this)
    g = graph_from_edges(spark, [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (2, 4)])
    _assert_matches_nx(g)
    rows = clique_percolation(g).collect()
    memberships = [r for r in rows if r["vertex_id"] == 2]
    assert len(memberships) == 2


def test_cpm_vertex_sharing_is_not_enough(spark):
    # two triangles sharing only vertex 0 (no shared edge): two communities
    g = graph_from_edges(spark, [(0, 1), (1, 2), (0, 2), (0, 3), (3, 4), (0, 4)])
    _assert_matches_nx(g)
    labels = {
        (r["com_a"], r["com_b"], r["com_c"])
        for r in clique_percolation(g).collect()
    }
    assert len(labels) == 2


def test_cpm_triangle_free_graph_empty(spark):
    g = graph_from_edges(spark, [(i, i + 1) for i in range(6)])
    assert clique_percolation(g).count() == 0
    assert clique_percolation(g, local_edges_threshold=0).count() == 0


def test_cpm_on_synth_transcript_graph(spark):
    g = induce_graph(synth_transcripts(spark, n_convs=40, seed=11))
    _assert_matches_nx(g)


# ---------------------------------------------------------------------------
# CPM k=4
# ---------------------------------------------------------------------------


def _nx_communities_k4(graph):
    nxg = graph_to_networkx(graph)
    return {frozenset(c) for c in nx.community.k_clique_communities(nxg, 4)}


def _assert_k4_matches_nx(graph):
    from csd363_sin_spark.operators.percolation import clique_percolation_k4

    expected = _nx_communities_k4(graph)
    results = []
    for thr in (100_000, 0):
        rows = sorted(
            map(
                tuple,
                clique_percolation_k4(graph, local_edges_threshold=thr).collect(),
            )
        )
        results.append(rows)
        by_label: dict = {}
        for v, a, b, c, d in rows:
            by_label.setdefault((a, b, c, d), set()).add(v)
        assert {frozenset(s) for s in by_label.values()} == expected, f"thr={thr}"
        for (a, b, c, d), members in by_label.items():
            assert {a, b, c, d} <= members and a < b < c < d
    assert results[0] == results[1]


def test_cpm4_two_k4s_sharing_triangle(spark):
    # K4 {0,1,2,3} and K4 {1,2,3,4} share triangle (1,2,3): one community;
    # K4 {10,11,12,13} is separate; a lone triangle (20,21,22) is ignored
    k4a = [(a, b) for a in (0, 1, 2, 3) for b in (0, 1, 2, 3) if a < b]
    k4b = [(a, b) for a in (1, 2, 3, 4) for b in (1, 2, 3, 4) if a < b]
    k4c = [(a, b) for a in (10, 11, 12, 13) for b in (10, 11, 12, 13) if a < b]
    tri = [(20, 21), (21, 22), (20, 22)]
    g = graph_from_edges(spark, sorted(set(k4a + k4b + k4c + tri)))
    _assert_k4_matches_nx(g)


def test_cpm4_edge_sharing_is_not_enough(spark):
    # two K4s sharing only edge (0,1): k=4 adjacency needs a shared
    # TRIANGLE, so they stay separate communities (k=3 would merge them)
    k4a = [(a, b) for a in (0, 1, 2, 3) for b in (0, 1, 2, 3) if a < b]
    k4b = [(a, b) for a in (0, 1, 8, 9) for b in (0, 1, 8, 9) if a < b]
    g = graph_from_edges(spark, sorted(set(k4a + k4b)))
    _assert_k4_matches_nx(g)
    from csd363_sin_spark.operators.percolation import clique_percolation_k4

    labels = {
        tuple(r[1:]) for r in clique_percolation_k4(g).collect()
    }
    assert len(labels) == 2


def test_cpm4_on_synth_transcript_graph(spark):
    g = induce_graph(synth_transcripts(spark, n_convs=40, seed=11))
    _assert_k4_matches_nx(g)
