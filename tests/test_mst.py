"""Borůvka minimum spanning forest tests (operators/mst.py)."""

from __future__ import annotations

import pytest

from csd363_sin_spark.operators.mst import minimum_spanning_forest
from csd363_sin_spark.plans.induce import graph_from_edges, induce_graph
from csd363_sin_spark.sources.synth import synth_transcripts


def _kruskal(edges):
    """Mirror spec: Kruskal over the (weight, src, dst) total order —
    produces the unique MSF of the keyed graph."""
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    out = []
    for w, u, v in sorted((w, u, v) for u, v, w in edges):
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
            out.append((u, v, w))
    return sorted(out)


def _collect_msf(g, **kw):
    return sorted(
        (r["src"], r["dst"], r["weight"])
        for r in minimum_spanning_forest(g, **kw).collect()
    )


def test_msf_vs_kruskal_on_transcript_graph(spark):
    t = synth_transcripts(spark, n_convs=50, n_tools=12, n_clusters=3, seed=7)
    g = induce_graph(t)
    edges = [
        (r["src"], r["dst"], r["weight"]) for r in g.edges.collect()
    ]
    expected = _kruskal(edges)
    got = _collect_msf(g)
    assert got == expected
    # forest invariant: |F| = |V| - #components
    import networkx as nx

    nxg = nx.Graph()
    nxg.add_nodes_from(r["vertex_id"] for r in g.vertices.collect())
    nxg.add_weighted_edges_from(edges)
    assert len(got) == nxg.number_of_nodes() - nx.number_connected_components(nxg)
    # total weight is unique across ALL minimum forests
    nx_total = sum(
        d["weight"] for _, _, d in nx.minimum_spanning_edges(nxg, data=True)
    )
    assert sum(w for _, _, w in got) == pytest.approx(nx_total, abs=1e-9)
    # determinism across runs
    assert _collect_msf(g) == got


def test_msf_forced_distributed_merge_parity(spark):
    t = synth_transcripts(spark, n_convs=30, n_tools=8, n_clusters=2, seed=9)
    g = induce_graph(t)
    assert _collect_msf(g, local_merge_threshold=0) == _collect_msf(g)


def test_msf_anchors(spark):
    # weighted 4-cycle: drops exactly the max-weight edge
    g = graph_from_edges(
        spark,
        [(0, 1), (1, 2), (2, 3), (0, 3)],
        weights=[1.0, 2.0, 3.0, 4.0],
    )
    assert _collect_msf(g) == [(0, 1, 1.0), (1, 2, 2.0), (2, 3, 3.0)]
    # equal weights: tie broken by (src, dst) — the lexicographically
    # smallest spanning edges win
    g = graph_from_edges(
        spark, [(0, 1), (1, 2), (0, 2)], weights=[1.0, 1.0, 1.0]
    )
    assert _collect_msf(g) == [(0, 1, 1.0), (0, 2, 1.0)]
    # disconnected: one tree per component, isolates contribute nothing
    g = graph_from_edges(
        spark, [(0, 1), (2, 3), (3, 4), (2, 4)], weights=[5.0, 1.0, 2.0, 3.0]
    )
    assert _collect_msf(g) == [(0, 1, 5.0), (2, 3, 1.0), (3, 4, 2.0)]
