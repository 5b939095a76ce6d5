"""Truss decomposition: exact vs nx.k_truss, both dispatch paths identical."""

from __future__ import annotations

import networkx as nx

from csd363_sin_spark.operators.ktruss import k_truss_edges, truss_number
from csd363_sin_spark.plans.induce import graph_from_edges, induce_graph
from csd363_sin_spark.sources.synth import synth_transcripts

from tests.conftest import graph_to_networkx


def _nx_truss_numbers(nxg):
    t = {}
    h = nxg.copy()
    k = 2
    while h.number_of_edges():
        nxt = nx.k_truss(nxg, k + 1)
        kept = {frozenset(e) for e in nxt.edges()}
        for e in h.edges():
            if frozenset(e) not in kept:
                t[frozenset(e)] = k
        h = nxt
        k += 1
    return t


def _collect(df):
    return {frozenset((r["u"], r["v"])): r["truss"] for r in df.collect()}


def test_truss_vs_networkx_both_paths(spark):
    t = synth_transcripts(spark, n_convs=60, n_tools=12, n_clusters=3, seed=41)
    g = induce_graph(t)
    expected = _nx_truss_numbers(graph_to_networkx(g))
    driver = _collect(truss_number(g))
    dist = _collect(truss_number(g, local_edges_threshold=0))
    assert driver == expected
    assert dist == expected  # bit-identical integer math on both paths


def test_truss_hand_case(spark):
    # K4 (truss 4 on all 6 edges) + a pendant edge (truss 2) + a triangle
    # hanging off vertex 0 (its edges close exactly 1 triangle -> truss 3)
    k4 = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
    extra = [(3, 9), (0, 4), (0, 5), (4, 5)]
    g = graph_from_edges(spark, k4 + extra)
    got = _collect(truss_number(g))
    for e in k4:
        assert got[frozenset(e)] == 4
    assert got[frozenset((3, 9))] == 2
    for e in [(0, 4), (0, 5), (4, 5)]:
        assert got[frozenset(e)] == 3
    # k_truss_edges agrees on both paths
    k3_driver = {frozenset((r["u"], r["v"])) for r in k_truss_edges(g, 3).collect()}
    k3_dist = {
        frozenset((r["u"], r["v"]))
        for r in k_truss_edges(g, 3, local_edges_threshold=0).collect()
    }
    assert k3_driver == k3_dist == {frozenset(e) for e in k4 + [(0, 4), (0, 5), (4, 5)]}


def test_truss_resume_mid_peel(spark, monkeypatch, tmp_path):
    """Simulated crash between peel rounds: the resumed run continues
    from the round snapshot and matches an uninterrupted run exactly."""
    import pytest

    import csd363_sin_spark.operators.ktruss as kt
    from csd363_sin_spark.checkpoint import CheckpointStore

    k4 = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
    g = graph_from_edges(spark, k4 + [(3, 9), (0, 4), (0, 5), (4, 5)])
    straight = _collect(truss_number(g, local_edges_threshold=0))

    calls = {"n": 0}
    orig = kt._edge_support

    def bomb(*a, **kw):
        calls["n"] += 1
        if calls["n"] >= 4:
            raise RuntimeError("simulated crash")
        return orig(*a, **kw)

    store = CheckpointStore(str(tmp_path), run_id="tr")
    monkeypatch.setattr(kt, "_edge_support", bomb)
    with pytest.raises(RuntimeError):
        truss_number(g, local_edges_threshold=0, store=store, stage="tx")
    monkeypatch.setattr(kt, "_edge_support", orig)
    assert store.has_meta("tx_state")  # round snapshot survived the crash

    resumed = _collect(
        truss_number(g, local_edges_threshold=0, store=store, stage="tx")
    )
    assert resumed == straight
    # a third call short-circuits to the saved result
    again = _collect(
        truss_number(g, local_edges_threshold=0, store=store, stage="tx")
    )
    assert again == straight


def test_truss_triangle_free(spark):
    # a tree: every edge has truss 2
    g = graph_from_edges(spark, [(0, 1), (1, 2), (2, 3), (1, 4)])
    got = _collect(truss_number(g))
    assert set(got.values()) == {2}
    assert _collect(truss_number(g, local_edges_threshold=0)) == got
