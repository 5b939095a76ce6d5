"""Louvain: exact parity with the spec oracle + quality vs networkx."""

from __future__ import annotations

import networkx as nx
import pytest

from csd363_sin_spark.operators.louvain import louvain
from csd363_sin_spark.plans.induce import graph_from_edges, induce_graph
from csd363_sin_spark.sources.synth import synth_ground_truth, synth_transcripts

from tests.conftest import graph_to_networkx
from tests.louvain_oracle import oracle_louvain
from tests.oracles import oracle_nmi


def _spark_vs_oracle(spark, graph, weighted=True):
    # BOTH execution paths (distributed supersteps forced with
    # local_phase_edges=0, and the adaptive driver-side phase) must match
    # the independent sequential spec oracle bit-for-bit.
    res = louvain(graph, weighted=weighted, local_phase_edges=0)
    got = {r["vertex_id"]: r["comm"] for r in res.assign.collect()}
    res_local = louvain(graph, weighted=weighted)
    got_local = {r["vertex_id"]: r["comm"] for r in res_local.assign.collect()}
    rows = [
        (r["src"], r["dst"], r["weight"] if weighted else 1.0)
        for r in graph.edges.collect()
    ]
    verts = [r["vertex_id"] for r in graph.vertices.collect()]
    exp, exp_q, _levels, _hist = oracle_louvain(rows, verts)
    assert got == exp, (
        f"assignment mismatch: {sum(1 for v in got if got[v] != exp[v])}/"
        f"{len(got)} vertices differ"
    )
    assert got_local == exp, "driver-side phase diverged from the spec oracle"
    assert res.modularity == pytest.approx(exp_q, abs=1e-9)
    assert res_local.modularity == pytest.approx(exp_q, abs=1e-9)
    return res, got


def test_louvain_phase_dispatch_parity(spark):
    """Distributed supersteps vs driver-side phase: bit-identical
    assignments on a planted transcript graph (integer-exact scores)."""
    t = synth_transcripts(spark, n_convs=120, n_tools=16, n_clusters=4, seed=45)
    g = induce_graph(t)
    a = louvain(g, weighted=True, local_phase_edges=0)
    b = louvain(g, weighted=True)  # all levels under default threshold
    got_a = {r["vertex_id"]: r["comm"] for r in a.assign.collect()}
    got_b = {r["vertex_id"]: r["comm"] for r in b.assign.collect()}
    assert got_a == got_b
    assert a.modularity == pytest.approx(b.modularity, abs=1e-12)
    assert a.supersteps == b.supersteps and a.levels == b.levels


def test_louvain_two_triangles(spark):
    g = graph_from_edges(
        spark, [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]
    )
    res, got = _spark_vs_oracle(spark, g)
    # the canonical split: triangles end up in different communities
    assert got[0] == got[1] == got[2]
    assert got[3] == got[4] == got[5]
    assert got[0] != got[3]
    assert res.modularity == pytest.approx(6 / 7 - 2 * (7 / 14) ** 2, abs=1e-9)


def test_louvain_barbell(spark):
    k5a = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    k5b = [(a, b) for a in range(5, 10) for b in range(a + 1, 10)]
    g = graph_from_edges(spark, k5a + k5b + [(4, 5)])
    _res, got = _spark_vs_oracle(spark, g)
    assert len({got[v] for v in range(5)}) == 1
    assert len({got[v] for v in range(5, 10)}) == 1
    assert got[0] != got[9]


def test_louvain_star_and_chain(spark):
    g = graph_from_edges(spark, [(0, i) for i in range(1, 9)] + [(20, 21), (21, 22)])
    _spark_vs_oracle(spark, g)


def test_louvain_planted_partition_quality(spark):
    """Planted 3-cluster transcript graph: exact oracle parity AND
    networkx-Louvain-level quality AND planted-label recovery."""
    t = synth_transcripts(spark, n_convs=90, n_tools=12, n_clusters=3, seed=42)
    g = induce_graph(t)
    res, got = _spark_vs_oracle(spark, g, weighted=True)

    nxg = graph_to_networkx(g)
    nx_q = nx.community.modularity(
        nxg,
        nx.community.louvain_communities(nxg, weight="weight", seed=7),
        weight="weight",
    )
    # synchronous distributed variant should be within a few % of sequential
    assert res.modularity > nx_q - 0.05, (res.modularity, nx_q)

    gt = synth_ground_truth(spark, n_convs=90, n_tools=12, n_clusters=3, seed=42)
    gt_map = {
        r["vertex_id"]: r["comm"]
        for r in g.vertices.join(gt, "actor").select("vertex_id", "comm").collect()
    }
    score = oracle_nmi(got, gt_map)
    assert score > 0.5, score


def test_louvain_unweighted_mode(spark):
    t = synth_transcripts(spark, n_convs=40, n_tools=8, n_clusters=2, seed=44)
    g = induce_graph(t, binarize=True)
    _spark_vs_oracle(spark, g, weighted=False)
