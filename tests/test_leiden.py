"""Leiden: dispatch parity, connectivity guarantee, quality vs Louvain."""

from __future__ import annotations

import networkx as nx
import pytest

from csd363_sin_spark.operators.leiden import leiden
from csd363_sin_spark.operators.louvain import louvain
from csd363_sin_spark.plans.induce import graph_from_edges, induce_graph
from csd363_sin_spark.sources.synth import synth_transcripts
from tests.conftest import graph_to_networkx


def _assert_all_connected(graph, got: dict) -> None:
    nxg = graph_to_networkx(graph)
    comms: dict = {}
    for v, c in got.items():
        comms.setdefault(c, set()).add(v)
    for c, members in comms.items():
        sub = nxg.subgraph(members)
        assert nx.is_connected(sub), (c, sorted(members))


def _run_both_paths(graph, weighted=True):
    a = leiden(graph, weighted=weighted, local_phase_edges=0)
    b = leiden(graph, weighted=weighted)  # driver dispatch
    got_a = {r["vertex_id"]: r["comm"] for r in a.assign.collect()}
    got_b = {r["vertex_id"]: r["comm"] for r in b.assign.collect()}
    assert got_a == got_b, (
        f"dispatch divergence: {sum(1 for v in got_a if got_a[v] != got_b[v])}"
        f"/{len(got_a)} vertices differ"
    )
    assert a.modularity == pytest.approx(b.modularity, abs=1e-9)
    assert a.supersteps == b.supersteps and a.levels == b.levels
    return a, got_a


def test_leiden_two_triangles(spark):
    g = graph_from_edges(
        spark, [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]
    )
    res, got = _run_both_paths(g)
    assert got[0] == got[1] == got[2]
    assert got[3] == got[4] == got[5]
    assert got[0] != got[3]
    assert res.modularity == pytest.approx(6 / 7 - 2 * (7 / 14) ** 2, abs=1e-9)
    # canonical labels: community label = min member id
    assert got[0] == 0 and got[3] == 3
    _assert_all_connected(g, got)


def test_leiden_barbell_and_star(spark):
    k5a = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    k5b = [(a, b) for a in range(5, 10) for b in range(a + 1, 10)]
    g = graph_from_edges(spark, k5a + k5b + [(4, 5)])
    _res, got = _run_both_paths(g)
    assert len({got[v] for v in range(5)}) == 1
    assert len({got[v] for v in range(5, 10)}) == 1
    assert got[0] != got[9]
    _assert_all_connected(g, got)

    g2 = graph_from_edges(
        spark, [(0, i) for i in range(1, 9)] + [(20, 21), (21, 22)]
    )
    _res2, got2 = _run_both_paths(g2)
    _assert_all_connected(g2, got2)


def test_leiden_connectivity_guarantee_random(spark):
    """Every output community induces a connected subgraph — the Leiden
    paper's headline guarantee (Traag et al. 2019), on random graphs."""
    import random

    for seed in (3, 7):
        rng = random.Random(seed)
        n = 40
        edges = [
            (u, v)
            for u in range(n)
            for v in range(u + 1, n)
            if rng.random() < 0.08
        ]
        if not edges:
            continue
        g = graph_from_edges(spark, edges)
        res, got = _run_both_paths(g)
        _assert_all_connected(g, got)
        assert -0.5 <= res.modularity <= 1.0


def test_leiden_planted_partition_vs_louvain(spark):
    """Planted transcript graph: Leiden matches or beats Louvain's
    modularity (the carryover + refinement never has to re-merge split
    parts blindly) and recovers the planted structure."""
    t = synth_transcripts(spark, n_convs=90, n_tools=12, n_clusters=3, seed=42)
    g = induce_graph(t)
    res, got = _run_both_paths(g, weighted=True)
    _assert_all_connected(g, got)

    lv = louvain(g, weighted=True)
    assert res.modularity >= lv.modularity - 1e-9, (
        res.modularity,
        lv.modularity,
    )


def test_leiden_determinism(spark):
    t = synth_transcripts(spark, n_convs=60, n_tools=10, n_clusters=3, seed=9)
    g = induce_graph(t)
    r1 = leiden(g)
    r2 = leiden(g)
    a1 = {r["vertex_id"]: r["comm"] for r in r1.assign.collect()}
    a2 = {r["vertex_id"]: r["comm"] for r in r2.assign.collect()}
    assert a1 == a2
    assert r1.modularity == r2.modularity


def test_leiden_checkpoint_resume_identical(spark, tmp_path):
    """Kill mid-run after the level-1 snapshot; a re-launched leiden()
    with the same store must resume and produce the storeless result
    exactly (the deterministic spec makes this checkable)."""
    from csd363_sin_spark.checkpoint import CheckpointStore
    from csd363_sin_spark.operators import leiden as ld

    t = synth_transcripts(spark, n_convs=200, n_tools=24, n_clusters=5, seed=9)
    g = induce_graph(t)

    clean = ld.leiden(g, weighted=True)
    want = {r["vertex_id"]: r["comm"] for r in clean.assign.collect()}

    store = CheckpointStore(str(tmp_path / "store"))
    calls = {"n": 0}
    orig = ld._local_move_phase_driver

    def bomb(*a, **kw):
        calls["n"] += 1
        if calls["n"] == 2:  # level 0 snapshotted; die inside level 1
            raise RuntimeError("simulated executor loss")
        return orig(*a, **kw)

    ld._local_move_phase_driver = bomb
    try:
        with pytest.raises(RuntimeError):
            ld.leiden(g, weighted=True, store=store)
    finally:
        ld._local_move_phase_driver = orig

    meta = store.load_meta("leiden_state")
    assert not meta.get("done") and meta["level"] >= 1, meta

    res = ld.leiden(g, weighted=True, store=store)
    got = {r["vertex_id"]: r["comm"] for r in res.assign.collect()}
    assert got == want
    assert res.modularity == pytest.approx(clean.modularity, abs=1e-9)
    # superstep lineage rows were recorded for the crashed levels
    kinds = {row.get("kind") for row in store.read_lineage()}
    assert "superstep" in kinds
