"""Infomap kernel + enhancement tests."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from csd363_sin_spark.operators.infomap import (
    enhance_infomap,
    flow_power_iteration,
    infomap_distributed,
    infomap_local,
    infomap_multi_trial,
    local_modularity_screen,
    map_equation_codelength,
    map_equation_codelength_df,
)
from csd363_sin_spark.plans.induce import graph_from_edges

TWO_TRI = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]
BARBELL = (
    [(a, b) for a in range(5) for b in range(a + 1, 5)]
    + [(a, b) for a in range(5, 10) for b in range(a + 1, 10)]
    + [(4, 5)]
)
# two K6 cliques + bridge: both >= 10 nodes merged as one community
K6A = [(a, b) for a in range(6) for b in range(a + 1, 6)]
K6B = [(a, b) for a in range(6, 12) for b in range(a + 1, 12)]
TWO_K6 = K6A + K6B + [(5, 6)]


def test_codelength_hand_check():
    """One-module partition: q = 0, L = -sum plogp(p_v) + plogp(1)."""
    part = {v: 0 for v in range(6)}
    L = map_equation_codelength(TWO_TRI, part)
    degs = {0: 2, 1: 2, 2: 3, 3: 3, 4: 2, 5: 2}
    m2 = 14.0
    expected = -sum((d / m2) * math.log2(d / m2) for d in degs.values()) + 0.0
    # plus plogp(q_m + p_m) with q_m=0, p_m=1 -> plogp(1) = 0
    assert L == pytest.approx(expected, abs=1e-12)


def test_codelength_split_beats_one_module_on_barbell():
    one = {v: 0 for v in range(10)}
    split = {v: 0 if v < 5 else 1 for v in range(10)}
    assert map_equation_codelength(BARBELL, split) < map_equation_codelength(
        BARBELL, one
    )


def test_codelength_df_matches_local(spark):
    g = graph_from_edges(spark, BARBELL)
    split = {v: 0 if v < 5 else 1 for v in range(10)}
    assign = spark.createDataFrame(
        [(v, c) for v, c in split.items()], "vertex_id long, comm long"
    )
    L_df = map_equation_codelength_df(g, assign)
    L_local = map_equation_codelength(BARBELL, split)
    assert L_df == pytest.approx(L_local, abs=1e-9)


def test_infomap_local_finds_modules():
    part, L = infomap_local(BARBELL, list(range(10)))
    assert {part[v] for v in range(5)} == {0}
    assert {part[v] for v in range(5, 10)} == {5}
    assert L == pytest.approx(
        map_equation_codelength(BARBELL, part), abs=1e-12
    )
    part2, _ = infomap_local(TWO_K6, list(range(12)))
    assert len({part2[v] for v in range(6)}) == 1
    assert len({part2[v] for v in range(6, 12)}) == 1
    assert part2[0] != part2[11]


def test_infomap_local_multi_trial_deterministic():
    p1, l1 = infomap_local(TWO_K6, list(range(12)), num_trials=5)
    p2, l2 = infomap_local(TWO_K6, list(range(12)), num_trials=5)
    assert p1 == p2 and l1 == l2


def test_screen_and_enhance(spark):
    g = graph_from_edges(spark, TWO_K6)
    assign = g.vertices.select("vertex_id", F.lit(0).cast("long").alias("comm"))
    sel = local_modularity_screen(g, assign, modularity_threshold=0.3, min_size=10)
    assert [r["comm"] for r in sel.collect()] == [0]
    # threshold <= 0 selects nothing (local modularity is exactly 0.0)
    sel0 = local_modularity_screen(g, assign, modularity_threshold=0.0, min_size=10)
    assert sel0.isEmpty()

    out = enhance_infomap(g, assign, modularity_threshold=0.3, min_size=10)
    got = {r["vertex_id"]: r["comm"] for r in out.collect()}
    assert len(set(got.values())) == 2
    assert len({got[v] for v in range(6)}) == 1
    assert len({got[v] for v in range(6, 12)}) == 1
    assert min(got.values()) >= 1  # fresh ids beyond old max (0)
    # the grouped-pandas path (forced) must produce the identical splice
    out_dist = enhance_infomap(
        g, assign, modularity_threshold=0.3, min_size=10, local_edges_threshold=0
    )
    got_dist = {r["vertex_id"]: r["comm"] for r in out_dist.collect()}
    assert got_dist == got


def test_enhance_skips_small_communities(spark):
    g = graph_from_edges(spark, TWO_TRI)  # 6 nodes < min_size
    assign = g.vertices.select("vertex_id", F.lit(0).cast("long").alias("comm"))
    out = enhance_infomap(g, assign, modularity_threshold=0.3, min_size=10)
    assert {r["comm"] for r in out.collect()} == {0}


def test_infomap_multi_trial_standalone(spark):
    g = graph_from_edges(spark, TWO_K6 + [(100, 101)])
    out, L = infomap_multi_trial(g, num_trials=2)
    got = {r["vertex_id"]: r["comm"] for r in out.collect()}
    # bridge component splits into the two K6s; tiny component intact
    assert len({got[v] for v in range(6)}) == 1
    assert len({got[v] for v in range(6, 12)}) == 1
    assert got[100] == got[101]
    assert L == pytest.approx(
        map_equation_codelength(TWO_K6 + [(100, 101)], got), abs=1e-9
    )


def _planted_cliques(k: int, size: int):
    edges = []
    for c in range(k):
        base = c * size
        edges += [(base + a, base + b) for a in range(size) for b in range(a + 1, size)]
    edges += [((c + 1) * size - 1, ((c + 1) * size) % (k * size)) for c in range(k)]
    return edges, list(range(k * size))


@pytest.mark.parametrize(
    "edges,verts",
    [
        (BARBELL, list(range(10))),
        (TWO_K6, list(range(12))),
        _planted_cliques(4, 8),
    ],
)
def test_infomap_distributed_parity_with_local(spark, edges, verts):
    """Distributed synchronous kernel vs sequential local kernel: exact
    partition + codelength parity on separable (planted) graphs."""
    g = graph_from_edges(spark, edges)
    part_l, L_l = infomap_local(edges, verts)
    out, L_d = infomap_distributed(g)
    part_d = {r["vertex_id"]: r["comm"] for r in out.collect()}
    assert part_d == part_l
    assert L_d == pytest.approx(L_l, abs=1e-9)
    assert L_d == pytest.approx(map_equation_codelength(edges, part_d), abs=1e-9)


def test_infomap_distributed_karate_quality(spark):
    """On Zachary's karate club the synchronous down-only schedule lands in
    a slightly worse basin than the sequential kernel (measured: L=4.5083
    vs 4.3150, both 3 modules).  The dispatch keeps small/medium
    communities on the exact sequential kernel, so this gap only applies
    to >dispatch_threshold communities; pin the measured quality here so a
    regression of the synchronous schedule is caught."""
    import networkx as nx

    kar = nx.karate_club_graph()
    edges = [tuple(e) for e in kar.edges()]
    g = graph_from_edges(spark, edges)
    out, L = infomap_distributed(g)
    part = {r["vertex_id"]: r["comm"] for r in out.collect()}
    assert len(set(part.values())) == 3
    assert L == pytest.approx(4.5083, abs=5e-3)
    assert L == pytest.approx(map_equation_codelength(edges, part), abs=1e-9)


def test_flow_power_iteration_matches_closed_form(spark):
    """North-star flow: lazy power iteration converges to the closed-form
    degree-proportional visit rates the optimizer uses."""
    import networkx as nx

    kar = nx.karate_club_graph()
    edges = [tuple(e) for e in kar.edges()]
    g = graph_from_edges(spark, edges)
    p = {r["vertex_id"]: r["p"] for r in flow_power_iteration(g, iterations=60).collect()}
    W = float(len(edges))
    deg = {}
    for u, v in edges:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    for v, d in deg.items():
        assert p[v] == pytest.approx(d / (2.0 * W), abs=1e-3)


def test_enhance_dispatch_distributed_matches_grouped(spark):
    """enhance_infomap routed through the distributed kernel must produce
    the same spliced assignment as the grouped-pandas path on a separable
    community (kernel parity + path-independent splice)."""
    g = graph_from_edges(spark, TWO_K6)
    assign = g.vertices.select("vertex_id", F.lit(0).cast("long").alias("comm"))
    grouped = enhance_infomap(
        g, assign, modularity_threshold=0.3, min_size=10, dispatch_threshold=10_000
    )
    dispatched = enhance_infomap(
        g, assign, modularity_threshold=0.3, min_size=10, dispatch_threshold=5
    )
    got_g = {r["vertex_id"]: r["comm"] for r in grouped.collect()}
    got_d = {r["vertex_id"]: r["comm"] for r in dispatched.collect()}
    assert got_g == got_d
    assert len(set(got_d.values())) == 2


def test_infomap_karate_club_anchor():
    """External anchor: Zachary's karate club. Published Infomap result:
    3 modules, codelength ~4.311 bits — our multilevel optimizer must
    land there (the flat greedy stuck at 8 modules / 4.58 bits)."""
    import networkx as nx

    g = nx.karate_club_graph()
    part, L = infomap_local(list(g.edges()), list(g.nodes()), num_trials=8)
    assert len(set(part.values())) == 3
    assert L == pytest.approx(4.311, abs=5e-3)
    assert L == pytest.approx(
        map_equation_codelength(list(g.edges()), part), abs=1e-9
    )


def test_infomap_distributed_resume_mid_levels(spark, monkeypatch, tmp_path):
    """Simulated crash between contraction levels: the resumed run
    continues from the level snapshot and matches an uninterrupted run."""
    import csd363_sin_spark.operators.infomap as imod
    from csd363_sin_spark.checkpoint import CheckpointStore

    edges, verts = _planted_cliques(4, 8)
    g = graph_from_edges(spark, edges)
    straight, L_straight = infomap_distributed(g)
    straight_map = {r["vertex_id"]: r["comm"] for r in straight.collect()}

    calls = {"n": 0}
    orig = imod._infomap_move_phase

    def bomb(*a, **k):
        calls["n"] += 1
        if calls["n"] >= 2:
            raise RuntimeError("simulated crash")
        return orig(*a, **k)

    store = CheckpointStore(str(tmp_path), run_id="imr")
    monkeypatch.setattr(imod, "_infomap_move_phase", bomb)
    with pytest.raises(RuntimeError):
        infomap_distributed(g, store=store, stage="imx")
    monkeypatch.setattr(imod, "_infomap_move_phase", orig)
    assert store.has_meta("imx_state")

    resumed, L_resumed = infomap_distributed(g, store=store, stage="imx")
    assert {r["vertex_id"]: r["comm"] for r in resumed.collect()} == straight_map
    assert L_resumed == pytest.approx(L_straight, abs=1e-12)
    # done-marker short-circuit
    again, L_again = infomap_distributed(g, store=store, stage="imx")
    assert {r["vertex_id"]: r["comm"] for r in again.collect()} == straight_map
    assert L_again == pytest.approx(L_straight, abs=1e-12)
