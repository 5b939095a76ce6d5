"""Edge betweenness (distributed + local kernel) and GN refinement tests."""

from __future__ import annotations

import networkx as nx
import numpy as np
import pytest
from pyspark.sql import functions as F

from csd363_sin_spark.functions.brandes import (
    components_local,
    edge_betweenness_local,
    girvan_newman_local,
)
from csd363_sin_spark.operators.betweenness import edge_betweenness
from csd363_sin_spark.operators.gn import (
    girvan_newman_distributed,
    refine_girvan_newman,
    remove_edges,
)
from csd363_sin_spark.plans.induce import graph_from_edges, induce_graph
from csd363_sin_spark.sources.synth import synth_transcripts

from tests.conftest import graph_to_networkx

BARBELL = (
    [(a, b) for a in range(5) for b in range(a + 1, 5)]
    + [(a, b) for a in range(5, 10) for b in range(a + 1, 10)]
    + [(4, 5)]
)
TWO_TRI = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]


def _nx_adj(edges):
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    return adj


@pytest.mark.parametrize(
    "edges",
    [BARBELL, TWO_TRI, [(i, i + 1) for i in range(9)], [(0, i) for i in range(1, 9)]],
)
def test_local_brandes_vs_networkx(edges):
    nxg = nx.Graph(edges)
    expected = nx.edge_betweenness_centrality(nxg, normalized=False)
    got = edge_betweenness_local(_nx_adj(edges))
    assert set(got) == {tuple(sorted(e)) for e in expected}
    for e, val in expected.items():
        assert got[tuple(sorted(e))] == pytest.approx(val, abs=1e-9)


@pytest.mark.parametrize("edges", [BARBELL, TWO_TRI, [(i, i + 1) for i in range(9)]])
def test_distributed_betweenness_vs_networkx(spark, edges):
    g = graph_from_edges(spark, edges)
    nxg = graph_to_networkx(g)
    expected = nx.edge_betweenness_centrality(nxg, normalized=False)
    # force the distributed dataflow path; the driver-kernel path is
    # covered by test_betweenness_dispatch_parity below
    got = {
        (r["src"], r["dst"]): r["betweenness"]
        for r in edge_betweenness(g, local_edges_threshold=0).collect()
    }
    for e, val in expected.items():
        assert got[tuple(sorted(e))] == pytest.approx(val, abs=1e-6)
    # bridge edge dominates on the barbell
    if edges is BARBELL:
        assert max(got, key=got.get) == (4, 5)


def test_betweenness_dispatch_parity(spark):
    """Driver-kernel path (default for small graphs) vs distributed
    dataflow path: same values to FP-summation tolerance, exact and
    sampled modes."""
    t = synth_transcripts(spark, n_convs=40, n_tools=10, n_clusters=2, seed=42)
    g = induce_graph(t, binarize=True)
    for kw in ({}, {"k_sources": 16}, {"normalized": True}):
        local = {
            (r["src"], r["dst"]): r["betweenness"]
            for r in edge_betweenness(g, **kw).collect()
        }
        dist = {
            (r["src"], r["dst"]): r["betweenness"]
            for r in edge_betweenness(g, local_edges_threshold=0, **kw).collect()
        }
        assert set(local) == set(dist)
        for e in local:
            assert local[e] == pytest.approx(dist[e], abs=1e-9)


def test_distributed_betweenness_disconnected_and_induced(spark):
    t = synth_transcripts(spark, n_convs=40, n_tools=10, n_clusters=2, seed=42)
    g = induce_graph(t, binarize=True)
    nxg = graph_to_networkx(g)
    expected = nx.edge_betweenness_centrality(nxg, normalized=False)
    got = {
        (r["src"], r["dst"]): r["betweenness"] for r in edge_betweenness(g).collect()
    }
    arr_g = np.array([got[tuple(sorted(e))] for e in expected])
    arr_e = np.array(list(expected.values()))
    assert np.allclose(arr_g, arr_e, atol=1e-6)


def test_sampled_betweenness_matches_local_kernel(spark):
    g = graph_from_edges(spark, BARBELL)
    got = {
        (r["src"], r["dst"]): r["betweenness"]
        for r in edge_betweenness(g, k_sources=4).collect()
    }
    local = edge_betweenness_local(_nx_adj(BARBELL), sources=[0, 1, 2, 3])
    for e, val in local.items():
        assert got[e] == pytest.approx(val, abs=1e-9)


def test_remove_edges(spark):
    g = graph_from_edges(spark, TWO_TRI)
    rm = spark.createDataFrame([(3, 2)], "src long, dst long")  # reversed orientation
    left = remove_edges(g.edges, rm)
    assert left.count() == 6
    assert left.filter((F.col("src") == 2) & (F.col("dst") == 3)).isEmpty()


def test_gn_local_kernel_barbell():
    part = girvan_newman_local(BARBELL, list(range(10)), max_communities=2)
    assert len(set(part.values())) == 2
    assert {part[v] for v in range(5)} == {0}
    assert {part[v] for v in range(5, 10)} == {5}


def test_gn_local_disconnected_input():
    # already-disconnected input: like the reference generator
    # (girvan_newman_wrapper.py:53), GN yields only after the NEXT split —
    # max-betweenness edge (0,1) is removed, giving 3 components
    edges = [(0, 1), (1, 2), (5, 6)]
    part = girvan_newman_local(edges, [0, 1, 2, 5, 6], max_communities=2)
    assert part == {0: 0, 1: 1, 2: 1, 5: 5, 6: 5}
    # components_local is the shortcut primitive used by the distributed
    # path (reference :162-185)
    comp = components_local(_nx_adj(edges))
    assert comp == {0: 0, 1: 0, 2: 0, 5: 5, 6: 5}


def test_refine_girvan_newman_splits_merged_community(spark):
    g = graph_from_edges(spark, BARBELL)
    assign = g.vertices.select("vertex_id", F.lit(0).cast("long").alias("comm"))
    out = refine_girvan_newman(g, assign, size_threshold=5, target_subcommunities=2)
    got = {r["vertex_id"]: r["comm"] for r in out.collect()}
    assert len(set(got.values())) == 2
    assert len({got[v] for v in range(5)}) == 1
    assert len({got[v] for v in range(5, 10)}) == 1
    assert min(got.values()) > 0  # fresh ids beyond old max
    # forced grouped-pandas path must produce the identical splice
    out_g = refine_girvan_newman(
        g, assign, size_threshold=5, target_subcommunities=2,
        local_edges_threshold=0,
    )
    assert {r["vertex_id"]: r["comm"] for r in out_g.collect()} == got


def test_refine_noop_below_threshold(spark):
    g = graph_from_edges(spark, BARBELL)
    assign = g.vertices.select("vertex_id", F.lit(0).cast("long").alias("comm"))
    out = refine_girvan_newman(g, assign, size_threshold=50)
    assert {r["comm"] for r in out.collect()} == {0}


def test_refine_multiple_communities_in_parallel(spark):
    # two separate barbells, both assigned one community each -> both split
    shift = 100
    edges = BARBELL + [(u + shift, v + shift) for u, v in BARBELL]
    g = graph_from_edges(spark, edges)
    assign = g.vertices.select(
        "vertex_id",
        F.when(F.col("vertex_id") < shift, F.lit(0)).otherwise(F.lit(1)).cast("long").alias("comm"),
    )
    out = refine_girvan_newman(g, assign, size_threshold=5, target_subcommunities=2)
    got = {r["vertex_id"]: r["comm"] for r in out.collect()}
    assert len(set(got.values())) == 4
    for base in (0, 5, shift, shift + 5):
        assert len({got[base + i] for i in range(5)}) == 1


def test_refine_dispatch_distributed_matches_grouped(spark):
    # the same two-barbell fixture refined twice: once with everything on
    # the grouped-pandas path, once forced through the distributed kernel
    # (dispatch_threshold below the community size).  The splice ids must
    # be IDENTICAL — both paths label subcommunities by min vertex id and
    # feed the same dense_rank splice.
    shift = 100
    edges = BARBELL + [(u + shift, v + shift) for u, v in BARBELL]
    g = graph_from_edges(spark, edges)
    assign = g.vertices.select(
        "vertex_id",
        F.when(F.col("vertex_id") < shift, F.lit(0)).otherwise(F.lit(1)).cast("long").alias("comm"),
    )
    grouped = refine_girvan_newman(
        g, assign, size_threshold=5, target_subcommunities=2, dispatch_threshold=10_000
    )
    dispatched = refine_girvan_newman(
        g, assign, size_threshold=5, target_subcommunities=2, dispatch_threshold=6
    )
    got_g = {r["vertex_id"]: r["comm"] for r in grouped.collect()}
    got_d = {r["vertex_id"]: r["comm"] for r in dispatched.collect()}
    assert got_g == got_d
    assert len(set(got_d.values())) == 4


def test_refine_dispatch_mixed_paths(spark):
    # one community below the dispatch threshold (grouped path) and one
    # above it (distributed path) in the same call: both split, fresh ids
    # are disjoint, members stay within their parent's split.
    shift = 100
    big = (
        [(a, b) for a in range(7) for b in range(a + 1, 7)]
        + [(a, b) for a in range(7, 14) for b in range(a + 1, 14)]
        + [(6, 7)]
    )
    edges = BARBELL + [(u + shift, v + shift) for u, v in big]
    g = graph_from_edges(spark, edges)
    assign = g.vertices.select(
        "vertex_id",
        F.when(F.col("vertex_id") < shift, F.lit(0)).otherwise(F.lit(1)).cast("long").alias("comm"),
    )
    out = refine_girvan_newman(
        g, assign, size_threshold=5, target_subcommunities=2, dispatch_threshold=12
    )
    got = {r["vertex_id"]: r["comm"] for r in out.collect()}
    assert len(set(got.values())) == 4
    for base, size in ((0, 5), (5, 5)):
        assert len({got[base + i] for i in range(size)}) == 1
    for base, size in ((shift, 7), (shift + 7, 7)):
        assert len({got[base + i] for i in range(size)}) == 1
    assert min(got.values()) > 1  # all ids fresh beyond old max


def test_gn_distributed_two_triangles(spark):
    g = graph_from_edges(spark, TWO_TRI)
    out = girvan_newman_distributed(g, max_communities=2, max_iterations=5)
    got = {r["vertex_id"]: r["comm"] for r in out.collect()}
    assert got[0] == got[1] == got[2]
    assert got[3] == got[4] == got[5]
    assert got[0] != got[3]


def test_gn_distributed_resume_mid_loop(spark, monkeypatch, tmp_path):
    """Simulated crash between removal rounds: the resumed run continues
    from the round snapshot and matches an uninterrupted run exactly."""
    import csd363_sin_spark.operators.gn as gnmod
    from csd363_sin_spark.checkpoint import CheckpointStore

    chain = [(i, i + 1) for i in range(12)]
    g = graph_from_edges(spark, chain)

    straight = {
        r["vertex_id"]: r["comm"]
        for r in girvan_newman_distributed(
            g, max_communities=3, max_iterations=8
        ).collect()
    }

    calls = {"n": 0}
    orig = gnmod.remove_edges

    def bomb(*a, **k):
        calls["n"] += 1
        if calls["n"] >= 2:
            raise RuntimeError("simulated crash")
        return orig(*a, **k)

    store = CheckpointStore(str(tmp_path), run_id="gnr")
    monkeypatch.setattr(gnmod, "remove_edges", bomb)
    import pytest as _pytest

    with _pytest.raises(RuntimeError):
        girvan_newman_distributed(
            g, max_communities=3, max_iterations=8, store=store, stage="gnx"
        )
    monkeypatch.setattr(gnmod, "remove_edges", orig)
    assert store.has_meta("gnx_state")  # round snapshot survived the crash

    resumed = {
        r["vertex_id"]: r["comm"]
        for r in girvan_newman_distributed(
            g, max_communities=3, max_iterations=8, store=store, stage="gnx"
        ).collect()
    }
    assert resumed == straight
    # completed state short-circuits a THIRD call
    again = {
        r["vertex_id"]: r["comm"]
        for r in girvan_newman_distributed(
            g, max_communities=3, max_iterations=8, store=store, stage="gnx"
        ).collect()
    }
    assert again == straight


# --- vertex betweenness (Brandes companion; operators/betweenness.py
#     accumulate="vertices" + functions/brandes.vertex_betweenness_local) ---


@pytest.mark.parametrize(
    "edges",
    [BARBELL, TWO_TRI, [(i, i + 1) for i in range(9)], [(0, i) for i in range(1, 9)]],
)
def test_local_vertex_betweenness_vs_networkx(edges):
    from csd363_sin_spark.functions.brandes import vertex_betweenness_local

    nxg = nx.Graph(edges)
    expected = nx.betweenness_centrality(nxg, normalized=False)
    got = vertex_betweenness_local(_nx_adj(edges))
    assert set(got) == set(expected)
    for v, val in expected.items():
        assert got[v] == pytest.approx(val, abs=1e-9)


@pytest.mark.parametrize("edges", [BARBELL, TWO_TRI, [(i, i + 1) for i in range(9)]])
def test_distributed_vertex_betweenness_vs_networkx(spark, edges):
    from csd363_sin_spark.operators.betweenness import vertex_betweenness

    g = graph_from_edges(spark, edges)
    nxg = graph_to_networkx(g)
    expected = nx.betweenness_centrality(nxg, normalized=False)
    got = {
        r["vertex_id"]: r["betweenness"]
        for r in vertex_betweenness(g, local_edges_threshold=0).collect()
    }
    assert set(got) == set(expected)
    for v, val in expected.items():
        assert got[v] == pytest.approx(val, abs=1e-6)
    if edges is BARBELL:
        # the two bridge endpoints dominate on the barbell
        assert sorted(sorted(got, key=got.get)[-2:]) == [4, 5]


def test_vertex_betweenness_dispatch_parity_and_batched(spark):
    """Driver kernel vs distributed dataflow vs batched sharding: same
    per-vertex values (exact, sampled, and normalized modes), and the
    batched per-vertex sums equal the single-batch result."""
    from csd363_sin_spark.operators.betweenness import (
        vertex_betweenness,
        vertex_betweenness_batched,
    )

    t = synth_transcripts(spark, n_convs=40, n_tools=10, n_clusters=2, seed=42)
    g = induce_graph(t, binarize=True)
    nxg = graph_to_networkx(g)
    exact_nx = nx.betweenness_centrality(nxg, normalized=False)
    for kw in ({}, {"k_sources": 16}, {"normalized": True}):
        local = {
            r["vertex_id"]: r["betweenness"]
            for r in vertex_betweenness(g, **kw).collect()
        }
        dist = {
            r["vertex_id"]: r["betweenness"]
            for r in vertex_betweenness(g, local_edges_threshold=0, **kw).collect()
        }
        assert set(local) == set(dist)
        for v in local:
            assert local[v] == pytest.approx(dist[v], abs=1e-9)
        if not kw:
            for v, val in exact_nx.items():
                assert local[v] == pytest.approx(val, abs=1e-6)
    n = g.vertices.count()
    norm = {
        r["vertex_id"]: r["betweenness"]
        for r in vertex_betweenness(g, normalized=True).collect()
    }
    expected_norm = nx.betweenness_centrality(nxg, normalized=True)
    for v, val in expected_norm.items():
        assert norm[v] == pytest.approx(val, abs=1e-9)
    batched = {
        r["vertex_id"]: r["betweenness"]
        for r in vertex_betweenness_batched(
            g, batch_size=7, local_edges_threshold=0
        ).collect()
    }
    for v, val in exact_nx.items():
        assert batched[v] == pytest.approx(val, abs=1e-6)
