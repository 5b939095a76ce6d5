"""Landmark BFS distances: exact vs networkx, both dispatch paths identical."""

from __future__ import annotations

import networkx as nx

from csd363_sin_spark.operators.bfs import landmark_distances, select_landmarks
from csd363_sin_spark.plans.induce import Graph, graph_from_edges, induce_graph
from csd363_sin_spark.sources.synth import synth_transcripts

from tests.conftest import graph_to_networkx


def _collect(df):
    return {(r["landmark"], r["vertex_id"]): r["dist"] for r in df.collect()}


def _nx_expected(g, n_landmarks, max_depth):
    nxg = graph_to_networkx(g)
    deg = dict(nxg.degree())
    landmarks = sorted(deg, key=lambda v: (-deg[v], v))[:n_landmarks]
    out = {}
    for lm in landmarks:
        for v, d in nx.single_source_shortest_path_length(
            nxg, lm, cutoff=max_depth
        ).items():
            out[(lm, v)] = d
    return out


def test_bfs_vs_networkx_both_paths(spark):
    t = synth_transcripts(spark, n_convs=80, n_tools=12, n_clusters=3, seed=23)
    g = induce_graph(t)
    expected = _nx_expected(g, 4, 6)
    driver = _collect(landmark_distances(g, 4, 6))
    dist = _collect(landmark_distances(g, 4, 6, local_edges_threshold=0))
    assert driver == expected
    assert dist == expected  # bit-identical integer math on both paths


def test_landmark_closeness_vs_networkx(spark):
    import pytest

    from csd363_sin_spark.operators.bfs import landmark_closeness

    t = synth_transcripts(spark, n_convs=80, n_tools=12, n_clusters=3, seed=23)
    g = induce_graph(t)
    nxg = graph_to_networkx(g)
    deg = dict(nxg.degree())
    got = {
        r["landmark"]: (r["n_reached"], r["closeness"], r["harmonic"])
        for r in landmark_closeness(g, n_landmarks=4, max_depth=20).collect()
    }
    assert set(got) == set(sorted(deg, key=lambda v: (-deg[v], v))[:4])
    for lm, (n_reached, clo, har) in got.items():
        dists = nx.single_source_shortest_path_length(nxg, lm)
        assert n_reached == len(dists) - 1
        assert clo == pytest.approx(
            nx.closeness_centrality(nxg, lm, wf_improved=False), abs=1e-6
        )
        assert har == pytest.approx(
            sum(1.0 / d for v, d in dists.items() if v != lm), abs=1e-6
        )


def test_weighted_distances_vs_dijkstra_both_paths(spark):
    import pytest

    from csd363_sin_spark.operators.bfs import weighted_distances

    t = synth_transcripts(spark, n_convs=80, n_tools=12, n_clusters=3, seed=23)
    g = induce_graph(t)
    nxg = graph_to_networkx(g)
    deg = dict(nxg.degree())
    landmarks = sorted(deg, key=lambda v: (-deg[v], v))[:4]
    exp = {}
    for lm in landmarks:
        for v, d in nx.single_source_dijkstra_path_length(
            nxg, lm, weight="weight"
        ).items():
            exp[(lm, v)] = d
    driver = {
        (r["landmark"], r["vertex_id"]): r["dist"]
        for r in weighted_distances(g, 4).collect()
    }
    dist = {
        (r["landmark"], r["vertex_id"]): r["dist"]
        for r in weighted_distances(g, 4, local_edges_threshold=0).collect()
    }
    assert set(driver) == set(exp) == set(dist)
    for k in exp:
        assert driver[k] == pytest.approx(exp[k], abs=1e-9)
        assert dist[k] == pytest.approx(exp[k], abs=1e-9)


def test_weighted_vs_unweighted_divergence(spark):
    # weight-aware routing: direct edge costs 10, two-hop detour costs 2
    g = graph_from_edges(
        spark, [(0, 1), (0, 2), (2, 1)], weights=[10.0, 1.0, 1.0]
    )
    from csd363_sin_spark.operators.bfs import weighted_distances

    lm = spark.createDataFrame([(0,)], "vertex_id long")
    got = {
        r["vertex_id"]: r["dist"]
        for r in weighted_distances(g, landmarks=lm).collect()
    }
    assert got == {0: 0.0, 2: 1.0, 1: 2.0}
    got_dist = {
        r["vertex_id"]: r["dist"]
        for r in weighted_distances(g, landmarks=lm, local_edges_threshold=0).collect()
    }
    assert got_dist == got


def test_diameter_double_sweep(spark):
    from csd363_sin_spark.operators.bfs import diameter_double_sweep

    # path graph: double sweep finds the true diameter exactly
    g = graph_from_edges(spark, [(i, i + 1) for i in range(7)])
    row = diameter_double_sweep(g).collect()[0]
    assert row["diameter_lb"] == 7
    assert {row["vertex_a"], row["vertex_b"]} == {0, 7}
    # synth graph: lb <= true diameter and == eccentricity of vertex_a
    t = synth_transcripts(spark, n_convs=80, n_tools=12, n_clusters=3, seed=23)
    g2 = induce_graph(t)
    nxg = graph_to_networkx(g2)
    row2 = diameter_double_sweep(g2).collect()[0]
    # the sweep runs inside the start vertex's component
    sub = nxg.subgraph(nx.node_connected_component(nxg, row2["vertex_a"]))
    ecc = nx.eccentricity(sub, v=row2["vertex_a"])
    assert row2["diameter_lb"] == ecc
    assert row2["diameter_lb"] <= nx.diameter(sub)
    # forced-distributed parity
    row3 = diameter_double_sweep(g2, local_edges_threshold=0).collect()[0]
    assert (row3["vertex_a"], row3["vertex_b"], row3["diameter_lb"]) == (
        row2["vertex_a"], row2["vertex_b"], row2["diameter_lb"],
    )


def test_bfs_depth_cutoff_and_disconnect(spark):
    # path 0-1-2-3-4 plus disconnected edge 5-6; landmark = highest degree
    g = graph_from_edges(spark, [(0, 1), (1, 2), (2, 3), (3, 4), (5, 6)])
    got = _collect(landmark_distances(g, n_landmarks=1, max_depth=2))
    lm = [r["vertex_id"] for r in select_landmarks(g, 1).collect()][0]
    assert lm == 1  # degree-2 ties (1,2,3) break to the smallest id
    assert got == {(1, 1): 0, (1, 0): 1, (1, 2): 1, (1, 3): 2}
    # disconnected component never appears
    assert all(v not in (5, 6) for (_, v) in got)
    dist_path = _collect(
        landmark_distances(g, n_landmarks=1, max_depth=2, local_edges_threshold=0)
    )
    assert dist_path == got


def test_closeness_exact_vs_networkx(spark):
    """closeness_exact matches nx.closeness_centrality (wf_improved
    default) and nx.harmonic_centrality on both dispatch paths, including
    a disconnected fixture."""
    import networkx as nx
    import pytest

    from csd363_sin_spark.operators.bfs import closeness_exact

    t = synth_transcripts(spark, n_convs=40, n_tools=10, n_clusters=2, seed=42)
    g = induce_graph(t, binarize=True)
    nxg = graph_to_networkx(g)
    exp_c = nx.closeness_centrality(nxg)
    exp_h = nx.harmonic_centrality(nxg)
    for thr in (100_000, 0):
        got = {
            r["vertex_id"]: (r["closeness"], r["harmonic"], r["n_reached"])
            for r in closeness_exact(g, local_edges_threshold=thr).collect()
        }
        assert set(got) == set(exp_c)
        for v in exp_c:
            assert got[v][0] == pytest.approx(exp_c[v], abs=1e-6)
            assert got[v][1] == pytest.approx(exp_h[v], abs=1e-6)
    # disconnected: two components + an isolate
    g2 = graph_from_edges(spark, [(0, 1), (1, 2), (3, 4)])
    g2 = Graph(
        vertices=g2.vertices.select("vertex_id").unionByName(
            spark.createDataFrame([(9,)], "vertex_id long")
        ),
        edges=g2.edges,
    )
    nxg2 = graph_to_networkx(g2)
    exp2 = nx.closeness_centrality(nxg2)
    got2 = {
        r["vertex_id"]: (r["closeness"], r["n_reached"])
        for r in closeness_exact(g2).collect()
    }
    for v in exp2:
        assert got2[v][0] == pytest.approx(exp2[v], abs=1e-6)
    assert got2[9] == (0.0, 0)


def test_shortest_path_extraction(spark):
    """Extracted path is a valid shortest path with the deterministic
    min-parent rule, on a fixture with multiple equal-length paths; empty
    when unreachable."""
    from csd363_sin_spark.operators.bfs import shortest_path

    # diamond: 0-1-3, 0-2-3 both length 2 -> parent rule picks min id (1)
    g = graph_from_edges(spark, [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4)])
    path = [
        (r["step"], r["vertex_id"])
        for r in shortest_path(g, 0, 4).orderBy("step").collect()
    ]
    assert path == [(0, 0), (1, 1), (2, 3), (3, 4)]
    # distances match nx; the path is genuinely shortest
    nxg = graph_to_networkx(g)
    assert len(path) - 1 == nx.shortest_path_length(nxg, 0, 4)
    # unreachable -> empty
    g2 = graph_from_edges(spark, [(0, 1), (5, 6)])
    assert shortest_path(g2, 0, 6).count() == 0
    # both dispatch paths of the underlying BFS agree
    path_dist = [
        (r["step"], r["vertex_id"])
        for r in shortest_path(g, 0, 4, local_edges_threshold=0)
        .orderBy("step")
        .collect()
    ]
    assert path_dist == path


def test_global_efficiency_vs_networkx(spark):
    import networkx as nx
    from csd363_sin_spark.operators.bfs import global_efficiency
    from csd363_sin_spark.plans.induce import Graph, graph_from_edges
    from tests.conftest import graph_to_networkx

    # connected, disconnected-with-isolate, and complete anchors
    cases = [
        [(0, 1), (1, 2), (2, 3), (0, 3), (1, 3)],
        [(0, 1), (1, 2), (5, 6)],
        [(a, b) for a in range(5) for b in range(a + 1, 5)],
    ]
    for edges in cases:
        g = graph_from_edges(spark, edges)
        expected = nx.global_efficiency(graph_to_networkx(g))
        for thr in (100_000, 0):
            got = global_efficiency(g, local_edges_threshold=thr).collect()[0][0]
            assert abs(got - round(expected, 6)) < 1e-6, (edges, thr)
    # isolate handling: unreachable pairs contribute zero
    g = graph_from_edges(spark, [(0, 1)])
    iso = spark.createDataFrame(
        [(9, "v:9", "v")], "vertex_id long, actor string, kind string"
    )
    g = Graph(vertices=g.vertices.unionByName(iso), edges=g.edges)
    expected = nx.global_efficiency(graph_to_networkx(g))
    got = global_efficiency(g).collect()[0][0]
    assert abs(got - round(expected, 6)) < 1e-6
