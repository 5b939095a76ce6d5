"""PageRank allclose(1e-6) vs networkx; triangle counts exact vs networkx."""

from __future__ import annotations

import networkx as nx
import numpy as np
import pytest

from csd363_sin_spark.operators.pagerank import pagerank, visit_rates
from csd363_sin_spark.operators.triangles import triangle_count, triangles_per_vertex
from csd363_sin_spark.plans.induce import Graph, graph_from_edges, induce_graph
from csd363_sin_spark.sources.synth import synth_transcripts

from tests.conftest import graph_to_networkx


def _nx_pagerank(nxg, weighted):
    # nx.pagerank delegates to scipy (absent in this env); use networkx's
    # pure-python power iteration, which implements identical semantics
    from networkx.algorithms.link_analysis.pagerank_alg import _pagerank_python

    return _pagerank_python(
        nxg, alpha=0.85, tol=1e-6, weight="weight" if weighted else None
    )


def _check_pagerank(graph, nxg, weighted=True, **kw):
    # both dispatch paths (driver numpy power iteration for small graphs,
    # distributed loop forced via local_edges_threshold=0) must match the
    # networkx oracle AND each other
    got = {r["vertex_id"]: r["rank"] for r in pagerank(graph, weighted=weighted, **kw).collect()}
    dist = {
        r["vertex_id"]: r["rank"]
        for r in pagerank(
            graph, weighted=weighted, local_edges_threshold=0, **kw
        ).collect()
    }
    expected = _nx_pagerank(nxg, weighted)
    assert set(got) == set(expected) == set(dist)
    g_arr = np.array([got[v] for v in sorted(got)])
    d_arr = np.array([dist[v] for v in sorted(got)])
    e_arr = np.array([expected[v] for v in sorted(got)])
    assert np.allclose(g_arr, e_arr, atol=1e-6)
    assert np.allclose(d_arr, e_arr, atol=1e-6)
    assert np.allclose(g_arr, d_arr, atol=1e-9)
    assert abs(g_arr.sum() - 1.0) < 1e-9


def test_pagerank_star(spark):
    # closed form check territory: hub + 8 leaves
    g = graph_from_edges(spark, [(0, i) for i in range(1, 9)])
    _check_pagerank(g, graph_to_networkx(g))


def test_pagerank_with_isolates_dangling(spark):
    g = graph_from_edges(spark, [(0, 1), (1, 2)])
    iso = spark.createDataFrame(
        [(10, "v:10", "v")], "vertex_id long, actor string, kind string"
    )
    g = Graph(vertices=g.vertices.unionByName(iso), edges=g.edges)
    nxg = graph_to_networkx(g)
    _check_pagerank(g, nxg)


def test_pagerank_weighted_induced(spark):
    t = synth_transcripts(spark, n_convs=60, n_tools=12, n_clusters=3, seed=42)
    g = induce_graph(t)  # weighted co-occurrence
    _check_pagerank(g, graph_to_networkx(g), weighted=True)


def test_pagerank_unweighted_induced(spark):
    t = synth_transcripts(spark, n_convs=40, n_tools=10, n_clusters=2, seed=43)
    g = induce_graph(t, binarize=True)
    _check_pagerank(g, graph_to_networkx(g), weighted=False)


def test_visit_rates(spark):
    g = graph_from_edges(spark, [(0, 1), (1, 2), (0, 2), (2, 3)])
    nxg = graph_to_networkx(g)
    got = {r["vertex_id"]: r["rate"] for r in visit_rates(g).collect()}
    m2 = 2 * nxg.number_of_edges()
    for v in nxg.nodes():
        assert got[v] == pytest.approx(nxg.degree(v) / m2, abs=1e-12)


def test_triangles_k4(spark):
    g = graph_from_edges(
        spark, [(a, b) for a in range(4) for b in range(a + 1, 4)]
    )
    assert triangle_count(g) == 4
    per = {r["vertex_id"]: r["triangles"] for r in triangles_per_vertex(g).collect()}
    assert per == {0: 3, 1: 3, 2: 3, 3: 3}


def test_triangles_vs_networkx(spark):
    t = synth_transcripts(spark, n_convs=60, n_tools=12, n_clusters=3, seed=42)
    g = induce_graph(t)
    nxg = graph_to_networkx(g)
    expected = nx.triangles(nxg)
    assert triangle_count(g) == sum(expected.values()) // 3
    per = {r["vertex_id"]: r["triangles"] for r in triangles_per_vertex(g).collect()}
    assert per == expected


def test_triangles_triangle_free(spark):
    g = graph_from_edges(spark, [(i, i + 1) for i in range(6)])
    assert triangle_count(g) == 0
    per = triangles_per_vertex(g)
    assert per.filter(per.triangles > 0).isEmpty()


def test_personalized_pagerank_vs_networkx(spark):
    from networkx.algorithms.link_analysis.pagerank_alg import _pagerank_python

    from csd363_sin_spark.operators.pagerank import personalized_pagerank

    t = synth_transcripts(spark, n_convs=60, n_tools=12, n_clusters=3, seed=5)
    g = induce_graph(t)
    nxg = graph_to_networkx(g)
    seed_ids = [
        r["vertex_id"]
        for r in g.vertices.filter("kind = 'tool'").collect()
    ]
    pers = {v: (1.0 if v in set(seed_ids) else 0.0) for v in nxg}
    expected = _pagerank_python(
        nxg, alpha=0.85, tol=1e-8, weight="weight", personalization=pers
    )
    seeds = g.vertices.filter("kind = 'tool'").select("vertex_id")
    for thr in (100_000, 0):  # driver dispatch AND distributed kernel
        got = {
            r["vertex_id"]: r["rank"]
            for r in personalized_pagerank(
                g, seeds, tol=1e-10, local_edges_threshold=thr
            ).collect()
        }
        assert set(got) == set(expected)
        for v in expected:
            assert got[v] == pytest.approx(expected[v], abs=1e-6)
        # teleport mass concentrates near seeds: every non-seed vertex
        # with no edges would get 0 (none here), seeds outrank uniform
        assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_clustering_coefficient_vs_networkx(spark):
    from csd363_sin_spark.operators.triangles import clustering_coefficient

    t = synth_transcripts(spark, n_convs=60, n_tools=12, n_clusters=3, seed=7)
    g = induce_graph(t)
    nxg = graph_to_networkx(g)
    expected = nx.clustering(nxg)
    got = {
        r["vertex_id"]: r["clustering"]
        for r in clustering_coefficient(g).collect()
    }
    assert set(got) == set(expected)
    for v in expected:
        assert got[v] == pytest.approx(expected[v], abs=1e-6)


def test_clustering_coefficient_degenerate(spark):
    from csd363_sin_spark.operators.triangles import clustering_coefficient

    # path graph: every coefficient 0; endpoints have degree 1 (no NaN/div0)
    g = graph_from_edges(spark, [(i, i + 1) for i in range(4)])
    got = {r["vertex_id"]: r["clustering"] for r in clustering_coefficient(g).collect()}
    assert got == {i: 0.0 for i in range(5)}


def test_degree_assortativity_vs_definition(spark):
    from csd363_sin_spark.operators.degree import degree_assortativity

    t = synth_transcripts(spark, n_convs=60, n_tools=12, n_clusters=3, seed=11)
    g = induce_graph(t)
    nxg = graph_to_networkx(g)
    deg = dict(nxg.degree())
    xs, ys = [], []
    for u, v in nxg.edges():
        xs += [deg[u], deg[v]]
        ys += [deg[v], deg[u]]
    expected = float(np.corrcoef(xs, ys)[0, 1])
    got = degree_assortativity(g).collect()[0]["assortativity"]
    assert got == pytest.approx(expected, abs=1e-6)
    # star graph: perfectly disassortative, r = -1 exactly... only with
    # degree variance on both endpoints; star has constant corr -> NaN?
    # K(1,3) has du in {3,1}: every edge pairs 3 with 1 -> r = -1
    star = graph_from_edges(spark, [(0, i) for i in range(1, 4)])
    r = degree_assortativity(star).collect()[0]["assortativity"]
    assert r == pytest.approx(-1.0, abs=1e-9)


def test_square_total_vs_trace_formula(spark):
    """#C4 = (tr(A^4) - 2m - 2*sum d(d-1)) / 8 — independent oracle."""
    import random

    from csd363_sin_spark.operators.triangles import square_total

    rng = random.Random(7)
    n = 14
    edges = [
        (u, v)
        for u in range(n)
        for v in range(u + 1, n)
        if rng.random() < 0.3
    ]
    g = graph_from_edges(spark, edges)
    got = square_total(g).collect()[0]["squares"]
    A = np.zeros((n, n))
    for u, v in edges:
        A[u, v] = A[v, u] = 1
    d = A.sum(axis=1)
    tr4 = np.trace(np.linalg.matrix_power(A, 4))
    exact = (tr4 - 2 * len(edges) - 2 * (d * (d - 1)).sum()) / 8
    assert got == int(round(exact))
    # hand anchors: C4 itself has 1 square; K4 has 3; a triangle has 0
    assert square_total(
        graph_from_edges(spark, [(0, 1), (1, 2), (2, 3), (3, 0)])
    ).collect()[0]["squares"] == 1
    assert square_total(
        graph_from_edges(
            spark, [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
        )
    ).collect()[0]["squares"] == 3
    assert square_total(
        graph_from_edges(spark, [(0, 1), (1, 2), (2, 0)])
    ).collect()[0]["squares"] == 0


def test_four_clique_total_vs_enumeration(spark):
    """K4 count vs brute-force enumeration + hand anchors."""
    import itertools
    import random

    from csd363_sin_spark.operators.triangles import four_clique_total

    rng = random.Random(11)
    n = 13
    edges = [
        (u, v)
        for u in range(n)
        for v in range(u + 1, n)
        if rng.random() < 0.35
    ]
    g = graph_from_edges(spark, edges)
    eset = {frozenset(e) for e in edges}
    exact = sum(
        1
        for quad in itertools.combinations(range(n), 4)
        if all(
            frozenset(p) in eset for p in itertools.combinations(quad, 2)
        )
    )
    assert four_clique_total(g).collect()[0]["cliques4"] == exact
    # hand anchors: K4 has 1; K5 has C(5,4)=5; C4 and a triangle have 0
    k5 = graph_from_edges(
        spark, [(u, v) for u in range(5) for v in range(u + 1, 5)]
    )
    assert four_clique_total(k5).collect()[0]["cliques4"] == 5
    assert four_clique_total(
        graph_from_edges(spark, [(0, 1), (1, 2), (2, 3), (3, 0)])
    ).collect()[0]["cliques4"] == 0
    assert four_clique_total(
        graph_from_edges(spark, [(0, 1), (1, 2), (2, 0)])
    ).collect()[0]["cliques4"] == 0
    # degeneracy-style (degree, id) orientation: count is order-invariant
    assert four_clique_total(g, order="degree").collect()[0]["cliques4"] == exact
    assert four_clique_total(k5, order="degree").collect()[0]["cliques4"] == 5
    with pytest.raises(ValueError):
        four_clique_total(g, order="nope")


def test_transitivity_vs_networkx(spark):
    from csd363_sin_spark.operators.triangles import transitivity

    t = synth_transcripts(spark, n_convs=60, n_tools=12, n_clusters=3, seed=7)
    g = induce_graph(t)
    nxg = graph_to_networkx(g)
    row = transitivity(g).collect()[0]
    assert row["transitivity"] == pytest.approx(nx.transitivity(nxg), abs=1e-6)
    assert row["triangles"] == sum(nx.triangles(nxg).values()) // 3
    # K4 anchor: 4 triangles, 12 wedges, transitivity 1.0; path: 0 triangles
    k4 = graph_from_edges(spark, [(a, b) for a in range(4) for b in range(a + 1, 4)])
    r = transitivity(k4).collect()[0]
    assert (r["triangles"], r["wedges"], r["transitivity"]) == (4, 12, 1.0)
    path = graph_from_edges(spark, [(i, i + 1) for i in range(3)])
    r = transitivity(path).collect()[0]
    assert (r["triangles"], r["transitivity"]) == (0, 0.0)


def test_ego_stats_vs_networkx(spark):
    from csd363_sin_spark.operators.triangles import ego_stats

    t = synth_transcripts(spark, n_convs=60, n_tools=12, n_clusters=3, seed=7)
    g = induce_graph(t)
    nxg = graph_to_networkx(g)
    got = {
        r["vertex_id"]: (r["degree"], r["ego_n"], r["ego_edges"], r["ego_density"])
        for r in ego_stats(g).collect()
    }
    assert set(got) == set(nxg.nodes)
    for v in nxg.nodes:
        ego = nx.ego_graph(nxg, v)
        n, m = ego.number_of_nodes(), ego.number_of_edges()
        dens = 2.0 * m / (n * (n - 1)) if n > 1 else 0.0
        assert got[v][0] == nxg.degree(v)
        assert got[v][1] == n
        assert got[v][2] == m
        assert got[v][3] == pytest.approx(dens, abs=1e-6)


def test_edge_embeddedness_vs_networkx(spark):
    from csd363_sin_spark.operators.triangles import edge_embeddedness

    t = synth_transcripts(spark, n_convs=60, n_tools=12, n_clusters=3, seed=7)
    g = induce_graph(t)
    nxg = graph_to_networkx(g)
    got = {
        (r["src"], r["dst"]): (
            r["common_neighbors"], r["overlap"], r["is_local_bridge"]
        )
        for r in edge_embeddedness(g).collect()
    }
    assert set(got) == {tuple(sorted(e)) for e in nxg.edges}
    for u, v in nxg.edges:
        cn = len(set(nxg[u]) & set(nxg[v]))
        union = len((set(nxg[u]) | set(nxg[v])) - {u, v})
        exp_ov = cn / union if union > 0 else 0.0
        key = tuple(sorted((u, v)))
        assert got[key][0] == cn
        assert got[key][1] == pytest.approx(exp_ov, abs=1e-6)
        assert got[key][2] == (cn == 0)


def test_rich_club_and_gini(spark):
    """rich_club matches nx.rich_club_coefficient (non-normalized); gini
    matches the direct sorted-rank formula; anchors: regular graph gini 0."""
    from csd363_sin_spark.operators.degree import degree_gini, rich_club

    t = synth_transcripts(spark, n_convs=60, n_tools=12, n_clusters=3, seed=7)
    g = induce_graph(t)
    nxg = graph_to_networkx(g)
    nx_rc = nx.rich_club_coefficient(nxg, normalized=False)
    got = {r["k"]: (r["n_club"], r["phi"]) for r in rich_club(g).collect()}
    for k in (1, 2, 4, 8, 16):
        if k in nx_rc:
            assert got[k][1] == pytest.approx(nx_rc[k], abs=1e-6), k
    degs = sorted(d for _, d in nxg.degree())
    n, sumd = len(degs), sum(degs)
    expected_gini = sum((2 * (i + 1) - n - 1) * d for i, d in enumerate(degs)) / (
        n * sumd
    )
    row = degree_gini(g).collect()[0]
    assert row["gini"] == pytest.approx(expected_gini, abs=1e-6)
    assert row["n"] == n
    # 6-cycle: 2-regular -> gini exactly 0
    cyc = graph_from_edges(spark, [(i, (i + 1) % 6) for i in range(6)])
    assert degree_gini(cyc).collect()[0]["gini"] == 0.0


def test_square_total_order_invariance(spark):
    """order="degree" (vertex-priority wedge counting: every 4-cycle
    counted exactly once at its highest-priority corner) must equal the
    default unrestricted expansion, including on the star graph where
    the degree path generates ZERO wedges."""
    import random

    from csd363_sin_spark.operators.triangles import square_total

    rng = random.Random(23)
    n = 15
    edges = [
        (u, v)
        for u in range(n)
        for v in range(u + 1, n)
        if rng.random() < 0.3
    ]
    g = graph_from_edges(spark, edges)
    assert (
        square_total(g).collect()[0]["squares"]
        == square_total(g, order="degree").collect()[0]["squares"]
    )
    # hand anchors under the degree order
    assert square_total(
        graph_from_edges(spark, [(0, 1), (1, 2), (2, 3), (3, 0)]),
        order="degree",
    ).collect()[0]["squares"] == 1
    star = graph_from_edges(spark, [(0, i) for i in range(1, 8)])
    assert square_total(star, order="degree").collect()[0]["squares"] == 0
