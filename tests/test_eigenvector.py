"""Eigenvector centrality: vs networkx (up to normalization) + path parity."""

from __future__ import annotations

import math

import networkx as nx
import pytest

from csd363_sin_spark.operators.eigenvector import eigenvector_centrality
from csd363_sin_spark.plans.induce import graph_from_edges, induce_graph
from csd363_sin_spark.sources.synth import synth_transcripts

from tests.conftest import graph_to_networkx


def _collect(df):
    return {r["vertex_id"]: r["score"] for r in df.collect()}


def _l2_normalized(scores):
    nrm = math.sqrt(sum(v * v for v in scores.values()))
    return {k: v / nrm for k, v in scores.items()}


def test_eigenvector_vs_networkx(spark):
    t = synth_transcripts(spark, n_convs=60, n_tools=12, n_clusters=3, seed=31)
    g = induce_graph(t)
    got = _l2_normalized(_collect(eigenvector_centrality(g, max_iter=500, tol=1e-13)))
    exp = nx.eigenvector_centrality(
        graph_to_networkx(g), weight="weight", max_iter=1000, tol=1e-12
    )
    assert set(got) == set(exp)
    for v in exp:
        assert got[v] == pytest.approx(exp[v], abs=1e-6)


def test_eigenvector_path_parity_fixed_iters(spark):
    # tol=0 => both paths run the identical 8-step recurrence
    t = synth_transcripts(spark, n_convs=60, n_tools=12, n_clusters=3, seed=31)
    g = induce_graph(t)
    driver = _collect(eigenvector_centrality(g, max_iter=8, tol=0.0))
    dist = _collect(
        eigenvector_centrality(g, max_iter=8, tol=0.0, local_edges_threshold=0)
    )
    assert set(driver) == set(dist)
    for v in driver:
        assert driver[v] == pytest.approx(dist[v], abs=1e-9)


def test_katz_vs_networkx_and_parity(spark):
    from csd363_sin_spark.operators.eigenvector import katz_centrality

    t = synth_transcripts(spark, n_convs=40, n_tools=10, n_clusters=2, seed=13)
    g = induce_graph(t)
    import numpy as np

    nxg = graph_to_networkx(g)
    # pick a safe alpha below 1/lambda_max of the weighted adjacency
    import networkx as nx2

    lam = max(
        abs(np.linalg.eigvalsh(nx2.to_numpy_array(nxg, weight="weight")))
    )
    alpha = 0.5 / lam
    got = _l2_normalized(
        _collect(katz_centrality(g, alpha=alpha, max_iter=2000, tol=1e-13))
    )
    exp = nx.katz_centrality(
        nxg, alpha=alpha, beta=1.0, weight="weight", max_iter=5000, tol=1e-12
    )
    for v in exp:
        assert got[v] == pytest.approx(exp[v], abs=1e-6)
    # fixed-iteration path parity (tol=0 => identical 8-step recurrence)
    driver = _collect(katz_centrality(g, max_iter=8, tol=0.0))
    dist = _collect(katz_centrality(g, max_iter=8, tol=0.0, local_edges_threshold=0))
    for v in driver:
        assert driver[v] == pytest.approx(dist[v], abs=1e-9)


def test_eigenvector_star_and_isolate(spark):
    # star 0-(1,2,3) is bipartite — converges ONLY because of the +I
    # shift; center -> 1.0, leaves -> 1/sqrt(3); the isolate's score
    # decays geometrically toward 0
    from csd363_sin_spark.plans.induce import Graph

    g = graph_from_edges(spark, [(0, 1), (0, 2), (0, 3)])
    iso = spark.createDataFrame(
        [(9, "v:9", "v")], "vertex_id long, actor string, kind string"
    )
    g = Graph(vertices=g.vertices.unionByName(iso), edges=g.edges)
    got = _collect(eigenvector_centrality(g, max_iter=200, tol=1e-13))
    assert got[0] == pytest.approx(1.0, abs=1e-9)
    for leaf in (1, 2, 3):
        assert got[leaf] == pytest.approx(1 / math.sqrt(3), abs=1e-6)
    assert got[9] < 1e-6


# --- Fiedler vector (spectral bipartition) ---


def test_fiedler_matches_eigendecomposition(spark):
    """Converged deflated power iteration aligns with numpy's exact
    second-smallest Laplacian eigenvector (up to sign/scale) on a
    connected graph with a clear spectral gap."""
    import numpy as np

    from csd363_sin_spark.operators.eigenvector import fiedler_vector

    # barbell: two K4s joined by one edge — textbook Fiedler case
    edges = (
        [(a, b) for a in range(4) for b in range(a + 1, 4)]
        + [(a, b) for a in range(4, 8) for b in range(a + 1, 8)]
        + [(3, 4)]
    )
    g = graph_from_edges(spark, edges)
    got = {
        r["vertex_id"]: r["fiedler"]
        for r in fiedler_vector(g, max_iter=3000).collect()
    }
    n = 8
    A = np.zeros((n, n))
    for u, v in edges:
        A[u, v] = A[v, u] = 1.0
    L = np.diag(A.sum(1)) - A
    vals, vecs = np.linalg.eigh(L)
    f = vecs[:, 1]  # second-smallest eigenvalue's eigenvector
    x = np.array([got[i] for i in range(n)])
    cos = abs(x @ f) / (np.linalg.norm(x) * np.linalg.norm(f))
    assert cos == pytest.approx(1.0, abs=1e-6)
    # sign bipartition separates the two cliques
    side = {v for v in range(n) if got[v] >= 0}
    assert side in ({0, 1, 2, 3}, {4, 5, 6, 7})


def test_fiedler_dispatch_parity(spark):
    """Driver numpy kernel vs distributed kernel: same fixed-K values to
    FP-summation tolerance, shared default hash start."""
    from csd363_sin_spark.operators.eigenvector import fiedler_vector

    t = synth_transcripts(spark, n_convs=40, n_tools=10, n_clusters=2, seed=42)
    g = induce_graph(t)
    local = {
        r["vertex_id"]: r["fiedler"]
        for r in fiedler_vector(g, max_iter=8).collect()
    }
    dist = {
        r["vertex_id"]: r["fiedler"]
        for r in fiedler_vector(g, max_iter=8, local_edges_threshold=0).collect()
    }
    assert set(local) == set(dist)
    for v in local:
        assert local[v] == pytest.approx(dist[v], abs=1e-9)


def test_spectral_cut_barbell(spark):
    """The converged spectral bipartition of a barbell graph is the
    clique split: cut = 1 bridge edge, conductance = 1/13."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "entry_mod", "/root/repo/__spark_entry__.py"
    )
    # exercise the same composition the gate runs, inline on a fixture
    from csd363_sin_spark.operators.eigenvector import fiedler_vector

    edges = (
        [(a, b) for a in range(4) for b in range(a + 1, 4)]
        + [(a, b) for a in range(4, 8) for b in range(a + 1, 8)]
        + [(3, 4)]
    )
    g = graph_from_edges(spark, edges)
    fv = {
        r["vertex_id"]: r["fiedler"]
        for r in fiedler_vector(g, max_iter=3000).collect()
    }
    pos = {v for v, s in fv.items() if round(s, 6) >= 0}
    neg = set(fv) - pos
    assert {frozenset(pos), frozenset(neg)} == {
        frozenset({0, 1, 2, 3}),
        frozenset({4, 5, 6, 7}),
    }
    cut = sum(1 for u, v in edges if (u in pos) != (v in pos))
    assert cut == 1
    # vol of each side: 3 internal K4 degrees * ... = 2*6 + 1 = 13
    assert cut / 13.0 == pytest.approx(1 / 13)


def test_spectral_clustering_three_cliques(spark):
    """Three K5 cliques in a ring (ids interleaved so the deterministic
    lowest-id k-means seeds land one per clique): converged spectral
    clustering recovers the cliques exactly, and f2 is orthogonal to both
    the constant vector and f1."""
    import numpy as np

    from csd363_sin_spark.operators.eigenvector import (
        spectral_clustering,
        spectral_embedding,
    )

    # clique c = {v : v % 3 == c}, v in 0..14 (K5 each); ring bridges
    edges = [
        (a, b)
        for a in range(15)
        for b in range(a + 1, 15)
        if a % 3 == b % 3
    ] + [(0, 1), (1, 2), (0, 2)]
    g = graph_from_edges(spark, edges)
    emb = {
        r["vertex_id"]: (r["f1"], r["f2"])
        for r in spectral_embedding(g, max_iter=40).collect()
    }
    f1 = np.array([emb[v][0] for v in range(15)])
    f2 = np.array([emb[v][1] for v in range(15)])
    assert abs(f2.sum()) < 1e-6
    assert abs(f1 @ f2) / (np.linalg.norm(f1) * np.linalg.norm(f2)) < 1e-6
    got = {
        r["vertex_id"]: r["cluster"]
        for r in spectral_clustering(g, n_clusters=3, max_iter=40).collect()
    }
    by_clique = [{got[v] for v in range(15) if v % 3 == c} for c in range(3)]
    assert all(len(s) == 1 for s in by_clique)
    assert len(set().union(*by_clique)) == 3
