"""Label propagation: spec oracle, dispatch parity, determinism."""

from __future__ import annotations

import pytest

from csd363_sin_spark.operators.lpa import label_propagation
from csd363_sin_spark.plans.induce import Graph, graph_from_edges


def _oracle_lpa(edges, vertices, max_iterations):
    """Independent reference implementation of the deterministic spec
    (written against the docstring, not the operator code): synchronous,
    weighted neighbor vote, ties to smallest label, isolates keep label."""
    nbrs = {v: {} for v in vertices}
    for u, v, w in edges:
        nbrs[u][v] = nbrs[u].get(v, 0.0) + w
        nbrs[v][u] = nbrs[v].get(u, 0.0) + w
    labels = {v: v for v in vertices}
    for _ in range(max_iterations):
        nxt = {}
        for v in vertices:
            if not nbrs[v]:
                nxt[v] = labels[v]
                continue
            scores = {}
            for u, w in nbrs[v].items():
                scores.setdefault(labels[u], 0.0)
                scores[labels[u]] += w
            best_score = max(scores.values())
            nxt[v] = min(l for l, s in scores.items() if s == best_score)
        if nxt == labels:
            break
        labels = nxt
    return labels


def _run_both(spark, edge_rows, weights=None, max_iterations=20, extra_isolates=()):
    g = graph_from_edges(spark, edge_rows, weights)
    if extra_isolates:
        iso = spark.createDataFrame(
            [(int(x), f"v:{x}", "v") for x in extra_isolates],
            "vertex_id long, actor string, kind string",
        )
        g = Graph(vertices=g.vertices.unionByName(iso), edges=g.edges)
    driver = {
        r["vertex_id"]: r["label"]
        for r in label_propagation(g, max_iterations).collect()
    }
    dist = {
        r["vertex_id"]: r["label"]
        for r in label_propagation(
            g, max_iterations, local_edges_threshold=0
        ).collect()
    }
    edges = [
        (int(r["src"]), int(r["dst"]), float(r["weight"]))
        for r in g.edges.collect()
    ]
    verts = [int(r["vertex_id"]) for r in g.vertices.collect()]
    expected = _oracle_lpa(edges, verts, max_iterations)
    assert driver == expected, "driver kernel diverges from spec oracle"
    assert dist == expected, "distributed kernel diverges from spec oracle"
    return expected


def test_lpa_two_cliques_bridge(spark):
    clique1 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    clique2 = [(a, b) for a in range(10, 14) for b in range(a + 1, 14)]
    labels = _run_both(spark, clique1 + clique2 + [(3, 10)])
    # each clique converges to one label; labels are vertex ids
    assert len({labels[v] for v in range(4)}) == 1
    assert len({labels[v] for v in range(10, 14)}) == 1


def test_lpa_isolates_keep_own_label(spark):
    labels = _run_both(spark, [(0, 1), (1, 2)], extra_isolates=(50, 51))
    assert labels[50] == 50 and labels[51] == 51


def test_lpa_weighted_tiebreak(spark):
    # vertex 2 sees label 0 (weight 5.0) vs label 3 (weight 1.0+1.0=2.0)
    # after superstep 1 both neighbors of 4 carry distinct labels with
    # EQUAL weight -> smallest label must win deterministically
    edges = [(0, 2), (3, 2), (3, 4), (2, 4)]
    weights = [5.0, 2.0, 1.0, 1.0]
    _run_both(spark, edges, weights)


def test_lpa_star_hub(spark):
    # star: hub 0 with leaves 1..6; all leaves vote label 0 at step 1,
    # hub sees 6 distinct leaf labels (tie) -> adopts smallest (1),
    # then oscillation is cut by max_iterations; spec parity is what
    # matters, not sociological quality
    _run_both(spark, [(0, i) for i in range(1, 7)], max_iterations=5)


def test_lpa_chain_fixpoint_stability(spark):
    # once converged, extra iterations must not change labels
    g = graph_from_edges(spark, [(i, i + 1) for i in range(6)])
    a = {r["vertex_id"]: r["label"] for r in label_propagation(g, 20).collect()}
    b = {r["vertex_id"]: r["label"] for r in label_propagation(g, 40).collect()}
    assert a == b


def test_lpa_random_graph_parity(spark):
    # derandomized medium fixture: circulant + deterministic chords
    edges = [(i, (i + 1) % 60) for i in range(60)]
    edges += [(i, (i * 7 + 3) % 60) for i in range(0, 60, 2)]
    edges = [(u, v) for u, v in edges if u != v]
    weights = [float(1 + (u * 3 + v) % 4) for u, v in edges]
    _run_both(spark, edges, weights, max_iterations=8)
