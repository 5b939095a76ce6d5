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


# ---------------------------------------------------------------------------
# seeded label spreading (semi-supervised, hard-clamped seeds)
# ---------------------------------------------------------------------------


def _spread_py(verts, edges, seeds, iters=20):
    adj = {v: [] for v in verts}
    for u, v, w in edges:
        adj[u].append((v, w))
        adj[v].append((u, w))
    labels = dict(seeds)
    for _ in range(iters):
        new = dict(seeds)
        for v in verts:
            if v in seeds:
                continue
            scores = {}
            for u, w in adj[v]:
                lu = labels.get(u)
                if lu is not None:
                    scores[lu] = scores.get(lu, 0.0) + w
            if scores:
                new[v] = max(scores.items(), key=lambda kv: (kv[1], -kv[0]))[0]
        if new == labels:
            break
        labels = new
    return labels


def test_label_spreading_mirror_and_parity(spark):
    from csd363_sin_spark.operators.lpa import label_spreading
    from csd363_sin_spark.plans.induce import graph_from_edges

    # two lobes with a weak link + a detached pair with no seed
    edges = [
        (0, 1), (1, 2), (0, 2), (2, 3),
        (3, 4), (4, 5), (5, 6), (4, 6),
        (10, 11),
    ]
    g = graph_from_edges(spark, edges)
    seeds = {0: 7, 6: 9}
    seeds_df = spark.createDataFrame(
        sorted(seeds.items()), "vertex_id long, label long"
    )
    verts = sorted(r["vertex_id"] for r in g.vertices.collect())
    expected = _spread_py(verts, [(u, v, 1.0) for u, v in edges], seeds)

    for thr in (100_000, 0):
        got = {
            r["vertex_id"]: r["label"]
            for r in label_spreading(
                g, seeds_df, local_edges_threshold=thr
            ).collect()
        }
        assert got == expected, f"threshold={thr}"
    # detached pair never labeled; seeds clamped
    assert 10 not in expected and 11 not in expected
    assert expected[0] == 7 and expected[6] == 9
    # the weak-link boundary vertex adopts the majority side
    assert set(expected.values()) == {7, 9}


def test_label_spreading_tie_breaks_to_smallest_label(spark):
    from csd363_sin_spark.operators.lpa import label_spreading
    from csd363_sin_spark.plans.induce import graph_from_edges

    # vertex 1 sees labels 5 and 3 with equal weight -> picks 3
    g = graph_from_edges(spark, [(0, 1), (1, 2)])
    seeds_df = spark.createDataFrame(
        [(0, 5), (2, 3)], "vertex_id long, label long"
    )
    for thr in (100_000, 0):
        got = {
            r["vertex_id"]: r["label"]
            for r in label_spreading(
                g, seeds_df, local_edges_threshold=thr
            ).collect()
        }
        assert got[1] == 3, f"threshold={thr}"
