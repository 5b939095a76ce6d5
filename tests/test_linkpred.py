"""Link prediction: exact vs networkx jaccard/adamic-adar generators."""

from __future__ import annotations

import networkx as nx
import pytest

from csd363_sin_spark.operators.linkpred import (
    link_prediction_scores,
    link_prediction_topk,
)
from csd363_sin_spark.plans.induce import graph_from_edges, induce_graph
from csd363_sin_spark.sources.synth import synth_transcripts

from tests.conftest import graph_to_networkx


def _nx_scores(nxg):
    """(u,v) -> (cn, jaccard, aa) for all non-adjacent pairs with cn >= 1."""
    out = {}
    for u in nxg:
        for v in nxg:
            if u >= v or nxg.has_edge(u, v):
                continue
            cn = sorted(nx.common_neighbors(nxg, u, v))
            if not cn:
                continue
            import math

            aa = sum(1.0 / math.log(nxg.degree(w)) for w in cn)
            union = len(set(nxg[u]) | set(nxg[v]))
            out[(u, v)] = (len(cn), len(cn) / union, aa)
    return out


def test_link_prediction_vs_networkx(spark):
    t = synth_transcripts(spark, n_convs=60, n_tools=12, n_clusters=3, seed=13)
    g = induce_graph(t)
    nxg = graph_to_networkx(g)
    expected = _nx_scores(nxg)
    got = {
        (r["u"], r["v"]): (r["common_neighbors"], r["jaccard"], r["adamic_adar"])
        for r in link_prediction_scores(g).collect()
    }
    assert set(got) == set(expected)
    for pair, (cn, jac, aa) in expected.items():
        gcn, gjac, gaa = got[pair]
        assert gcn == cn
        assert gjac == pytest.approx(jac, abs=1e-6)
        assert gaa == pytest.approx(aa, abs=1e-6)
    # adjacency exclusion: no returned pair is an existing edge
    edges = {(r["src"], r["dst"]) for r in g.edges.collect()}
    assert not (set(got) & edges)


def test_link_prediction_topk_deterministic(spark):
    t = synth_transcripts(spark, n_convs=60, n_tools=12, n_clusters=3, seed=13)
    g = induce_graph(t)
    a = [tuple(r) for r in link_prediction_topk(g, k=10).collect()]
    b = [tuple(r) for r in link_prediction_topk(g, k=10).collect()]
    assert a == b and len(a) == 10
    # ranking is by rounded adamic_adar desc, then (u, v)
    keys = [(-r[4], r[0], r[1]) for r in a]
    assert keys == sorted(keys)


def test_link_prediction_hub_guard(spark):
    # star + one outer edge: center 0 has degree 4; capping centers at
    # degree 3 removes every wedge THROUGH the hub but keeps the rest
    g = graph_from_edges(spark, [(0, 1), (0, 2), (0, 3), (0, 4), (1, 2)])
    exact = {(r["u"], r["v"]) for r in link_prediction_scores(g).collect()}
    # via hub: (1,3),(1,4),(2,3),(2,4),(3,4); via 1 or 2: (0 adj to all)
    assert exact == {(1, 3), (1, 4), (2, 3), (2, 4), (3, 4)}
    capped = {
        (r["u"], r["v"])
        for r in link_prediction_scores(g, max_center_degree=3).collect()
    }
    assert capped == set()  # every candidate here goes through the hub


def test_link_prediction_triangle_free(spark):
    # path graph: (0,2),(1,3),(2,4) are the only 2-hop pairs; aa = 1/ln 2
    import math

    g = graph_from_edges(spark, [(0, 1), (1, 2), (2, 3), (3, 4)])
    got = {
        (r["u"], r["v"]): r["adamic_adar"]
        for r in link_prediction_scores(g).collect()
    }
    assert set(got) == {(0, 2), (1, 3), (2, 4)}
    for v in got.values():
        assert v == pytest.approx(1.0 / math.log(2), abs=1e-6)
