"""Property-based parity tests (hypothesis, derandomized).

Random small graphs — not hand-picked fixtures — must satisfy the same
exactness contracts: CC labeling vs networkx, distributed Louvain vs the
sequential spec oracle, betweenness vs networkx, dedup candidate-subset
property.  ``derandomize=True`` keeps the suite deterministic for CI.
"""

from __future__ import annotations

import networkx as nx
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from csd363_sin_spark.operators.components import connected_components
from csd363_sin_spark.operators.louvain import louvain
from csd363_sin_spark.plans.induce import graph_from_edges

from tests.louvain_oracle import oracle_louvain

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def edge_lists(max_n=14, max_m=30):
    pair = st.tuples(
        st.integers(min_value=0, max_value=max_n - 1),
        st.integers(min_value=0, max_value=max_n - 1),
    ).filter(lambda p: p[0] != p[1])
    return st.lists(pair, min_size=1, max_size=max_m)


@given(edges=edge_lists())
@settings(**SETTINGS)
def test_cc_matches_networkx_on_random_graphs(spark, edges):
    g = graph_from_edges(spark, edges)
    comp = {r["vertex_id"]: r["comp_id"] for r in connected_components(g).collect()}
    nxg = nx.Graph()
    nxg.add_edges_from(edges)
    expected = {}
    for cc in nx.connected_components(nxg):
        root = min(cc)
        for v in cc:
            expected[v] = root
    assert comp == expected


@given(edges=edge_lists(max_n=12, max_m=24))
@settings(**SETTINGS)
def test_louvain_matches_spec_oracle_on_random_graphs(spark, edges):
    g = graph_from_edges(spark, edges)
    res = louvain(g, weighted=True)
    got = {r["vertex_id"]: r["comm"] for r in res.assign.collect()}
    rows = [(r["src"], r["dst"], r["weight"]) for r in g.edges.collect()]
    verts = [r["vertex_id"] for r in g.vertices.collect()]
    exp, exp_q, _l, _h = oracle_louvain(rows, verts)
    assert got == exp
    assert res.modularity == pytest.approx(exp_q, abs=1e-9)


@given(edges=edge_lists(max_n=10, max_m=18))
@settings(**SETTINGS)
def test_betweenness_matches_networkx_on_random_graphs(spark, edges):
    from csd363_sin_spark.operators.betweenness import edge_betweenness

    g = graph_from_edges(spark, edges)
    nxg = nx.Graph()
    nxg.add_edges_from(edges)
    expected = nx.edge_betweenness_centrality(nxg, normalized=False)
    got = {
        (r["src"], r["dst"]): r["betweenness"] for r in edge_betweenness(g).collect()
    }
    for e, val in expected.items():
        assert got[tuple(sorted(e))] == pytest.approx(val, abs=1e-9)


@given(
    texts=st.lists(
        st.text(
            alphabet=st.sampled_from("ab cd"), min_size=0, max_size=40
        ),
        min_size=2,
        max_size=12,
    )
)
@settings(**SETTINGS)
def test_minhash_candidates_subset_of_exact_on_random_docs(spark, texts):
    from csd363_sin_spark.functions.dedup import minhash_lsh_pairs, ngram_jaccard_pairs

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in ngram_jaccard_pairs(
            docs, n=2, threshold=0.5, max_shingle_freq=None
        ).collect()
    }
    lsh = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_pairs(docs, n=2, threshold=0.5).collect()
    }
    # LSH output is exact-verified -> no false positives, ever
    assert lsh <= exact


@given(edges=edge_lists(max_n=12, max_m=24))
@settings(**SETTINGS)
def test_lpa_driver_matches_distributed_on_random_graphs(spark, edges):
    from csd363_sin_spark.operators.lpa import label_propagation

    g = graph_from_edges(spark, edges)
    driver = {
        r["vertex_id"]: r["label"] for r in label_propagation(g, 6).collect()
    }
    dist = {
        r["vertex_id"]: r["label"]
        for r in label_propagation(g, 6, local_edges_threshold=0).collect()
    }
    assert driver == dist
