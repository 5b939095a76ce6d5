"""GN dendrogram-cut parity vs networkx + batched betweenness + oracle
property tests (hypothesis over random graphs)."""

from __future__ import annotations

import networkx as nx
import pytest
from hypothesis import given, settings, strategies as st

from csd363_sin_spark.functions.brandes import girvan_newman_local
from csd363_sin_spark.operators.betweenness import (
    edge_betweenness,
    edge_betweenness_batched,
)
from csd363_sin_spark.plans.induce import graph_from_edges

from tests.louvain_oracle import oracle_louvain

BARBELL = (
    [(a, b) for a in range(5) for b in range(a + 1, 5)]
    + [(a, b) for a in range(5, 10) for b in range(a + 1, 10)]
    + [(4, 5)]
)
TWO_TRI = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]


def _nx_dendrogram(edges, levels):
    """First `levels` splits from networkx's GN generator, as canonical
    (min-vertex-labeled) partitions."""
    gen = nx.community.girvan_newman(nx.Graph(edges))
    out = []
    for _, comms in zip(range(levels), gen):
        part = {}
        for cc in comms:
            root = min(cc)
            for v in cc:
                part[v] = root
        out.append(part)
    return out


def _our_dendrogram(edges, verts, levels):
    """Our kernel driven split-by-split (max_communities grows by 1)."""
    out = []
    n_start = 1
    for target in range(2, 2 + levels):
        part = girvan_newman_local(
            edges, verts, max_communities=target, max_iterations=None
        )
        out.append(part)
    return out


@pytest.mark.parametrize("edges,verts", [(BARBELL, range(10)), (TWO_TRI, range(6))])
def test_gn_first_cut_matches_networkx(edges, verts):
    """The first dendrogram cut (the unambiguous one — unique max-
    betweenness bridge) must match networkx's girvan_newman exactly."""
    nx_first = _nx_dendrogram(edges, 1)[0]
    ours = girvan_newman_local(list(edges), list(verts), max_communities=2)
    assert ours == nx_first


def test_gn_dendrogram_sequence_two_tri():
    """Beyond the first cut: community COUNTS track the nx dendrogram
    (labels can differ once betweenness ties appear)."""
    nx_seq = _nx_dendrogram(TWO_TRI, 3)
    for i, target in enumerate(range(2, 5)):
        ours = girvan_newman_local(TWO_TRI, list(range(6)), max_communities=target)
        # our kernel returns the best-modularity split seen up to the stop
        # point (reference semantics) — its community count never exceeds
        # the nx dendrogram level's
        assert len(set(ours.values())) <= len(set(nx_seq[i].values()))


def test_batched_betweenness_equals_full(spark):
    g = graph_from_edges(spark, BARBELL)
    full = {
        (r["src"], r["dst"]): r["betweenness"] for r in edge_betweenness(g).collect()
    }
    batched = {
        (r["src"], r["dst"]): r["betweenness"]
        for r in edge_betweenness_batched(g, batch_size=3).collect()
    }
    assert set(full) == set(batched)
    for e in full:
        assert batched[e] == pytest.approx(full[e], abs=1e-9)


# ---------------------------------------------------------------------------
# property tests on the (pure-python) spec oracle: cheap, no Spark session
# ---------------------------------------------------------------------------

@st.composite
def random_graph(draw):
    n = draw(st.integers(min_value=2, max_value=24))
    possible = [(u, v) for u in range(n) for v in range(u + 1, n)]
    edges = draw(
        st.lists(st.sampled_from(possible), min_size=1, max_size=60, unique=True)
    )
    weights = draw(
        st.lists(
            st.integers(min_value=1, max_value=5),
            min_size=len(edges),
            max_size=len(edges),
        )
    )
    return n, [(u, v, float(w)) for (u, v), w in zip(edges, weights)]


@settings(max_examples=60, deadline=None)
@given(random_graph())
def test_louvain_oracle_properties(g):
    """Spec invariants on arbitrary weighted graphs: termination well
    under the cap, non-increasing comm ids vs vertex ids (down-only),
    per-level modularity non-decreasing, valid partition."""
    n, edges = g
    comp, q, levels, hist = oracle_louvain(edges, range(n))
    assert set(comp.keys()) == set(range(n))
    # down-only moves + contraction can only relabel to ids that exist
    assert all(c in comp or c in range(n) for c in comp.values())
    # history is strictly increasing except a possible last improvement
    for a, b in zip(hist, hist[1:]):
        assert b > a - 1e-12
    # modularity bounds
    assert -0.5 - 1e-9 <= q <= 1.0 + 1e-9


@settings(max_examples=30, deadline=None)
@given(random_graph())
def test_gn_kernel_partition_valid(g):
    n, edges = g
    plain = [(u, v) for u, v, _ in edges]
    part = girvan_newman_local(plain, range(n), max_communities=3, max_iterations=5)
    covered = set(part.keys())
    assert covered == set(range(n))
    # labels are min-vertex canonical: every label is a member of its group
    for v, c in part.items():
        assert part[c] == c
