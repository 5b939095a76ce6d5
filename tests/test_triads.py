"""Triad/dyad census vs networkx.triadic_census (exact, all 16 classes)."""

from __future__ import annotations

import random
from itertools import permutations

import networkx as nx
import pytest

from csd363_sin_spark.operators.triads import (
    TRIAD_TABLE,
    dyad_census,
    triad_census,
)
from csd363_sin_spark.plans.directed import digraph_from_edges

# same bit layout as the operator: (c, x, y) with
# bit0 c->x, bit1 x->c, bit2 c->y, bit3 y->c, bit4 x->y, bit5 y->x
_PAIRS = [(0, 1), (1, 0), (0, 2), (2, 0), (1, 2), (2, 1)]


def test_lookup_table_matches_networkx_on_all_64_codes():
    for code in range(64):
        g = nx.DiGraph()
        g.add_nodes_from([0, 1, 2])
        for i, (a, b) in enumerate(_PAIRS):
            if code >> i & 1:
                g.add_edge(a, b)
        census = nx.triadic_census(g)
        (name,) = [k for k, v in census.items() if v == 1]
        assert TRIAD_TABLE[code] == name, code


def test_lookup_table_is_ordering_invariant():
    # the class must not depend on which vertex the wedge join centers
    for code in range(64):
        bits = {(a, b): bool(code >> i & 1) for i, (a, b) in enumerate(_PAIRS)}
        names = set()
        for perm in permutations(range(3)):
            pcode = sum(
                1 << i
                for i, (a, b) in enumerate(_PAIRS)
                if bits.get((perm[a], perm[b]), False)
            )
            names.add(TRIAD_TABLE[pcode])
        assert len(names) == 1, (code, names)


def _census_dict(df):
    return {r["triad_type"]: int(r["count"]) for r in df.collect()}


def _nx_census(edges, n_nodes):
    g = nx.DiGraph()
    g.add_nodes_from(range(n_nodes))
    g.add_edges_from(edges)
    return {k: int(v) for k, v in nx.triadic_census(g).items()}


@pytest.mark.parametrize("seed,n,p", [(1, 12, 0.25), (2, 20, 0.12), (3, 9, 0.5)])
def test_triad_census_matches_networkx_random(spark, seed, n, p):
    rng = random.Random(seed)
    edges = [
        (u, v)
        for u in range(n)
        for v in range(n)
        if u != v and rng.random() < p
    ]
    dg = digraph_from_edges(spark, edges)
    got = _census_dict(triad_census(dg))
    # networkx over the SAME vertex set (digraph_from_edges drops
    # isolates, so restrict nx to the endpoint-induced node set)
    nodes = {u for u, _ in edges} | {v for _, v in edges}
    g = nx.DiGraph()
    g.add_nodes_from(nodes)
    g.add_edges_from(edges)
    want = {k: int(v) for k, v in nx.triadic_census(g).items()}
    assert got == want
    assert sum(got.values()) == len(nodes) * (len(nodes) - 1) * (len(nodes) - 2) // 6


def test_triad_census_hand_cases(spark):
    # mutual pair + incoming third: 1 triad, class by direct nx check
    cases = [
        [(0, 1), (1, 0), (2, 0)],          # one connected triad
        [(0, 1), (1, 2), (2, 0)],          # 030C cycle
        [(0, 1), (1, 2), (0, 2)],          # 030T transitive
        [(0, 1), (2, 3)],                  # disjoint asym dyads
    ]
    for edges in cases:
        dg = digraph_from_edges(spark, edges)
        got = _census_dict(triad_census(dg))
        nodes = {u for u, _ in edges} | {v for _, v in edges}
        g = nx.DiGraph()
        g.add_nodes_from(nodes)
        g.add_edges_from(edges)
        want = {k: int(v) for k, v in nx.triadic_census(g).items()}
        assert got == want, edges
    # cycle graph sanity: exactly one 030C
    got = _census_dict(triad_census(digraph_from_edges(spark, [(0, 1), (1, 2), (2, 0)])))
    assert got["030C"] == 1 and got["030T"] == 0


def test_dyad_census_hand_computed(spark):
    # 4 vertices; 0<->1 mutual, 2->3 asym; C(4,2)=6 dyads -> 4 null
    dg = digraph_from_edges(spark, [(0, 1), (1, 0), (2, 3)])
    row = dyad_census(dg).collect()[0]
    assert (
        row["mutual"],
        row["asymmetric"],
        row["null_dyads"],
        row["num_vertices"],
    ) == (1, 1, 4, 4)


@pytest.mark.parametrize("seed,n,p", [(5, 14, 0.2), (6, 10, 0.45)])
def test_triad_census_order_invariance(spark, seed, n, p):
    """order="degree" (closed forms + degree-oriented triangle listing,
    no sum-deg^2 wedge join) must produce identical 16-class counts to
    the default wedge enumeration AND to networkx."""
    rng = random.Random(seed)
    edges = [
        (u, v)
        for u in range(n)
        for v in range(n)
        if u != v and rng.random() < p
    ]
    dg = digraph_from_edges(spark, edges)
    by_id = _census_dict(triad_census(dg))
    by_degree = _census_dict(triad_census(dg, order="degree"))
    assert by_id == by_degree
    nodes = {u for u, _ in edges} | {v for _, v in edges}
    g = nx.DiGraph()
    g.add_nodes_from(nodes)
    g.add_edges_from(edges)
    assert by_degree == {k: int(v) for k, v in nx.triadic_census(g).items()}


def test_triad_census_degree_order_star(spark):
    """A pure out-star (the hub-skew worst case for the wedge join):
    C(n-1, 2) triples through the hub, all 021D, zero closed triples —
    the degree path's closed forms carry the whole census."""
    n = 9
    dg = digraph_from_edges(spark, [(0, i) for i in range(1, n)])
    got = _census_dict(triad_census(dg, order="degree"))
    assert got["021D"] == (n - 1) * (n - 2) // 2
    assert got["030T"] == got["030C"] == got["300"] == 0
    assert got == _census_dict(triad_census(dg))
