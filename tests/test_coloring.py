"""Luby MIS + iterated-MIS coloring tests (operators/coloring.py)."""

from __future__ import annotations

import hashlib

import pytest

from csd363_sin_spark.operators.coloring import hash_coloring, maximal_independent_set
from csd363_sin_spark.plans.induce import induce_actor_edges
from csd363_sin_spark.sources.synth import synth_transcripts


def _graph(spark, seed=42):
    t = synth_transcripts(spark, n_convs=40, n_tools=10, n_clusters=2, seed=seed)
    edges = induce_actor_edges(t)
    verts = (
        edges.selectExpr("src_actor AS actor")
        .union(edges.selectExpr("dst_actor AS actor"))
        .distinct()
    )
    adj: dict = {}
    for r in edges.collect():
        u, v = r["src_actor"], r["dst_actor"]
        if u == v:
            continue
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    for r in verts.collect():
        adj.setdefault(r["actor"], set())
    return verts, edges, adj


def _prio(salt, a):
    return hashlib.md5(f"{salt}:{a}".encode()).hexdigest() + ":" + a


def _luby_mirror(adj, salt, remove_neighbors, max_rounds=40):
    prio = {a: _prio(salt, a) for a in adj}
    und = set(adj)
    out = {}
    for r in range(max_rounds):
        if not und:
            break
        winners = {
            a
            for a in und
            if all(prio[a] < prio[b] for b in adj[a] if b in und)
        }
        for a in winners:
            out[a] = r
        und -= winners
        if remove_neighbors:
            und -= {b for a in winners for b in adj[a]}
    return out


def test_mis_properties_and_mirror(spark):
    verts, edges, adj = _graph(spark)
    got = {
        r["actor"]: (r["in_mis"], r["mis_round"])
        for r in maximal_independent_set(verts, edges).collect()
    }
    assert len(got) == len(adj)
    mis = {a for a, (m, _) in got.items() if m}
    # independence
    for a in mis:
        assert not (adj[a] & mis), a
    # maximality: every non-member has a MIS neighbor
    for a in set(adj) - mis:
        assert adj[a] & mis, a
    # exact python mirror of the derandomized rule
    mirror = _luby_mirror(adj, "mis", remove_neighbors=True)
    assert mis == set(mirror)
    for a in mis:
        assert got[a][1] == mirror[a]
    # determinism across runs
    again = {
        r["actor"]: (r["in_mis"], r["mis_round"])
        for r in maximal_independent_set(verts, edges).collect()
    }
    assert got == again


def test_hash_coloring_proper_and_mirror(spark):
    verts, edges, adj = _graph(spark)
    got = {r["actor"]: r["color"] for r in hash_coloring(verts, edges).collect()}
    assert len(got) == len(adj)
    # all decided at the default cap, proper coloring
    assert min(got.values()) >= 0
    for a, nbrs in adj.items():
        for b in nbrs:
            assert got[a] != got[b], (a, b)
    mirror = _luby_mirror(adj, "color", remove_neighbors=False)
    assert got == mirror


def test_mis_round_cap_matches_mirror(spark):
    """A cap below the fixpoint leaves identical -1s (the property the
    SQL oracle relies on)."""
    verts, edges, adj = _graph(spark)
    got = {
        r["actor"]: r["color"]
        for r in hash_coloring(verts, edges, max_rounds=2).collect()
    }
    mirror = _luby_mirror(adj, "color", remove_neighbors=False, max_rounds=2)
    expected = {a: mirror.get(a, -1) for a in adj}
    assert got == expected
    assert -1 in got.values()  # the cap genuinely bites on this graph


def _edge_prio(salt, u, v):
    key = f"{u}|{v}"
    return hashlib.md5(f"{salt}:{key}".encode()).hexdigest() + ":" + key


def _matching_mirror(adj, salt="match", max_rounds=20):
    """Pure-python mirror of the derandomized handshake rule."""
    live = {tuple(sorted((u, v))) for u in adj for v in adj[u]}
    prio = {e: _edge_prio(salt, *e) for e in live}
    out = {}
    for r in range(max_rounds):
        if not live:
            break
        minp = {}
        for e in live:
            for a in e:
                if a not in minp or prio[e] < minp[a]:
                    minp[a] = prio[e]
        winners = {
            e for e in live if prio[e] == minp[e[0]] and prio[e] == minp[e[1]]
        }
        for u, v in winners:
            out[u] = (v, r)
            out[v] = (u, r)
        hit = {a for e in winners for a in e}
        live = {e for e in live if e[0] not in hit and e[1] not in hit}
    return out


def test_maximal_matching_properties_and_mirror(spark):
    from csd363_sin_spark.operators.coloring import maximal_matching

    verts, edges, adj = _graph(spark)
    got = {
        r["actor"]: (r["mate_actor"], r["match_round"])
        for r in maximal_matching(verts, edges).collect()
    }
    assert len(got) == len(adj)
    matched = {a for a, (m, _) in got.items() if m}
    # symmetry + edges exist + vertex-disjoint (mate's mate is self)
    for a in matched:
        mate = got[a][0]
        assert got[mate][0] == a
        assert mate in adj[a]
        assert got[a][1] == got[mate][1]
    # maximality: no edge joins two unmatched vertices
    for a in set(adj) - matched:
        assert not (adj[a] - matched), a
        assert got[a] == ("", -1)
    # exact python mirror of the derandomized rule
    mirror = _matching_mirror(adj)
    assert {a: v for a, v in got.items() if v[1] >= 0} == mirror
    # determinism across runs
    again = {
        r["actor"]: (r["mate_actor"], r["match_round"])
        for r in maximal_matching(verts, edges).collect()
    }
    assert got == again


def test_maximal_matching_round_cap_and_anchors(spark):
    from csd363_sin_spark.operators.coloring import maximal_matching

    verts, edges, adj = _graph(spark)
    got = {
        r["actor"]: (r["mate_actor"], r["match_round"])
        for r in maximal_matching(verts, edges, max_rounds=1).collect()
    }
    mirror = _matching_mirror(adj, max_rounds=1)
    expected = {a: mirror.get(a, ("", -1)) for a in adj}
    assert got == expected
    # a triangle matches exactly one edge; the third vertex stays single
    e = spark.createDataFrame(
        [("a", "b", 1.0), ("b", "c", 1.0), ("a", "c", 1.0)],
        "src_actor string, dst_actor string, weight double",
    )
    v3 = e.selectExpr("src_actor AS actor").union(
        e.selectExpr("dst_actor AS actor")
    ).distinct()
    rows = {r["actor"]: r for r in maximal_matching(v3, e).collect()}
    n_matched = sum(1 for r in rows.values() if r["match_round"] >= 0)
    assert n_matched == 2
    single = next(a for a, r in rows.items() if r["match_round"] == -1)
    assert rows[single]["mate_actor"] == ""


def _weighted_prio(salt, u, v, w):
    import math

    wkey = str(10**15 - int(math.floor(w * 1e6 + 0.5))).zfill(16)
    return wkey + "~" + _edge_prio(salt, u, v)


def test_weighted_matching_mirror_and_half_approx(spark):
    from csd363_sin_spark.operators.coloring import maximal_matching

    verts, edges, adj = _graph(spark)
    wmap = {
        tuple(sorted((r["src_actor"], r["dst_actor"]))): r["weight"]
        for r in edges.collect()
    }
    got = {
        r["actor"]: (r["mate_actor"], r["match_round"])
        for r in maximal_matching(verts, edges, salt="wm", weighted=True).collect()
    }
    # python mirror with the weighted priority
    live = set(wmap)
    prio = {e: _weighted_prio("wm", *e, wmap[e]) for e in live}
    mirror = {}
    for rnd in range(20):
        if not live:
            break
        minp: dict = {}
        for e in live:
            for a in e:
                if a not in minp or prio[e] < minp[a]:
                    minp[a] = prio[e]
        winners = {
            e for e in live if prio[e] == minp[e[0]] and prio[e] == minp[e[1]]
        }
        for u, v in winners:
            mirror[u] = (v, rnd)
            mirror[v] = (u, rnd)
        hit = {a for e in winners for a in e}
        live = {e for e in live if e[0] not in hit and e[1] not in hit}
    assert {a: x for a, x in got.items() if x[1] >= 0} == mirror
    # 1/2-approximation of the maximum-weight matching (Preis bound)
    import networkx as nx

    nxg = nx.Graph()
    for (u, v), w in wmap.items():
        nxg.add_edge(u, v, weight=w)
    opt = sum(
        nxg[u][v]["weight"] for u, v in nx.max_weight_matching(nxg)
    )
    got_w = sum(
        wmap[tuple(sorted((a, m)))] for a, (m, r) in got.items() if r >= 0
    ) / 2.0
    assert got_w >= 0.5 * opt - 1e-9
    # heaviest-edge anchor: on a weighted path, the heavy middle edge wins
    e3 = spark.createDataFrame(
        [("a", "b", 1.0), ("b", "c", 9.0), ("c", "d", 1.0)],
        "src_actor string, dst_actor string, weight double",
    )
    v3 = e3.selectExpr("src_actor AS actor").union(
        e3.selectExpr("dst_actor AS actor")
    ).distinct()
    rows = {
        r["actor"]: r["mate_actor"]
        for r in maximal_matching(v3, e3, weighted=True).collect()
    }
    assert rows["b"] == "c" and rows["c"] == "b"
    assert rows["a"] == "" and rows["d"] == ""


def test_wl_refinement_structure(spark):
    """WL colors capture structural roles: a cycle is color-uniform, a
    path splits by distance-to-end symmetry, and the rounds match an
    independent python mirror."""
    from csd363_sin_spark.operators.coloring import wl_refinement

    def named(edges):
        e = spark.createDataFrame(
            [(f"v{u}", f"v{v}", 1.0) for u, v in edges],
            "src_actor string, dst_actor string, weight double",
        )
        verts = e.selectExpr("src_actor AS actor").union(
            e.selectExpr("dst_actor AS actor")
        ).distinct()
        return verts, e

    # 6-cycle: vertex-transitive -> one color class of size 6
    verts, e = named([(i, (i + 1) % 6) for i in range(6)])
    got = wl_refinement(verts, e, rounds=3).collect()
    assert {r["class_size"] for r in got} == {6}
    assert len({r["wl_color"] for r in got}) == 1

    # 5-path: classes by mirror symmetry {0,4}, {1,3}, {2}
    verts, e = named([(i, i + 1) for i in range(4)])
    got = {r["actor"]: r["wl_color"] for r in wl_refinement(verts, e, rounds=3).collect()}
    assert got["v0"] == got["v4"]
    assert got["v1"] == got["v3"]
    assert len({got["v0"], got["v1"], got["v2"]}) == 3

    # python mirror on the transcript graph
    import hashlib

    from csd363_sin_spark.plans.induce import induce_actor_edges
    from csd363_sin_spark.sources.synth import synth_transcripts

    t = synth_transcripts(spark, n_convs=30, n_tools=8, n_clusters=2, seed=3)
    edges = induce_actor_edges(t)
    verts = edges.selectExpr("src_actor AS actor").union(
        edges.selectExpr("dst_actor AS actor")
    ).distinct()
    adj: dict = {}
    for r in edges.collect():
        adj.setdefault(r["src_actor"], set()).add(r["dst_actor"])
        adj.setdefault(r["dst_actor"], set()).add(r["src_actor"])
    col = {a: hashlib.md5(b"wl:init").hexdigest() for a in adj}
    for _ in range(3):
        col = {
            a: hashlib.md5(
                f"wl:{col[a]}:{','.join(sorted(col[b] for b in adj[a]))}".encode()
            ).hexdigest()
            for a in adj
        }
    got = {r["actor"]: r["wl_color"] for r in wl_refinement(verts, edges, rounds=3).collect()}
    assert got == col


def test_densest_subgraph_planted_core(spark):
    """A planted K8 inside a sparse path is recovered exactly (its density
    3.5 dominates), and the reported density is a valid 2(1+eps) bound."""
    from csd363_sin_spark.operators.coloring import densest_subgraph

    core = [(f"k{a}", f"k{b}") for a in range(8) for b in range(a + 1, 8)]
    tail = [(f"p{i}", f"p{i+1}") for i in range(20)] + [("k0", "p0")]
    e = spark.createDataFrame(
        [(u, v, 1.0) for u, v in core + tail],
        "src_actor string, dst_actor string, weight double",
    )
    verts = e.selectExpr("src_actor AS actor").union(
        e.selectExpr("dst_actor AS actor")
    ).distinct()
    got = {r["actor"]: r for r in densest_subgraph(verts, e, eps=0.5).collect()}
    members = {a for a, r in got.items() if r["in_densest"]}
    assert members == {f"k{i}" for i in range(8)}
    # K8 density = 28/8 = 3.5 -> 3_500_000 ppm
    assert next(iter(got.values()))["density_ppm"] == 3_500_000
    # python mirror of the peel (same rule) agrees on the best density
    adj: dict = {}
    edges_set = set()
    for u, v in core + tail:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
        edges_set.add((u, v))
    s = set(adj)
    best = -1.0
    while s:
        m = sum(1 for u, v in edges_set if u in s and v in s)
        rho = m / len(s)
        best = max(best, rho)
        if m == 0:
            break
        s = {a for a in s if sum(1 for b in adj[a] if b in s) > 3.0 * rho}
    assert best == 3.5
