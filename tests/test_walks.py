"""Deterministic random walks: full python-mirror oracle + determinism."""

from __future__ import annotations

import hashlib

import pytest

from csd363_sin_spark.operators.walks import (
    N2V_HASH_MOD,
    node2vec_walks,
    random_walks,
)
from csd363_sin_spark.plans.induce import induce_actor_edges
from csd363_sin_spark.sources.synth import synth_transcripts


def _h(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_walks(edges, walk_length, walks_per_vertex, salt="walk"):
    adj: dict[str, set[str]] = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    out = {}
    for start in adj:
        for wid in range(walks_per_vertex):
            cur = start
            out[(start, wid, 0)] = cur
            for step in range(1, walk_length + 1):
                nbrs = adj.get(cur)
                if not nbrs:
                    break
                cur = min(nbrs, key=lambda n: (_h(f"{salt}:{start}:{wid}:{step}:{n}"), n))
                out[(start, wid, step)] = cur
    return out


def test_random_walks_match_python_mirror(spark):
    t = synth_transcripts(spark, n_convs=40, n_tools=8, n_clusters=2, seed=11)
    en = induce_actor_edges(t)
    edges = [(r["src_actor"], r["dst_actor"]) for r in en.collect()]
    exp = _py_walks(edges, 3, 2)
    got = {
        (r["start_actor"], r["walk_id"], r["step"]): r["actor"]
        for r in random_walks(en, walk_length=3, walks_per_vertex=2).collect()
    }
    assert got == exp
    # deterministic across runs
    again = {
        (r["start_actor"], r["walk_id"], r["step"]): r["actor"]
        for r in random_walks(en, walk_length=3, walks_per_vertex=2).collect()
    }
    assert again == got
    # every consecutive pair is a real edge
    eset = {frozenset(e) for e in edges}
    for (start, wid, step), actor in got.items():
        if step > 0:
            prev = got[(start, wid, step - 1)]
            assert frozenset((prev, actor)) in eset


def _py_n2v(edges, walk_length, walks_per_vertex, p_cost, q_cost, salt="n2v"):
    adj: dict[str, set[str]] = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    out = {}
    for start in adj:
        for wid in range(walks_per_vertex):
            cur, prev = start, None
            out[(start, wid, 0)] = cur
            for step in range(1, walk_length + 1):
                nbrs = adj.get(cur)
                if not nbrs:
                    break

                def score(n):
                    h = _h(f"{salt}:{start}:{wid}:{step}:{n}") % N2V_HASH_MOD
                    if prev is None:
                        c = 1
                    elif n == prev:
                        c = p_cost
                    elif prev in adj.get(n, ()):
                        c = 1
                    else:
                        c = q_cost
                    return (h * c, n)

                nxt = min(nbrs, key=score)
                prev, cur = cur, nxt
                out[(start, wid, step)] = cur
    return out


def test_node2vec_walks_match_python_mirror(spark):
    t = synth_transcripts(spark, n_convs=40, n_tools=8, n_clusters=2, seed=13)
    en = induce_actor_edges(t)
    edges = [(r["src_actor"], r["dst_actor"]) for r in en.collect()]
    exp = _py_n2v(edges, 3, 2, p_cost=4, q_cost=2)
    got = {
        (r["start_actor"], r["walk_id"], r["step"]): r["actor"]
        for r in node2vec_walks(
            en, walk_length=3, walks_per_vertex=2, p_cost=4, q_cost=2
        ).collect()
    }
    assert got == exp
    # every consecutive pair is a real edge
    eset = {frozenset(e) for e in edges}
    for (start, wid, step), actor in got.items():
        if step > 0:
            assert frozenset((got[(start, wid, step - 1)], actor)) in eset
    # the bias must actually bite: neutral costs match the neutral
    # mirror, and the biased corpus diverges from it somewhere
    neutral = {
        (r["start_actor"], r["walk_id"], r["step"]): r["actor"]
        for r in node2vec_walks(
            en, walk_length=3, walks_per_vertex=2, p_cost=1, q_cost=1
        ).collect()
    }
    assert neutral == _py_n2v(edges, 3, 2, p_cost=1, q_cost=1)
    assert got != neutral


def test_ppmi_scores_hand_computed(spark):
    import math

    from csd363_sin_spark.operators.walks import ppmi_scores

    pairs = spark.createDataFrame(
        [("a", "b", 4), ("a", "c", 1), ("b", "a", 4), ("c", "a", 1)],
        "center string, context string, n long",
    )
    got = {
        (r["center"], r["context"]): r["ppmi"]
        for r in ppmi_scores(pairs).collect()
    }
    # N=10; e.g. (a,b): n=4, n_c(a)=5, n_x(b)=4 -> ln(40/20)=ln 2
    assert got[("a", "b")] == pytest.approx(math.log(2.0))
    # (a,c): n=1, n_c(a)=5, n_x(c)=1 -> ln(10/5)=ln 2
    assert got[("a", "c")] == pytest.approx(math.log(2.0))
    # (c,a): n=1, n_c(c)=1, n_x(a)=5 -> ln(10/5)=ln 2
    assert got[("c", "a")] == pytest.approx(math.log(2.0))
    # negative PMI clips to 0: add a diluted pair
    pairs2 = spark.createDataFrame(
        [("x", "y", 1), ("x", "z", 9), ("w", "y", 9)],
        "center string, context string, n long",
    )
    got2 = {
        (r["center"], r["context"]): r["ppmi"]
        for r in ppmi_scores(pairs2).collect()
    }
    # (x,y): ln(1*19/(10*10)) < 0 -> clipped
    assert got2[("x", "y")] == 0.0
