"""Deterministic random walks: full python-mirror oracle + determinism."""

from __future__ import annotations

import hashlib

from csd363_sin_spark.operators.walks import random_walks
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
