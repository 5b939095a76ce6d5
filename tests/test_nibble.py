"""PageRank-Nibble conductance sweep: python mirror + planted community."""

from __future__ import annotations

from pyspark.sql import functions as F

from csd363_sin_spark.operators.nibble import conductance_sweep, pagerank_nibble
from csd363_sin_spark.plans.induce import graph_from_edges


def _barbell(spark):
    # two K5s joined by a single edge (4, 5): conductance valley at
    # either clique
    k5a = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    k5b = [(a + 5, b + 5) for a in range(5) for b in range(a + 1, 5)]
    return graph_from_edges(spark, k5a + k5b + [(4, 5)])


def test_sweep_python_mirror(spark):
    # pin the sweep math against a from-scratch python mirror on scores
    # chosen to exercise rounding-order and tie-break
    g = _barbell(spark)
    scores = spark.createDataFrame(
        [(v, 1.0 / (v + 1)) for v in range(10)], "vertex_id long, rank double"
    )
    got = {
        r["rank"]: (r["vertex_id"], r["vol"], r["cut"], r["conductance"])
        for r in conductance_sweep(g, scores, top_m=10).collect()
    }

    deg = {r["vertex_id"]: int(r["degree"]) for r in g.degrees().collect()}
    edges = [(r["src"], r["dst"]) for r in g.edges.collect()]
    m2 = 2 * len(edges)
    order = sorted(
        ((round((1.0 / (v + 1)) / deg[v], 6), v) for v in range(10)),
        key=lambda t: (-t[0], t[1]),
    )
    prefix, vol, intra = set(), 0, 0
    for k, (_, v) in enumerate(order, start=1):
        prefix.add(v)
        vol += deg[v]
        intra += sum(1 for a, b in edges if a in prefix and b in prefix and (a == v or b == v))
        cut = vol - 2 * intra
        den = min(vol, m2 - vol)
        cond = cut / den if den > 0 else None
        assert got[k][0] == v
        assert got[k][1] == vol and got[k][2] == cut
        if cond is None:
            assert got[k][3] is None
        else:
            assert abs(got[k][3] - cond) < 1e-12


def test_nibble_recovers_planted_clique(spark):
    g = _barbell(spark)
    seeds = spark.createDataFrame([(0,)], "vertex_id long")
    res = pagerank_nibble(g, seeds, top_m=10)
    comm = sorted(r["vertex_id"] for r in res.community.collect())
    assert comm == [0, 1, 2, 3, 4]  # the seed's K5, cut=1 conductance=1/21
    best = (
        res.sweep.filter(F.col("conductance").isNotNull())
        .orderBy("conductance", "rank")
        .first()
    )
    assert best["rank"] == 5 and best["cut"] == 1
    assert abs(best["conductance"] - 1 / 21) < 1e-12


def test_nibble_deterministic_and_dispatch_parity(spark):
    g = _barbell(spark)
    seeds = spark.createDataFrame([(7,)], "vertex_id long")
    a = pagerank_nibble(g, seeds, top_m=10)
    b = pagerank_nibble(g, seeds, top_m=10, local_edges_threshold=0)
    rows_a = sorted(map(tuple, a.sweep.collect()))
    rows_b = sorted(map(tuple, b.sweep.collect()))
    # PPR driver vs distributed kernels agree ~1e-9; 6-dp score rounding
    # makes the sweep order (and the integer vol/cut columns) identical
    assert [r[:2] + r[3:5] for r in rows_a] == [r[:2] + r[3:5] for r in rows_b]
    comm = sorted(r["vertex_id"] for r in b.community.collect())
    assert comm == [5, 6, 7, 8, 9]
