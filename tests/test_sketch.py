"""Portable HLL sketch + HyperANF neighborhood function."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from csd363_sin_spark.functions import sketch as sk
from csd363_sin_spark.operators.neighborhood import (
    effective_diameter,
    neighborhood_function,
)
from csd363_sin_spark.plans.induce import graph_from_edges


def _py_hll(values):
    """Python mirror of the sketch spec: registers dict + estimate."""
    regs: dict[int, int] = {}
    for v in values:
        h = int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)
        idx = h % sk.M
        rest = h >> sk.P
        if rest == 0:
            rho = sk.RMAX
        else:
            rho = 1
            while rest % 2 == 0:
                rest //= 2
                rho += 1
        regs[idx] = max(regs.get(idx, 0), rho)
    present = len(regs)
    dsum = sum(1 << (sk.RMAX - r) for r in regs.values())
    zeros = sk.M - present
    denom = dsum + zeros * (1 << sk.RMAX)
    raw = sk.ALPHA_NUMER / float(denom)
    if raw <= 2.5 * sk.M and zeros > 0:
        import math

        return float(sk.M) * math.log(float(sk.M) / float(zeros))
    return raw


def test_hll_matches_python_mirror_and_is_accurate(spark):
    vals = [f"doc_{i:06d}" for i in range(4000)]
    df = spark.createDataFrame([(v, "g") for v in vals], "v string, grp string")
    got = sk.hll_distinct(df, ["grp"], "v").collect()[0]["approx_distinct"]
    assert got == _py_hll(vals)  # bit-exact vs the spec mirror
    assert abs(got - 4000) / 4000 < 0.3  # m=64 -> ~13% stderr

    # merge = max of registers: two halves re-aggregated == whole
    regs_whole = sk.hll_registers(df, ["grp"], "v")
    half = spark.createDataFrame(
        [(v, "g", i % 2) for i, v in enumerate(vals)],
        "v string, grp string, part int",
    )
    merged = (
        sk.hll_registers(half, ["grp", "part"], "v")
        .groupBy("grp", "idx")
        .agg(F.max("reg").alias("reg"))
    )
    assert sorted(map(tuple, regs_whole.collect())) == sorted(
        map(tuple, merged.collect())
    )


def test_hll_small_range_linear_counting(spark):
    df = spark.createDataFrame(
        [(f"x{i % 12}", "a") for i in range(300)], "v string, grp string"
    )
    got = sk.hll_distinct(df, ["grp"], "v").collect()[0]["approx_distinct"]
    assert got == _py_hll([f"x{i}" for i in range(12)])
    assert abs(got - 12) < 6  # near-exact regime


def test_neighborhood_function_matches_exact_ball_sketches(spark):
    # petersen-ish small graph: NF must equal the HLL of the EXACT ball
    import networkx as nx

    g = nx.petersen_graph()
    graph = graph_from_edges(spark, list(g.edges()))
    nf = neighborhood_function(graph, max_t=3)
    got = {
        (r["vertex_id"], r["t"]): r["ball_est"] for r in nf.collect()
    }
    for v in g.nodes():
        lengths = nx.single_source_shortest_path_length(g, v)
        for t in range(4):
            ball = [str(u) for u, d in lengths.items() if d <= t]
            assert got[(v, t)] == _py_hll(ball), (v, t)


def test_effective_diameter_on_path_graph(spark):
    import networkx as nx

    n = 12
    g = nx.path_graph(n)
    graph = graph_from_edges(spark, list(g.edges()))
    nf = neighborhood_function(graph, max_t=n)
    ed = effective_diameter(nf, q=0.9).collect()[0]
    # exact 90%-effective diameter of a path: NF(t)=sum min(2t+1 capped)
    def mass(t):
        return sum(
            len([u for u in range(n) if abs(u - v) <= t]) for v in range(n)
        )

    exact = min(t for t in range(n + 1) if mass(t) >= 0.9 * mass(n))
    # sketch estimate may be off by one radius at these tiny sizes
    assert abs(ed["effective_diameter"] - exact) <= 1
