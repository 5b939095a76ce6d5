"""CSR block layer + Arrow-kernel PageRank tests."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from csd363_sin_spark.operators.pagerank import pagerank
from csd363_sin_spark.plans.csr import blocks_stats, build_blocks, pagerank_csr
from csd363_sin_spark.plans.induce import graph_from_edges, induce_graph
from csd363_sin_spark.sources.synth import synth_transcripts


def test_blocks_cover_all_edges(spark):
    t = synth_transcripts(spark, n_convs=40, n_tools=10, n_clusters=2, seed=42)
    g = induce_graph(t)
    blocks = build_blocks(g, num_blocks=4)
    stats = blocks_stats(blocks).collect()
    assert sum(r["num_edges"] for r in stats) == g.edges_sym().count()
    # every source in a block hashes to that block
    for row in blocks.collect():
        for s in row["src_sorted"]:
            assert s % 4 == row["part_id"]
        assert len(row["offsets"]) == len(row["src_sorted"]) + 1
        assert row["offsets"][-1] == len(row["dst"])


def test_blocks_salting_splits_hubs(spark):
    g = graph_from_edges(spark, [(0, i) for i in range(1, 21)])  # hub deg 20
    blocks = build_blocks(g, num_blocks=2, salt_threshold=6)
    rows = blocks.collect()
    hub_rows = [r for r in rows if r["src_sorted"] == [0]]
    assert len(hub_rows) == 4  # ceil(20/6)
    assert sum(len(r["dst"]) for r in hub_rows) == 20
    # all edges still present overall
    assert sum(len(r["dst"]) for r in rows) == g.edges_sym().count()


def _compare_pageranks(graph, **kw):
    a = {r["vertex_id"]: r["rank"] for r in pagerank(graph).collect()}
    b = {r["vertex_id"]: r["rank"] for r in pagerank_csr(graph, **kw).collect()}
    assert set(a) == set(b)
    av = np.array([a[k] for k in sorted(a)])
    bv = np.array([b[k] for k in sorted(a)])
    assert np.allclose(av, bv, atol=1e-9)


def test_pagerank_csr_matches_join_version(spark):
    t = synth_transcripts(spark, n_convs=50, n_tools=10, n_clusters=2, seed=42)
    g = induce_graph(t)
    _compare_pageranks(g, num_blocks=4)


def test_pagerank_csr_with_salting_and_isolates(spark):
    from csd363_sin_spark.plans.induce import Graph

    g = graph_from_edges(spark, [(0, i) for i in range(1, 15)] + [(1, 2), (3, 4)])
    iso = spark.createDataFrame(
        [(99, "v:99", "v")], "vertex_id long, actor string, kind string"
    )
    g = Graph(vertices=g.vertices.unionByName(iso), edges=g.edges)
    _compare_pageranks(g, num_blocks=3, salt_threshold=4)


def test_louvain_phase_csr_parity(spark):
    """CSR-gather phase == join-dataflow phase, bit-for-bit (shared
    _decide_moves; integral weights make the gather order-insensitive)."""
    from pyspark.sql import functions as F

    from csd363_sin_spark.operators.louvain import (
        _local_move_phase,
        _local_move_phase_csr,
    )
    from csd363_sin_spark.plans.induce import induce_graph
    from csd363_sin_spark.sources.synth import synth_transcripts

    t = synth_transcripts(spark, n_convs=150, n_tools=20, n_clusters=5, seed=31)
    g = induce_graph(t)
    m = float(g.edges.agg(F.sum("weight")).collect()[0][0])
    e = g.edges.select("src", "dst", "weight")
    v = g.vertices.select("vertex_id")
    a, sa = _local_move_phase(e, v, m, 64)
    b, sb = _local_move_phase_csr(e, v, m, 64, salt_threshold=32)
    assert sa == sb
    assert {r["vertex_id"]: r["comm"] for r in a.collect()} == {
        r["vertex_id"]: r["comm"] for r in b.collect()
    }


def test_csr_gather_matches_edge_join(spark):
    """csr_gather expansion == frontier-JOIN-edges expansion, row-for-row
    (incl. salted hub rows, whose sub-slices union to the full adjacency)."""
    from csd363_sin_spark.plans.csr import csr_gather

    t = synth_transcripts(spark, n_convs=80, n_tools=12, n_clusters=3, seed=7)
    g = induce_graph(t, binarize=True)
    nb = 4
    frontier = g.vertices.select(
        F.col("vertex_id").alias("s"),
        F.col("vertex_id").alias("v"),
        (F.col("vertex_id") % 5 + 1.0).alias("val"),
    ).filter(F.col("v") % 3 == 0)
    sym = g.edges_sym().select("src", "dst")
    expect = sorted(
        (r["s"], r["v"], r["dst"], r["val"])
        for r in frontier.join(sym, frontier["v"] == sym["src"])
        .select("s", "v", "dst", "val")
        .collect()
    )
    for salt in (None, 3):
        blocks = build_blocks(g, num_blocks=nb, weighted=False, salt_threshold=salt)
        got = sorted(
            (r["s"], r["v"], r["w"], r["val"])
            for r in csr_gather(blocks, frontier, nb).collect()
        )
        assert got == expect


def test_betweenness_csr_gather_parity(spark):
    """edge_betweenness gather="csr" == gather="join" (same dataflow, the
    expansion kernel swapped) to FP tolerance, exact and sampled modes."""
    from csd363_sin_spark.operators.betweenness import edge_betweenness

    t = synth_transcripts(spark, n_convs=40, n_tools=10, n_clusters=2, seed=42)
    g = induce_graph(t, binarize=True)
    for kw in ({}, {"k_sources": 12}):
        join_side = {
            (r["src"], r["dst"]): r["betweenness"]
            for r in edge_betweenness(g, local_edges_threshold=0, **kw).collect()
        }
        csr_side = {
            (r["src"], r["dst"]): r["betweenness"]
            for r in edge_betweenness(
                g, local_edges_threshold=0, gather="csr", **kw
            ).collect()
        }
        assert set(join_side) == set(csr_side)
        for e in join_side:
            assert csr_side[e] == pytest.approx(join_side[e], abs=1e-9)


def test_lpa_csr_matches_operator(spark):
    from csd363_sin_spark.operators.lpa import label_propagation
    from csd363_sin_spark.plans.csr import lpa_csr

    t = synth_transcripts(spark, n_convs=60, n_tools=12, n_clusters=3, seed=7)
    g = induce_graph(t)
    ref = {r["vertex_id"]: r["label"] for r in label_propagation(g, 6).collect()}
    got = {r["vertex_id"]: r["label"] for r in lpa_csr(g, max_iterations=6).collect()}
    assert got == ref


def test_lpa_csr_salted_hub_and_isolates(spark):
    from csd363_sin_spark.operators.lpa import label_propagation
    from csd363_sin_spark.plans.csr import lpa_csr
    from csd363_sin_spark.plans.induce import Graph

    g = graph_from_edges(
        spark, [(0, i) for i in range(1, 21)] + [(21, 22), (22, 23)]
    )
    iso = spark.createDataFrame(
        [(50, "v:50", "v")], "vertex_id long, actor string, kind string"
    )
    g = Graph(vertices=g.vertices.unionByName(iso), edges=g.edges)
    ref = {r["vertex_id"]: r["label"] for r in label_propagation(g, 5).collect()}
    got = {
        r["vertex_id"]: r["label"]
        for r in lpa_csr(g, max_iterations=5, salt_threshold=6).collect()
    }
    assert got == ref
    assert got[50] == 50
