"""Frontier-delta k_in / w_to maintenance is bit-identical to full
recompute (integral weights make every merge exact), and auto-disables
on fractional weights."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from csd363_sin_spark.operators.infomap import _infomap_move_phase
from csd363_sin_spark.operators.louvain import _local_move_phase
from csd363_sin_spark.plans.induce import graph_from_edges, induce_graph
from csd363_sin_spark.sources.synth import synth_transcripts


def _phase_assign(spark, g, delta, arm=None):
    m = float(g.edges.agg(F.sum("weight")).collect()[0][0] or 0.0)
    assign, steps = _local_move_phase(
        g.edges.select("src", "dst", "weight"),
        g.vertices.select("vertex_id"),
        m,
        max_supersteps=64,
        delta_kin=delta,
        # arm immediately so every superstep after the first exercises the
        # delta-merge path (the production default arms adaptively)
        delta_arm_threshold=arm,
    )
    return {r["vertex_id"]: r["comm"] for r in assign.collect()}, steps


def test_phase_delta_kin_parity(spark):
    t = synth_transcripts(spark, n_convs=150, n_tools=20, n_clusters=5, seed=77)
    g = induce_graph(t)
    a, steps_a = _phase_assign(spark, g, delta=True, arm=10**9)
    b, steps_b = _phase_assign(spark, g, delta=False)
    assert a == b
    assert steps_a == steps_b


def test_phase_delta_kin_parity_adaptive_arming(spark):
    # production defaults: arming happens mid-phase when movers fall below
    # |V|/8 — the armed/unarmed boundary superstep must also be exact
    t = synth_transcripts(spark, n_convs=150, n_tools=20, n_clusters=5, seed=77)
    g = induce_graph(t)
    a, steps_a = _phase_assign(spark, g, delta=True)
    b, steps_b = _phase_assign(spark, g, delta=False)
    assert a == b
    assert steps_a == steps_b


def test_phase_delta_kin_parity_weighted_integral(spark):
    pairs = [
        (0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (4, 5),
        (3, 5), (5, 6), (6, 7), (7, 8), (6, 8),
    ]
    weights = [3.0, 2.0, 4.0, 1.0, 5.0, 2.0, 3.0, 1.0, 2.0, 2.0, 4.0]
    g = graph_from_edges(spark, pairs, weights=weights)
    a, _ = _phase_assign(spark, g, delta=True, arm=10**9)
    b, _ = _phase_assign(spark, g, delta=False)
    assert a == b


def test_phase_delta_disabled_on_fractional_weights(spark):
    # fractional weights: the delta gate must fall back to full recompute
    # (exactness cannot be guaranteed), and results still match the
    # delta_kin=False run because both take the identical full path
    pairs = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4)]
    g = graph_from_edges(spark, pairs, weights=[0.5, 1.5, 2.5, 0.25, 1.0])
    a, _ = _phase_assign(spark, g, delta=True)
    b, _ = _phase_assign(spark, g, delta=False)
    assert a == b


def test_move_phase_delta_parity(spark):
    t = synth_transcripts(spark, n_convs=120, n_tools=16, n_clusters=4, seed=91)
    g = induce_graph(t)
    edges = g.edges.select("src", "dst", F.lit(1.0).alias("weight"))
    verts = g.vertices.select("vertex_id")
    a, sa = _infomap_move_phase(
        edges, verts, max_supersteps=64, delta_kin=True,
        delta_arm_threshold=10**9,
    )
    b, sb = _infomap_move_phase(edges, verts, max_supersteps=64, delta_kin=False)
    assert {r["vertex_id"]: r["comm"] for r in a.collect()} == {
        r["vertex_id"]: r["comm"] for r in b.collect()
    }
    assert sa == sb
