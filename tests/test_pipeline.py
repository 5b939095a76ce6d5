"""End-to-end pipeline + checkpoint/resume tests."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from csd363_sin_spark.checkpoint import CheckpointStore
from csd363_sin_spark.pipeline import PipelineConfig, run_pipeline
from csd363_sin_spark.plans.induce import graph_from_edges, induce_graph
from csd363_sin_spark.sources.synth import synth_ground_truth, synth_transcripts

BARBELL = (
    [(a, b) for a in range(5) for b in range(a + 1, 5)]
    + [(a, b) for a in range(5, 10) for b in range(a + 1, 10)]
    + [(4, 5)]
)


@pytest.fixture(scope="module")
def planted(spark):
    t = synth_transcripts(spark, n_convs=60, n_tools=12, n_clusters=3, seed=42)
    g = induce_graph(t)
    gt = synth_ground_truth(spark, n_convs=60, n_tools=12, n_clusters=3, seed=42)
    gt_ids = g.vertices.join(gt, "actor").select("vertex_id", "comm")
    return g, gt_ids


def test_pipeline_end_to_end(spark, planted):
    g, gt = planted
    cfg = PipelineConfig(size_threshold=30, infomap_min_size=10, fast_mode=True)
    out = run_pipeline(g, ground_truth=gt, config=cfg)
    assert out["baseline"]["modularity"] == pytest.approx(0.0, abs=1e-12)
    assert out["louvain"]["modularity"] > 0.3
    assert out["louvain"]["nmi"] is not None and out["louvain"]["nmi"] > 0.4
    # stage deltas recorded (reference __main__.py:742-745, :765-768)
    assert "improvement_from_gn" in out["infomap"]
    assert out["summary"]["final_communities"] >= out["louvain"]["num_communities"] - 1
    n_assigned = out["final_assign"].count()
    assert n_assigned == g.vertices.count()


def test_pipeline_resume_identical(spark):
    """Kill-after-stage-k resume: final assignment identical (FIXTURES F6)."""
    g = graph_from_edges(spark, BARBELL)
    cfg = PipelineConfig(size_threshold=5, target_subcommunities=2, infomap_min_size=3)

    with tempfile.TemporaryDirectory() as d1:
        store = CheckpointStore(d1, run_id="runA")
        out_full = run_pipeline(g, config=cfg, store=store)
        full_assign = sorted(
            (r["vertex_id"], r["comm"]) for r in out_full["final_assign"].collect()
        )
        lineage = store.read_lineage()
        assert any(row["stage"] == "louvain" for row in lineage)
        assert all("checksum" in row for row in lineage if row["superstep"] == -1)

        # simulate a crash after stage 1: wipe stage-2/3 state, resume
        import os, shutil

        for key in list(os.listdir(os.path.join(d1, "state"))):
            if key.startswith(("gn", "infomap")):
                shutil.rmtree(os.path.join(d1, "state", key))
        for key in list(os.listdir(os.path.join(d1, "meta"))):
            if key.startswith(("gn", "infomap")):
                os.remove(os.path.join(d1, "meta", key))

        out_resumed = run_pipeline(g, config=cfg, store=CheckpointStore(d1, run_id="runA"))
        resumed_assign = sorted(
            (r["vertex_id"], r["comm"]) for r in out_resumed["final_assign"].collect()
        )
        assert resumed_assign == full_assign
        # louvain stage must have been loaded, not recomputed
        assert out_resumed["louvain"] == out_full["louvain"]


def test_pipeline_no_store_matches_store(spark):
    g = graph_from_edges(spark, BARBELL)
    cfg = PipelineConfig(size_threshold=5, target_subcommunities=2, infomap_min_size=3)
    a = sorted(
        (r["vertex_id"], r["comm"])
        for r in run_pipeline(g, config=cfg)["final_assign"].collect()
    )
    with tempfile.TemporaryDirectory() as d:
        b = sorted(
            (r["vertex_id"], r["comm"])
            for r in run_pipeline(g, config=cfg, store=CheckpointStore(d))[
                "final_assign"
            ].collect()
        )
    assert a == b


def test_format_metrics_summary_layout():
    """S12 output parity: the fixed-width layout mirrors the reference's
    extract_metrics.py:173-277 formatter (header rules, column widths,
    NMI + improvement sections, m/s runtime)."""
    from csd363_sin_spark.checkpoint import format_metrics_summary

    out = {
        "graph_analysis": {
            "num_nodes": 10, "num_edges": 21, "density": 0.466667,
            "num_components": 1, "largest_component_size": 10,
            "largest_component_pct": 100.0,
        },
        "baseline": {"num_communities": 1, "modularity": 0.0, "avg_conductance": 0.0},
        "louvain": {
            "num_communities": 2, "modularity": 0.3571,
            "avg_conductance": 0.05, "nmi": 1.0,
        },
        "girvan_newman": {"num_communities": 2, "modularity": 0.3571, "avg_conductance": 0.05},
        "infomap": {"num_communities": 2, "modularity": 0.3571, "avg_conductance": 0.05},
        "summary": {"total_runtime": 75.5},
    }
    txt = format_metrics_summary(out, timestamp="2026-08-17 00:00:00")
    lines = txt.splitlines()
    assert lines[0] == "=" * 80
    assert lines[1] == "COMMUNITY DETECTION PIPELINE - METRICS SUMMARY"
    assert "Run date: 2026-08-17 00:00:00" in txt
    header = "{:<20} {:<15} {:<15} {:<15}".format(
        "Algorithm", "Communities", "Modularity", "Conductance"
    )
    assert header in txt
    assert "{:<20} {:<15} {:<15.4f} {:<15.4f}".format("Louvain", 2, 0.3571, 0.05) in txt
    assert "Louvain vs Baseline (Modularity): +0.3571" in txt
    assert "Total Runtime: 1m 15.50s" in txt


def test_pipeline_leiden_base_algorithm(spark, planted):
    """base_algorithm='leiden' swaps stage 1 for the connectivity-
    guaranteed variant; downstream stages and metrics flow unchanged."""
    g, gt = planted
    cfg = PipelineConfig(
        size_threshold=30, infomap_min_size=10, fast_mode=True,
        base_algorithm="leiden",
    )
    out = run_pipeline(g, ground_truth=gt, config=cfg)
    assert out["louvain"]["modularity"] > 0.3
    assert out["final_assign"].count() == g.vertices.count()
    # leiden base: every stage-1 community is internally connected
    import networkx as nx

    from tests.conftest import graph_to_networkx

    nxg = graph_to_networkx(g)
    comms: dict = {}
    from csd363_sin_spark.operators.leiden import leiden

    for r in leiden(g).assign.collect():
        comms.setdefault(r["comm"], set()).add(r["vertex_id"])
    for members in comms.values():
        assert nx.is_connected(nxg.subgraph(members))
