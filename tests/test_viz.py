"""Visualization sink tests (SURVEY S13): SVG/HTML artifacts render from
aggregates for the pipeline e2e fixture, without matplotlib/PIL."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from csd363_sin_spark.plans.induce import graph_from_edges
from csd363_sin_spark.viz import render_pipeline_report

BARBELL = (
    [(a, b) for a in range(5) for b in range(a + 1, 5)]
    + [(a, b) for a in range(5, 10) for b in range(a + 1, 10)]
    + [(4, 5)]
)


def test_render_pipeline_report(spark):
    g = graph_from_edges(spark, BARBELL)
    assign = g.vertices.select(
        "vertex_id",
        F.when(F.col("vertex_id") < 5, F.lit(0)).otherwise(F.lit(1)).cast("long").alias("comm"),
    )
    metrics = {"louvain": {"modularity": 0.357, "num_communities": 2}}
    with tempfile.TemporaryDirectory() as d:
        paths = render_pipeline_report(g, assign, metrics, d)
        for name, p in paths.items():
            assert os.path.exists(p), name
            content = open(p).read()
            assert len(content) > 200, name
        svg = open(paths["community_summary"]).read()
        assert svg.startswith("<svg") and "<rect" in svg
        graph_svg = open(paths["community_graph"]).read()
        assert graph_svg.count("<circle") == 2  # two communities
        assert "<line" in graph_svg  # the bridge edge between them
        report = open(paths["report"]).read()
        assert "modularity" in report and "<svg" in report


def test_metrics_comparison_chart(spark):
    """The cross-algorithm grouped-bar chart (reference
    visualization/metrics_visualization.py:9-225 metrics_comparison
    analogue): rendered standalone from compare_algorithms-style data
    and embedded in the pipeline report when >=2 stage bundles exist."""
    from csd363_sin_spark.viz import metrics_comparison_svg

    comparison = {
        "louvain": {"modularity": 0.41, "avg_conductance": 0.22, "coverage": 0.9},
        "girvan_newman": {"modularity": 0.44, "avg_conductance": 0.20, "coverage": 0.88},
        "infomap": {"modularity": 0.43, "avg_conductance": 0.21, "coverage": 0.91},
    }
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "cmp.svg")
        svg = metrics_comparison_svg(comparison, p)
        assert os.path.exists(p)
        assert svg.startswith("<svg")
        # one group label per metric present, one legend entry per algo,
        # one bar per (algo, metric)
        for label in ("modularity", "avg_conductance", "coverage", "louvain",
                      "girvan_newman", "infomap"):
            assert label in svg, label
        assert "nmi" not in svg  # absent everywhere -> dropped
        assert svg.count("<rect") == 9 + 3  # 3x3 bars + 3 legend swatches

    # report embedding: two stage bundles -> the chart appears
    g = graph_from_edges(spark, BARBELL)
    assign = g.vertices.select(
        "vertex_id",
        F.when(F.col("vertex_id") < 5, F.lit(0)).otherwise(F.lit(1)).cast("long").alias("comm"),
    )
    metrics = {
        "louvain": {"modularity": 0.357, "avg_conductance": 0.3},
        "infomap": {"modularity": 0.36, "avg_conductance": 0.29},
    }
    with tempfile.TemporaryDirectory() as d:
        paths = render_pipeline_report(g, assign, metrics, d)
        assert "metrics_comparison" in paths
        assert os.path.exists(paths["metrics_comparison"])
        report = open(paths["report"]).read()
        assert "Metrics comparison" in report


def test_connectivity_report_svg(spark):
    """Reference plot_utils.py:63-116 analogue: component-size histogram
    + cumulative coverage curve + stats text from analyze_graph."""
    from csd363_sin_spark.operators.components import connected_components
    from csd363_sin_spark.operators.degree import analyze_graph
    from csd363_sin_spark.viz import connectivity_report_svg

    # barbell + a disconnected triangle -> two components
    g = graph_from_edges(spark, BARBELL + [(20, 21), (21, 22), (20, 22)])
    comp = connected_components(g)
    analysis = analyze_graph(g, comp)
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "conn.svg")
        svg = connectivity_report_svg(comp, analysis, p)
        assert os.path.exists(p)
        assert svg.startswith("<svg")
        assert "2 connected" in svg
        assert "Total nodes: 13" in svg
        assert "<polyline" in svg and "<rect" in svg


def test_edge_betweenness_distribution_svg(spark):
    """Reference metrics_visualization.py:90-160 analogue: the barbell
    bridge edge dominates betweenness and is flagged inter-community."""
    from csd363_sin_spark.operators.betweenness import edge_betweenness
    from csd363_sin_spark.viz import edge_betweenness_distribution_svg

    g = graph_from_edges(spark, BARBELL)
    assign = g.vertices.select(
        "vertex_id",
        F.when(F.col("vertex_id") < 5, F.lit(0))
        .otherwise(F.lit(1))
        .cast("long")
        .alias("comm"),
    )
    eb = edge_betweenness(g)
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "eb.svg")
        svg = edge_betweenness_distribution_svg(eb, p, assign=assign)
        assert svg.startswith("<svg")
        # the bridge 4-5 is the top edge and inter-community (red)
        assert "4-5" in svg
        assert "#e15759" in svg and "inter-community" in svg
        # intra-community bars present too
        assert svg.count("<rect") > 5


def test_description_length_contribution_svg(spark):
    from csd363_sin_spark.functions.metrics import description_length
    from csd363_sin_spark.viz import (
        community_sizes,
        description_length_contribution_svg,
    )

    g = graph_from_edges(spark, BARBELL)
    # uneven split (4 vs 6 members) so the size-vs-entropy scatter has
    # x-variance and the least-squares trend line renders
    assign = g.vertices.select(
        "vertex_id",
        F.when(F.col("vertex_id") < 4, F.lit(0))
        .otherwise(F.lit(1))
        .cast("long")
        .alias("comm"),
    )
    _, per = description_length(g, assign)
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "dl.svg")
        svg = description_length_contribution_svg(
            per, community_sizes(assign), p
        )
        assert svg.startswith("<svg")
        assert "entropy contribution" in svg
        assert "<circle" in svg  # scatter points
        assert "stroke-dasharray" in svg  # trend line


def test_algorithm_metrics_svg_and_lineage_adapter(spark, tmp_path):
    """Reference metrics_visualization.py:9-88 analogue fed two ways:
    directly from track_algorithm_metrics output, and through the
    checkpoint store's already-persisted superstep lineage
    (step_series_from_lineage)."""
    from csd363_sin_spark.checkpoint import CheckpointStore
    from csd363_sin_spark.viz import (
        algorithm_metrics_svg,
        step_series_from_lineage,
    )

    tracked = {
        "algorithm": "girvan_newman",
        "steps": [
            {"modularity": 0.1, "avg_conductance": 0.5, "num_communities": 1,
             "edge_betweenness": 9.0},
            {"modularity": 0.3, "avg_conductance": 0.3, "num_communities": 2,
             "edge_betweenness": 4.0},
            {"modularity": 0.35, "avg_conductance": 0.2, "num_communities": 3,
             "edge_betweenness": 2.0},
        ],
        "num_steps": 3,
    }
    p1 = str(tmp_path / "steps.svg")
    svg = algorithm_metrics_svg(tracked, p1)
    assert svg.startswith("<svg")
    assert svg.count("<polyline") == 4  # 4 panels
    assert "modularity" in svg and "edge_betweenness" in svg

    # store-fed path: lineage rows with numeric extras become series
    store = CheckpointStore(str(tmp_path / "run"))
    for step, q in enumerate([0.1, 0.25, 0.31]):
        store.lineage("gn", step, None, best_q=q)
    tracked2 = step_series_from_lineage(store.read_lineage(), "gn")
    assert tracked2["num_steps"] == 3
    assert [s["best_q"] for s in tracked2["steps"]] == [0.1, 0.25, 0.31]
    p2 = str(tmp_path / "steps2.svg")
    svg2 = algorithm_metrics_svg(tracked2, p2)
    assert "best_q" in svg2 and "<polyline" in svg2
    # the store's metrics reader round-trips too
    store.metrics("gn", {"modularity": 0.31})
    assert store.read_metrics()[0]["metrics"]["modularity"] == 0.31


def test_step_series_dedupes_resumed_lineage(tmp_path):
    """A resumed run appends to the same lineage file; the adapter must
    keep the LATEST row per superstep, not plot replayed steps twice."""
    from csd363_sin_spark.checkpoint import CheckpointStore
    from csd363_sin_spark.viz import step_series_from_lineage

    store = CheckpointStore(str(tmp_path / "run"))
    for step, q in enumerate([0.1, 0.2, 0.3]):
        store.lineage("gn", step, None, best_q=q)
    # "resume": steps 1-2 replayed with updated values
    store2 = CheckpointStore(str(tmp_path / "run"))
    for step, q in [(1, 0.25), (2, 0.33)]:
        store2.lineage("gn", step, None, best_q=q)
    tracked = step_series_from_lineage(store2.read_lineage(), "gn")
    assert tracked["num_steps"] == 3
    assert [s["best_q"] for s in tracked["steps"]] == [0.1, 0.25, 0.33]
