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
