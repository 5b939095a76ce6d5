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
