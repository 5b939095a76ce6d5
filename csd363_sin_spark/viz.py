"""Visualization sinks (SURVEY S13) — dependency-free SVG + HTML.

Mirrors the reference's rendered artifacts (community-size summary bars,
top-community layouts, inter-community graph, HTML report — reference
visualization.py:178-628, plot_utils.py:12-116,
visualization/community_visualization.py:11-401) without matplotlib/PIL
(absent in this environment): charts are emitted as standalone SVG, and
the report as a single HTML file embedding them.

Scale design: every renderer consumes ALREADY-AGGREGATED DataFrames
(per-community sizes, inter-community edge aggregates) or explicitly
bounded member samples — the only driver-side materialization is
O(#communities) / O(top x max_nodes) rows, never the vertex or edge set.
"""

from __future__ import annotations

import html
import math
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from csd363_sin_spark.plans.induce import Graph

_FONT = 'font-family="sans-serif"'
_PALETTE = [
    "#4e79a7", "#f28e2b", "#59a14f", "#e15759", "#76b7b2",
    "#edc948", "#b07aa1", "#ff9da7", "#9c755f", "#bab0ac",
]


def _color(i: int) -> str:
    return _PALETTE[i % len(_PALETTE)]


def _svg(width: int, height: int, body: list[str]) -> str:
    return (
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" '
        f'height="{height}" viewBox="0 0 {width} {height}">\n'
        + "\n".join(body)
        + "\n</svg>\n"
    )


def community_sizes(assign: DataFrame) -> DataFrame:
    """(comm, size) — the shared aggregate behind the size charts."""
    return assign.groupBy("comm").agg(F.count(F.lit(1)).alias("size"))


def community_size_summary_svg(
    sizes: DataFrame, path: str, top: int = 30, width: int = 720, height: int = 360
) -> str:
    """Bar chart of the largest ``top`` community sizes (reference
    visualization.py:246-261 community summary).  Collects ``top`` rows."""
    rows = (
        sizes.orderBy(F.desc("size"), F.asc("comm")).limit(top).collect()
    )
    n_comm = sizes.count()
    body = [
        f'<text x="{width / 2}" y="18" text-anchor="middle" {_FONT} '
        f'font-size="14">Top {len(rows)} of {n_comm} communities by size</text>'
    ]
    if rows:
        max_size = max(r["size"] for r in rows)
        pad_l, pad_b, pad_t = 46, 34, 30
        plot_w, plot_h = width - pad_l - 10, height - pad_t - pad_b
        bw = plot_w / max(len(rows), 1)
        for i, r in enumerate(rows):
            h = plot_h * r["size"] / max_size
            x = pad_l + i * bw
            y = pad_t + plot_h - h
            body.append(
                f'<rect x="{x:.1f}" y="{y:.1f}" width="{max(bw - 2, 1):.1f}" '
                f'height="{h:.1f}" fill="{_color(i)}">'
                f'<title>comm {r["comm"]}: {r["size"]}</title></rect>'
            )
            if len(rows) <= 30:
                body.append(
                    f'<text x="{x + bw / 2:.1f}" y="{height - pad_b + 14}" '
                    f'text-anchor="middle" {_FONT} font-size="8">{r["comm"]}</text>'
                )
        # y axis: 0 and max
        body.append(
            f'<text x="{pad_l - 6}" y="{pad_t + 4}" text-anchor="end" {_FONT} '
            f'font-size="10">{max_size}</text>'
        )
        body.append(
            f'<text x="{pad_l - 6}" y="{pad_t + plot_h + 4}" text-anchor="end" '
            f'{_FONT} font-size="10">0</text>'
        )
        body.append(
            f'<line x1="{pad_l}" y1="{pad_t}" x2="{pad_l}" '
            f'y2="{pad_t + plot_h}" stroke="#333"/>'
        )
        body.append(
            f'<line x1="{pad_l}" y1="{pad_t + plot_h}" x2="{width - 10}" '
            f'y2="{pad_t + plot_h}" stroke="#333"/>'
        )
    svg = _svg(width, height, body)
    with open(path, "w") as f:
        f.write(svg)
    return svg


def community_graph_svg(
    sizes: DataFrame,
    inter_edges: DataFrame,
    path: str,
    top: int = 20,
    width: int = 640,
    height: int = 640,
) -> str:
    """Inter-community graph: top communities on a circle, node radius ~
    sqrt(size), edge width ~ total inter-community weight (reference
    visualization.py:489-555 interconnections plot).  Collects ``top``
    node rows + the inter-edges among them."""
    nodes = sizes.orderBy(F.desc("size"), F.asc("comm")).limit(top).collect()
    keep = {int(r["comm"]) for r in nodes}
    edges = [
        r
        for r in inter_edges.filter(
            F.col("comm_a").isin(list(keep)) & F.col("comm_b").isin(list(keep))
        ).collect()
    ]
    cx, cy = width / 2, height / 2
    ring = min(width, height) / 2 - 70
    pos = {}
    for i, r in enumerate(nodes):
        ang = 2 * math.pi * i / max(len(nodes), 1) - math.pi / 2
        pos[int(r["comm"])] = (cx + ring * math.cos(ang), cy + ring * math.sin(ang))
    body = [
        f'<text x="{cx}" y="20" text-anchor="middle" {_FONT} font-size="14">'
        f"Inter-community edges (top {len(nodes)} communities)</text>"
    ]
    max_w = max((float(r["total_weight"]) for r in edges), default=1.0)
    for r in edges:
        (x1, y1), (x2, y2) = pos[int(r["comm_a"])], pos[int(r["comm_b"])]
        w = 0.5 + 4.5 * float(r["total_weight"]) / max_w
        body.append(
            f'<line x1="{x1:.1f}" y1="{y1:.1f}" x2="{x2:.1f}" y2="{y2:.1f}" '
            f'stroke="#999" stroke-width="{w:.2f}" stroke-opacity="0.6">'
            f'<title>{r["comm_a"]}-{r["comm_b"]}: {r["num_edges"]} edges, '
            f'weight {float(r["total_weight"]):.1f}</title></line>'
        )
    max_size = max((r["size"] for r in nodes), default=1)
    for i, r in enumerate(nodes):
        x, y = pos[int(r["comm"])]
        rad = 6 + 22 * math.sqrt(r["size"] / max_size)
        body.append(
            f'<circle cx="{x:.1f}" cy="{y:.1f}" r="{rad:.1f}" '
            f'fill="{_color(i)}" fill-opacity="0.85" stroke="#333">'
            f'<title>comm {r["comm"]}: {r["size"]} members</title></circle>'
        )
        body.append(
            f'<text x="{x:.1f}" y="{y + 3:.1f}" text-anchor="middle" {_FONT} '
            f'font-size="9">{r["comm"]}</text>'
        )
    svg = _svg(width, height, body)
    with open(path, "w") as f:
        f.write(svg)
    return svg


def top_communities_svg(
    graph: Graph,
    assign: DataFrame,
    path: str,
    top: int = 4,
    max_nodes: int = 40,
    width: int = 720,
    height: int = 720,
) -> str:
    """Member-level view of the ``top`` largest communities (reference
    visualization.py:391 top-communities layout): each community's lowest
    ``max_nodes`` member ids on a small circle, intra-edges among the
    sampled members drawn.  Bounded collect: top x max_nodes vertex rows
    plus the intra-edges among them."""
    sizes = community_sizes(assign)
    comms = [
        int(r["comm"])
        for r in sizes.orderBy(F.desc("size"), F.asc("comm")).limit(top).collect()
    ]
    grid = math.ceil(math.sqrt(max(len(comms), 1)))
    cell = min(width, height) / grid
    body = [
        f'<text x="{width / 2}" y="16" text-anchor="middle" {_FONT} '
        f'font-size="14">Top {len(comms)} communities (sampled members)</text>'
    ]
    for ci, comm in enumerate(comms):
        members = [
            int(r["vertex_id"])
            for r in assign.filter(F.col("comm") == comm)
            .orderBy("vertex_id")
            .limit(max_nodes)
            .collect()
        ]
        mset = set(members)
        sub_edges = [
            (int(r["src"]), int(r["dst"]))
            for r in graph.edges.filter(
                F.col("src").isin(members) & F.col("dst").isin(members)
            ).collect()
        ]
        gx, gy = (ci % grid) * cell + cell / 2, (ci // grid) * cell + cell / 2 + 14
        ring = cell / 2 - 28
        pos = {}
        for i, v in enumerate(members):
            ang = 2 * math.pi * i / max(len(members), 1)
            pos[v] = (gx + ring * math.cos(ang), gy + ring * math.sin(ang))
        for u, v in sub_edges:
            if u in mset and v in mset:
                (x1, y1), (x2, y2) = pos[u], pos[v]
                body.append(
                    f'<line x1="{x1:.1f}" y1="{y1:.1f}" x2="{x2:.1f}" '
                    f'y2="{y2:.1f}" stroke="{_color(ci)}" stroke-width="0.5" '
                    f'stroke-opacity="0.5"/>'
                )
        for v in members:
            x, y = pos[v]
            body.append(
                f'<circle cx="{x:.1f}" cy="{y:.1f}" r="2.4" fill="{_color(ci)}"/>'
            )
        body.append(
            f'<text x="{gx:.1f}" y="{gy - ring - 8:.1f}" text-anchor="middle" '
            f'{_FONT} font-size="11">comm {comm}</text>'
        )
    svg = _svg(width, height, body)
    with open(path, "w") as f:
        f.write(svg)
    return svg


def metrics_comparison_svg(
    comparison: dict[str, dict],
    path: str,
    metrics: tuple[str, ...] = ("modularity", "avg_conductance", "coverage", "nmi"),
    width: int = 760,
    height: int = 340,
) -> str:
    """Grouped-bar cross-algorithm metric comparison (reference
    visualization/metrics_visualization.py:9-225 renders the analogous
    ``metrics_comparison.png``): one group per metric, one bar per
    algorithm/stage, bars scaled within their group (metrics live on
    different scales), value labels on every bar.

    ``comparison`` maps algorithm/stage name -> metrics dict — both the
    ``compare_algorithms(...)["metrics"]`` table and the pipeline's
    per-stage bundles fit.  Metrics absent from every algorithm are
    dropped.  Driver-side cost is O(#algorithms x #metrics) floats —
    already-aggregated scalars, never graph data."""
    algos = list(comparison)
    cols = [
        m
        for m in metrics
        if any(isinstance(comparison[a].get(m), (int, float)) for a in algos)
    ]
    if not algos or not cols:
        svg = _svg(width, 40, ['<text x="10" y="25">no comparison data</text>'])
        with open(path, "w") as f:
            f.write(svg)
        return svg
    margin, legend_h, label_h = 40, 26, 36
    plot_h = height - margin - legend_h - label_h
    group_w = (width - 2 * margin) / len(cols)
    bar_w = min(28.0, (group_w - 16) / max(len(algos), 1))
    body = []
    for gi, m in enumerate(cols):
        vals = [
            float(comparison[a][m])
            for a in algos
            if isinstance(comparison[a].get(m), (int, float))
        ]
        vmax = max([abs(v) for v in vals] + [1e-12])
        gx = margin + gi * group_w
        for ai, a in enumerate(algos):
            v = comparison[a].get(m)
            if not isinstance(v, (int, float)):
                continue
            h = abs(float(v)) / vmax * plot_h
            x = gx + 8 + ai * bar_w
            y = legend_h + plot_h - h
            body.append(
                f'<rect x="{x:.1f}" y="{y:.1f}" width="{bar_w - 3:.1f}" '
                f'height="{h:.1f}" fill="{_color(ai)}"/>'
            )
            body.append(
                f'<text x="{x + (bar_w - 3) / 2:.1f}" y="{max(y - 3, 10):.1f}" '
                f'font-size="8" text-anchor="middle" {_FONT}>'
                f"{float(v):.4g}</text>"
            )
        body.append(
            f'<text x="{gx + group_w / 2:.1f}" y="{legend_h + plot_h + 16}" '
            f'font-size="11" text-anchor="middle" {_FONT}>{html.escape(m)}</text>'
        )
    for ai, a in enumerate(algos):
        lx = margin + ai * ((width - 2 * margin) / len(algos))
        body.append(
            f'<rect x="{lx:.1f}" y="6" width="10" height="10" fill="{_color(ai)}"/>'
        )
        body.append(
            f'<text x="{lx + 14:.1f}" y="15" font-size="11" {_FONT}>'
            f"{html.escape(a)}</text>"
        )
    svg = _svg(width, height, body)
    with open(path, "w") as f:
        f.write(svg)
    return svg


def html_report(metrics: dict, svgs: dict[str, str], path: str) -> str:
    """Standalone HTML report embedding the SVG charts + a metrics table
    per pipeline stage (reference visualization.py HTML report role)."""
    rows = []
    for stage, m in metrics.items():
        if not isinstance(m, dict):
            continue
        cells = "".join(
            f"<tr><td>{html.escape(str(k))}</td>"
            f"<td>{html.escape(str(round(v, 6) if isinstance(v, float) else v))}"
            "</td></tr>"
            for k, v in m.items()
            if isinstance(v, (int, float, str)) and not isinstance(v, bool)
        )
        rows.append(
            f"<h3>{html.escape(stage)}</h3>"
            f'<table border="1" cellspacing="0" cellpadding="3">{cells}</table>'
        )
    figures = "".join(
        f"<h3>{html.escape(name)}</h3>\n{svg}" for name, svg in svgs.items()
    )
    doc = (
        "<!DOCTYPE html><html><head><meta charset='utf-8'>"
        "<title>Community detection report</title></head><body>"
        "<h1>Hybrid community detection report</h1>"
        f"{''.join(rows)}{figures}</body></html>"
    )
    with open(path, "w") as f:
        f.write(doc)
    return doc


def render_pipeline_report(
    graph: Graph, assign: DataFrame, metrics: dict, out_dir: str
) -> dict[str, str]:
    """Render the full artifact set the reference produces: size summary,
    inter-community graph, top-community layouts, and report.html.
    Returns {artifact name: file path}."""
    from csd363_sin_spark.operators.structure import inter_community_edges

    os.makedirs(out_dir, exist_ok=True)
    sizes = community_sizes(assign).persist()
    paths = {
        "community_summary": os.path.join(out_dir, "community_summary.svg"),
        "community_graph": os.path.join(out_dir, "community_graph.svg"),
        "top_communities": os.path.join(out_dir, "top_communities.svg"),
        "report": os.path.join(out_dir, "report.html"),
    }
    svg1 = community_size_summary_svg(sizes, paths["community_summary"])
    svg2 = community_graph_svg(
        sizes, inter_community_edges(graph, assign), paths["community_graph"]
    )
    svg3 = top_communities_svg(graph, assign, paths["top_communities"])
    svgs = {
        "Community sizes": svg1,
        "Inter-community graph": svg2,
        "Top communities": svg3,
    }
    # cross-stage metric comparison (reference metrics_comparison.png):
    # every pipeline-stage metrics bundle present in the dict
    comparison = {
        k: v
        for k, v in metrics.items()
        if isinstance(v, dict) and isinstance(v.get("modularity"), (int, float))
    }
    if len(comparison) >= 2:
        paths["metrics_comparison"] = os.path.join(
            out_dir, "metrics_comparison.svg"
        )
        svgs["Metrics comparison"] = metrics_comparison_svg(
            comparison, paths["metrics_comparison"]
        )
    html_report(metrics, svgs, paths["report"])
    sizes.unpersist()
    return paths
