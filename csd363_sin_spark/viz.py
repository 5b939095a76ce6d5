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


def _spark_histogram(
    df: DataFrame, col: str, bins: int = 20
) -> tuple[list[tuple[float, int]], float, float]:
    """Distributed fixed-width histogram of a numeric column: one min/max
    aggregation + one bucket groupBy — the driver sees ``bins`` rows, the
    chart-side contract every distribution plot here uses."""
    row = df.agg(F.min(col).alias("lo"), F.max(col).alias("hi")).collect()[0]
    lo = float(row["lo"] or 0.0)
    hi = float(row["hi"] or 0.0)
    if hi <= lo:
        hi = lo + 1.0
    w = (hi - lo) / bins
    counts = {
        int(r["b"]): int(r["count"])
        for r in df.select(
            F.least(
                F.lit(bins - 1),
                F.floor((F.col(col) - F.lit(lo)) / F.lit(w)).cast("int"),
            ).alias("b")
        )
        .groupBy("b")
        .count()
        .collect()
    }
    return [(lo + i * w, counts.get(i, 0)) for i in range(bins)], lo, hi


def _line_panel(
    body: list[str],
    x0: float,
    y0: float,
    w: float,
    h: float,
    values: list[float],
    title: str,
    color: str,
) -> None:
    """One line-chart panel (axis, polyline, point markers, min/max
    labels) appended to ``body`` — the unit of the 2x2 metrics grid."""
    pad_l, pad_b, pad_t = 52, 22, 20
    pw, ph = w - pad_l - 8, h - pad_t - pad_b
    vmin, vmax = min(values), max(values)
    span = (vmax - vmin) or 1.0
    pts = []
    for i, v in enumerate(values):
        px = x0 + pad_l + pw * (i / max(len(values) - 1, 1))
        py = y0 + pad_t + ph * (1.0 - (v - vmin) / span)
        pts.append((px, py))
    body.append(
        f'<text x="{x0 + w / 2:.1f}" y="{y0 + 13:.1f}" text-anchor="middle" '
        f'{_FONT} font-size="11">{html.escape(title)}</text>'
    )
    body.append(
        f'<line x1="{x0 + pad_l:.1f}" y1="{y0 + pad_t:.1f}" '
        f'x2="{x0 + pad_l:.1f}" y2="{y0 + pad_t + ph:.1f}" stroke="#333"/>'
    )
    body.append(
        f'<line x1="{x0 + pad_l:.1f}" y1="{y0 + pad_t + ph:.1f}" '
        f'x2="{x0 + pad_l + pw:.1f}" y2="{y0 + pad_t + ph:.1f}" stroke="#333"/>'
    )
    body.append(
        f'<text x="{x0 + pad_l - 4:.1f}" y="{y0 + pad_t + 4:.1f}" '
        f'text-anchor="end" {_FONT} font-size="8">{vmax:.4g}</text>'
    )
    body.append(
        f'<text x="{x0 + pad_l - 4:.1f}" y="{y0 + pad_t + ph + 4:.1f}" '
        f'text-anchor="end" {_FONT} font-size="8">{vmin:.4g}</text>'
    )
    poly = " ".join(f"{px:.1f},{py:.1f}" for px, py in pts)
    body.append(
        f'<polyline points="{poly}" fill="none" stroke="{color}" '
        f'stroke-width="1.5"/>'
    )
    for px, py in pts:
        body.append(f'<circle cx="{px:.1f}" cy="{py:.1f}" r="2" fill="{color}"/>')


def algorithm_metrics_svg(
    tracked: dict,
    path: str,
    width: int = 760,
    height: int = 520,
) -> str:
    """Per-step metric line charts, 2x2 grid (reference
    visualization/metrics_visualization.py:9-88 plot_algorithm_metrics):
    modularity / conductance / community count plus the algorithm-
    specific fourth panel (edge betweenness for GN, description length
    for Infomap, coverage otherwise) — whichever of those are present in
    the step dicts.

    ``tracked`` is ``track_algorithm_metrics(...)`` output (or the
    :func:`step_series_from_lineage` adapter over a checkpoint store):
    ``{"algorithm": str|None, "steps": [{metric: value}, ...]}``.
    Driver-side cost: the step dicts are already scalars."""
    steps = tracked.get("steps") or []
    pref = [
        "modularity", "avg_conductance", "num_communities",
        "edge_betweenness", "description_length", "coverage",
    ]
    series: dict[str, list[float]] = {}
    keys = [k for k in pref if any(k in s for s in steps)]
    keys += sorted(
        {
            k
            for s in steps
            for k, v in s.items()
            if k not in pref and isinstance(v, (int, float))
            and not isinstance(v, bool)
        }
    )
    for k in keys:
        vals = [
            float(s[k])
            for s in steps
            if isinstance(s.get(k), (int, float)) and not isinstance(s.get(k), bool)
        ]
        if len(vals) >= 2:
            series[k] = vals
    algo = tracked.get("algorithm") or "unknown"
    body = [
        f'<text x="{width / 2}" y="18" text-anchor="middle" {_FONT} '
        f'font-size="14">Algorithm metrics over steps '
        f"({html.escape(str(algo))})</text>"
    ]
    panels = list(series.items())[:4]
    if not panels:
        body.append(
            f'<text x="{width / 2}" y="{height / 2}" text-anchor="middle" '
            f"{_FONT}>not enough steps to plot</text>"
        )
    pw, ph = width / 2, (height - 26) / 2
    for i, (name, vals) in enumerate(panels):
        _line_panel(
            body, (i % 2) * pw, 26 + (i // 2) * ph, pw, ph, vals,
            f"{name} ({len(vals)} steps)", _color(i),
        )
    svg = _svg(width, height, body)
    with open(path, "w") as f:
        f.write(svg)
    return svg


def step_series_from_lineage(
    lineage_rows: list[dict], stage: str
) -> dict:
    """Adapt a checkpoint store's already-recorded superstep lineage
    (``CheckpointStore.read_lineage()``) into the
    ``track_algorithm_metrics`` shape :func:`algorithm_metrics_svg`
    consumes — per-superstep numeric extras (e.g. the GN driver's
    ``best_q``, each round's ``rows``) become the plotted series, so the
    per-step charts come from metrics the run ALREADY persisted instead
    of a re-evaluation pass."""
    picked: dict[int, dict] = {}
    for r in lineage_rows:
        if r.get("stage") == stage and r.get("superstep", -1) >= 0:
            # resumed runs append to the same lineage file; keep the
            # LATEST row per superstep so replayed steps don't double
            prev = picked.get(r["superstep"])
            if prev is None or r.get("ts", 0) >= prev.get("ts", 0):
                picked[r["superstep"]] = r
    rows = [picked[k] for k in sorted(picked)]
    skip = {"superstep", "ts", "checksum", "run_id"}
    steps = [
        {
            k: v
            for k, v in r.items()
            if k not in skip
            and isinstance(v, (int, float))
            and not isinstance(v, bool)
        }
        for r in rows
    ]
    return {"algorithm": stage, "steps": steps, "num_steps": len(steps)}


def edge_betweenness_distribution_svg(
    eb: DataFrame,
    path: str,
    assign: DataFrame | None = None,
    top_n: int = 20,
    bins: int = 20,
    width: int = 880,
    height: int = 380,
) -> str:
    """Edge-betweenness analysis, two panels (reference
    visualization/metrics_visualization.py:90-160
    plot_edge_betweenness_distribution): value-distribution histogram +
    top-``top_n`` edges bar list, colored red/blue by inter- vs
    intra-community when ``assign`` is given.

    ``eb`` is ``edge_betweenness(...)`` output (src, dst, betweenness).
    Driver sees ``bins`` histogram rows + ``top_n`` edge rows; the
    community flags join AFTER the top-n cut, so the collect stays
    bounded whatever the edge count."""
    hist, lo, hi = _spark_histogram(eb, "betweenness", bins)
    top = eb.orderBy(F.desc("betweenness"), "src", "dst").limit(top_n)
    if assign is not None:
        ca = assign.select(
            F.col("vertex_id").alias("src"), F.col("comm").alias("comm_src")
        )
        cb = assign.select(
            F.col("vertex_id").alias("dst"), F.col("comm").alias("comm_dst")
        )
        top = (
            F.broadcast(top)
            .join(ca, "src", "left")
            .join(cb, "dst", "left")
            .withColumn(
                "inter",
                F.col("comm_src").isNotNull()
                & F.col("comm_dst").isNotNull()
                & (F.col("comm_src") != F.col("comm_dst")),
            )
        )
    else:
        top = top.withColumn("inter", F.lit(False))
    rows = top.orderBy(F.desc("betweenness"), "src", "dst").collect()
    half = width / 2
    body = [
        f'<text x="{width / 2}" y="18" text-anchor="middle" {_FONT} '
        f'font-size="14">Edge betweenness analysis</text>'
    ]
    # left: histogram
    pad_l, pad_b, pad_t = 56, 40, 36
    pw, ph = half - pad_l - 16, height - pad_t - pad_b
    cmax = max((c for _, c in hist), default=1) or 1
    bw = pw / max(len(hist), 1)
    for i, (blo, c) in enumerate(hist):
        bh = ph * c / cmax
        body.append(
            f'<rect x="{pad_l + i * bw:.1f}" y="{pad_t + ph - bh:.1f}" '
            f'width="{max(bw - 1, 1):.1f}" height="{bh:.1f}" '
            f'fill="{_color(0)}"><title>[{blo:.4g}, '
            f"{blo + (hi - lo) / max(bins, 1):.4g}): {c}</title></rect>"
        )
    body.append(
        f'<line x1="{pad_l}" y1="{pad_t}" x2="{pad_l}" y2="{pad_t + ph}" '
        f'stroke="#333"/>'
        f'<line x1="{pad_l}" y1="{pad_t + ph}" x2="{pad_l + pw:.1f}" '
        f'y2="{pad_t + ph}" stroke="#333"/>'
    )
    body.append(
        f'<text x="{pad_l - 4}" y="{pad_t + 4}" text-anchor="end" {_FONT} '
        f'font-size="9">{cmax}</text>'
        f'<text x="{pad_l:.1f}" y="{pad_t + ph + 14}" text-anchor="middle" '
        f'{_FONT} font-size="9">{lo:.3g}</text>'
        f'<text x="{pad_l + pw:.1f}" y="{pad_t + ph + 14}" '
        f'text-anchor="middle" {_FONT} font-size="9">{hi:.3g}</text>'
        f'<text x="{pad_l + pw / 2:.1f}" y="{pad_t - 8}" text-anchor="middle" '
        f'{_FONT} font-size="11">Distribution of edge betweenness</text>'
    )
    # right: top-n bars
    bx = half + 150
    bar_w_max = width - bx - 70
    vmax = max((float(r["betweenness"]) for r in rows), default=1.0) or 1.0
    bh2 = (height - pad_t - 24) / max(len(rows), 1)
    body.append(
        f'<text x="{bx + bar_w_max / 2:.1f}" y="{pad_t - 8}" '
        f'text-anchor="middle" {_FONT} font-size="11">Top {len(rows)} edges '
        f"by betweenness</text>"
    )
    for i, r in enumerate(rows):
        bl = bar_w_max * float(r["betweenness"]) / vmax
        y = pad_t + i * bh2
        color = "#e15759" if r["inter"] else "#4e79a7"
        body.append(
            f'<rect x="{bx}" y="{y:.1f}" width="{bl:.1f}" '
            f'height="{max(bh2 - 2, 1):.1f}" fill="{color}">'
            f'<title>{r["src"]}-{r["dst"]}: {float(r["betweenness"]):.4g}'
            f"</title></rect>"
        )
        body.append(
            f'<text x="{bx - 4}" y="{y + bh2 / 2 + 3:.1f}" text-anchor="end" '
            f'{_FONT} font-size="8">{html.escape(str(r["src"]))}-'
            f'{html.escape(str(r["dst"]))}</text>'
        )
    if assign is not None:
        body.append(
            f'<rect x="{bx}" y="{height - 16}" width="10" height="10" '
            f'fill="#e15759"/><text x="{bx + 14}" y="{height - 7}" {_FONT} '
            f'font-size="10">inter-community</text>'
            f'<rect x="{bx + 130}" y="{height - 16}" width="10" height="10" '
            f'fill="#4e79a7"/><text x="{bx + 144}" y="{height - 7}" {_FONT} '
            f'font-size="10">intra-community</text>'
        )
    svg = _svg(width, height, body)
    with open(path, "w") as f:
        f.write(svg)
    return svg


def description_length_contribution_svg(
    per_comm: DataFrame,
    sizes: DataFrame,
    path: str,
    top_n: int = 20,
    scatter_cap: int = 2000,
    width: int = 880,
    height: int = 380,
) -> str:
    """Infomap description-length analysis, two panels (reference
    visualization/metrics_visualization.py:162-225
    plot_description_length_contribution): top-``top_n`` communities by
    entropy contribution (bars) + community size vs entropy scatter with
    a least-squares trend line.

    ``per_comm`` is the per-community entropy frame
    ``description_length(...)`` returns; ``sizes`` is
    :func:`community_sizes` output.  The scatter collects the
    ``scatter_cap`` highest-entropy communities (the reference collects
    ALL — unbounded at 10^8 communities; the cap keeps the driver
    contract and is drawn in the title when it bites)."""
    joined = per_comm.join(sizes, "comm")
    n_total = joined.count()
    pts = joined.orderBy(F.desc("entropy"), "comm").limit(scatter_cap).collect()
    top = pts[:top_n]
    capped = f" (top {scatter_cap} of {n_total})" if n_total > scatter_cap else ""
    body = [
        f'<text x="{width / 2}" y="18" text-anchor="middle" {_FONT} '
        f'font-size="14">Infomap description length analysis</text>'
    ]
    half = width / 2
    pad_t = 36
    # left: top-n entropy bars
    bx = 120
    bar_w_max = half - bx - 30
    vmax = max((float(r["entropy"]) for r in top), default=1.0) or 1.0
    bh = (height - pad_t - 16) / max(len(top), 1)
    body.append(
        f'<text x="{bx + bar_w_max / 2:.1f}" y="{pad_t - 8}" '
        f'text-anchor="middle" {_FONT} font-size="11">Top {len(top)} '
        f"communities by entropy contribution</text>"
    )
    for i, r in enumerate(top):
        bl = bar_w_max * float(r["entropy"]) / vmax
        y = pad_t + i * bh
        body.append(
            f'<rect x="{bx}" y="{y:.1f}" width="{bl:.1f}" '
            f'height="{max(bh - 2, 1):.1f}" fill="{_color(1)}">'
            f'<title>comm {r["comm"]}: {float(r["entropy"]):.6g}</title></rect>'
        )
        body.append(
            f'<text x="{bx - 4}" y="{y + bh / 2 + 3:.1f}" text-anchor="end" '
            f'{_FONT} font-size="8">comm {r["comm"]}</text>'
        )
    # right: size-vs-entropy scatter + trend
    sx, sw = half + 56, width - half - 80
    sy, sh = pad_t, height - pad_t - 40
    body.append(
        f'<text x="{sx + sw / 2:.1f}" y="{pad_t - 8}" text-anchor="middle" '
        f'{_FONT} font-size="11">Community size vs entropy{capped}</text>'
    )
    if pts:
        xs = [float(r["size"]) for r in pts]
        ys = [float(r["entropy"]) for r in pts]
        xmin, xmax = min(xs), max(xs)
        ymin, ymax = min(ys), max(ys)
        xsp = (xmax - xmin) or 1.0
        ysp = (ymax - ymin) or 1.0
        for x, y in zip(xs, ys):
            px = sx + sw * (x - xmin) / xsp
            py = sy + sh * (1.0 - (y - ymin) / ysp)
            body.append(
                f'<circle cx="{px:.1f}" cy="{py:.1f}" r="2.5" '
                f'fill="{_color(4)}" fill-opacity="0.7"/>'
            )
        if len(pts) > 1 and xsp > 0:
            n = len(xs)
            mx, my = sum(xs) / n, sum(ys) / n
            sxx = sum((x - mx) ** 2 for x in xs)
            if sxx > 0:
                slope = sum(
                    (x - mx) * (y - my) for x, y in zip(xs, ys)
                ) / sxx
                y1 = my + slope * (xmin - mx)
                y2 = my + slope * (xmax - mx)
                p1y = sy + sh * (1.0 - (min(max(y1, ymin), ymax) - ymin) / ysp)
                p2y = sy + sh * (1.0 - (min(max(y2, ymin), ymax) - ymin) / ysp)
                body.append(
                    f'<line x1="{sx:.1f}" y1="{p1y:.1f}" x2="{sx + sw:.1f}" '
                    f'y2="{p2y:.1f}" stroke="#e15759" stroke-dasharray="5,3"/>'
                )
        body.append(
            f'<line x1="{sx}" y1="{sy}" x2="{sx}" y2="{sy + sh}" '
            f'stroke="#333"/><line x1="{sx}" y1="{sy + sh}" '
            f'x2="{sx + sw}" y2="{sy + sh}" stroke="#333"/>'
            f'<text x="{sx - 4}" y="{sy + 4}" text-anchor="end" {_FONT} '
            f'font-size="8">{ymax:.3g}</text>'
            f'<text x="{sx - 4}" y="{sy + sh + 4}" text-anchor="end" {_FONT} '
            f'font-size="8">{ymin:.3g}</text>'
            f'<text x="{sx:.1f}" y="{sy + sh + 14}" text-anchor="middle" '
            f'{_FONT} font-size="9">{xmin:.0f}</text>'
            f'<text x="{sx + sw:.1f}" y="{sy + sh + 14}" text-anchor="middle" '
            f'{_FONT} font-size="9">{xmax:.0f}</text>'
        )
    svg = _svg(width, height, body)
    with open(path, "w") as f:
        f.write(svg)
    return svg


def connectivity_report_svg(
    components: DataFrame,
    analysis: dict,
    path: str,
    bins: int = 20,
    curve_points: int = 200,
    width: int = 880,
    height: int = 420,
) -> str:
    """Graph connectivity report, two panels + stats block (reference
    plot_utils.py:63-116 plot_connectivity_report): component-size
    histogram (log-scaled counts) and the cumulative node-coverage curve
    over components sorted largest-first.

    ``components`` is ``connected_components(...)`` output (vertex_id,
    comp_id); ``analysis`` the ``analyze_graph(...)`` dict for the stats
    text.  The curve collects the ``curve_points`` largest components +
    one total (the reference collects every component — unbounded);
    everything else is ``bins``-row aggregates."""
    comp_sizes = components.groupBy("comp_id").agg(
        F.count(F.lit(1)).alias("size")
    ).persist()
    hist, lo, hi = _spark_histogram(comp_sizes, "size", bins)
    total_nodes = int(
        comp_sizes.agg(F.sum("size")).collect()[0][0] or 0
    )
    n_comp = comp_sizes.count()
    top_sizes = [
        int(r["size"])
        for r in comp_sizes.orderBy(F.desc("size"), "comp_id")
        .limit(curve_points)
        .collect()
    ]
    comp_sizes.unpersist()
    body = [
        f'<text x="{width / 2}" y="18" text-anchor="middle" {_FONT} '
        f'font-size="14">Connectivity report — {n_comp} connected '
        f"component(s)</text>"
    ]
    half = width / 2
    pad_l, pad_t, pad_b = 56, 40, 90
    pw, ph = half - pad_l - 16, height - pad_t - pad_b
    # left: size histogram, log-scaled counts
    cmax = max((c for _, c in hist), default=1) or 1
    log_max = math.log10(cmax + 1)
    bw = pw / max(len(hist), 1)
    for i, (blo, c) in enumerate(hist):
        bh = ph * (math.log10(c + 1) / log_max if log_max else 0)
        body.append(
            f'<rect x="{pad_l + i * bw:.1f}" y="{pad_t + ph - bh:.1f}" '
            f'width="{max(bw - 1, 1):.1f}" height="{bh:.1f}" '
            f'fill="#76b7b2"><title>size [{blo:.0f}, '
            f"{blo + (hi - lo) / max(bins, 1):.0f}): {c} component(s)"
            f"</title></rect>"
        )
    body.append(
        f'<line x1="{pad_l}" y1="{pad_t}" x2="{pad_l}" y2="{pad_t + ph}" '
        f'stroke="#333"/><line x1="{pad_l}" y1="{pad_t + ph}" '
        f'x2="{pad_l + pw:.1f}" y2="{pad_t + ph}" stroke="#333"/>'
        f'<text x="{pad_l - 4}" y="{pad_t + 4}" text-anchor="end" {_FONT} '
        f'font-size="9">{cmax}</text>'
        f'<text x="{pad_l + pw / 2:.1f}" y="{pad_t - 8}" text-anchor="middle" '
        f'{_FONT} font-size="11">Component sizes (log count)</text>'
        f'<text x="{pad_l:.1f}" y="{pad_t + ph + 14}" text-anchor="middle" '
        f'{_FONT} font-size="9">{lo:.0f}</text>'
        f'<text x="{pad_l + pw:.1f}" y="{pad_t + ph + 14}" '
        f'text-anchor="middle" {_FONT} font-size="9">{hi:.0f}</text>'
    )
    # right: cumulative coverage curve
    sx = half + 56
    sw = width - sx - 30
    body.append(
        f'<text x="{sx + sw / 2:.1f}" y="{pad_t - 8}" text-anchor="middle" '
        f'{_FONT} font-size="11">Cumulative node coverage'
        f'{f" (largest {curve_points})" if n_comp > curve_points else ""}'
        f"</text>"
    )
    if top_sizes and total_nodes:
        cum, pts = 0, []
        for i, s in enumerate(top_sizes):
            cum += s
            px = sx + sw * (i / max(len(top_sizes) - 1, 1))
            py = pad_t + ph * (1.0 - cum / total_nodes)
            pts.append((px, py))
        poly = " ".join(f"{px:.1f},{py:.1f}" for px, py in pts)
        body.append(
            f'<polyline points="{poly}" fill="none" stroke="{_color(3)}" '
            f'stroke-width="1.5"/>'
        )
        for px, py in pts[:: max(len(pts) // 40, 1)]:
            body.append(
                f'<circle cx="{px:.1f}" cy="{py:.1f}" r="1.8" '
                f'fill="{_color(3)}"/>'
            )
        body.append(
            f'<line x1="{sx}" y1="{pad_t}" x2="{sx}" y2="{pad_t + ph}" '
            f'stroke="#333"/><line x1="{sx}" y1="{pad_t + ph}" '
            f'x2="{sx + sw}" y2="{pad_t + ph}" stroke="#333"/>'
            f'<text x="{sx - 4}" y="{pad_t + 4}" text-anchor="end" {_FONT} '
            f'font-size="9">1.0</text>'
            f'<text x="{sx - 4}" y="{pad_t + ph + 4}" text-anchor="end" '
            f'{_FONT} font-size="9">0.0</text>'
        )
    # stats block (reference's annotation text)
    stats = [
        f"Total nodes: {analysis.get('num_nodes', '?')}",
        f"Total edges: {analysis.get('num_edges', '?')}",
        f"Connected components: {analysis.get('num_components', n_comp)}",
        (
            f"Largest component: {analysis.get('largest_component_size', '?')} "
            f"nodes ({analysis.get('largest_component_pct', 0.0):.1f}%)"
        ),
        f"Density: {analysis.get('density', 0.0):.6f}",
    ]
    for i, line in enumerate(stats):
        body.append(
            f'<text x="{width / 2}" y="{height - 72 + i * 14}" '
            f'text-anchor="middle" {_FONT} font-size="10">'
            f"{html.escape(line)}</text>"
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
    graph: Graph,
    assign: DataFrame,
    metrics: dict,
    out_dir: str,
    store=None,
    eb_edge_threshold: int = 200_000,
) -> dict[str, str]:
    """Render the full artifact set the reference produces: size summary,
    inter-community graph, top-community layouts, connectivity report,
    description-length contribution, edge-betweenness distribution,
    per-stage step charts (from the checkpoint ``store``'s lineage when
    given), and report.html.  Returns {artifact name: file path}.

    The edge-betweenness distribution needs a betweenness pass, so it
    renders only at or below ``eb_edge_threshold`` edges (sampled
    Brandes, 16 sources) — report rendering must never dominate the
    pipeline it reports on."""
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

    # connectivity report (reference plot_utils.py:63-116)
    from csd363_sin_spark.operators.components import connected_components

    comp = connected_components(graph)
    paths["connectivity_report"] = os.path.join(
        out_dir, "connectivity_report.svg"
    )
    svgs["Connectivity report"] = connectivity_report_svg(
        comp, metrics.get("graph_analysis") or {}, paths["connectivity_report"]
    )

    # description-length contribution on the final partition (reference
    # metrics_visualization.py:162-225)
    from csd363_sin_spark.functions.metrics import description_length

    _, per_comm = description_length(graph, assign)
    paths["description_length"] = os.path.join(
        out_dir, "description_length_contribution.svg"
    )
    svgs["Description length contribution"] = (
        description_length_contribution_svg(
            per_comm, sizes, paths["description_length"]
        )
    )

    # edge-betweenness distribution (reference
    # metrics_visualization.py:90-160), sampled + size-gated
    if graph.edges.count() <= eb_edge_threshold:
        from csd363_sin_spark.operators.betweenness import edge_betweenness

        eb = edge_betweenness(graph, k_sources=16)
        paths["edge_betweenness"] = os.path.join(
            out_dir, "edge_betweenness_distribution.svg"
        )
        svgs["Edge betweenness distribution"] = (
            edge_betweenness_distribution_svg(
                eb, paths["edge_betweenness"], assign=assign
            )
        )

    # per-stage step charts from the store's already-persisted superstep
    # lineage (reference metrics_visualization.py:9-88; the series come
    # from metrics the run recorded, not a re-evaluation pass)
    if store is not None:
        rows = store.read_lineage()
        for stage in sorted({r.get("stage") for r in rows if r.get("stage")}):
            tracked = step_series_from_lineage(rows, stage)
            counts: dict[str, int] = {}
            for s in tracked["steps"]:
                for k in s:
                    counts[k] = counts.get(k, 0) + 1
            if not any(v >= 2 for v in counts.values()):
                continue
            key = f"steps_{stage}"
            paths[key] = os.path.join(out_dir, f"steps_{stage}.svg")
            svgs[f"Per-step metrics: {stage}"] = algorithm_metrics_svg(
                tracked, paths[key]
            )
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
