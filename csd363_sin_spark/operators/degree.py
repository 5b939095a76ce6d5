"""Degree / density / graph-structure analysis (SURVEY.md §2.2 G1-G2, §2.4 M10).

Replaces the reference's ``analyze_graph_structure`` (reference
__main__.py:185-244): node/edge counts, density, degree stats, isolated
nodes, component stats.  Everything is one or two hash aggregations; no
driver-side iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from csd363_sin_spark.plans.induce import Graph


def degree_stats(graph: Graph) -> DataFrame:
    """One-row DataFrame: n, m, avg/max/min degree, isolated count, density."""
    deg = graph.degrees()
    n = graph.vertices.count()
    stats = deg.agg(
        F.count(F.lit(1)).alias("num_nodes"),
        (F.sum("degree") / 2).cast("long").alias("num_edges"),
        F.avg("degree").alias("avg_degree"),
        F.max("degree").alias("max_degree"),
        F.min("degree").alias("min_degree"),
        F.sum((F.col("degree") == 0).cast("long")).alias("isolated_nodes"),
    )
    dens = F.when(
        F.col("num_nodes") > 1,
        2.0 * F.col("num_edges") / (F.col("num_nodes") * (F.col("num_nodes") - 1.0)),
    ).otherwise(F.lit(0.0))
    _ = n  # n computed via the same agg; kept for API symmetry
    return stats.withColumn("density", dens)


def density(graph: Graph) -> float:
    """``nx.density`` equivalent (reference __main__.py:201)."""
    row = degree_stats(graph).collect()[0]
    return float(row["density"])


def analyze_graph(graph: Graph, components: DataFrame | None = None) -> dict:
    """Reference ``analyze_graph_structure`` (__main__.py:185-244) as a dict.

    ``components`` — optional precomputed (vertex_id, comp_id) to include
    component stats (reference :204-208) without recomputing.
    """
    row = degree_stats(graph).collect()[0]
    out = {
        "num_nodes": int(row["num_nodes"]),
        "num_edges": int(row["num_edges"]),
        "density": float(row["density"]),
        "avg_degree": float(row["avg_degree"]),
        "max_degree": float(row["max_degree"]),
        "min_degree": float(row["min_degree"]),
        "isolated_nodes": int(row["isolated_nodes"]),
    }
    if components is not None:
        comp_sizes = components.groupBy("comp_id").count()
        crow = comp_sizes.agg(
            F.count(F.lit(1)).alias("num_components"),
            F.max("count").alias("largest"),
        ).collect()[0]
        out["num_components"] = int(crow["num_components"])
        out["largest_component_size"] = int(crow["largest"])
        out["largest_component_pct"] = (
            100.0 * crow["largest"] / out["num_nodes"] if out["num_nodes"] else 0.0
        )
    return out


def degree_histogram(graph: Graph) -> DataFrame:
    """``(degree long, n_vertices long)`` — the degree distribution (the
    first thing anyone plots about a link graph; heavy-tail check before
    choosing skew strategies).  One |V|-row hash aggregation."""
    return (
        graph.degrees()
        .groupBy(F.col("degree").cast("long").alias("degree"))
        .agg(F.count(F.lit(1)).alias("n_vertices"))
    )


def avg_neighbor_degree(graph: Graph) -> DataFrame:
    """Per-vertex mean neighbor degree — nx.average_neighbor_degree on
    simple undirected graphs: the local assortativity profile (hubs whose
    neighbors are leaves vs cores whose neighbors are hubs).  Returns
    ``(vertex_id, avg_nbr_degree)`` with 0.0 for isolates; 6-dp rounded
    (the engine-portability contract).

    Plan: one join of the half-edge view with the degree table and one
    map-side-combined per-vertex avg — the same single O(E) pass shape
    as the assortativity aggregate, grouped instead of global.
    """
    deg = graph.degrees()
    dv = deg.select(F.col("vertex_id").alias("dst"), F.col("degree").alias("dv"))
    nbr = (
        graph.edges_sym()
        .join(dv, "dst")
        .groupBy(F.col("src").alias("vertex_id"))
        .agg(F.round(F.avg("dv"), 6).alias("avg_nbr_degree"))
    )
    return (
        graph.vertices.select("vertex_id")
        .join(nbr, "vertex_id", "left")
        .fillna({"avg_nbr_degree": 0.0})
    )


def degree_assortativity(graph: Graph) -> DataFrame:
    """Pearson degree-assortativity coefficient — matches
    nx.degree_assortativity_coefficient on simple undirected graphs:
    the correlation of (deg(u), deg(v)) over directed half-edges (each
    undirected edge counted in both orientations, the standard
    joint-degree-distribution convention).

    Plan: two broadcast-sized joins of the half-edge table with the
    degree table and ONE corr() aggregate — a single map-side-combinable
    pass over 2|E| rows, trivially 100 TB-shaped.
    """
    deg = graph.degrees()
    du = deg.select(F.col("vertex_id").alias("src"), F.col("degree").alias("du"))
    dv = deg.select(F.col("vertex_id").alias("dst"), F.col("degree").alias("dv"))
    return (
        graph.edges_sym()
        .join(du, "src")
        .join(dv, "dst")
        .agg(F.round(F.corr("du", "dv"), 6).alias("assortativity"))
    )


def rich_club(graph: Graph, ks: list[int] | None = None) -> DataFrame:
    """Rich-club coefficient phi(k) = 2*E_k / (N_k*(N_k-1)) — the density
    of the subgraph induced by vertices with degree > k (Zhou & Mondragon
    2004) — for each threshold in ``ks`` (default 1, 2, 4, 8, 16).

    Returns ``(k, n_club, club_edges, phi)``.  Per threshold: two
    broadcast-style semi-joins of the canonical edge table against the
    (tiny, high-degree) club membership plus one count — no all-pairs
    work; thresholds share the single degree aggregation."""
    if ks is None:
        ks = [1, 2, 4, 8, 16]
    deg = graph.degrees().persist()
    e = graph.edges.select("src", "dst").distinct()
    spark = graph.edges.sparkSession
    rows = []
    for k in ks:
        club = deg.filter(F.col("degree") > k).select("vertex_id")
        n_club = club.count()
        club_edges = (
            e.join(club.withColumnRenamed("vertex_id", "src"), "src", "left_semi")
            .join(club.withColumnRenamed("vertex_id", "dst"), "dst", "left_semi")
            .count()
        )
        phi = (
            2.0 * club_edges / (n_club * (n_club - 1)) if n_club > 1 else 0.0
        )
        rows.append((k, n_club, club_edges, round(phi, 6)))
    deg.unpersist()
    return spark.createDataFrame(
        rows, "k int, n_club long, club_edges long, phi double"
    )


def degree_gini(graph: Graph) -> DataFrame:
    """One row ``(n, mean_degree, gini)`` — the Gini coefficient of the
    degree distribution (0 = regular graph, near 1 = hub-dominated), the
    standard inequality summary for skew-aware capacity planning.

    Gini = sum_i (2i - n - 1) * d_(i) / (n * sum d) over degrees sorted
    ascending (i 1-based).  Plan: degrees collapse to their HISTOGRAM
    first (one map-side-combined agg), then the rank math runs grouped —
    a tie group with count c starting after s rows contributes
    d*c*(2s + c + 1) to sum 2i*d — so the only window is a running sum
    over the tiny distinct-degree table, never a |V|-row global sort."""
    from pyspark.sql import Window

    hist = graph.degrees().groupBy("degree").agg(F.count(F.lit(1)).alias("c"))
    w = Window.orderBy(F.asc("degree")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    grouped = hist.withColumn("s", F.coalesce(F.sum("c").over(w), F.lit(0)))
    agg = grouped.agg(
        F.sum("c").alias("n"),
        F.sum(F.col("degree") * F.col("c")).alias("sumd"),
        F.sum(
            F.col("degree") * F.col("c") * (2.0 * F.col("s") + F.col("c") + 1.0)
        ).alias("wsum"),
    )
    gini = F.when(
        (F.col("n") > 0) & (F.col("sumd") > 0),
        (F.col("wsum") - (F.col("n") + 1.0) * F.col("sumd"))
        / (F.col("n") * F.col("sumd")),
    ).otherwise(F.lit(0.0))
    return agg.select(
        F.col("n").alias("n"),
        F.round(F.col("sumd") / F.col("n"), 6).alias("mean_degree"),
        F.round(gini, 6).alias("gini"),
    )


def degree_centralization(graph: Graph) -> DataFrame:
    """Freeman degree centralization: sum(max_deg - deg_v) normalized by
    the star graph's value (n-1)(n-2) — 1.0 for a star, 0.0 for any
    regular graph.  One row ``(centralization double)``; NULL for n < 3.
    One aggregation over the |V|-row degree relation — scale-trivial."""
    deg = graph.degrees()
    return deg.agg(
        F.round(
            (F.count(F.lit(1)) * F.max("degree") - F.sum("degree"))
            / (
                (F.count(F.lit(1)) - 1)
                * (F.count(F.lit(1)) - 2)
            ),
            6,
        ).alias("centralization")
    )
