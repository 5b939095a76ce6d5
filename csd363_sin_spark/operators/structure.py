"""Graph-structural helpers completing SURVEY G4-G8.

Each is a one-liner join/aggregate in Spark — listed explicitly so the
operator inventory maps 1:1 to the reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from csd363_sin_spark.plans.induce import Graph


def subgraph(graph: Graph, vertices: DataFrame) -> Graph:
    """Induced subgraph on a vertex set (reference ``G.subgraph`` at
    detection.py:87,177 etc.) — two semi-joins, no data movement beyond
    the filter."""
    keep = vertices.select("vertex_id")
    return Graph(
        vertices=graph.vertices.join(keep, "vertex_id", "left_semi"),
        edges=graph.edges.join(
            keep.withColumnRenamed("vertex_id", "src"), "src", "left_semi"
        ).join(keep.withColumnRenamed("vertex_id", "dst"), "dst", "left_semi"),
    )


def community_subgraph(graph: Graph, assign: DataFrame, comm: int) -> Graph:
    """One community's induced subgraph (reference detection.py:87)."""
    members = assign.filter(F.col("comm") == comm).select("vertex_id")
    return subgraph(graph, members)


def remove_isolates(graph: Graph) -> Graph:
    """Drop degree-0 vertices (reference visualization.py:206-207, G6)."""
    touched = (
        graph.edges.select(F.col("src").alias("vertex_id"))
        .unionByName(graph.edges.select(F.col("dst").alias("vertex_id")))
        .distinct()
    )
    return Graph(
        vertices=graph.vertices.join(touched, "vertex_id", "left_semi"),
        edges=graph.edges,
    )


def contract_graph(graph: Graph, assign: DataFrame, keep_self_loops: bool = True) -> Graph:
    """Community contraction: the coarse graph whose vertices are the
    communities of ``assign`` (vertex_id, comm) and whose edge weights
    sum the underlying edge weights between (or, as self-loops, within)
    communities — the public version of the level-contraction step the
    multi-level Louvain/Infomap kernels use internally.

    One double community join + one hash aggregation (map-side combined);
    edge canonicality (src <= dst) is preserved via least/greatest so the
    coarse graph composes with every other operator.
    """
    a = assign.select(F.col("vertex_id").alias("src"), F.col("comm").alias("c1"))
    b = assign.select(F.col("vertex_id").alias("dst"), F.col("comm").alias("c2"))
    pairs = graph.edges.join(a, "src").join(b, "dst")
    if not keep_self_loops:
        pairs = pairs.filter(F.col("c1") != F.col("c2"))
    edges = (
        pairs.groupBy(
            F.least("c1", "c2").alias("src"), F.greatest("c1", "c2").alias("dst")
        )
        .agg(F.sum("weight").alias("weight"))
    )
    verts = assign.select(F.col("comm").alias("vertex_id")).distinct().select(
        "vertex_id",
        F.concat(F.lit("comm:"), F.col("vertex_id").cast("string")).alias("actor"),
        F.lit("comm").alias("kind"),
    )
    return Graph(vertices=verts, edges=edges)


def inter_community_edges(graph: Graph, assign: DataFrame) -> DataFrame:
    """(comm_a, comm_b, num_edges, total_weight) for comm_a < comm_b —
    the inter-community edge counting behind the reference's community
    graph viz and boundary analysis (visualization.py:489-504,
    evaluation.py:164-180, G8)."""
    a = assign.select(F.col("vertex_id").alias("src"), F.col("comm").alias("c1"))
    b = assign.select(F.col("vertex_id").alias("dst"), F.col("comm").alias("c2"))
    return (
        graph.edges.join(a, "src")
        .join(b, "dst")
        .filter(F.col("c1") != F.col("c2"))
        .select(
            F.least("c1", "c2").alias("comm_a"),
            F.greatest("c1", "c2").alias("comm_b"),
            "weight",
        )
        .groupBy("comm_a", "comm_b")
        .agg(
            F.count(F.lit(1)).alias("num_edges"),
            F.sum("weight").alias("total_weight"),
        )
    )
