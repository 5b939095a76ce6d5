"""Ground-truth acquisition ladder (SURVEY S6-S10).

Mirrors the reference's dispatch (reference __main__.py:368-403): explicit
pair-format file -> SNAP one-community-per-line file -> edge-file with
connected-component fallback (reference :295-366) -> synthetic
(Louvain-derived or seeded random, reference :405-426); plus the
filter-to-sample step (reference :428-444).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from csd363_sin_spark.plans.induce import Graph
from csd363_sin_spark.sources.transcripts import (
    read_edge_list,
    read_ground_truth_pairs,
    read_ground_truth_snap,
)


def ground_truth_from_components(graph: Graph) -> DataFrame:
    """Connected components as labels (reference __main__.py:343-355)."""
    from csd363_sin_spark.operators.components import connected_components

    comp = connected_components(graph)
    return comp.select("vertex_id", F.col("comp_id").alias("comm"))


def ground_truth_from_edge_file(spark: SparkSession, path: str, graph: Graph | None = None) -> DataFrame:
    """Try pair format; if the second column repeats like an edge list,
    re-read as edges and label by connected component (reference
    __main__.py:295-366)."""
    pairs = read_ground_truth_pairs(spark, path)
    # heuristic mirror of the reference: a pair file where the "community"
    # column has ~as many distinct values as rows is actually an edge list
    n = pairs.count()
    k = pairs.select("comm").distinct().count()
    if n > 0 and k < max(2, n // 2):
        return pairs.select("vertex_id", "comm") if "vertex_id" in pairs.columns else pairs
    edges = read_edge_list(spark, path)
    verts = (
        edges.select(F.col("src").alias("vertex_id"))
        .unionByName(edges.select(F.col("dst").alias("vertex_id")))
        .distinct()
        .withColumn("actor", F.col("vertex_id").cast("string"))
        .withColumn("kind", F.lit("v"))
    )
    return ground_truth_from_components(Graph(vertices=verts, edges=edges))


def synthetic_ground_truth(
    graph: Graph, mode: str = "louvain", num_communities: int = 10, seed: int = 42
) -> DataFrame:
    """Synthetic labels (reference __main__.py:405-426): 'louvain' uses a
    detection pass as pseudo-truth; 'random' assigns seeded uniform labels
    (deterministic via xxhash64, not an RNG)."""
    if mode == "louvain":
        from csd363_sin_spark.operators.louvain import louvain

        return louvain(graph).assign
    return graph.vertices.select(
        "vertex_id",
        F.pmod(F.xxhash64(F.col("vertex_id"), F.lit(seed)), F.lit(num_communities)).alias(
            "comm"
        ),
    )


def filter_ground_truth(gt: DataFrame, graph: Graph) -> DataFrame:
    """Keep only labels for vertices present in the graph
    (reference __main__.py:428-444) — a left-semi join."""
    return gt.join(graph.vertices.select("vertex_id"), "vertex_id", "left_semi")


def load_ground_truth(
    spark: SparkSession,
    graph: Graph,
    pairs_path: str | None = None,
    snap_path: str | None = None,
    edge_path: str | None = None,
    synthetic_mode: str | None = None,
) -> DataFrame:
    """Priority dispatch (reference __main__.py:368-403)."""
    if pairs_path:
        gt = read_ground_truth_pairs(spark, pairs_path)
    elif snap_path:
        gt = read_ground_truth_snap(spark, snap_path)
    elif edge_path:
        gt = ground_truth_from_edge_file(spark, edge_path, graph)
    elif synthetic_mode:
        gt = synthetic_ground_truth(graph, mode=synthetic_mode)
    else:
        gt = ground_truth_from_components(graph)
    if "vertex" in gt.columns:
        gt = gt.withColumnRenamed("vertex", "vertex_id")
    return filter_ground_truth(gt, graph)
