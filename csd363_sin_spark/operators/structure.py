"""Graph-structural helpers completing SURVEY G4-G8.

Each is a one-liner join/aggregate in Spark — listed explicitly so the
operator inventory maps 1:1 to the reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
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


def sparsify_topk(edges_named: DataFrame, k: int, salt: str = "sparsify") -> DataFrame:
    """Deterministic k-out graph sparsifier over actor-named edges.

    Keeps an edge iff it ranks among the ``k`` lowest-hash edges of
    EITHER endpoint (rank by the engine-portable hash of the canonical
    pair, tie-break by neighbor name).  The union-of-endpoints rule is
    the classic "k-out" sampler: every vertex retains at least
    min(degree, k) incident edges, so connectivity structure degrades
    gracefully while hub degrees drop from millions to k — the standard
    pre-pass before quadratic-cost operators (exact betweenness, motif
    counts) at web scale.  Deterministic across runs/retries/engines:
    a pure function of the edge set, k, and the salt.

    One symmetric expansion + one per-vertex window (candidates of one
    vertex = its incident edges; a 10M-degree hub makes a 10M-row
    partition for ITS rank — at web scale swap the window for the
    two-phase per-partition top-k in functions/similarity.py, same
    spec).
    """
    from csd363_sin_spark.functions.dedup import portable_hash64

    h = portable_hash64(
        F.concat_ws(":", F.lit(salt), F.col("src_actor"), F.col("dst_actor"))
    )
    half = edges_named.select(
        F.col("src_actor").alias("u"),
        F.col("dst_actor").alias("v"),
        "src_actor",
        "dst_actor",
        h.alias("h"),
    ).unionByName(
        edges_named.select(
            F.col("dst_actor").alias("u"),
            F.col("src_actor").alias("v"),
            "src_actor",
            "dst_actor",
            h.alias("h"),
        )
    )
    w = Window.partitionBy("u").orderBy("h", "v")
    kept = (
        half.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select("src_actor", "dst_actor")
        .distinct()
    )
    return edges_named.join(kept, ["src_actor", "dst_actor"], "left_semi")


def split_disconnected_communities(
    graph: Graph,
    assign: DataFrame,
    local_edges_threshold: int = 100_000,
    max_iterations: int = 50,
) -> DataFrame:
    """Leiden-style well-connectedness refinement (Traag, Waltman &
    van Eck 2019, "From Louvain to Leiden", Sci. Rep. 9:5233): Louvain can
    emit communities whose induced subgraph is internally DISCONNECTED —
    split every community into its connected parts.

    Returns ``(vertex_id, comm, sub_comm)`` where ``sub_comm`` is the
    minimum vertex id of the vertex's part within its community (the
    engine's CC labeling convention, so labels are deterministic and
    path-independent); ``sub_comm == comm``-wise grouping recovers the
    refinement, and a community is well-connected iff it maps to exactly
    one ``sub_comm``.

    Plan: one double-join to keep only intra-community edges (no
    inter-community edge survives, so one global CC run over the filtered
    edge set computes every community's parts at once — no per-community
    loop), then the standard large-star/small-star kernel with its driver
    dispatch."""
    from csd363_sin_spark.operators.components import connected_components

    a_src = assign.select(F.col("vertex_id").alias("src"), F.col("comm").alias("c_src"))
    a_dst = assign.select(F.col("vertex_id").alias("dst"), F.col("comm").alias("c_dst"))
    intra = (
        graph.edges.join(a_src, "src")
        .join(a_dst, "dst")
        .filter(F.col("c_src") == F.col("c_dst"))
        .select("src", "dst", "weight")
    )
    sub = connected_components(
        Graph(vertices=graph.vertices, edges=intra),
        max_iterations=max_iterations,
        local_edges_threshold=local_edges_threshold,
    )
    return assign.join(sub, "vertex_id").select(
        "vertex_id", "comm", F.col("comp_id").alias("sub_comm")
    )
