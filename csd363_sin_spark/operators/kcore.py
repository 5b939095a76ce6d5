"""k-core decomposition (core numbers) — beyond the reference.

Core number c(v) = largest k such that v belongs to a subgraph where
every vertex has degree >= k; the standard link-graph density/peeling
analysis (and the classic "drop the 1-core fringe before community
detection" preprocessing step).

Algorithm: Montresor-De Pellegrini-Miorandi distributed coreness —
iterate ``c'(v) = min(c(v), h-index{c(u) : u ∈ N(v)})`` from
``c0 = degree`` until fixpoint; c is monotone non-increasing and
converges to the exact core numbers (matches ``nx.core_number``).

Scale design: the h-index per superstep is computed WITHOUT a per-vertex
sort over raw neighbors (a 10M-degree hub would pin one sort partition):
values are clamped to the vertex's own estimate (h <= deg always, so the
clamp never changes the result), histogrammed by ``groupBy(v, value)``
— map-side combine collapses a hub's 10M neighbor rows to <= its
distinct clamped values — and the h-index is read off the histogram via
``max(min(value, suffix_count))`` over a per-vertex window on the
(small) histogram rows.  Convergence check is one scalar aggregate
(sum of estimates, monotone).  Driver dispatch below
``local_edges_threshold`` mirrors the other iterative operators; both
paths are bit-identical (pure integer math).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from csd363_sin_spark.plans.induce import Graph
from csd363_sin_spark.plans.lineage import materialize, release


def _core_number_driver(graph: Graph) -> DataFrame:
    spark = graph.edges.sparkSession
    adj: dict[int, set[int]] = {
        int(r["vertex_id"]): set() for r in graph.vertices.collect()
    }
    for r in graph.edges.collect():
        a, b = int(r["src"]), int(r["dst"])
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    c = {v: len(ns) for v, ns in adj.items()}
    while True:
        new = {}
        for v, ns in adj.items():
            vals = sorted((c[u] for u in ns), reverse=True)
            h = 0
            for i, x in enumerate(vals, 1):
                if x >= i:
                    h = i
                else:
                    break
            new[v] = min(c[v], h)
        if new == c:
            break
        c = new
    return spark.createDataFrame(
        [(v, k) for v, k in c.items()], "vertex_id long, core long"
    )


def core_number(
    graph: Graph,
    local_edges_threshold: int = 100_000,
    max_iter: int = 1000,
) -> DataFrame:
    """Exact per-vertex core numbers: ``(vertex_id long, core long)``.

    Isolates get core 0.  ``max_iter`` is a safety bound only; the
    h-index iteration converges in O(max-core) supersteps in practice.
    """
    if graph.edges.count() <= local_edges_threshold:
        return _core_number_driver(graph)

    sym = graph.edges_sym().select("src", "dst").persist()
    sym.count()
    c = materialize(
        graph.degrees().select(
            "vertex_id", F.col("degree").cast("long").alias("c")
        )
    )
    total = c.agg(F.sum("c")).collect()[0][0]
    for _ in range(max_iter):
        c_nbr = c.select(F.col("vertex_id").alias("dst"), F.col("c").alias("c_nbr"))
        c_own = c.select(F.col("vertex_id").alias("src"), F.col("c").alias("c_own"))
        # histogram of clamped neighbor estimates; map-side combine
        # collapses hub fan-in before the shuffle
        hist = (
            sym.join(c_nbr, "dst")
            .join(c_own, "src")
            .groupBy(
                F.col("src").alias("vertex_id"),
                F.least("c_nbr", "c_own").alias("x"),
            )
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        w = Window.partitionBy("vertex_id").orderBy(F.desc("x"))
        h = (
            hist.withColumn("cnt_ge", F.sum("cnt").over(w))
            .groupBy("vertex_id")
            .agg(F.max(F.least(F.col("x"), F.col("cnt_ge"))).alias("h"))
        )
        new_c = materialize(
            c.join(h, "vertex_id", "left")
            .fillna({"h": 0})
            .select("vertex_id", F.least("c", "h").alias("c"))
        )
        new_total = new_c.agg(F.sum("c")).collect()[0][0]
        release(c)
        c = new_c
        if new_total == total:  # monotone non-increasing -> fixpoint
            break
        total = new_total
    sym.unpersist()
    return c.select("vertex_id", F.col("c").alias("core"))


def k_core(graph: Graph, k: int, **kw) -> Graph:
    """The k-core subgraph: vertices with core number >= k and the edges
    among them (one semi-join per endpoint on the canonical edge table)."""
    keep = core_number(graph, **kw).filter(F.col("core") >= k).select("vertex_id")
    verts = graph.vertices.join(keep, "vertex_id", "left_semi")
    edges = graph.edges.join(
        keep.withColumnRenamed("vertex_id", "src"), "src", "left_semi"
    ).join(keep.withColumnRenamed("vertex_id", "dst"), "dst", "left_semi")
    return Graph(vertices=verts, edges=edges.select("src", "dst", "weight"))
