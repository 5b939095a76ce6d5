"""Multi-source BFS landmark distances — beyond the reference.

Unweighted shortest-path distances from a deterministic set of landmark
vertices (top-k by degree, ties to the smallest id) to every reachable
vertex — the standard building block for distance sketches / closeness
estimates on link graphs, and a reusable exact-BFS primitive.

Scale design: the distributed kernel is textbook Pregel BFS batched over
ALL landmarks at once — state is the ``(landmark, vertex) -> dist``
relation, each superstep expands the current frontier through one join
with the symmetric edge view, dedups with ``distinct()`` (map-side
combine collapses multi-parent fan-in before the shuffle) and drops
already-visited pairs with one anti-join against the state.  Work per
superstep is O(frontier-adjacent edges), not O(V*E); state is bounded by
|landmarks| x |V| rows.  Frontier and state are ``materialize``d
(localCheckpoint) per round so lineage stays flat.  Driver dispatch
below ``local_edges_threshold`` mirrors the other iterative operators;
both paths are bit-identical (pure integer math).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from csd363_sin_spark.plans.induce import Graph
from csd363_sin_spark.plans.lineage import materialize, release


def select_landmarks(graph: Graph, n_landmarks: int) -> DataFrame:
    """Deterministic landmark set: top-n by (degree DESC, vertex_id ASC).
    One total sort of the |V|-row degree relation truncated to n rows —
    Spark's sort-limit pushes the limit into each partition, so the
    exchange carries n rows per partition, not |V|."""
    return (
        graph.degrees()
        .orderBy(F.desc("degree"), F.asc("vertex_id"))
        .limit(n_landmarks)
        .select("vertex_id")
    )


def _bfs_driver(graph: Graph, landmarks: list[int], max_depth: int) -> DataFrame:
    spark = graph.edges.sparkSession
    adj: dict[int, list[int]] = {
        int(r["vertex_id"]): [] for r in graph.vertices.select("vertex_id").collect()
    }
    for r in graph.edges.select("src", "dst").collect():
        a, b = int(r["src"]), int(r["dst"])
        if a != b:
            adj[a].append(b)
            adj[b].append(a)
    rows = []
    for lm in landmarks:
        dist = {lm: 0}
        frontier = [lm]
        d = 0
        while frontier and d < max_depth:
            d += 1
            nxt = []
            for v in frontier:
                for u in adj[v]:
                    if u not in dist:
                        dist[u] = d
                        nxt.append(u)
            frontier = nxt
        rows.extend((lm, v, dd) for v, dd in dist.items())
    return spark.createDataFrame(rows, "landmark long, vertex_id long, dist long")


def landmark_distances(
    graph: Graph,
    n_landmarks: int = 4,
    max_depth: int = 8,
    local_edges_threshold: int = 100_000,
) -> DataFrame:
    """``(landmark long, vertex_id long, dist long)`` for every vertex
    within ``max_depth`` hops of each landmark (landmarks themselves at
    dist 0).  Unreachable / farther vertices are absent."""
    landmark_ids = [
        int(r["vertex_id"]) for r in select_landmarks(graph, n_landmarks).collect()
    ]
    if graph.edges.count() <= local_edges_threshold:
        return _bfs_driver(graph, landmark_ids, max_depth)

    spark = graph.edges.sparkSession
    sym = graph.edges_sym().select("src", "dst").persist()
    sym.count()
    seed = spark.createDataFrame(
        [(lm, lm, 0) for lm in landmark_ids], "landmark long, vertex_id long, dist long"
    )
    state = materialize(seed)
    frontier = state
    for d in range(1, max_depth + 1):
        nxt = materialize(
            frontier.join(sym, frontier["vertex_id"] == sym["src"])
            .select("landmark", F.col("dst").alias("vertex_id"))
            .distinct()
            .join(state, ["landmark", "vertex_id"], "left_anti")
            .withColumn("dist", F.lit(d).cast("long"))
        )
        if nxt.count() == 0:
            release(nxt)
            break
        new_state = materialize(state.unionByName(nxt))
        release(state)
        if frontier is not state:
            release(frontier)
        state, frontier = new_state, nxt
    if frontier is not state:
        release(frontier)
    sym.unpersist()
    return state


def landmark_closeness(
    graph: Graph,
    n_landmarks: int = 4,
    max_depth: int = 8,
    local_edges_threshold: int = 100_000,
) -> DataFrame:
    """Closeness + harmonic centrality of the landmark vertices, composed
    on :func:`landmark_distances`: ``(landmark long, n_reached long,
    closeness double, harmonic double)`` where n_reached counts OTHER
    vertices within max_depth, closeness = n_reached / sum(dist), and
    harmonic = sum(1/dist) — both rounded to 6 dp (the engine-portability
    contract).  One |landmarks x V|-row aggregation on top of the BFS
    state; scales exactly as the BFS does."""
    d = landmark_distances(
        graph, n_landmarks, max_depth, local_edges_threshold
    ).filter(F.col("dist") > 0)
    return d.groupBy("landmark").agg(
        F.count(F.lit(1)).alias("n_reached"),
        F.round(F.count(F.lit(1)) / F.sum("dist"), 6).alias("closeness"),
        F.round(F.sum(F.lit(1.0) / F.col("dist")), 6).alias("harmonic"),
    )
