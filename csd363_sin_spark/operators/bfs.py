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
    landmarks: DataFrame | None = None,
) -> DataFrame:
    """``(landmark long, vertex_id long, dist long)`` for every vertex
    within ``max_depth`` hops of each landmark (landmarks themselves at
    dist 0).  Unreachable / farther vertices are absent.  ``landmarks``
    (a vertex_id DataFrame) overrides the degree-based selection."""
    if landmarks is None:
        landmarks = select_landmarks(graph, n_landmarks)
    if graph.edges.count() <= local_edges_threshold:
        landmark_ids = [int(r["vertex_id"]) for r in landmarks.collect()]
        return _bfs_driver(graph, landmark_ids, max_depth)

    # pre-partitioned on the expansion join key: each round exchanges
    # only the (small) frontier side
    sym = graph.edges_sym().select("src", "dst").repartition("src").persist()
    sym.count()
    # seed straight from the DataFrame — the all-sources callers
    # (closeness_exact) must never collect the vertex set to the driver
    seed = landmarks.select(
        F.col("vertex_id").alias("landmark"),
        "vertex_id",
        F.lit(0).cast("long").alias("dist"),
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


def _weighted_driver(
    graph: Graph, landmarks: list[int], max_rounds: int
) -> DataFrame:
    import heapq

    spark = graph.edges.sparkSession
    adj: dict[int, list[tuple[int, float]]] = {
        int(r["vertex_id"]): [] for r in graph.vertices.select("vertex_id").collect()
    }
    for r in graph.edges.select("src", "dst", "weight").collect():
        a, b, w = int(r["src"]), int(r["dst"]), float(r["weight"])
        if a != b:
            adj[a].append((b, w))
            adj[b].append((a, w))
    rows = []
    for lm in landmarks:
        dist = {lm: 0.0}
        heap = [(0.0, lm)]
        while heap:
            d, v = heapq.heappop(heap)
            if d > dist.get(v, float("inf")):
                continue
            for u, w in adj[v]:
                nd = d + w
                if nd < dist.get(u, float("inf")):
                    dist[u] = nd
                    heapq.heappush(heap, (nd, u))
        rows.extend((lm, v, dd) for v, dd in dist.items())
    return spark.createDataFrame(rows, "landmark long, vertex_id long, dist double")


def weighted_distances(
    graph: Graph,
    n_landmarks: int = 4,
    max_rounds: int = 64,
    local_edges_threshold: int = 100_000,
    landmarks: DataFrame | None = None,
) -> DataFrame:
    """Weighted single/multi-source shortest-path distances from the
    landmark set: ``(landmark long, vertex_id long, dist double)``.

    Distributed kernel: synchronous min-plus relaxation (Bellman-Ford
    supersteps) — each round joins the current distance relation with
    the symmetric edge view and folds the relaxed candidates back with
    one ``min`` aggregation; converged when the (count, sum) signature
    stops changing (dist is monotone non-increasing and the reached set
    monotone non-decreasing, so the signature is a valid fixpoint
    witness with exact-in-FP integral edge weights).  O(E) shuffle per
    round, round count = max shortest-path hop length; a delta-stepping
    frontier would trim constant factors but not the shuffle shape.
    Driver dispatch below ``local_edges_threshold`` runs heap Dijkstra —
    identical distances (both are exact)."""
    if landmarks is None:
        landmarks = select_landmarks(graph, n_landmarks)
    landmark_ids = [int(r["vertex_id"]) for r in landmarks.collect()]
    if graph.edges.count() <= local_edges_threshold:
        return _weighted_driver(graph, landmark_ids, max_rounds)

    spark = graph.edges.sparkSession
    # pre-partitioned on the relaxation join key (see landmark_distances)
    sym = (
        graph.edges_sym().select("src", "dst", "weight").repartition("src").persist()
    )
    sym.count()
    state = materialize(
        spark.createDataFrame(
            [(lm, lm, 0.0) for lm in landmark_ids],
            "landmark long, vertex_id long, dist double",
        )
    )
    sig = (len(landmark_ids), 0.0)
    for _ in range(max_rounds):
        relaxed = state.join(
            sym, state["vertex_id"] == sym["src"]
        ).select(
            "landmark",
            F.col("dst").alias("vertex_id"),
            (F.col("dist") + F.col("weight")).alias("dist"),
        )
        new_state = materialize(
            state.unionByName(relaxed)
            .groupBy("landmark", "vertex_id")
            .agg(F.min("dist").alias("dist"))
        )
        row = new_state.agg(
            F.count(F.lit(1)).alias("n"), F.sum("dist").alias("s")
        ).collect()[0]
        new_sig = (row["n"], float(row["s"]))
        release(state)
        state = new_state
        if new_sig == sig:
            break
        sig = new_sig
    sym.unpersist()
    return state


def _farthest(distances: DataFrame) -> DataFrame:
    """The deterministic farthest vertex of a single-source BFS state:
    max dist, ties to the smallest vertex_id."""
    return (
        distances.orderBy(F.desc("dist"), F.asc("vertex_id"))
        .limit(1)
        .select("vertex_id")
    )


def diameter_double_sweep(
    graph: Graph, max_depth: int = 32, local_edges_threshold: int = 100_000
) -> DataFrame:
    """Double-sweep diameter lower bound: BFS from the top-degree vertex,
    then BFS again from the farthest vertex found; the second sweep's
    eccentricity is a (usually tight) lower bound on the true diameter.
    Returns one row ``(vertex_a long, vertex_b long, diameter_lb long)``
    — the endpoints of the long path and its length.  Two BFS runs =
    exactly twice the BFS cost; the standard trick for diameter on
    graphs where all-pairs is unthinkable."""
    d1 = landmark_distances(
        graph,
        max_depth=max_depth,
        local_edges_threshold=local_edges_threshold,
        landmarks=select_landmarks(graph, 1),
    )
    a = _farthest(d1)
    d2 = landmark_distances(
        graph,
        max_depth=max_depth,
        local_edges_threshold=local_edges_threshold,
        landmarks=a,
    )
    return (
        d2.orderBy(F.desc("dist"), F.asc("vertex_id"))
        .limit(1)
        .select(
            F.col("landmark").alias("vertex_a"),
            F.col("vertex_id").alias("vertex_b"),
            F.col("dist").alias("diameter_lb"),
        )
    )


def closeness_exact(
    graph: Graph,
    max_depth: int = 64,
    local_edges_threshold: int = 100_000,
) -> DataFrame:
    """EXACT closeness + harmonic centrality for EVERY vertex —
    ``(vertex_id, n_reached, closeness, harmonic)`` with networkx
    semantics: closeness = ((r-1)/sum_d) * ((r-1)/(n-1)) (the
    Wasserman-Faust component correction nx applies by default; 0.0 for
    isolates), harmonic = sum over reached of 1/d.  Complements the
    sampled :func:`landmark_closeness`: this is the all-sources variant,
    one batched multi-source BFS (every vertex a landmark, seeded
    straight from the vertex DataFrame — no driver collect) + one
    aggregation over the (source, vertex, dist) state.  State is
    O(sum over sources of reached) rows — the exact-closeness lower
    bound; shard sources via landmark_distances for bounded-memory
    approximations."""
    n = graph.vertices.count()
    d = landmark_distances(
        graph,
        max_depth=max_depth,
        local_edges_threshold=local_edges_threshold,
        landmarks=graph.vertices.select("vertex_id"),
    )
    agg = d.groupBy(F.col("landmark").alias("vertex_id")).agg(
        (F.count(F.lit(1)) - 1).alias("n_reached"),
        F.sum("dist").alias("sumd"),
        F.sum(
            F.when(F.col("dist") > 0, 1.0 / F.col("dist")).otherwise(F.lit(0.0))
        ).alias("harm"),
    )
    closeness = F.when(
        F.col("sumd") > 0,
        (F.col("n_reached") / F.col("sumd"))
        * (F.col("n_reached") / F.lit(float(n - 1) if n > 1 else 1.0)),
    ).otherwise(F.lit(0.0))
    return (
        graph.vertices.select("vertex_id")
        .join(agg, "vertex_id", "left")
        .fillna({"n_reached": 0, "sumd": 0, "harm": 0.0})
        .select(
            "vertex_id",
            "n_reached",
            F.round(closeness, 6).alias("closeness"),
            F.round("harm", 6).alias("harmonic"),
        )
    )


def shortest_path(
    graph: Graph,
    src: int,
    dst: int,
    max_depth: int = 64,
    local_edges_threshold: int = 100_000,
) -> DataFrame:
    """One explicit shortest path src -> dst: ``(step, vertex_id)`` rows
    (step 0 = src), empty if dst is unreachable within ``max_depth``.

    Deterministic: among the BFS predecessors of each vertex (neighbors
    at distance d-1) the MINIMUM vertex id is the parent, so the
    extracted path is unique and engine-reproducible.

    Plan: one single-source BFS (landmark_distances), one join + min
    aggregation for the full parent map, then at most ``dist(dst)`` tiny
    broadcast probes that walk the path backwards — each probe joins the
    1-row frontier against the parent map, so the walk never collects
    more than the path itself."""
    spark = graph.edges.sparkSession
    lm = spark.createDataFrame([(int(src),)], "vertex_id long")
    dists = landmark_distances(
        graph,
        max_depth=max_depth,
        local_edges_threshold=local_edges_threshold,
        landmarks=lm,
    ).select("vertex_id", "dist")
    target = dists.filter(F.col("vertex_id") == dst).collect()
    if not target:
        return spark.createDataFrame([], "step int, vertex_id long")
    d_dst = int(target[0]["dist"])
    sym = graph.edges_sym().select("src", "dst")
    dv = dists.select(F.col("vertex_id").alias("v"), F.col("dist").alias("dv"))
    du = dists.select(F.col("vertex_id").alias("u"), F.col("dist").alias("du"))
    parents = (
        sym.select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .join(dv, "v")
        .join(du, "u")
        .filter(F.col("du") == F.col("dv") - 1)
        .groupBy("v")
        .agg(F.min("u").alias("parent"))
    )
    parents = materialize(parents)
    rows = [(d_dst, int(dst))]
    cur = int(dst)
    for step in range(d_dst, 0, -1):
        cur = int(
            parents.filter(F.col("v") == cur).collect()[0]["parent"]
        )
        rows.append((step - 1, cur))
    release(parents)
    out = spark.createDataFrame(sorted(rows), "step int, vertex_id long")
    return out


def global_efficiency(
    graph: Graph,
    max_depth: int = 64,
    local_edges_threshold: int = 100_000,
) -> DataFrame:
    """Global efficiency (Latora-Marchiori): the mean of 1/d(u, v) over
    ordered vertex pairs, with unreachable pairs contributing 0 — the
    standard "how well does the network transport" scalar that, unlike
    average path length, is defined for disconnected graphs.  One row
    ``(efficiency double)``, 6-dp (nx.global_efficiency parity).

    Reuses the all-sources batched BFS (every vertex a landmark, no
    driver collect) + ONE aggregation — the closeness_exact cost
    profile; shard sources for bounded-memory approximations."""
    n = graph.vertices.count()
    d = landmark_distances(
        graph,
        max_depth=max_depth,
        local_edges_threshold=local_edges_threshold,
        landmarks=graph.vertices.select("vertex_id"),
    )
    denom = float(n * (n - 1)) if n > 1 else 1.0
    return d.filter(F.col("dist") > 0).agg(
        F.round(F.sum(1.0 / F.col("dist")) / F.lit(denom), 6).alias("efficiency")
    )
