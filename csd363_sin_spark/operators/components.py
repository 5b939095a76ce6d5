"""Connected components — alternating large-star / small-star (SURVEY G3).

Replaces ``nx.connected_components`` (reference __main__.py:204-208 and the
GN shortcuts at reference algorithms/girvan_newman_wrapper.py:158-241).

Algorithm: Kiveris et al., "Connected Components in MapReduce and Beyond"
(SOCC'14) — alternate

* **large-star**: every neighbor ``v > u`` of ``u`` is re-linked to
  ``m = min(N(u) ∪ {u})``;
* **small-star**: every neighbor ``v <= u`` (and ``u``) is linked to the
  minimum of that closed set;

until the edge set reaches a fixpoint (O(log n) rounds), at which point
every vertex is directly linked to its component's minimum vertex id.

Scale notes: each round is two shuffles (groupBy(u) min + re-emit,
distinct).  The working edge set shrinks monotonically toward a star
forest.  Every round ends in ``localCheckpoint`` to truncate lineage —
without it the iterative plan grows unboundedly (the classic iterative-
DataFrame pitfall).  Convergence is detected via a cheap (count,
sum-of-ids) signature followed by an exact subtract check only when the
signature is stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from csd363_sin_spark.plans.induce import Graph
from csd363_sin_spark.plans.lineage import materialize, release


def _sym(pairs: DataFrame) -> DataFrame:
    return pairs.unionByName(pairs.select(F.col("v").alias("u"), F.col("u").alias("v")))


def _large_star(pairs: DataFrame) -> DataFrame:
    nbrs = _sym(pairs)
    m = nbrs.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
    return (
        nbrs.join(m, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(pairs: DataFrame) -> DataFrame:
    # orient edges high -> low so each node groups its smaller neighbors
    lo = pairs.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).distinct()
    m = lo.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
    joined = lo.join(m, "u")
    relink = joined.select(F.col("v").alias("u"), F.col("m").alias("v"))
    self_link = joined.select(F.col("u"), F.col("m").alias("v")).distinct()
    return (
        relink.unionByName(self_link)
        .filter(F.col("u") != F.col("v"))
        .select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
        .distinct()
    )


def _components_driver(graph: Graph) -> DataFrame:
    """Driver-side union-find for a graph small enough to collect —
    identical output contract (comp_id = min vertex id in component,
    isolates own components).  Adaptive dispatch mirror of the
    Louvain/PageRank driver paths: the distributed GN loop calls
    connected_components every removal round, so medium community
    subgraphs get one collect instead of O(log n) two-shuffle rounds."""
    parent: dict = {}

    def find(x: int) -> int:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    verts = [int(r["vertex_id"]) for r in graph.vertices.select("vertex_id").collect()]
    for v in verts:
        parent[v] = v
    for r in graph.edges.select("src", "dst").collect():
        u, v = int(r["src"]), int(r["dst"])
        if u not in parent:
            parent[u] = u
        if v not in parent:
            parent[v] = v
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    # min-root labeling: after union-by-min, find() yields the component min
    out = [(v, find(v)) for v in parent]
    return graph.edges.sparkSession.createDataFrame(
        out, "vertex_id long, comp_id long"
    )


def connected_components(
    graph: Graph,
    max_iterations: int = 50,
    use_reliable_checkpoint: bool = False,
    local_edges_threshold: int = 100_000,
) -> DataFrame:
    """Return ``(vertex_id long, comp_id long)``; comp_id = min vertex id.

    Isolated vertices get their own component (comp_id = vertex_id),
    matching ``nx.connected_components`` semantics.  Graphs at or below
    ``local_edges_threshold`` edges run a driver-side union-find with the
    identical output contract; larger graphs run the distributed
    large-star/small-star rounds.
    """
    if (
        local_edges_threshold > 0
        and graph.edges.count() <= local_edges_threshold
        and graph.vertices.count() <= 4 * local_edges_threshold
    ):
        return _components_driver(graph)
    pairs = (
        graph.edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    pairs = materialize(pairs)

    prev_sig = None
    for _ in range(max_iterations):
        pairs_new = _small_star(_large_star(pairs))
        pairs_new = (
            pairs_new.checkpoint(eager=True)
            if use_reliable_checkpoint
            else materialize(pairs_new)
        )
        sig_row = pairs_new.agg(
            F.count(F.lit(1)).alias("c"), F.sum(F.col("u") + F.col("v")).alias("s")
        ).collect()[0]
        sig = (sig_row["c"], sig_row["s"])
        if sig == prev_sig and pairs_new.subtract(pairs).isEmpty():
            release(pairs)
            pairs = pairs_new
            break
        prev_sig = sig
        release(pairs)
        pairs = pairs_new

    # at fixpoint: every (u, v) has v = component min < u
    membership = pairs.groupBy(F.col("u").alias("vertex_id")).agg(
        F.min("v").alias("comp_id")
    )
    roots_and_isolates = graph.vertices.select("vertex_id").join(
        membership.select("vertex_id"), "vertex_id", "left_anti"
    ).select("vertex_id", F.col("vertex_id").alias("comp_id"))
    return membership.unionByName(roots_and_isolates)


def component_sizes(components: DataFrame) -> DataFrame:
    return components.groupBy("comp_id").agg(F.count(F.lit(1)).alias("size"))


def largest_component(graph: Graph, components: DataFrame) -> Graph:
    """Focus on the biggest CC (reference girvan_newman_wrapper.py:187-193)."""
    top = (
        component_sizes(components)
        .orderBy(F.desc("size"), F.asc("comp_id"))
        .limit(1)
        .select("comp_id")
    )
    keep = components.join(F.broadcast(top), "comp_id").select("vertex_id")
    vertices = graph.vertices.join(keep, "vertex_id", "left_semi")
    edges = graph.edges.join(
        keep.withColumnRenamed("vertex_id", "src"), "src", "left_semi"
    )
    return Graph(vertices=vertices, edges=edges)
