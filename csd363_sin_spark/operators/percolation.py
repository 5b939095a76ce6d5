"""Clique percolation (CPM, k=3) — overlapping communities.

Palla et al. 2005 ("Uncovering the overlapping community structure of
complex networks", Nature): communities are the connected components of
the *triangle graph* — triangles are adjacent iff they share an edge —
and a vertex belongs to every community whose triangles contain it.
The only OVERLAPPING community operator in the engine (Louvain / GN /
Infomap / LPA all partition); nx parity target
``nx.community.k_clique_communities(G, 3)``.

Output contract: ``(vertex_id, com_a, com_b, com_c)`` — one row per
(vertex, community) membership, the community labeled by its
lexicographically smallest member triangle (a < b < c).  Vertices in no
triangle appear in no community.

Scale shape: triangle listing is the shared edge-ordered two-hop join
(operators/triangles.py); triangle ADJACENCY is one self-join of the
(triangle, edge) incidence relation keyed by the edge pair (3 rows per
triangle), so its cost is sum over edges of (triangles-on-edge)^2 — the
known CPM hot spot, concentrated on high-embeddedness edges exactly
like the dedup family's hub shingles (the same guard applies if a
deployment needs it: cap or sample per-edge triangle lists).  Component
finding over the triangle graph and the min-triple labeling reuse the
CC kernel and one struct-min aggregation; triangle ids come from
plans/ids dense_ids (no global window).  Driver dispatch below
``local_edges_threshold`` runs the identical spec with a union-find
(labels are partition-determined, so both paths agree byte-for-byte).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from csd363_sin_spark.operators.components import connected_components
from csd363_sin_spark.plans.ids import dense_ids
from csd363_sin_spark.plans.induce import Graph
from csd363_sin_spark.plans.lineage import materialize, release


def _triangles(graph: Graph) -> DataFrame:
    e = graph.edges.select("src", "dst").distinct()
    e1 = e.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    e2 = e.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    e3 = e.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    return e1.join(e2, "b").join(e3, ["a", "c"]).select("a", "b", "c")


def _cpm_driver(graph: Graph) -> list[tuple[int, int, int, int]]:
    edges = sorted(
        {
            (min(int(r[0]), int(r[1])), max(int(r[0]), int(r[1])))
            for r in graph.edges.select("src", "dst").collect()
            if int(r[0]) != int(r[1])
        }
    )
    eset = set(edges)
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tris = sorted(
        (a, b, c)
        for a, b in edges
        for c in sorted(adj[a] & adj[b])
        if c > b
    )
    # union-find over triangles via shared edges
    parent = list(range(len(tris)))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    by_edge: dict[tuple[int, int], int] = {}
    for ti, (a, b, c) in enumerate(tris):
        for e in ((a, b), (a, c), (b, c)):
            if e in by_edge:
                ra, rb = find(by_edge[e]), find(ti)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
            else:
                by_edge[e] = ti
    comm: dict[int, tuple[int, int, int]] = {}
    for ti in range(len(tris)):
        root = find(ti)
        lbl = comm.get(root)
        if lbl is None or tris[ti] < lbl:
            comm[root] = min(tris[ti], lbl) if lbl else tris[ti]
    rows = set()
    for ti, (a, b, c) in enumerate(tris):
        la, lb, lc = comm[find(ti)]
        rows.update((v, la, lb, lc) for v in (a, b, c))
    return sorted(rows)


def clique_percolation(
    graph: Graph, local_edges_threshold: int = 100_000
) -> DataFrame:
    """CPM k=3 overlapping communities (see module docstring)."""
    spark = graph.edges.sparkSession
    if (
        local_edges_threshold > 0
        and graph.edges.count() <= local_edges_threshold
        and graph.vertices.count() <= 4 * local_edges_threshold
    ):
        return spark.createDataFrame(
            _cpm_driver(graph) or [],
            "vertex_id long, com_a long, com_b long, com_c long",
        )

    tris = materialize(_triangles(graph))
    tkey = F.concat_ws(
        ":",
        F.col("a").cast("string"),
        F.col("b").cast("string"),
        F.col("c").cast("string"),
    )
    tids = materialize(dense_ids(tris.select(tkey.alias("tk")), "tk", id_col="tid"))
    twid = tris.select("a", "b", "c", tkey.alias("tk")).join(tids, "tk")

    # (triangle, edge) incidence — 3 rows per triangle
    inc = (
        twid.select(F.col("tid"), F.col("a").alias("x"), F.col("b").alias("y"))
        .unionByName(twid.select("tid", F.col("a").alias("x"), F.col("c").alias("y")))
        .unionByName(twid.select("tid", F.col("b").alias("x"), F.col("c").alias("y")))
    )
    left = inc.select("x", "y", F.col("tid").alias("ta"))
    right = inc.select("x", "y", F.col("tid").alias("tb"))
    tadj = (
        left.join(right, ["x", "y"])
        .filter(F.col("ta") < F.col("tb"))
        .select(F.col("ta").alias("src"), F.col("tb").alias("dst"))
        .withColumn("weight", F.lit(1.0))
    )
    tcomp = connected_components(
        Graph(vertices=tids.select(F.col("tid").alias("vertex_id")), edges=tadj),
        local_edges_threshold=0,
    )
    labeled = twid.join(
        tcomp.withColumnRenamed("vertex_id", "tid"), "tid"
    ).select("a", "b", "c", "comp_id")
    lbl = labeled.groupBy("comp_id").agg(
        F.min(F.struct("a", "b", "c")).alias("mn")
    )
    with_lbl = labeled.join(lbl, "comp_id").select(
        "a",
        "b",
        "c",
        F.col("mn.a").alias("com_a"),
        F.col("mn.b").alias("com_b"),
        F.col("mn.c").alias("com_c"),
    )
    out = materialize(
        with_lbl.select(F.col("a").alias("vertex_id"), "com_a", "com_b", "com_c")
        .unionByName(
            with_lbl.select(F.col("b").alias("vertex_id"), "com_a", "com_b", "com_c")
        )
        .unionByName(
            with_lbl.select(F.col("c").alias("vertex_id"), "com_a", "com_b", "com_c")
        )
        .distinct()
    )
    release(tris)
    release(tids)
    return out
