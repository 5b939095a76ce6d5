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


def _four_cliques(graph: Graph) -> DataFrame:
    e = graph.edges.select("src", "dst").distinct()
    e1 = e.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    e2 = e.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    e3 = e.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    tri = e1.join(e2, "b").join(e3, ["a", "c"])
    ad = e.select(F.col("src").alias("a"), F.col("dst").alias("d"))
    bd = e.select(F.col("src").alias("b"), F.col("dst").alias("d"))
    cd = e.select(F.col("src").alias("c"), F.col("dst").alias("d"))
    return (
        tri.join(cd, "c").join(bd, ["b", "d"]).join(ad, ["a", "d"])
        .select("a", "b", "c", "d")
    )


def _cpm4_driver(graph: Graph) -> list[tuple[int, int, int, int, int]]:
    edges = sorted(
        {
            (min(int(r[0]), int(r[1])), max(int(r[0]), int(r[1])))
            for r in graph.edges.select("src", "dst").collect()
            if int(r[0]) != int(r[1])
        }
    )
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    k4s = sorted(
        (a, b, c, d)
        for a, b in edges
        for c in sorted(adj[a] & adj[b])
        if c > b
        for d in sorted(adj[a] & adj[b] & adj[c])
        if d > c
    )
    parent = list(range(len(k4s)))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    by_tri: dict[tuple[int, int, int], int] = {}
    for ki, (a, b, c, d) in enumerate(k4s):
        for t in ((a, b, c), (a, b, d), (a, c, d), (b, c, d)):
            if t in by_tri:
                ra, rb = find(by_tri[t]), find(ki)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
            else:
                by_tri[t] = ki
    comm: dict[int, tuple[int, int, int, int]] = {}
    for ki in range(len(k4s)):
        root = find(ki)
        lbl = comm.get(root)
        if lbl is None or k4s[ki] < lbl:
            comm[root] = k4s[ki]
    rows = set()
    for ki, (a, b, c, d) in enumerate(k4s):
        la, lb, lc, ld = comm[find(ki)]
        rows.update((v, la, lb, lc, ld) for v in (a, b, c, d))
    return sorted(rows)


def clique_percolation_k4(
    graph: Graph, local_edges_threshold: int = 100_000
) -> DataFrame:
    """CPM k=4: overlapping communities = connected components of the
    4-clique graph, K4s adjacent iff they share a TRIANGLE (3 vertices)
    — a strictly denser community notion than k=3 (every k=4 community
    is inside a k=3 one).  Output ``(vertex_id, com_a..com_d)`` rows
    labeled by the community's lexicographically smallest member K4.

    Same plan shapes as :func:`clique_percolation`: the K4 listing is
    the ordered triangle-extension join (operators/triangles.py
    four_clique_total — the degeneracy-reorder note there applies),
    adjacency is one self-join of the 4-rows-per-K4 (K4, triangle)
    incidence, components reuse the CC kernel over dense K4 ids."""
    spark = graph.edges.sparkSession
    if (
        local_edges_threshold > 0
        and graph.edges.count() <= local_edges_threshold
        and graph.vertices.count() <= 4 * local_edges_threshold
    ):
        return spark.createDataFrame(
            _cpm4_driver(graph) or [],
            "vertex_id long, com_a long, com_b long, com_c long, com_d long",
        )

    k4s = materialize(_four_cliques(graph))
    kkey = F.concat_ws(
        ":",
        *[F.col(x).cast("string") for x in ("a", "b", "c", "d")],
    )
    kids = materialize(dense_ids(k4s.select(kkey.alias("kk")), "kk", id_col="kid"))
    kwid = k4s.select("a", "b", "c", "d", kkey.alias("kk")).join(kids, "kk")

    def tri_inc(x, y, z):
        return kwid.select(
            "kid",
            F.col(x).alias("t1"),
            F.col(y).alias("t2"),
            F.col(z).alias("t3"),
        )

    inc = (
        tri_inc("a", "b", "c")
        .unionByName(tri_inc("a", "b", "d"))
        .unionByName(tri_inc("a", "c", "d"))
        .unionByName(tri_inc("b", "c", "d"))
    )
    left = inc.select("t1", "t2", "t3", F.col("kid").alias("ka"))
    right = inc.select("t1", "t2", "t3", F.col("kid").alias("kb"))
    kadj = (
        left.join(right, ["t1", "t2", "t3"])
        .filter(F.col("ka") < F.col("kb"))
        .select(F.col("ka").alias("src"), F.col("kb").alias("dst"))
        .withColumn("weight", F.lit(1.0))
    )
    kcomp = connected_components(
        Graph(vertices=kids.select(F.col("kid").alias("vertex_id")), edges=kadj),
        local_edges_threshold=0,
    )
    labeled = kwid.join(
        kcomp.withColumnRenamed("vertex_id", "kid"), "kid"
    ).select("a", "b", "c", "d", "comp_id")
    lbl = labeled.groupBy("comp_id").agg(
        F.min(F.struct("a", "b", "c", "d")).alias("mn")
    )
    with_lbl = labeled.join(lbl, "comp_id").select(
        "a",
        "b",
        "c",
        "d",
        F.col("mn.a").alias("com_a"),
        F.col("mn.b").alias("com_b"),
        F.col("mn.c").alias("com_c"),
        F.col("mn.d").alias("com_d"),
    )
    parts = [
        with_lbl.select(
            F.col(x).alias("vertex_id"), "com_a", "com_b", "com_c", "com_d"
        )
        for x in ("a", "b", "c", "d")
    ]
    out = parts[0]
    for pt in parts[1:]:
        out = out.unionByName(pt)
    out = materialize(out.distinct())
    release(k4s)
    release(kids)
    return out
