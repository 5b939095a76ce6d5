"""Triangle counting via edge-ordered two-hop join (SURVEY G9).

Not present in the reference; required by the north rule's supporting-
operator list.  Classic Cohen / "MapReduce triangle" plan on the
canonical (src < dst) edge table:

    wedges  = e1(a,b) JOIN e2(b,c)      -- a < b < c by canonicality
    closed  = wedges JOIN e3(a,c)

Every triangle {a<b<c} is emitted exactly once.  Catalyst picks
sort-merge joins; AQE splits skewed hub keys.  Per-vertex counts explode
each closed wedge to its three corners and hash-aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from csd363_sin_spark.plans.induce import Graph


def _closed_wedges(graph: Graph) -> DataFrame:
    e = graph.edges.select("src", "dst").distinct()
    e1 = e.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    e2 = e.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    e3 = e.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    return e1.join(e2, "b").join(e3, ["a", "c"])


def triangle_count(graph: Graph) -> int:
    """Total number of triangles in the graph."""
    return _closed_wedges(graph).count()


def triangles_per_vertex(graph: Graph) -> DataFrame:
    """(vertex_id, triangles) for every vertex — matches nx.triangles."""
    tri = _closed_wedges(graph)
    corners = (
        tri.select(F.col("a").alias("vertex_id"))
        .unionAll(tri.select(F.col("b").alias("vertex_id")))
        .unionAll(tri.select(F.col("c").alias("vertex_id")))
    )
    counts = corners.groupBy("vertex_id").agg(F.count(F.lit(1)).alias("triangles"))
    return (
        graph.vertices.select("vertex_id")
        .join(counts, "vertex_id", "left")
        .fillna({"triangles": 0})
    )


def clustering_coefficient(graph: Graph) -> DataFrame:
    """Per-vertex local clustering coefficient — matches nx.clustering on
    simple graphs: 2*triangles / (deg * (deg-1)), 0.0 when deg < 2.

    Plan: the same closed-wedge join as triangle_count (one pass over the
    canonical edge table), a corner-explode hash aggregation, and one
    broadcast-sized join with the degree table — no new shuffle shapes
    beyond what G9 already pays, so the 100 TB story is unchanged.
    """
    tri = triangles_per_vertex(graph)
    deg = graph.degrees()
    coeff = F.when(
        F.col("degree") >= 2,
        2.0 * F.col("triangles") / (F.col("degree") * (F.col("degree") - 1)),
    ).otherwise(F.lit(0.0))
    return tri.join(deg, "vertex_id").select(
        "vertex_id", "triangles", F.round(coeff, 6).alias("clustering")
    )


def transitivity(graph: Graph) -> DataFrame:
    """One row ``(triangles, wedges, transitivity)`` — the GLOBAL
    clustering coefficient, matching ``nx.transitivity``:
    ``3 * triangles / wedges`` with ``wedges = sum_v C(deg_v, 2)``
    (connected triples), 0.0 on wedge-free graphs.

    Plan: the G9 closed-wedge count plus one degree aggregation, combined
    with a 1x1 cross join — two scalar jobs, no new shuffle shapes.
    ``deg*(deg-1)`` is always even so the wedge count is exact BIGINT."""
    tri = _closed_wedges(graph).agg(F.count(F.lit(1)).alias("triangles"))
    wed = graph.degrees().agg(
        F.sum(
            (F.col("degree") * (F.col("degree") - 1) / 2).cast("long")
        ).alias("wedges")
    )
    ratio = F.when(
        F.col("wedges") > 0, 3.0 * F.col("triangles") / F.col("wedges")
    ).otherwise(F.lit(0.0))
    return tri.crossJoin(wed).select(
        "triangles", "wedges", F.round(ratio, 6).alias("transitivity")
    )


def square_total(graph: Graph, order: str = "id") -> DataFrame:
    """Exact 4-cycle (square) count: one row ``(squares long)``.

    Motif counting beyond triangles.  A 4-cycle a-c-b-d-a is determined
    by its two opposite corner pairs; if W(a,b) = #common neighbors of
    the unordered pair (a, b), every square contributes C(2,2) = 1 to
    each of its two opposite pairs, so

        #C4 = (1/2) * sum over pairs a<b of C(W(a,b), 2).

    Dataflow: one self-join of the symmetric edge view on the wedge
    center (the same expansion the triangle kernel uses) feeding a
    map-side-combined count per (a, b), then one integer aggregation —
    all exact BIGINT math.

    ``order``: ``"id"`` (default) runs the unrestricted wedge expansion
    above — O(sum deg^2), keeping the SQL oracle verbatim.  ``"degree"``
    is the vertex-priority counting of Wang et al. (VLDB 2019, butterfly
    counting generalized to C4): under the total priority
    ``p(v) = (degree, id)``, generate only wedges (start u, middle v,
    end w) with ``p(u) > p(v)`` and ``p(u) > p(w)``; every 4-cycle has a
    unique highest-priority vertex and is counted exactly once by the
    wedge PAIR at (that vertex, its opposite corner), so

        #C4 = sum over (u, w) of C(cnt(u, w), 2)     -- no halving

    with cost O(sum over edges of min-endpoint degree) ~ O(m * sqrt m)
    worst case and ~0 wedges at hub middles (a pure star generates NO
    wedges: no neighbor out-ranks the hub).  Same exact count — the
    order-invariance test pins it — different intermediate size: the
    right mode for hub-heavy graphs at scale.
    """
    sym = graph.edges_sym().select("src", "dst").distinct()
    if order == "degree":
        deg = sym.groupBy(F.col("src").alias("v")).agg(
            F.count(F.lit(1)).alias("deg")
        )
        c_lit = int(
            sym.agg(F.greatest(F.max("src"), F.max("dst"))).collect()[0][0]
            or 0
        ) + 1
        keyed = deg.select(
            "v", (F.col("deg") * F.lit(c_lit) + F.col("v")).alias("k")
        )
        half = (
            sym.join(keyed.withColumnRenamed("v", "src"), "src")
            .join(
                keyed.select(
                    F.col("v").alias("dst"), F.col("k").alias("kn")
                ),
                "dst",
            )
            .select(
                F.col("src").alias("v"), F.col("k").alias("kv"),
                F.col("dst").alias("n"), F.col("kn"),
            )
        )
        starts = half.where(F.col("kn") > F.col("kv")).select(
            "v", F.col("n").alias("u"), F.col("kn").alias("ku")
        )
        ends = half.select("v", F.col("n").alias("w"), F.col("kn").alias("kw"))
        cnt = (
            starts.join(ends, "v")
            .where(F.col("kw") < F.col("ku"))
            .groupBy("u", "w")
            .agg(F.count(F.lit(1)).alias("w_cnt"))
        )
        return cnt.select(
            F.expr("div(w_cnt * (w_cnt - 1), 2)").alias("p")
        ).agg(F.coalesce(F.sum("p"), F.lit(0)).cast("long").alias("squares"))
    elif order != "id":
        raise ValueError(f"unknown order: {order!r}")
    a = sym.select(F.col("src").alias("c"), F.col("dst").alias("a"))
    b = sym.select(F.col("src").alias("c"), F.col("dst").alias("b"))
    wedges = (
        a.join(b, "c")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("w"))
    )
    pairs = wedges.select(
        F.expr("div(w * (w - 1), 2)").alias("p")
    )
    return pairs.agg(
        F.expr("div(sum(p), 2)").cast("long").alias("squares")
    )


def four_clique_total(graph: Graph, order: str = "id") -> DataFrame:
    """Exact 4-clique (K4) count: one row ``(cliques4 long)``.

    Ordered-join clique listing (Chiba-Nishizeki style): every K4
    {a < b < c < d} is the unique extension of the ordered triangle
    (a, b, c) by a vertex d adjacent to all three with d > c, so

        K4 = triangles(a,b,c) JOIN e(c,d) JOIN e(b,d) JOIN e(a,d)

    on the canonical (src < dst) edge table emits each clique exactly
    once.  The (c, d) join runs first: it is the most selective
    (d must exceed the triangle's largest vertex), so the two remaining
    joins filter an already-small candidate set.  All equi-joins —
    Catalyst picks sort-merge, AQE splits skewed hub keys.

    ``order``: the total vertex order the listing runs under.  The count
    is order-invariant; the INTERMEDIATE sizes are not.  ``"id"``
    (default) keeps the SQL oracle verbatim.  ``"degree"`` relabels each
    vertex to the composite key ``degree * C + id`` (C > max id, so the
    order is (degree, id) lexicographic) and re-canonicalizes edges
    under it — the standard degeneracy-style orientation that bounds
    per-vertex out-degree by O(core number) instead of the max degree,
    the right setting for hub-heavy graphs at scale (exact clique
    listing is inherently O(m * alpha^2), alpha = degeneracy).  Cost of
    the relabel: one degree aggregation + one scalar max + two hash
    joins — no new shuffle shapes.  The composite key needs
    deg * (max_id + 1) + id < 2^63 — fine through ~3e9 vertices; past
    that swap the arithmetic key for a dense (degree, id) rank.
    """
    e = graph.edges.select("src", "dst").distinct()
    if order == "degree":
        sym = e.unionAll(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        deg = sym.groupBy(F.col("src").alias("v")).agg(
            F.count(F.lit(1)).alias("deg")
        )
        c_lit = int(
            e.agg(F.greatest(F.max("src"), F.max("dst"))).collect()[0][0] or 0
        ) + 1
        key = (F.col("deg") * F.lit(c_lit) + F.col("v")).alias("k")
        ranked = deg.select("v", key)
        ks = ranked.select(F.col("v").alias("src"), F.col("k").alias("ks"))
        kd = ranked.select(F.col("v").alias("dst"), F.col("k").alias("kd"))
        e = (
            e.join(ks, "src")
            .join(kd, "dst")
            .select(
                F.least("ks", "kd").alias("src"),
                F.greatest("ks", "kd").alias("dst"),
            )
        )
    elif order != "id":
        raise ValueError(f"unknown order: {order!r}")
    e1 = e.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    e2 = e.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    e3 = e.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    tri = e1.join(e2, "b").join(e3, ["a", "c"])
    ad = e.select(F.col("src").alias("a"), F.col("dst").alias("d"))
    bd = e.select(F.col("src").alias("b"), F.col("dst").alias("d"))
    cd = e.select(F.col("src").alias("c"), F.col("dst").alias("d"))
    k4 = tri.join(cd, "c").join(bd, ["b", "d"]).join(ad, ["a", "d"])
    return k4.agg(F.count(F.lit(1)).cast("long").alias("cliques4"))


def ego_stats(graph: Graph) -> DataFrame:
    """Per-vertex ego-network profile: ``(vertex_id, degree, ego_n,
    ego_edges, ego_density)`` where the ego net of v is {v} + N(v), its
    edge count = deg(v) spokes + triangles through v (edges among
    neighbors), and density = 2*ego_edges / (ego_n*(ego_n-1)); degree-0
    vertices get density 0.0.

    Zero new shuffle shapes: reuses the G9 closed-wedge corner counts and
    the degree aggregation, joined once."""
    tri = triangles_per_vertex(graph)
    deg = graph.degrees()
    d = F.col("degree")
    t = F.col("triangles")
    ego_edges = (d + t).cast("long")
    density = F.when(
        d > 0, 2.0 * (d + t) / ((d + 1.0) * d)
    ).otherwise(F.lit(0.0))
    return tri.join(deg, "vertex_id").select(
        "vertex_id",
        d.cast("long").alias("degree"),
        (d + 1).cast("long").alias("ego_n"),
        ego_edges.alias("ego_edges"),
        F.round(density, 6).alias("ego_density"),
    )


def edge_embeddedness(graph: Graph) -> DataFrame:
    """Per-edge embeddedness (Granovetter tie strength): common neighbors
    of the endpoints, neighborhood overlap = common / (|N(u) ∪ N(v)| - 2),
    and the local-bridge flag (embeddedness 0 — edges whose removal
    lengthens every path between their endpoints).

    Returns ``(src, dst, common_neighbors, overlap, is_local_bridge)``
    for every canonical edge.  Plan: one wedge join (the G9 expansion
    restricted to edge-adjacent wedges) + one degree join — the
    embeddedness of edge (u, v) counts wedges u-w-v, i.e. common
    neighbors; union size = deg(u) + deg(v) - common - 2 self terms."""
    e = graph.edges.select("src", "dst").distinct()
    sym = graph.edges_sym().select("src", "dst").distinct()
    # wedges u-w-v for the edge (u, v): neighbor lists joined on the middle
    a = sym.select(F.col("dst").alias("u"), F.col("src").alias("w"))
    b = sym.select(F.col("dst").alias("v"), F.col("src").alias("w"))
    common = (
        e.join(a, e["src"] == a["u"])
        .join(b, (e["dst"] == b["v"]) & (a["w"] == b["w"]))
        .groupBy(e["src"], e["dst"])
        .agg(F.count(F.lit(1)).alias("common_neighbors"))
    )
    deg = graph.degrees()
    du = deg.select(F.col("vertex_id").alias("src"), F.col("degree").alias("du"))
    dv = deg.select(F.col("vertex_id").alias("dst"), F.col("degree").alias("dv"))
    out = (
        e.join(common, ["src", "dst"], "left")
        .fillna({"common_neighbors": 0})
        .join(du, "src")
        .join(dv, "dst")
    )
    denom = F.col("du") + F.col("dv") - F.col("common_neighbors") - 2.0
    return out.select(
        "src",
        "dst",
        "common_neighbors",
        F.round(
            F.when(denom > 0, F.col("common_neighbors") / denom).otherwise(
                F.lit(0.0)
            ),
            6,
        ).alias("overlap"),
        (F.col("common_neighbors") == 0).alias("is_local_bridge"),
    )
