"""Biconnected components / articulation points — beyond the reference.

A *biconnected component* (block) is a maximal edge set in which every
two edges lie on a common simple cycle (bridges are single-edge blocks);
an *articulation point* (cut vertex) is a vertex whose removal
disconnects its component — equivalently, a vertex belonging to two or
more blocks.  Completes the connectivity-decomposition family next to
operators/bridges.py (2-EDGE-connectivity) with the 2-VERTEX-connected
structure (nx parity: ``nx.biconnected_component_edges`` /
``nx.articulation_points``).

Algorithm — a Tarjan-Vishkin-style *auxiliary graph* (TV, "An efficient
parallel biconnectivity algorithm", SIAM J. Comput. '85) adapted from
DFS preorder low/high to a BFS forest with LCA depths, because DFS is
inherently sequential while every step below is an O(diameter)-round
dataflow:

1. BFS spanning forest (depth, parent = min neighbor one layer up) from
   the connected-component min-id roots — same deterministic forest as
   operators/bridges.py.
2. per NON-tree edge (u, v): the depth of lca(u, v), via synchronized
   parent lifting (the deeper endpoint steps up; both step when equal)
   — O(depth) rounds over the non-tree edge set.  The fundamental cycle
   of (u, v) is the tree path u..lca..v plus the edge itself.
3. ``m(c)`` = min lca-depth over non-tree edges with an endpoint in
   subtree(c) (bottom-up min DP over the forest, like the bridge sum
   DP).  An edge CROSSING subtree(c) has lca strictly above c, so
   m(c) < depth(c) iff some cycle passes through tree edge
   (parent(c), c) — the exact, hash-free coverage test.
4. auxiliary graph on the edges of G:
   * rule A: non-tree edge (u, v) links to the first tree edges of its
     cycle — (parent(u), u) when u != lca, (parent(v), v) when v != lca;
   * rule B: tree edge (parent(c), c) links to (parent(parent(c)),
     parent(c)) iff m(c) < depth(parent(c)) — some fundamental cycle
     continues above the parent.
   Every fundamental cycle's edges form one aux component (rule B
   chains each branch up to the lca's children, rule A ties the two
   branches), and overlapping cycles merge — so connected components of
   the aux graph ARE the blocks.
5. block label = lexicographically smallest (src, dst) edge in the
   block; articulation points = vertices incident to >= 2 distinct
   block labels.  Labels are partition-determined, so the driver path
   (classic iterative Tarjan below ``local_edges_threshold``) produces
   byte-identical output from a completely different algorithm.

Scale shape: one CC + one BFS (O(diameter) rounds), LCA lifting
(O(depth) rounds over |non-tree| rows), one min-DP (height rounds of
O(V) child->parent aggregation), dense edge ids (plans/ids, no global
window), and one CC over the aux graph whose size is |E| nodes /
O(|E|) links.  No driver state beyond 1-row signatures.
"""

from __future__ import annotations

from functools import reduce
from typing import NamedTuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from csd363_sin_spark.operators.components import connected_components
from csd363_sin_spark.plans.ids import dense_ids
from csd363_sin_spark.plans.induce import Graph
from csd363_sin_spark.plans.lineage import materialize, release


class BiconnectedDecomposition(NamedTuple):
    """``blocks``: (src, dst, bcc_src, bcc_dst) — every canonical edge
    with its block's smallest edge as the label; ``articulation``:
    (vertex_id) cut vertices."""

    blocks: DataFrame
    articulation: DataFrame


def _bcc_driver(graph: Graph) -> tuple[list[tuple], list[int]]:
    """Driver-side classic iterative Tarjan (disc/low over a DFS tree
    with an edge stack).  The block partition is unique, so labeling
    each block by its minimum (src, dst) edge matches the distributed
    aux-graph path exactly."""
    verts = sorted(int(r[0]) for r in graph.vertices.select("vertex_id").collect())
    edges = sorted(
        {
            (min(int(r[0]), int(r[1])), max(int(r[0]), int(r[1])))
            for r in graph.edges.select("src", "dst").collect()
            if int(r[0]) != int(r[1])
        }
    )
    adj: dict[int, list[int]] = {v: [] for v in verts}
    for a, b in edges:
        adj[a].append(b)
        adj[b].append(a)
    for v in adj:
        adj[v].sort()

    disc: dict[int, int] = {}
    low: dict[int, int] = {}
    timer = 0
    blocks: list[list[tuple[int, int]]] = []
    aps: set[int] = set()
    estack: list[tuple[int, int]] = []

    for root in verts:
        if root in disc or not adj[root]:
            continue
        # iterative DFS: stack of (vertex, parent, neighbor iterator)
        disc[root] = low[root] = timer
        timer += 1
        stack = [(root, -1, iter(adj[root]))]
        root_children = 0
        while stack:
            v, parent, it = stack[-1]
            advanced = False
            for w in it:
                if w == parent:
                    continue
                e = (min(v, w), max(v, w))
                if w not in disc:
                    estack.append(e)
                    disc[w] = low[w] = timer
                    timer += 1
                    stack.append((w, v, iter(adj[w])))
                    if v == root:
                        root_children += 1
                    advanced = True
                    break
                if disc[w] < disc[v]:
                    estack.append(e)
                    low[v] = min(low[v], disc[w])
            if advanced:
                continue
            stack.pop()
            if stack:
                pv = stack[-1][0]
                low[pv] = min(low[pv], low[v])
                if low[v] >= disc[pv]:
                    # pop the block rooted at the tree edge (pv, v)
                    block = []
                    stop = (min(pv, v), max(pv, v))
                    while estack:
                        e = estack.pop()
                        block.append(e)
                        if e == stop:
                            break
                    if block:
                        blocks.append(block)
                    if pv != root or root_children > 1:
                        aps.add(pv)
    rows = []
    for block in blocks:
        ls, ld = min(block)
        rows.extend((s, d, ls, ld) for s, d in block)
    return sorted(rows), sorted(aps)


def bcc_decomposition(
    graph: Graph,
    local_edges_threshold: int = 100_000,
) -> BiconnectedDecomposition:
    """Blocks + articulation points in one pass (see module docstring)."""
    spark = graph.edges.sparkSession
    if (
        local_edges_threshold > 0
        and graph.edges.count() <= local_edges_threshold
        and graph.vertices.count() <= 4 * local_edges_threshold
    ):
        rows, aps = _bcc_driver(graph)
        blocks = spark.createDataFrame(
            rows or [], "src long, dst long, bcc_src long, bcc_dst long"
        )
        art = spark.createDataFrame([(a,) for a in aps] or [], "vertex_id long")
        return BiconnectedDecomposition(blocks, art)

    edges = materialize(
        graph.edges.select(
            F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    sym = (
        edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .unionByName(edges.select(F.col("dst").alias("u"), F.col("src").alias("v")))
        .repartition("u")
        .persist()
    )
    sym.count()

    # --- BFS forest (same deterministic forest as operators/bridges.py)
    comp = connected_components(graph, local_edges_threshold=0)
    state = materialize(
        comp.filter(F.col("vertex_id") == F.col("comp_id")).select(
            "vertex_id", F.lit(0).cast("long").alias("depth")
        )
    )
    frontier = state
    d = 0
    while True:
        d += 1
        nxt = materialize(
            frontier.join(sym, frontier["vertex_id"] == sym["u"])
            .select(F.col("v").alias("vertex_id"))
            .distinct()
            .join(state, "vertex_id", "left_anti")
            .withColumn("depth", F.lit(d).cast("long"))
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
    depth = state
    height = d - 1

    dep_u = depth.select(F.col("vertex_id").alias("u"), F.col("depth").alias("du"))
    dep_v = depth.select(F.col("vertex_id").alias("v"), F.col("depth").alias("dv"))
    par = materialize(
        sym.join(dep_u, "u")
        .join(dep_v, "v")
        .filter(F.col("du") == F.col("dv") - 1)
        .groupBy(F.col("v").alias("child"))
        .agg(F.min("u").alias("parent"))
    ).persist()
    par.count()
    tree = par.select(
        F.least("parent", "child").alias("src"),
        F.greatest("parent", "child").alias("dst"),
    )
    non_tree = materialize(edges.join(tree, ["src", "dst"], "left_anti"))

    # --- LCA depth per non-tree edge: synchronized parent lifting.
    # Invariant each round: (a, b) are on the two branches of the
    # fundamental cycle, at equal-or-adjacent depths; lift the deeper
    # (both when equal) until they meet at the lca.
    dep_map = depth.select(
        F.col("vertex_id").alias("_v"), F.col("depth").alias("_dp")
    )
    par_map = par.select(F.col("child").alias("_v"), F.col("parent").alias("_p"))
    lift = materialize(
        non_tree.select("src", "dst", F.col("src").alias("a"), F.col("dst").alias("b"))
    )
    done_parts: list[DataFrame] = []
    for _ in range(2 * max(1, height) + 2):
        met = lift.filter(F.col("a") == F.col("b"))
        if met.limit(1).count() > 0:
            done_parts.append(materialize(met))
        live = lift.filter(F.col("a") != F.col("b"))
        if live.limit(1).count() == 0:
            release(lift)
            break
        da = dep_map.select(F.col("_v").alias("a"), F.col("_dp").alias("dpa"))
        db = dep_map.select(F.col("_v").alias("b"), F.col("_dp").alias("dpb"))
        pa = par_map.select(F.col("_v").alias("a"), F.col("_p").alias("pra"))
        pb = par_map.select(F.col("_v").alias("b"), F.col("_p").alias("prb"))
        stepped = (
            live.join(da, "a")
            .join(db, "b")
            .join(pa, "a", "left")
            .join(pb, "b", "left")
            .select(
                "src",
                "dst",
                F.when(F.col("dpa") >= F.col("dpb"), F.col("pra"))
                .otherwise(F.col("a"))
                .alias("a"),
                F.when(F.col("dpb") >= F.col("dpa"), F.col("prb"))
                .otherwise(F.col("b"))
                .alias("b"),
            )
        )
        new_lift = materialize(stepped)
        release(lift)
        lift = new_lift
    lcad = materialize(
        (
            reduce(lambda x, y: x.unionByName(y), done_parts)
            if done_parts
            else non_tree.limit(0).select(
                "src", "dst", F.col("src").alias("a"), F.col("dst").alias("b")
            )
        )
        .join(dep_map.withColumnRenamed("_v", "a"), "a")
        .select("src", "dst", F.col("_dp").alias("lca_depth"))
    )
    for p_ in done_parts:
        release(p_)

    # --- m(c): bottom-up min DP over the forest of per-vertex min
    # lca-depth contributions (both endpoints of every non-tree edge)
    tag_min = (
        lcad.select(F.col("src").alias("vertex_id"), "lca_depth")
        .unionByName(lcad.select(F.col("dst").alias("vertex_id"), "lca_depth"))
        .groupBy("vertex_id")
        .agg(F.min("lca_depth").alias("t"))
    )
    base = materialize(
        graph.vertices.select("vertex_id").join(tag_min, "vertex_id", "left")
        .select("vertex_id", F.col("t").alias("m"))
    )
    child_par = par.select(F.col("child").alias("vertex_id"), "parent")
    sub = base
    for _ in range(height):
        rolled = (
            sub.join(child_par, "vertex_id")
            .groupBy(F.col("parent").alias("vertex_id"))
            .agg(F.min("m").alias("cm"))
        )
        new_sub = materialize(
            base.select("vertex_id", F.col("m").alias("t0"))
            .join(rolled, "vertex_id", "left")
            .select("vertex_id", F.least("t0", "cm").alias("m"))
        )
        if sub is not base:
            release(sub)
        sub = new_sub

    # --- auxiliary graph on the canonical edges
    te = par.select(
        F.least("parent", "child").alias("s"),
        F.greatest("parent", "child").alias("d"),
        "child",
        "parent",
    )
    # rule A: non-tree edge -> first tree edge at each non-lca endpoint
    ed_u = lcad.join(
        dep_map.withColumnRenamed("_v", "src").withColumnRenamed("_dp", "dpu"), "src"
    ).filter(F.col("dpu") > F.col("lca_depth"))
    ed_v = lcad.join(
        dep_map.withColumnRenamed("_v", "dst").withColumnRenamed("_dp", "dpv"), "dst"
    ).filter(F.col("dpv") > F.col("lca_depth"))
    aux_a = (
        ed_u.join(te.select(F.col("child").alias("src"), F.col("s").alias("s2"), F.col("d").alias("d2")), "src")
        .select(F.col("src").alias("x_src"), F.col("dst").alias("x_dst"), "s2", "d2")
        .unionByName(
            ed_v.join(
                te.select(F.col("child").alias("dst"), F.col("s").alias("s2"), F.col("d").alias("d2")),
                "dst",
            ).select(F.col("src").alias("x_src"), F.col("dst").alias("x_dst"), "s2", "d2")
        )
    )
    # rule B: tree edge of c -> tree edge of parent(c) when a cycle
    # through (parent(c), c) continues above parent(c)
    dep_parent = dep_map.select(
        F.col("_v").alias("parent"), F.col("_dp").alias("dp_parent")
    )
    aux_b = (
        te.join(sub.withColumnRenamed("vertex_id", "child"), "child")
        .join(dep_parent, "parent")
        .filter(F.col("m").isNotNull() & (F.col("m") < F.col("dp_parent")))
        .join(
            te.select(
                F.col("child").alias("parent"),
                F.col("s").alias("s2"),
                F.col("d").alias("d2"),
            ),
            "parent",
        )
        .select(F.col("s").alias("x_src"), F.col("d").alias("x_dst"), "s2", "d2")
    )
    aux_links = aux_a.unionByName(aux_b)

    # dense edge ids (key-order over the canonical pair; no global window)
    ekey = F.concat_ws(":", F.col("src").cast("string"), F.col("dst").cast("string"))
    eids = materialize(
        dense_ids(edges.select(ekey.alias("ek")), "ek", id_col="eid")
    )
    e_with_id = edges.select("src", "dst", ekey.alias("ek")).join(eids, "ek")
    id_of = e_with_id.select("src", "dst", "eid")
    aux_edges = (
        aux_links.join(
            id_of.select(
                F.col("src").alias("x_src"), F.col("dst").alias("x_dst"), F.col("eid").alias("ea")
            ),
            ["x_src", "x_dst"],
        )
        .join(
            id_of.select(
                F.col("src").alias("s2"), F.col("dst").alias("d2"), F.col("eid").alias("eb")
            ),
            ["s2", "d2"],
        )
        .select(F.col("ea").alias("src"), F.col("eb").alias("dst"))
        .withColumn("weight", F.lit(1.0))
    )
    aux_vertices = id_of.select(F.col("eid").alias("vertex_id"))
    aux_comp = connected_components(
        Graph(vertices=aux_vertices, edges=aux_edges), local_edges_threshold=0
    )

    labeled = id_of.join(
        aux_comp.withColumnRenamed("vertex_id", "eid"), "eid"
    ).select("src", "dst", "comp_id")
    lbl = labeled.groupBy("comp_id").agg(
        F.min(F.struct(F.col("src"), F.col("dst"))).alias("mn")
    )
    blocks = materialize(
        labeled.join(lbl, "comp_id").select(
            "src",
            "dst",
            F.col("mn.src").alias("bcc_src"),
            F.col("mn.dst").alias("bcc_dst"),
        )
    )
    articulation = materialize(
        blocks.select(F.col("src").alias("vertex_id"), "bcc_src", "bcc_dst")
        .unionByName(blocks.select(F.col("dst").alias("vertex_id"), "bcc_src", "bcc_dst"))
        .groupBy("vertex_id")
        .agg(F.count_distinct(F.struct("bcc_src", "bcc_dst")).alias("nb"))
        .filter(F.col("nb") >= 2)
        .select("vertex_id")
    )

    sym.unpersist()
    par.unpersist()
    release(depth)
    release(non_tree)
    release(lcad)
    release(base)
    if sub is not base:
        release(sub)
    release(edges)
    release(eids)
    return BiconnectedDecomposition(blocks, articulation)


def biconnected_components(
    graph: Graph, local_edges_threshold: int = 100_000
) -> DataFrame:
    """``(src, dst, bcc_src, bcc_dst)``: every canonical edge labeled by
    its block's lexicographically smallest edge."""
    return bcc_decomposition(graph, local_edges_threshold).blocks


def articulation_points(
    graph: Graph, local_edges_threshold: int = 100_000
) -> DataFrame:
    """``(vertex_id long)`` cut vertices (nx.articulation_points)."""
    return bcc_decomposition(graph, local_edges_threshold).articulation


def block_cut_tree(
    graph: Graph, local_edges_threshold: int = 100_000
) -> DataFrame:
    """``(vertex_id, bcc_src, bcc_dst)`` — the block-cut tree as the
    bipartite incidence of articulation points and blocks (one row per
    (cut vertex, block containing it)).  Classic fact: this graph is a
    forest; together with the per-edge block labels it fully describes
    the graph's 2-vertex-connectivity structure.  Derived from
    :func:`bcc_decomposition` with one endpoint explode + semi-join —
    no new shuffle shapes."""
    dec = bcc_decomposition(graph, local_edges_threshold)
    incident = (
        dec.blocks.select(F.col("src").alias("vertex_id"), "bcc_src", "bcc_dst")
        .unionByName(
            dec.blocks.select(F.col("dst").alias("vertex_id"), "bcc_src", "bcc_dst")
        )
        .distinct()
    )
    return incident.join(dec.articulation, "vertex_id", "left_semi")
