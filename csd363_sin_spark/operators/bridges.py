"""Exact bridges / 2-edge-connected components — beyond the reference.

A *bridge* is an edge whose removal disconnects its endpoints; the
*2-edge-connected components* (2ECC) are the connected components left
after all bridges are removed.  Complements the local-bridge heuristic
in operators/triangles.py (zero common neighbors) with the exact global
notion (reference has neither; nx parity target: ``nx.bridges`` /
``nx.k_edge_components(G, 2)``).

Algorithm — a derandomized cycle-space crossing test over a BFS spanning
forest (the signed-sum variant of the XOR trick from graph sketching,
e.g. Ahn-Guha-McGregor '12), chosen because it needs NO DFS (inherently
sequential) and runs in O(diameter) Pregel-style supersteps:

1. roots: connected components (large-star/small-star); root = min id.
2. BFS forest from the roots; ``parent(v)`` = smallest neighbor one
   layer up — deterministic, and id order == actor order (plans/ids), so
   the DuckDB oracle reproduces the identical forest from actor strings.
3. every NON-tree edge ``(a < b)`` deposits ``+r`` at ``a`` and ``-r``
   at ``b``, where ``r`` is the engine-portable 60-bit md5 hash of the
   edge (functions/dedup.portable_hash64 family).
4. subtree sums over the forest (bottom-up DP, one child->parent
   aggregation per level, ``height`` supersteps): the signed total below
   child ``c`` counts exactly the non-tree edges with ONE endpoint in
   the subtree — edges fully inside contribute ``+r-r = 0``.  The tree
   edge ``(parent(c), c)`` is *crossed* iff such an edge exists; a true
   bridge is crossed by nothing, so its sum is EXACTLY 0 (no false
   negatives); a non-bridge shows 0 only on a ~2^-60 hash cancellation.
5. confirmation: connected components of ``G minus candidates``; a
   candidate is a confirmed bridge iff its endpoints separate (removing
   extra edges never reconnects anything, so every true bridge
   confirms).  ``confirm_rounds > 1`` re-checks with only the confirmed
   set removed, to a monotone fixpoint — belt-and-braces against the
   astronomically unlikely correlated multi-cancellation.
   Non-tree edges are never bridges (they close a cycle with the tree
   path), so candidates ⊆ tree edges suffices.

Scale notes: every stage is either a CC call, a BFS (both O(diameter)
rounds, lineage-truncated via materialize), or one O(V)-row
child->parent aggregation per tree level; the only O(E) shuffles are the
tree/non-tree anti-join and the tag scatter.  No collects beyond the
1-row height/fixpoint signatures.  Driver dispatch below
``local_edges_threshold`` runs the identical spec in plain Python
(bit-identical output — integer math end to end).
"""

from __future__ import annotations

import hashlib
from collections import deque
from typing import NamedTuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from csd363_sin_spark.functions.dedup import portable_hash64
from csd363_sin_spark.operators.components import connected_components
from csd363_sin_spark.plans.induce import Graph
from csd363_sin_spark.plans.lineage import materialize, release


class BridgeDecomposition(NamedTuple):
    """``bridges``: (src, dst) canonical bridge edges; ``tec``:
    (vertex_id, tec_id) with tec_id = min vertex id of the
    2-edge-connected component (isolates are their own component)."""

    bridges: DataFrame
    tec: DataFrame


def _edge_hash_60(src, dst):
    """Portable signed-sum value for a canonical edge: md5 60-bit family
    (functions/dedup), input ``bridge:<src>:<dst>`` over the dense ids —
    mirrored verbatim by the DuckDB oracle via row_number()-derived ids."""
    return portable_hash64(
        F.concat_ws(":", F.lit("bridge"), F.col(src).cast("string"), F.col(dst).cast("string"))
    )


def _bridges_driver(
    graph: Graph, confirm_rounds: int
) -> tuple[list[tuple[int, int]], dict[int, int]]:
    """Driver-side mirror of the distributed spec (identical output)."""
    verts = sorted(int(r[0]) for r in graph.vertices.select("vertex_id").collect())
    edges = sorted(
        (min(int(r[0]), int(r[1])), max(int(r[0]), int(r[1])))
        for r in graph.edges.select("src", "dst").collect()
        if int(r[0]) != int(r[1])
    )
    adj: dict[int, list[int]] = {v: [] for v in verts}
    for a, b in edges:
        adj[a].append(b)
        adj[b].append(a)

    def cc(edge_list):
        parent = {v: v for v in verts}

        def find(x):
            root = x
            while parent[root] != root:
                root = parent[root]
            while parent[x] != root:
                parent[x], x = root, parent[x]
            return root

        for a, b in edge_list:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        return {v: find(v) for v in verts}

    comp = cc(edges)
    # BFS forest from each component's min vertex; parent = min neighbor
    # one layer up
    depth: dict[int, int] = {}
    roots = sorted({comp[v] for v in verts})
    frontier = deque()
    for r in roots:
        depth[r] = 0
        frontier.append(r)
    while frontier:
        v = frontier.popleft()
        for u in adj[v]:
            if u not in depth:
                depth[u] = depth[v] + 1
                frontier.append(u)
    parent_of = {
        v: min(u for u in adj[v] if depth[u] == depth[v] - 1)
        for v in verts
        if depth[v] > 0
    }
    tree = {(min(p, c), max(p, c)) for c, p in parent_of.items()}
    non_tree = [e for e in edges if e not in tree]

    tag: dict[int, int] = {v: 0 for v in verts}
    for a, b in non_tree:
        r = int(hashlib.md5(f"bridge:{a}:{b}".encode()).hexdigest()[:15], 16)
        tag[a] += r
        tag[b] -= r
    children: dict[int, list[int]] = {v: [] for v in verts}
    for c, p in parent_of.items():
        children[p].append(c)
    sub: dict[int, int] = {}
    for v in sorted(verts, key=lambda x: -depth[x]):
        sub[v] = tag[v] + sum(sub[c] for c in children[v])
    cand = sorted(
        (min(parent_of[c], c), max(parent_of[c], c))
        for c in parent_of
        if sub[c] == 0
    )
    for _ in range(max(1, confirm_rounds)):
        cand_set = set(cand)
        comp_wo = cc([e for e in edges if e not in cand_set])
        confirmed = [e for e in cand if comp_wo[e[0]] != comp_wo[e[1]]]
        if len(confirmed) == len(cand):
            break
        cand = confirmed
    bridges = cand
    bridge_set = set(bridges)
    tec = cc([e for e in edges if e not in bridge_set])
    return bridges, tec


def bridge_decomposition(
    graph: Graph,
    local_edges_threshold: int = 100_000,
    confirm_rounds: int = 3,
) -> BridgeDecomposition:
    """Compute bridges + 2-edge-connected components in one pass.

    ``confirm_rounds``: max monotone confirmation re-checks (each is one
    CC job; the loop exits the first time every candidate confirms — in
    practice round 1).  The gate queries pin ``confirm_rounds=1`` so the
    DuckDB oracle mirrors the exact computation.
    """
    spark = graph.edges.sparkSession
    if (
        local_edges_threshold > 0
        and graph.edges.count() <= local_edges_threshold
        and graph.vertices.count() <= 4 * local_edges_threshold
    ):
        bridges, tec = _bridges_driver(graph, confirm_rounds)
        bdf = spark.createDataFrame(
            bridges or [], "src long, dst long"
        )
        tdf = spark.createDataFrame(
            sorted(tec.items()), "vertex_id long, tec_id long"
        )
        return BridgeDecomposition(bdf, tdf)

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

    comp = connected_components(graph, local_edges_threshold=0)
    # BFS layers from the component roots (root = its own comp label)
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
    height = d - 1  # last non-empty layer

    # parent(v) = min neighbor one layer up; one O(E) join, map-side min
    dep_u = depth.select(F.col("vertex_id").alias("u"), F.col("depth").alias("du"))
    dep_v = depth.select(F.col("vertex_id").alias("v"), F.col("depth").alias("dv"))
    par = materialize(
        sym.join(dep_u, "u")
        .join(dep_v, "v")
        .filter(F.col("du") == F.col("dv") - 1)
        .groupBy(F.col("v").alias("child"))
        .agg(F.min("u").alias("parent"))
    )
    tree = par.select(
        F.least("parent", "child").alias("src"),
        F.greatest("parent", "child").alias("dst"),
    )
    non_tree = materialize(edges.join(tree, ["src", "dst"], "left_anti"))

    # signed scatter: +r at the small endpoint, -r at the large one
    r_col = _edge_hash_60("src", "dst").cast("decimal(38,0)")
    tags = materialize(
        non_tree.select(F.col("src").alias("vertex_id"), r_col.alias("x"))
        .unionByName(non_tree.select(F.col("dst").alias("vertex_id"), (-r_col).alias("x")))
        .groupBy("vertex_id")
        .agg(F.sum("x").alias("tg"))
    )

    # bottom-up DP: after k rounds S(v) = signed sum of tags at most k
    # levels below v; height rounds make it the exact subtree sum
    child_par = par.select(F.col("child").alias("vertex_id"), "parent").persist()
    child_par.count()
    sub = materialize(
        graph.vertices.select("vertex_id")
        .join(tags, "vertex_id", "left")
        .select("vertex_id", F.coalesce("tg", F.lit(0).cast("decimal(38,0)")).alias("sv"))
    )
    base = sub
    for _ in range(height):
        rolled = (
            sub.join(child_par, "vertex_id")
            .groupBy(F.col("parent").alias("vertex_id"))
            .agg(F.sum("sv").alias("cs"))
        )
        new_sub = materialize(
            base.select("vertex_id", F.col("sv").alias("tg0"))
            .join(rolled, "vertex_id", "left")
            .select(
                "vertex_id",
                (
                    F.col("tg0")
                    + F.coalesce("cs", F.lit(0).cast("decimal(38,0)"))
                ).alias("sv"),
            )
        )
        if sub is not base:
            release(sub)
        sub = new_sub

    cand = materialize(
        par.join(sub.withColumnRenamed("vertex_id", "child"), "child")
        .filter(F.col("sv") == 0)
        .select(
            F.least("parent", "child").alias("src"),
            F.greatest("parent", "child").alias("dst"),
        )
    )
    if sub is not base:
        release(sub)
    release(base)
    child_par.unpersist()

    bridges = cand
    for _ in range(max(1, confirm_rounds)):
        remaining = edges.join(bridges, ["src", "dst"], "left_anti")
        comp_wo = connected_components(
            Graph(vertices=graph.vertices, edges=remaining.withColumn("weight", F.lit(1.0))),
            local_edges_threshold=0,
        )
        ca = comp_wo.select(F.col("vertex_id").alias("src"), F.col("comp_id").alias("ca"))
        cb = comp_wo.select(F.col("vertex_id").alias("dst"), F.col("comp_id").alias("cb"))
        confirmed = materialize(
            bridges.join(ca, "src").join(cb, "dst").filter(F.col("ca") != F.col("cb")).select("src", "dst")
        )
        n_cand, n_conf = bridges.count(), confirmed.count()
        done = n_conf == n_cand
        release(bridges)
        bridges = confirmed
        if done:
            tec = comp_wo.select("vertex_id", F.col("comp_id").alias("tec_id"))
            break
    else:
        # fixpoint not reached within confirm_rounds: recompute tec
        # against the final confirmed set
        remaining = edges.join(bridges, ["src", "dst"], "left_anti")
        tec = connected_components(
            Graph(vertices=graph.vertices, edges=remaining.withColumn("weight", F.lit(1.0))),
            local_edges_threshold=0,
        ).select("vertex_id", F.col("comp_id").alias("tec_id"))

    sym.unpersist()
    release(depth)
    release(par)
    release(non_tree)
    release(tags)
    release(edges)
    return BridgeDecomposition(bridges, tec)


def bridges(
    graph: Graph,
    local_edges_threshold: int = 100_000,
    confirm_rounds: int = 3,
) -> DataFrame:
    """``(src long, dst long)`` canonical bridge edges."""
    return bridge_decomposition(graph, local_edges_threshold, confirm_rounds).bridges


def two_edge_components(
    graph: Graph,
    local_edges_threshold: int = 100_000,
    confirm_rounds: int = 3,
) -> DataFrame:
    """``(vertex_id long, tec_id long)``; tec_id = min vertex id of the
    2-edge-connected component (``nx.k_edge_components(G, 2)`` with
    isolates as singletons)."""
    return bridge_decomposition(graph, local_edges_threshold, confirm_rounds).tec
