"""Strongly connected components over the directed handoff graph.

Beyond-reference directed-layer operator (the reference engine is
undirected-only; see plans/directed.py).  Canonical output: every vertex
labeled with the smallest vertex id of its SCC — algorithm-independent,
so the driver and distributed kernels are bit-comparable and the DuckDB
oracle (recursive mutual-reachability closure) matches exactly.

Distributed kernel = trim + forward min-coloring + backward confirmation
(the FW-BW "coloring" algorithm of Orzan; also Slota et al., "BFS and
Coloring-based Parallel Algorithms for Strongly Connected Components",
IPDPS 2014), peeling rounds until every vertex is assigned:

1. **Trim**: a vertex with no in-edges or no out-edges in the active
   subgraph cannot lie on a cycle — it is a singleton SCC.  Trimming to
   fixpoint first is the standard accelerator: on DAG-like graphs (most
   handoff graphs) it assigns almost everything without any propagation.
2. **Color**: propagate ``color(v) = min id that forward-reaches v`` to
   fixpoint (Bellman-Ford-style supersteps: one join of the color vector
   against the src-keyed edge view + a map-side-combined min per
   superstep — O(E) shuffle, O(diameter) rounds).
3. **Confirm backward**: for every color root ``r`` (``color(r) == r``),
   the SCC of ``r`` = same-colored vertices that reach ``r``; found by a
   multi-root backward BFS restricted to matching colors (all roots
   expand in the same superstep — a vertex's color determines the only
   root it may join, so the state stays one row per reached vertex).
   Every member of that SCC has color r and r is its minimum id, so the
   label is canonical by construction.
4. Remove assigned vertices/edges, repeat.  Each round assigns at least
   every source-SCC of the remaining condensation, so the number of
   peeling rounds is bounded by the condensation's depth.

Driver kernel below ``local_edges_threshold``: iterative Kosaraju
(explicit stacks — no recursion limit), identical labels by definition.

Scale notes: all supersteps are joins + partial-aggregated min/distinct
against a persisted, ``src``/``dst``-pre-partitioned active edge view;
per-superstep state is one row per active vertex; hub fan-in collapses
map-side.  No per-row Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from csd363_sin_spark.plans.directed import DiGraph
from csd363_sin_spark.plans.lineage import materialize, release


def _scc_driver(dg: DiGraph) -> DataFrame:
    """Iterative Kosaraju on collected edges; scc_id = min member id."""
    spark = dg.edges.sparkSession
    verts = sorted(int(r[0]) for r in dg.vertices.select("vertex_id").collect())
    adj: dict[int, list[int]] = {v: [] for v in verts}
    radj: dict[int, list[int]] = {v: [] for v in verts}
    for r in dg.edges.select("src", "dst").distinct().collect():
        u, v = int(r["src"]), int(r["dst"])
        adj[u].append(v)
        radj[v].append(u)

    # pass 1: vertices by decreasing finish time (iterative DFS)
    order: list[int] = []
    seen: set[int] = set()
    for start in verts:
        if start in seen:
            continue
        seen.add(start)
        stack: list[tuple[int, int]] = [(start, 0)]
        while stack:
            node, i = stack[-1]
            nbrs = adj[node]
            advanced = False
            while i < len(nbrs):
                nxt = nbrs[i]
                i += 1
                if nxt not in seen:
                    seen.add(nxt)
                    stack[-1] = (node, i)
                    stack.append((nxt, 0))
                    advanced = True
                    break
            if not advanced:
                stack[-1] = (node, i)
                if i >= len(nbrs):
                    order.append(node)
                    stack.pop()

    # pass 2: reverse-graph DFS in reverse finish order
    label: dict[int, int] = {}
    for start in reversed(order):
        if start in label:
            continue
        comp = [start]
        label[start] = start
        stack2 = [start]
        while stack2:
            node = stack2.pop()
            for nxt in radj[node]:
                if nxt not in label:
                    label[nxt] = start
                    comp.append(nxt)
                    stack2.append(nxt)
        root = min(comp)
        for v in comp:
            label[v] = root
    return spark.createDataFrame(
        sorted(label.items()), "vertex_id long, scc_id long"
    )


def _singletons(remaining: DataFrame, active_e: DataFrame) -> DataFrame:
    """Active vertices missing an in-edge or an out-edge (trim rule)."""
    outs = active_e.select(F.col("src").alias("vertex_id")).distinct()
    ins = active_e.select(F.col("dst").alias("vertex_id")).distinct()
    both = remaining.join(outs, "vertex_id", "left_semi").join(
        ins, "vertex_id", "left_semi"
    )
    return remaining.join(both, "vertex_id", "left_anti")


def _scc_distributed(dg: DiGraph, store=None, stage: str = "scc") -> DataFrame:
    """``store`` (a checkpoint.CheckpointStore) makes the peeling loop
    resumable mid-algorithm (north rule): each peel round snapshots the
    remaining vertex set, the surviving edge set, and the assignments so
    far, and appends a lineage row; a relaunched call continues from the
    newest complete round."""
    spark = dg.edges.sparkSession
    meta_key = f"{stage}_state"
    peel_round = 0
    if store is not None and store.has_meta(meta_key):
        meta = store.load_meta(meta_key)
        if meta.get("done"):
            return materialize(store.load_df(spark, f"{stage}_result"))
        active_e = materialize(store.load_df(spark, f"{stage}_edges"))
        remaining = materialize(store.load_df(spark, f"{stage}_remaining"))
        assigned = materialize(store.load_df(spark, f"{stage}_assigned"))
        peel_round = meta["round"]
    else:
        active_e = materialize(dg.edges.select("src", "dst").distinct())
        remaining = materialize(dg.vertices.select("vertex_id"))
        assigned = materialize(
            spark.createDataFrame([], "vertex_id long, scc_id long")
        )

    def _snapshot() -> None:
        if store is None:
            return
        store.save_df(f"{stage}_edges", active_e)
        store.save_df(f"{stage}_remaining", remaining)
        store.save_df(f"{stage}_assigned", assigned)
        store.save_meta(meta_key, {"round": peel_round, "done": False})
        store.lineage(stage, peel_round, assigned, kind="scc_round")

    def _assign(new_rows: DataFrame) -> None:
        nonlocal assigned
        nxt = materialize(assigned.unionByName(new_rows))
        release(assigned)
        assigned = nxt

    while not remaining.isEmpty():
        # --- trim to fixpoint -------------------------------------------
        while True:
            trimmed = materialize(_singletons(remaining, active_e))
            if trimmed.isEmpty():
                release(trimmed)
                break
            _assign(
                trimmed.select("vertex_id", F.col("vertex_id").alias("scc_id"))
            )
            nxt_remaining = materialize(
                remaining.join(trimmed, "vertex_id", "left_anti")
            )
            release(remaining)
            release(trimmed)
            remaining = nxt_remaining
            nxt_e = materialize(
                active_e.join(
                    remaining.withColumnRenamed("vertex_id", "src"),
                    "src",
                    "left_semi",
                ).join(
                    remaining.withColumnRenamed("vertex_id", "dst"),
                    "dst",
                    "left_semi",
                )
            )
            release(active_e)
            active_e = nxt_e
        if remaining.isEmpty():
            break

        # --- forward min-coloring to fixpoint ---------------------------
        colors = materialize(
            remaining.select("vertex_id", F.col("vertex_id").alias("color"))
        )
        while True:
            incoming = (
                colors.withColumnRenamed("vertex_id", "src")
                .join(active_e, "src")
                .groupBy(F.col("dst").alias("vertex_id"))
                .agg(F.min("color").alias("in_color"))
            )
            merged = materialize(
                colors.join(incoming, "vertex_id", "left").select(
                    "vertex_id",
                    F.least(
                        "color", F.coalesce("in_color", "color")
                    ).alias("color"),
                )
            )
            changed = (
                merged.join(
                    colors.withColumnRenamed("color", "old"), "vertex_id"
                )
                .filter(F.col("color") != F.col("old"))
                .limit(1)
                .count()
            )
            release(colors)
            colors = merged
            if changed == 0:
                break

        # --- backward confirmation from every color root ----------------
        reached = materialize(
            colors.filter(F.col("color") == F.col("vertex_id")).select(
                "vertex_id", F.col("vertex_id").alias("root")
            )
        )
        frontier = reached
        while True:
            expanded = (
                frontier.withColumnRenamed("vertex_id", "dst")
                .join(active_e, "dst")
                .select(F.col("src").alias("vertex_id"), "root")
                .distinct()
                .join(colors, "vertex_id")
                .filter(F.col("color") == F.col("root"))
                .select("vertex_id", "root")
            )
            newly = materialize(
                expanded.join(reached, "vertex_id", "left_anti")
            )
            if frontier is not reached:
                release(frontier)
            if newly.isEmpty():
                release(newly)
                break
            nxt_reached = materialize(reached.unionByName(newly))
            release(reached)
            reached = nxt_reached
            frontier = newly
        release(colors)

        _assign(reached.select("vertex_id", F.col("root").alias("scc_id")))
        before = remaining.count()
        nxt_remaining = materialize(
            remaining.join(reached, "vertex_id", "left_anti")
        )
        release(remaining)
        release(reached)
        remaining = nxt_remaining
        if remaining.count() >= before:  # every round must peel something
            raise AssertionError("SCC peeling made no progress")
        nxt_e = materialize(
            active_e.join(
                remaining.withColumnRenamed("vertex_id", "src"),
                "src",
                "left_semi",
            ).join(
                remaining.withColumnRenamed("vertex_id", "dst"),
                "dst",
                "left_semi",
            )
        )
        release(active_e)
        active_e = nxt_e
        peel_round += 1
        _snapshot()
    release(active_e)
    release(remaining)
    if store is not None:
        store.save_df(f"{stage}_result", assigned)
        store.save_meta(meta_key, {"done": True})
        store.lineage(stage, -1, assigned, kind="scc_done")
    return assigned


def strongly_connected_components(
    dg: DiGraph,
    local_edges_threshold: int = 100_000,
    store=None,
    stage: str = "scc",
) -> DataFrame:
    """Return ``(vertex_id long, scc_id long)`` — scc_id = min member id.

    Adaptive dispatch like the undirected CC operator
    (operators/components.py): directed graphs at or below
    ``local_edges_threshold`` edges run iterative Kosaraju driver-side;
    larger graphs run the trim + coloring + backward-confirm peeling
    kernel.  Both paths produce identical labels (canonical min-id).
    ``store`` makes the distributed peel resumable mid-algorithm.
    """
    if dg.edges.count() <= local_edges_threshold:
        return _scc_driver(dg)
    return _scc_distributed(dg, store=store, stage=stage)


def condensation_edges(dg: DiGraph, scc: DataFrame) -> DataFrame:
    """Edges of the condensation DAG: ``(src_scc, dst_scc, weight)`` with
    summed weights, self-loops (intra-SCC edges) dropped — the directed
    analogue of structure.contract_graph."""
    s = scc.withColumnRenamed("vertex_id", "src").withColumnRenamed(
        "scc_id", "src_scc"
    )
    d = scc.withColumnRenamed("vertex_id", "dst").withColumnRenamed(
        "scc_id", "dst_scc"
    )
    return (
        dg.edges.join(s, "src")
        .join(d, "dst")
        .filter(F.col("src_scc") != F.col("dst_scc"))
        .groupBy("src_scc", "dst_scc")
        .agg(F.sum("weight").alias("weight"))
    )
