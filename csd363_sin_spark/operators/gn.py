"""Girvan-Newman refinement of large communities (SURVEY C2-C4, G5).

Reference behavior (detection.py:44-142): for every Louvain community
larger than ``size_threshold`` — extract its subgraph, run GN until
``target = max(2, min(target_subcommunities, n//10))`` subcommunities
(best-modularity split tracked, girvan_newman_wrapper.py:13-129), splice
the winning sub-partition back with fresh community ids.  The reference
loops communities sequentially in Python; we process ALL large communities
in parallel — each community's intra-edge set is one group of an
``applyInPandas`` kernel running the deterministic local GN
(csd363_sin_spark/functions/brandes.py).

For a community too large for one task, the same split can be driven by
the distributed Brandes kernel (operators/betweenness.py) + batch edge
removal (``remove_edges``) + connected components — the
``girvan_newman_distributed`` helper below; the grouped path is the
default because refined communities are bounded by the Louvain community
size distribution (reference run: 3 communities of ~10-40k nodes).

Splice id rule (reference detection.py:121-130 uses a driver counter):
deterministic instead — new id = max(comm) + 1 + dense_rank(parent_comm,
sub_comm), identical under any execution order.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from csd363_sin_spark.functions.brandes import girvan_newman_local
from csd363_sin_spark.plans.induce import Graph
from csd363_sin_spark.plans.lineage import materialize


def remove_edges(edges: DataFrame, to_remove: DataFrame) -> DataFrame:
    """Immutable edge removal (reference girvan_newman_wrapper.py:224):
    anti-join on both orientations of (src, dst)."""
    canon = to_remove.select(
        F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
    )
    return edges.join(canon, ["src", "dst"], "left_anti")


def _refine_gn_driver(
    graph: Graph,
    assign: DataFrame,
    size_threshold: int,
    target_subcommunities: int,
    max_iterations: int | None,
    betweenness_sources: int | None,
    dispatch_threshold: int,
) -> DataFrame | None:
    """Driver-side refine for a graph small enough to collect — the SAME
    selection, kernel (girvan_newman_local with all members incl.
    isolates), split filter, and dense-rank splice as the grouped path,
    so outputs are identical (dispatch-parity covered by the grouped-path
    tests forced via local_edges_threshold=0).  Returns None when any
    large community exceeds dispatch_threshold (distributed kernel's
    case)."""
    from collections import defaultdict

    comm_of = {
        int(r["vertex_id"]): int(r["comm"])
        for r in assign.select("vertex_id", "comm").collect()
    }
    sizes: dict = defaultdict(int)
    for c in comm_of.values():
        sizes[c] += 1
    large = sorted(c for c, n in sizes.items() if n > size_threshold)
    if not large:
        return assign
    if any(sizes[c] > dispatch_threshold for c in large):
        return None
    large_set = set(large)
    intra: dict = defaultdict(list)
    for r in graph.edges.select("src", "dst").collect():
        u, v = int(r["src"]), int(r["dst"])
        cu = comm_of.get(u)
        if cu is not None and cu in large_set and comm_of.get(v) == cu:
            intra[cu].append((u, v))
    members: dict = defaultdict(list)
    for v, c in comm_of.items():
        if c in large_set:
            members[c].append(v)

    refined: list = []
    for c in large:
        edges = intra.get(c, [])
        verts = set(members[c])
        verts.update(x for e in edges for x in e)
        n = len(verts)
        if n < 3 or len(set(map(tuple, map(sorted, edges)))) < 2:
            sub = {v: 0 for v in verts}
        else:
            target = max(2, min(target_subcommunities, n // 10))
            sub = girvan_newman_local(
                edges,
                sorted(verts),
                max_communities=target,
                max_iterations=max_iterations,
                betweenness_sources=betweenness_sources,
            )
        refined.extend((v, c, int(s)) for v, s in sub.items())

    # only splice parents that actually split
    subs_per_parent: dict = defaultdict(set)
    for _, p, s in refined:
        subs_per_parent[p].add(s)
    multi = {p for p, ss in subs_per_parent.items() if len(ss) > 1}
    refined = [(v, p, s) for v, p, s in refined if p in multi]
    if not refined:
        return assign
    max_comm = max(comm_of.values(), default=0)
    pairs = sorted({(p, s) for _, p, s in refined})
    idmap = {ps: max_comm + i + 1 for i, ps in enumerate(pairs)}
    new_comm = {v: idmap[(p, s)] for v, p, s in refined}
    out = [(v, new_comm.get(v, c)) for v, c in comm_of.items()]
    from csd363_sin_spark.plans.lineage import materialize as _mat

    return _mat(
        graph.edges.sparkSession.createDataFrame(out, "vertex_id long, comm long")
    )


def refine_girvan_newman(
    graph: Graph,
    assign: DataFrame,
    size_threshold: int,
    target_subcommunities: int = 5,
    max_iterations: int | None = None,
    betweenness_sources: int | None = None,
    dispatch_threshold: int = 10_000,
    local_edges_threshold: int = 100_000,
    store=None,
    stage: str = "gn_refine",
) -> DataFrame:
    """Refine communities with > ``size_threshold`` members; returns a new
    ``(vertex_id, comm)`` assignment.

    ``store`` (a checkpoint.CheckpointStore) is forwarded to each huge
    community's :func:`girvan_newman_distributed` run (stage key
    ``{stage}_c{comm}``), so a killed refine resumes mid-removal-loop
    inside whichever community it died in.

    Size-based dispatch (reference girvan_newman_wrapper.py:29-31 switches
    exact -> optimized at 10k nodes): communities up to
    ``dispatch_threshold`` members run as grouped-pandas tasks (one
    community per group, all in parallel); anything larger routes through
    :func:`girvan_newman_distributed` on the community subgraph so a huge
    community never serializes into a single executor task.  Both paths
    feed the same splice (parent, sub) machinery, so ids are identical
    regardless of which path produced a split.  Graphs at or below
    ``local_edges_threshold`` edges run the whole refine driver-side
    (identical selection/kernel/splice, see ``_refine_gn_driver``).
    """
    if (
        local_edges_threshold > 0
        and graph.edges.count() <= local_edges_threshold
    ):
        out = _refine_gn_driver(
            graph, assign, size_threshold, target_subcommunities,
            max_iterations, betweenness_sources, dispatch_threshold,
        )
        if out is not None:
            return out
    spark = graph.edges.sparkSession
    sizes = assign.groupBy("comm").agg(F.count(F.lit(1)).alias("size"))
    sizes = sizes.filter(F.col("size") > size_threshold).persist()
    large = sizes.select("comm")
    if large.isEmpty():
        sizes.unpersist()
        return assign
    # huge communities are FEW by construction (they're the tail of the
    # Louvain size distribution); collecting their (comm, size) rows is a
    # handful of rows, not a driver bottleneck.
    huge_rows = sizes.filter(F.col("size") > dispatch_threshold).collect()
    huge_ids = {int(r["comm"]) for r in huge_rows}
    grouped_comms = sizes.filter(F.col("size") <= dispatch_threshold).select("comm")
    sizes.unpersist()

    a_src = assign.select(F.col("vertex_id").alias("src"), F.col("comm").alias("c1"))
    a_dst = assign.select(F.col("vertex_id").alias("dst"), F.col("comm").alias("c2"))
    intra_all = (
        graph.edges.join(a_src, "src")
        .join(a_dst, "dst")
        .filter(F.col("c1") == F.col("c2"))
        .select(F.col("c1").alias("comm"), "src", "dst")
        .join(large, "comm", "left_semi")
    )
    if huge_ids:
        intra_all = intra_all.persist()
    intra = intra_all.join(grouped_comms, "comm", "left_semi")
    members = assign.join(grouped_comms, "comm", "left_semi").select(
        "comm", F.col("vertex_id").alias("src"), F.lit(None).cast("long").alias("dst")
    )
    grouped = intra.unionByName(members)

    max_iter = max_iterations
    target_cap = target_subcommunities
    k_sources = betweenness_sources

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        comm = int(pdf["comm"].iloc[0])
        edge_mask = pdf["dst"].notna()
        edges = list(
            zip(
                pdf.loc[edge_mask, "src"].astype("int64"),
                pdf.loc[edge_mask, "dst"].astype("int64"),
            )
        )
        verts = set(pdf["src"].astype("int64"))
        verts.update(v for e in edges for v in e)
        n = len(verts)
        # reference detection.py:88-99: skip tiny; target by size
        if n < 3 or len(set(map(tuple, map(sorted, edges)))) < 2:
            sub = {v: 0 for v in verts}
        else:
            target = max(2, min(target_cap, n // 10))
            sub = girvan_newman_local(
                edges,
                sorted(verts),
                max_communities=target,
                max_iterations=max_iter,
                betweenness_sources=k_sources,
            )
        return pd.DataFrame(
            {
                "vertex_id": list(sub.keys()),
                "parent": [comm] * len(sub),
                "sub": [int(sub[v]) for v in sub],
            }
        )

    refined = grouped.groupBy("comm").applyInPandas(
        kernel, "vertex_id long, parent long, sub long"
    )
    refined = materialize(refined)

    # distributed path for huge communities: same target rule, same
    # (parent, sub) output shape — min-vertex sub labels on both paths.
    for r in sorted(huge_rows, key=lambda r: int(r["comm"])):
        comm, n = int(r["comm"]), int(r["size"])
        sub_edges = (
            intra_all.filter(F.col("comm") == comm)
            .select("src", "dst", F.lit(1.0).alias("weight"))
        )
        sub_verts = assign.filter(F.col("comm") == comm).select("vertex_id")
        target = max(2, min(target_cap, n // 10))
        ks = k_sources if k_sources is not None else min(1000, n // 2)
        # reference girvan_newman_wrapper.py:220-224 removes the top
        # min(20, E/10) betweenness edges per round — one (sampled) Brandes
        # pass per removed edge is the dominant cost, so peeling one edge
        # at a time would make a 300k-node community ~20x slower
        e_cnt = sub_edges.count()
        sub_assign = girvan_newman_distributed(
            Graph(vertices=sub_verts, edges=sub_edges),
            max_communities=target,
            max_iterations=max_iter if max_iter is not None else 50,
            k_sources=ks,
            batch_remove=min(20, max(1, e_cnt // 10)),
            store=store,
            stage=f"{stage}_c{comm}",
        )
        refined = refined.unionByName(
            sub_assign.select(
                "vertex_id", F.lit(comm).alias("parent"), F.col("comm").alias("sub")
            )
        )
    if huge_ids:
        refined = materialize(refined)
        intra_all.unpersist()

    # only splice parents that actually split (reference detection.py:118-136)
    multi = (
        refined.groupBy("parent")
        .agg(F.countDistinct("sub").alias("k"))
        .filter(F.col("k") > 1)
        .select("parent")
    )
    refined = refined.join(multi, "parent", "left_semi")
    if refined.isEmpty():
        return assign

    max_comm = assign.agg(F.max("comm")).collect()[0][0] or 0
    pairs = refined.select("parent", "sub").distinct()
    from pyspark.sql import Window

    w = Window.orderBy("parent", "sub")  # tiny: one row per new subcommunity
    id_map = pairs.withColumn(
        "new_comm", F.lit(int(max_comm)) + F.dense_rank().over(w)
    )
    new_assign = (
        refined.join(F.broadcast(id_map), ["parent", "sub"])
        .select("vertex_id", F.col("new_comm").alias("comm"))
    )
    return (
        assign.join(new_assign.select("vertex_id"), "vertex_id", "left_anti")
        .unionByName(new_assign)
    )


def girvan_newman_distributed(
    graph: Graph,
    max_communities: int,
    max_iterations: int = 50,
    k_sources: int | None = None,
    batch_remove: int = 1,
    store=None,
    stage: str = "gn_dist",
) -> DataFrame:
    """Whole-graph GN split via the distributed Brandes kernel — the scale
    path for a community too large for one grouped task (reference
    run_optimized_girvan_newman, girvan_newman_wrapper.py:131-276, incl.
    its batch removal of the top-k betweenness edges per round :220-224).

    Returns (vertex_id, comm) where comm = component min-vertex label.

    Best-modularity tracking mirrors the grouped/local kernel
    (functions/brandes.py girvan_newman_local): every partition reached
    after a split is scored on the ORIGINAL edge set and the best split
    wins; the unsplit starting partition is never a candidate, so both
    paths agree on "did this community actually split".

    ``store`` (a checkpoint.CheckpointStore) makes the removal loop
    resumable mid-algorithm (north rule): each round snapshots the
    surviving edge set, the best split so far, and the loop counters, and
    appends a lineage row; a relaunched call continues from the newest
    complete round.
    """
    from csd363_sin_spark.functions.metrics import modularity
    from csd363_sin_spark.operators.betweenness import edge_betweenness
    from csd363_sin_spark.operators.components import connected_components

    spark = graph.edges.sparkSession
    edges = graph.edges
    n0: int | None = None
    best_q, best = None, None
    comp = None
    start_round = 0

    meta_key = f"{stage}_state"
    if store is not None and store.has_meta(meta_key):
        meta = store.load_meta(meta_key)
        if meta.get("done"):
            return materialize(store.load_df(spark, f"{stage}_result"))
        edges = materialize(store.load_df(spark, f"{stage}_edges"))
        if store.has_df(f"{stage}_best"):
            best = materialize(store.load_df(spark, f"{stage}_best"))
        best_q = meta["best_q"]
        n0 = meta["n0"]
        start_round = meta["round"]

    def _snapshot(round_next: int) -> None:
        if store is None:
            return
        store.save_df(f"{stage}_edges", edges)
        if best is not None:
            store.save_df(f"{stage}_best", best)
        store.save_meta(
            meta_key,
            {"round": round_next, "best_q": best_q, "n0": n0, "done": False},
        )
        store.lineage(stage, round_next, edges, kind="gn_round", best_q=best_q)

    def _finish(result: DataFrame) -> DataFrame:
        if store is not None:
            store.save_df(f"{stage}_result", result)
            store.save_meta(meta_key, {"done": True})
            store.lineage(stage, -1, result, kind="gn_done")
        return result

    from csd363_sin_spark.plans.lineage import release

    def _track_best(q: float, candidate: DataFrame) -> None:
        nonlocal best_q, best
        if best_q is None or q > best_q:
            if best is not None and best is not candidate:
                release(best)
            best_q, best = q, candidate

    for _round in range(start_round, max_iterations):
        g = Graph(vertices=graph.vertices, edges=edges)
        prev_comp = comp
        comp = materialize(
            connected_components(g).select("vertex_id", F.col("comp_id").alias("comm"))
        )
        if prev_comp is not None and prev_comp is not best:
            release(prev_comp)
        n_comp = comp.select("comm").distinct().count()
        if n0 is None:
            n0 = n_comp
        elif n_comp > n0:
            _track_best(modularity(graph, comp, weighted=False), comp)
        if n_comp >= max_communities:
            break
        bet = edge_betweenness(g, k_sources=k_sources)
        top = (
            bet.orderBy(F.desc("betweenness"), F.asc("src"), F.asc("dst"))
            .limit(batch_remove)
            .select("src", "dst")
        )
        prev_edges = edges
        edges = materialize(remove_edges(edges, top))
        release(bet)  # top was folded into the new edge set
        if prev_edges is not graph.edges:
            release(prev_edges)
        if edges.isEmpty():
            g = Graph(vertices=graph.vertices, edges=edges)
            prev_comp = comp
            comp = materialize(
                connected_components(g).select(
                    "vertex_id", F.col("comp_id").alias("comm")
                )
            )
            if prev_comp is not None and prev_comp is not best:
                release(prev_comp)
            _track_best(modularity(graph, comp, weighted=False), comp)
            break
        _snapshot(_round + 1)
    if best is None and comp is None:
        # resumed exactly at start_round >= max_iterations: the loop body
        # never ran — label the restored edge set so _finish has a result
        comp = materialize(
            connected_components(Graph(vertices=graph.vertices, edges=edges)).select(
                "vertex_id", F.col("comp_id").alias("comm")
            )
        )
    return _finish(best if best is not None else comp)
