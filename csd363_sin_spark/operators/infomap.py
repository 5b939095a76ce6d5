"""Infomap enhancement — two-level map equation (SURVEY C5-C6).

Reference behavior (detection.py:144-240): screen every community with
>= 10 nodes and >= 1 intra edge by "local modularity" — which, being the
modularity of a single-community partition on its own subgraph, is
ALWAYS 0.0 (mirrored faithfully) — and re-partition each selected
community with Infomap("--two-level"), splicing module ids back under
fresh community ids.  The reference loops communities sequentially and
calls the C++ infomap binding; we run every selected community in
parallel as one group of an ``applyInPandas`` kernel, with our own
deterministic two-level map-equation optimizer (no external deps).

Map equation (Rosvall & Bergstrom 2008), two-level, undirected ergodic
flow (visit rate p_v = deg_v / 2m, module exit prob q_m = cut_m / 2m):

    L(M) = plogp(q) - 2*sum_m plogp(q_m) - sum_v plogp(p_v)
           + sum_m plogp(q_m + p_m)          with plogp(x) = x log2 x

Optimizer spec (deterministic; the sequential test oracle mirrors it):
greedy local moves over vertices in ascending id order, move to the
neighbor module with the largest strict codelength decrease (ties ->
smallest module id), passes until no move, then contract modules and
repeat while L improves; ``num_trials`` reruns with hash-permuted vertex
orders and keeps the lowest-codelength result (reference
infomap_wrapper.py:22-119 multi-trial best-of).
"""

from __future__ import annotations

import math
from collections import defaultdict

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from csd363_sin_spark.plans.induce import Graph
from csd363_sin_spark.plans.lineage import materialize


def _plogp(x: float) -> float:
    return x * math.log2(x) if x > 0 else 0.0


def map_equation_codelength(edges: list, partition: dict) -> float:
    """Two-level codelength of a partition of an undirected unweighted
    graph given as (u, v) edges.  Exposed for tests / metric parity."""
    m = len(edges)
    if m == 0:
        return 0.0
    deg = defaultdict(float)
    cut = defaultdict(float)
    p_mod = defaultdict(float)
    for u, v in edges:
        deg[u] += 1
        deg[v] += 1
        if partition[u] != partition[v]:
            cut[partition[u]] += 1
            cut[partition[v]] += 1
    for v, d in deg.items():
        p_mod[partition[v]] += d / (2.0 * m)
    mods = set(partition.values())
    q_m = {c: cut.get(c, 0.0) / (2.0 * m) for c in mods}
    q = sum(q_m.values())
    L = _plogp(q)
    L -= 2.0 * sum(_plogp(q_m[c]) for c in mods)
    L -= sum(_plogp(d / (2.0 * m)) for d in deg.values())
    L += sum(_plogp(q_m[c] + p_mod[c]) for c in mods)
    return L


def _mix(a: int, b: int) -> int:
    # deterministic 64-bit mix for trial-order permutations
    x = (a * 0x9E3779B97F4A7C15 + b * 0xC2B2AE3D27D4EB4F) & 0xFFFFFFFFFFFFFFFF
    x ^= x >> 29
    x = (x * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    x ^= x >> 32
    return x


def infomap_local(
    edges: list,
    vertices: list,
    num_trials: int = 1,
    max_passes: int = 32,
) -> tuple[dict, float]:
    """Deterministic two-level map-equation partition of a local graph.

    Returns (vertex -> module id, codelength).  Module ids are canonical
    (min vertex id in module).
    """
    vertices = sorted(set(vertices))
    cedges = []
    seen = set()
    for u, v in (tuple(sorted(e)) for e in edges):
        if u != v and (u, v) not in seen:
            seen.add((u, v))
            cedges.append((u, v))
    m = len(cedges)
    if m == 0:
        return {v: v for v in vertices}, 0.0

    adj = {v: [] for v in vertices}
    for u, v in cedges:
        adj[u].append(v)
        adj[v].append(u)

    best_part, best_L = None, None
    for trial in range(num_trials):
        if trial == 0:
            order = list(vertices)
        else:
            order = sorted(vertices, key=lambda v: (_mix(trial, v), v))
        part = _optimize(cedges, vertices, adj, order, max_passes)
        L = map_equation_codelength(cedges, part)
        if best_L is None or L < best_L - 1e-12:
            best_L, best_part = L, part

    # canonical module labels: min member id
    members = defaultdict(list)
    for v, c in best_part.items():
        members[c].append(v)
    relabel = {c: min(vs) for c, vs in members.items()}
    return {v: relabel[c] for v, c in best_part.items()}, best_L


def _optimize(cedges, vertices, adj, order, max_passes):
    """Greedy local moves + contraction on the flat vertex set."""
    # current flat assignment
    part = {v: v for v in vertices}
    L_prev = map_equation_codelength(cedges, part)
    while True:
        part = _local_moves(cedges, vertices, adj, order, part, max_passes)
        L = map_equation_codelength(cedges, part)
        if L >= L_prev - 1e-12:
            return part
        L_prev = L


def _local_moves(cedges, vertices, adj, order, part, max_passes):
    m = float(len(cedges))
    deg = defaultdict(float)
    for u, v in cedges:
        deg[u] += 1
        deg[v] += 1
    # module aggregates
    p_of = {v: deg[v] / (2.0 * m) for v in vertices}
    p_mod = defaultdict(float)
    cut = defaultdict(float)
    for v in vertices:
        p_mod[part[v]] += p_of[v]
    for u, v in cedges:
        if part[u] != part[v]:
            cut[part[u]] += 1.0
            cut[part[v]] += 1.0
    q_of = lambda c: cut[c] / (2.0 * m)

    def mod_terms(c):
        qc = q_of(c)
        return -2.0 * _plogp(qc) + _plogp(qc + p_mod[c])

    q_tot = sum(cut[c] for c in p_mod) / (2.0 * m)

    for _ in range(max_passes):
        moved = 0
        for v in order:
            cur = part[v]
            # weight to each neighbor module
            w_to = defaultdict(float)
            for nb in adj[v]:
                w_to[part[nb]] += 1.0
            cand_mods = sorted(set(w_to) | {cur})
            if len(cand_mods) == 1:
                continue
            kv = deg[v]
            pv = p_of[v]
            w_cur = w_to.get(cur, 0.0)

            best_delta, best_c = 0.0, cur
            before_cur = mod_terms(cur)
            for c in cand_mods:
                if c == cur:
                    continue
                w_c = w_to.get(c, 0.0)
                # simulate: remove v from cur, add to c
                d_cut_cur = -(kv - w_cur) + w_cur  # cut change for module cur
                d_cut_c = (kv - w_c) - w_c
                old_terms = before_cur + mod_terms(c)
                cut[cur] += d_cut_cur
                p_mod[cur] -= pv
                cut[c] += d_cut_c
                p_mod[c] += pv
                new_q_tot = q_tot + (d_cut_cur + d_cut_c) / (2.0 * m)
                new_terms = mod_terms(cur) + mod_terms(c)
                delta = (
                    (_plogp(new_q_tot) - _plogp(q_tot)) + (new_terms - old_terms)
                )
                # revert
                cut[cur] -= d_cut_cur
                p_mod[cur] += pv
                cut[c] -= d_cut_c
                p_mod[c] -= pv
                # cand_mods ascends, so strict-improvement keeps the
                # smallest module id among equal deltas
                if delta < best_delta - 1e-12:
                    best_delta, best_c = delta, c
            if best_c != cur:
                w_c = w_to.get(best_c, 0.0)
                cut[cur] += -(kv - w_cur) + w_cur
                p_mod[cur] -= pv
                cut[best_c] += (kv - w_c) - w_c
                p_mod[best_c] += pv
                q_tot += ((-(kv - w_cur) + w_cur) + ((kv - w_c) - w_c)) / (2.0 * m)
                part[v] = best_c
                moved += 1
        if moved == 0:
            break
    return dict(part)


def local_modularity_screen(
    graph: Graph, assign: DataFrame, modularity_threshold: float, min_size: int = 10
) -> DataFrame:
    """Communities eligible for Infomap enhancement (reference
    detection.py:171-191): >= min_size members, >= 1 intra edge, and
    single-community local modularity (identically 0.0 for any subgraph —
    computed faithfully) below the threshold."""
    sizes = assign.groupBy("comm").agg(F.count(F.lit(1)).alias("size"))
    a_src = assign.select(F.col("vertex_id").alias("src"), F.col("comm").alias("c1"))
    a_dst = assign.select(F.col("vertex_id").alias("dst"), F.col("comm").alias("c2"))
    intra_m = (
        graph.edges.join(a_src, "src")
        .join(a_dst, "dst")
        .filter(F.col("c1") == F.col("c2"))
        .groupBy(F.col("c1").alias("comm"))
        .agg(F.count(F.lit(1)).alias("m_sub"))
    )
    # local modularity of the trivial one-community partition:
    # Q = m_sub/m_sub - (2*m_sub/(2*m_sub))^2 = 0.0 exactly
    screened = (
        sizes.join(intra_m, "comm")
        .filter((F.col("size") >= min_size) & (F.col("m_sub") > 0))
        .withColumn("local_modularity", F.lit(0.0))
        .filter(F.col("local_modularity") < modularity_threshold)
    )
    return screened.select("comm")


def enhance_infomap(
    graph: Graph,
    assign: DataFrame,
    modularity_threshold: float = 0.3,
    min_size: int = 10,
    num_trials: int = 1,
) -> DataFrame:
    """Re-partition low-local-modularity communities with the map-equation
    kernel, splicing module ids under fresh community ids (reference
    detection.py:193-240).  All selected communities run in parallel as
    grouped-pandas tasks."""
    selected = local_modularity_screen(graph, assign, modularity_threshold, min_size)
    if selected.isEmpty():
        return assign

    a_src = assign.select(F.col("vertex_id").alias("src"), F.col("comm").alias("c1"))
    a_dst = assign.select(F.col("vertex_id").alias("dst"), F.col("comm").alias("c2"))
    intra = (
        graph.edges.join(a_src, "src")
        .join(a_dst, "dst")
        .filter(F.col("c1") == F.col("c2"))
        .select(F.col("c1").alias("comm"), "src", "dst")
        .join(selected, "comm", "left_semi")
    )
    members = assign.join(selected, "comm", "left_semi").select(
        "comm", F.col("vertex_id").alias("src"), F.lit(None).cast("long").alias("dst")
    )
    grouped = intra.unionByName(members)
    trials = num_trials

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
        part, _L = infomap_local(edges, sorted(verts), num_trials=trials)
        return pd.DataFrame(
            {
                "vertex_id": list(part.keys()),
                "parent": [comm] * len(part),
                "sub": [int(part[v]) for v in part],
            }
        )

    refined = grouped.groupBy("comm").applyInPandas(
        kernel, "vertex_id long, parent long, sub long"
    )
    refined = materialize(refined)

    # reference renumbers EVERY enhanced community (even single-module)
    max_comm = assign.agg(F.max("comm")).collect()[0][0] or 0
    pairs = refined.select("parent", "sub").distinct()
    from pyspark.sql import Window

    w = Window.orderBy("parent", "sub")  # tiny: one row per (parent, module)
    id_map = pairs.withColumn("new_comm", F.lit(int(max_comm)) + F.dense_rank().over(w))
    new_assign = refined.join(F.broadcast(id_map), ["parent", "sub"]).select(
        "vertex_id", F.col("new_comm").alias("comm")
    )
    return (
        assign.join(new_assign.select("vertex_id"), "vertex_id", "left_anti")
        .unionByName(new_assign)
    )


def infomap_multi_trial(
    graph: Graph, num_trials: int = 10
) -> tuple[DataFrame, float]:
    """Standalone multi-trial Infomap over each connected component in
    parallel (reference infomap_wrapper.py:22-119, fixed: the reference's
    node-indexing bug at :50 made it uncallable).  Returns (assign,
    total codelength = sum over components of best-trial codelength)."""
    from csd363_sin_spark.operators.components import connected_components

    comp = connected_components(graph)
    assign = comp.select("vertex_id", F.col("comp_id").alias("comm"))
    # reuse the grouped kernel with threshold so every component qualifies
    out = enhance_infomap(
        graph, assign, modularity_threshold=0.5, min_size=1, num_trials=num_trials
    )
    return out, map_equation_codelength_df(graph, out)


def map_equation_codelength_df(graph: Graph, assign: DataFrame) -> float:
    """Distributed two-level codelength of a partition — same formula as
    :func:`map_equation_codelength`, computed from the shared per-community
    half-edge aggregation (scales to the full graph; no collect)."""
    from csd363_sin_spark.functions.metrics import community_edge_stats

    m = float(graph.edges.count())
    if m == 0:
        return 0.0
    stats = community_edge_stats(graph, assign, weighted=False)
    plogp = lambda col: F.when(col > 0, col * F.log2(col)).otherwise(F.lit(0.0))
    q_m = F.col("cut") / (2.0 * m)
    p_m = F.col("vol") / (2.0 * m)
    row = stats.agg(
        F.sum(q_m).alias("q"),
        F.sum(plogp(q_m)).alias("sum_plogp_q"),
        F.sum(plogp(q_m + p_m)).alias("sum_plogp_qp"),
    ).collect()[0]
    deg = graph.degrees()
    p_v = F.col("degree") / (2.0 * m)
    vrow = deg.agg(F.sum(plogp(p_v)).alias("s")).collect()[0]
    q = float(row["q"] or 0.0)
    L = (q * math.log2(q) if q > 0 else 0.0)
    L -= 2.0 * float(row["sum_plogp_q"] or 0.0)
    L -= float(vrow["s"] or 0.0)
    L += float(row["sum_plogp_qp"] or 0.0)
    return L
