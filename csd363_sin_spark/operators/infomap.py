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

Optimizer spec (deterministic): MULTILEVEL greedy — local moves over
vertices in ascending id order (move to the module with the largest
strict codelength decrease, ties -> smallest module id; weighted
internals), then contract modules into supernodes and repeat the moves
on the contracted graph while the codelength improves (the north star's
"repeated greedy module merge").  ``num_trials`` reruns with
hash-permuted vertex orders and keeps the lowest-codelength result
(reference infomap_wrapper.py:22-119 multi-trial best-of).  Anchored on
Zachary's karate club: 3 modules, L=4.3118 bits, matching published
Infomap output.
"""

from __future__ import annotations

import math
from collections import defaultdict

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from csd363_sin_spark.plans.induce import Graph
from csd363_sin_spark.plans.lineage import adopt, materialize, release


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
    """Deterministic multilevel two-level-map-equation partition.

    Louvain-style optimization of the map equation: greedy local moves,
    then module contraction and moves on the supernode graph (the "greedy
    module merge" of the north star), repeated while the codelength
    drops.  Returns (vertex -> module id, codelength); module ids are
    canonical (min vertex id in module).
    """
    vertices = sorted(set(vertices))
    cedges = defaultdict(float)
    for u, v in (tuple(sorted(e)) for e in edges):
        if u != v:
            cedges[(u, v)] += 1.0
    if not cedges:
        return {v: v for v in vertices}, 0.0
    cedges = dict(cedges)

    best_part, best_L = None, None
    for trial in range(num_trials):
        shuffle_key = None if trial == 0 else (lambda v, t=trial: (_mix(t, v), v))
        part = _optimize_multilevel(cedges, vertices, shuffle_key, max_passes)
        L = _codelength_w(cedges, {v: 0.0 for v in vertices}, part)
        if best_L is None or L < best_L - 1e-12:
            best_L, best_part = L, part

    members = defaultdict(list)
    for v, c in best_part.items():
        members[c].append(v)
    relabel = {c: min(vs) for c, vs in members.items()}
    return {v: relabel[c] for v, c in best_part.items()}, best_L


def _codelength_w(cedges: dict, self_loops_unused, partition: dict) -> float:
    """Weighted two-level codelength; ``cedges`` maps (u,v) u<=v -> w
    (u==v rows are module-internal self-loops from contraction)."""
    strength = defaultdict(float)
    cut = defaultdict(float)
    p_mod = defaultdict(float)
    W = 0.0
    for (u, v), w in cedges.items():
        W += w
        if u == v:
            strength[u] += 2.0 * w
        else:
            strength[u] += w
            strength[v] += w
            if partition[u] != partition[v]:
                cut[partition[u]] += w
                cut[partition[v]] += w
    if W == 0.0:
        return 0.0
    for v, s in strength.items():
        p_mod[partition[v]] += s / (2.0 * W)
    mods = set(partition.values())
    q_m = {c: cut.get(c, 0.0) / (2.0 * W) for c in mods}
    q = sum(q_m.values())
    L = _plogp(q)
    L -= 2.0 * sum(_plogp(q_m[c]) for c in mods)
    L -= sum(_plogp(s / (2.0 * W)) for s in strength.values())
    L += sum(_plogp(q_m[c] + p_mod[c]) for c in mods)
    return L


def _optimize_multilevel(cedges, vertices, shuffle_key, max_passes):
    """Local moves + contraction levels until codelength stops improving.
    Returns vertex -> module id on the ORIGINAL vertex set."""
    level_edges = dict(cedges)
    level_verts = list(vertices)
    composed = {v: v for v in vertices}
    L_prev = _codelength_w(cedges, None, composed)
    while True:
        order = (
            sorted(level_verts, key=shuffle_key) if shuffle_key else list(level_verts)
        )
        assign = _local_moves_w(level_edges, level_verts, order, max_passes)
        new_composed = {v: assign[composed[v]] for v in vertices}
        L = _codelength_w(cedges, None, new_composed)
        if L >= L_prev - 1e-10:
            return composed
        composed = new_composed
        L_prev = L
        # contract modules into supernodes (weights + self-loops aggregate)
        agg = defaultdict(float)
        for (u, v), w in level_edges.items():
            a, b = assign[u], assign[v]
            if a > b:
                a, b = b, a
            agg[(a, b)] += w
        level_edges = dict(agg)
        level_verts = sorted(set(assign.values()))
        if len(level_verts) <= 1:
            return composed


def _local_moves_w(cedges, vertices, order, max_passes):
    """Weighted greedy local moves minimizing the map equation.

    Deterministic: vertices visited in ``order``; move to the module with
    the largest strict codelength decrease (candidates ascending, so ties
    keep the smallest module id)."""
    W = sum(cedges.values())
    strength = defaultdict(float)
    self_w = defaultdict(float)
    adj = defaultdict(dict)
    for (u, v), w in cedges.items():
        if u == v:
            strength[u] += 2.0 * w
            self_w[u] += w
        else:
            strength[u] += w
            strength[v] += w
            adj[u][v] = adj[u].get(v, 0.0) + w
            adj[v][u] = adj[v].get(u, 0.0) + w

    part = {v: v for v in vertices}
    p_of = {v: strength.get(v, 0.0) / (2.0 * W) for v in vertices}
    p_mod = defaultdict(float)
    cut = defaultdict(float)
    for v in vertices:
        p_mod[part[v]] += p_of[v]
    for (u, v), w in cedges.items():
        if u != v and part[u] != part[v]:
            cut[part[u]] += w
            cut[part[v]] += w

    def mod_terms(c):
        qc = cut[c] / (2.0 * W)
        return -2.0 * _plogp(qc) + _plogp(qc + p_mod[c])

    q_tot = sum(cut[c] for c in p_mod) / (2.0 * W)

    for _ in range(max_passes):
        moved = 0
        for v in order:
            cur = part[v]
            w_to = defaultdict(float)
            for nb, w in adj[v].items():
                w_to[part[nb]] += w
            cand_mods = sorted(set(w_to) | {cur})
            if len(cand_mods) == 1:
                continue
            kv = strength.get(v, 0.0)
            pv = p_of[v]
            w_cur = w_to.get(cur, 0.0)

            best_delta, best_c = 0.0, cur
            before_cur = mod_terms(cur)
            for c in cand_mods:
                if c == cur:
                    continue
                w_c = w_to.get(c, 0.0)
                ext_v = kv - 2.0 * self_w.get(v, 0.0)  # v's non-self strength
                d_cut_cur = -(ext_v - w_cur) + w_cur
                d_cut_c = (ext_v - w_c) - w_c
                old_terms = before_cur + mod_terms(c)
                cut[cur] += d_cut_cur
                p_mod[cur] -= pv
                cut[c] += d_cut_c
                p_mod[c] += pv
                new_q_tot = q_tot + (d_cut_cur + d_cut_c) / (2.0 * W)
                new_terms = mod_terms(cur) + mod_terms(c)
                delta = (_plogp(new_q_tot) - _plogp(q_tot)) + (new_terms - old_terms)
                cut[cur] -= d_cut_cur
                p_mod[cur] += pv
                cut[c] -= d_cut_c
                p_mod[c] -= pv
                # cand_mods ascends: strict improvement keeps smallest id
                if delta < best_delta - 1e-12:
                    best_delta, best_c = delta, c
            if best_c != cur:
                w_c = w_to.get(best_c, 0.0)
                ext_v = kv - 2.0 * self_w.get(v, 0.0)
                cut[cur] += -(ext_v - w_cur) + w_cur
                p_mod[cur] -= pv
                cut[best_c] += (ext_v - w_c) - w_c
                p_mod[best_c] += pv
                q_tot += ((-(ext_v - w_cur) + w_cur) + ((ext_v - w_c) - w_c)) / (
                    2.0 * W
                )
                part[v] = best_c
                moved += 1
        if moved == 0:
            break
    return dict(part)


def flow_power_iteration(
    graph: Graph, iterations: int = 40, weighted: bool = True
) -> DataFrame:
    """Ergodic visit rates of the undirected random walk via LAZY power
    iteration (north star: "map-equation flow as a PageRank-style power
    iteration").  Returns ``(vertex_id, p)``.

    For an undirected graph the stationary distribution is degree-
    proportional in closed form (p_v = s_v / 2W); the lazy walk
    (1/2 stay + 1/2 step) removes bipartite period-2 oscillation so the
    iteration converges to exactly that.  The distributed optimizer uses
    the closed form directly; tests/test_infomap.py proves the two agree
    to 1e-9, which is the justification for skipping the iteration in the
    hot path.
    """
    w = F.col("weight") if weighted else F.lit(1.0)
    sym = (
        graph.edges.filter(F.col("src") != F.col("dst"))
        .select("src", "dst", w.alias("w"))
        .unionAll(
            graph.edges.filter(F.col("src") != F.col("dst")).select(
                F.col("dst").alias("src"), F.col("src").alias("dst"), w.alias("w")
            )
        )
    )
    strength = sym.groupBy(F.col("src").alias("vertex_id")).agg(F.sum("w").alias("s"))
    # out-share per directed half-edge: w / s_src
    share = materialize(
        sym.join(strength.withColumnRenamed("vertex_id", "src"), "src").select(
            "src", "dst", (F.col("w") / F.col("s")).alias("share")
        )
    )
    n = graph.vertices.count()
    p = materialize(
        graph.vertices.select("vertex_id", (F.lit(1.0) / n).alias("p"))
    )
    for _ in range(iterations):
        inflow = (
            share.join(p.withColumnRenamed("vertex_id", "src"), "src")
            .groupBy(F.col("dst").alias("vertex_id"))
            .agg(F.sum(F.col("share") * F.col("p")).alias("inp"))
        )
        old_p = p
        p = materialize(
            p.join(inflow, "vertex_id", "left")
            .fillna({"inp": 0.0})
            .select(
                "vertex_id", (0.5 * F.col("p") + 0.5 * F.col("inp")).alias("p")
            )
        )
        release(old_p)
    release(share)
    return p


def _infomap_move_phase(
    edges: DataFrame, vertices: DataFrame, max_supersteps: int,
    delta_kin: bool = False,
    delta_arm_threshold: int | None = None,
) -> tuple[DataFrame, int]:
    """Synchronous map-equation local moves on one level graph.

    ``edges`` canonical (src <= dst, weight; src==dst rows are
    contraction self-loops).  Same move rule as ``_local_moves_w`` —
    move to the module with the largest strict codelength decrease, ties
    to the smallest module id — evaluated for ALL vertices at once from
    three aggregates (neighbor-module weights, module stats, total exit
    flow), with the same monotone down-only id gating as
    operators/louvain.py so the synchronous schedule provably terminates.
    Returns (assign, supersteps_used).

    ``delta_kin``: the neighbor-module weight table w_to(v, c) is
    maintained incrementally from the previous superstep's movers (same
    frontier-delta scheme, exactness gate, arming rule, and measured
    DEFAULT-OFF decision as operators/louvain.py::_local_move_phase —
    level-0 weights are 1.0 and contraction sums keep them integral, so
    delta merging is exact); bit-identical to full recompute, asserted by
    tests/test_delta_supersteps.py::test_move_phase_delta_parity.
    """
    plogp = lambda c: F.when(c > 0, c * F.log2(c)).otherwise(F.lit(0.0))  # noqa: E731

    spark = edges.sparkSession
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    # pre-partition by the per-superstep join key so only the assignment
    # side exchanges each superstep (see operators/louvain.py)
    sym = (
        edges.filter(F.col("src") != F.col("dst"))
        .select("src", "dst", "weight")
        .unionAll(
            edges.filter(F.col("src") != F.col("dst")).select(
                F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"
            )
        )
        .repartition(n_part, "dst")
        .persist()
    )
    from csd363_sin_spark.operators.louvain import _strengths

    W_row = edges.agg(F.sum("weight")).collect()[0][0]
    W = float(W_row or 0.0)
    if W == 0.0:
        sym.unpersist()
        return vertices.select("vertex_id", F.col("vertex_id").alias("comm")), 0
    self_w = edges.filter(F.col("src") == F.col("dst")).select(
        F.col("src").alias("vertex_id"), F.col("weight").alias("self_w")
    )
    static = materialize(
        vertices.join(_strengths(edges), "vertex_id", "left")
        .join(self_w, "vertex_id", "left")
        .fillna({"k": 0.0, "self_w": 0.0})
        .select(
            "vertex_id",
            (F.col("k") / (2.0 * W)).alias("p_v"),
            (F.col("k") - 2.0 * F.col("self_w")).alias("ext"),
        )
    )
    assign = materialize(vertices.select("vertex_id", F.col("vertex_id").alias("comm")))

    use_delta = delta_kin and edges.filter(
        F.col("weight") != F.floor("weight")
    ).isEmpty()
    n_verts = vertices.count()
    arm_threshold = (
        delta_arm_threshold
        if delta_arm_threshold is not None
        else min(1_000_000, max(1, n_verts // 8))
    )
    armed = False
    wto_cache = None
    moved = None

    step = 0
    for step in range(max_supersteps):
        if moved is None:
            a_dst = assign.select(
                F.col("vertex_id").alias("dst"), F.col("comm").alias("c_nbr")
            )
            w_to_new = (
                sym.join(a_dst, "dst")
                .groupBy(F.col("src").alias("vertex_id"), "c_nbr")
                .agg(F.sum("weight").alias("w_nbr"))
            )
        else:
            delta = (
                sym.join(F.broadcast(moved), "dst")
                .select(
                    F.col("src").alias("vertex_id"),
                    F.explode(
                        F.array(
                            F.struct(
                                F.col("c_old").alias("c_nbr"),
                                (-F.col("weight")).alias("dw"),
                            ),
                            F.struct(
                                F.col("c_new").alias("c_nbr"),
                                F.col("weight").alias("dw"),
                            ),
                        )
                    ).alias("d"),
                )
                .select("vertex_id", "d.c_nbr", "d.dw")
            )
            w_to_new = (
                wto_cache.select("vertex_id", "c_nbr", F.col("w_nbr").alias("dw"))
                .unionAll(delta)
                .groupBy("vertex_id", "c_nbr")
                .agg(F.sum("dw").alias("w_nbr"))
                .filter(F.col("w_nbr") != 0.0)
            )
        if armed:
            w_to = materialize(w_to_new)
            release(wto_cache)
            wto_cache = w_to
        else:
            w_to = w_to_new.persist()
        w_cur_df = w_to.join(
            assign.withColumnRenamed("comm", "c_nbr"), ["vertex_id", "c_nbr"]
        ).select("vertex_id", F.col("w_nbr").alias("w_cur"))
        vstate = materialize(
            assign.join(static, "vertex_id")
            .join(w_cur_df, "vertex_id", "left")
            .fillna({"w_cur": 0.0})
            .withColumn("cut_v", F.col("ext") - F.col("w_cur"))
        )
        mod_stats = materialize(
            vstate.groupBy("comm").agg(
                F.sum("p_v").alias("p_mod"), F.sum("cut_v").alias("cut")
            )
        )
        q_tot = float(
            (mod_stats.agg(F.sum("cut")).collect()[0][0] or 0.0)
        ) / (2.0 * W)

        cur_stats = mod_stats.select(
            "comm", F.col("p_mod").alias("pm_cur"), F.col("cut").alias("cut_cur")
        )
        nbr_stats = mod_stats.select(
            F.col("comm").alias("c_nbr"),
            F.col("p_mod").alias("pm_c"),
            F.col("cut").alias("cut_c"),
        )
        cand = (
            w_to.join(vstate, "vertex_id")
            .filter(F.col("c_nbr") < F.col("comm"))  # down-only gating
            .join(cur_stats, "comm")
            .join(nbr_stats, "c_nbr")
        )
        d_cut_cur = 2.0 * F.col("w_cur") - F.col("ext")
        d_cut_c = F.col("ext") - 2.0 * F.col("w_nbr")
        modterm = lambda cut, pm: -2.0 * plogp(cut / (2.0 * W)) + plogp(  # noqa: E731
            cut / (2.0 * W) + pm
        )
        q2 = F.lit(q_tot) + (d_cut_cur + d_cut_c) / (2.0 * W)
        delta = (
            plogp(q2)
            - plogp(F.lit(q_tot))
            + modterm(F.col("cut_cur") + d_cut_cur, F.col("pm_cur") - F.col("p_v"))
            + modterm(F.col("cut_c") + d_cut_c, F.col("pm_c") + F.col("p_v"))
            - modterm(F.col("cut_cur"), F.col("pm_cur"))
            - modterm(F.col("cut_c"), F.col("pm_c"))
        )
        best = (
            cand.select("vertex_id", "c_nbr", delta.alias("delta"))
            .filter(F.col("delta") < -1e-12)
            .groupBy("vertex_id")
            .agg(F.min(F.struct("delta", "c_nbr")).alias("b"))
            .select("vertex_id", F.col("b.c_nbr").alias("next_comm"))
        )
        next_assign = materialize(
            assign.join(best, "vertex_id", "left").select(
                "vertex_id",
                F.coalesce("next_comm", "comm").alias("comm"),
                F.col("next_comm").isNotNull().alias("_moved"),
            )
        )
        if not armed:
            w_to.unpersist()
        moves = next_assign.filter(F.col("_moved")).count()
        old_moved = moved
        if use_delta and 0 < moves <= arm_threshold:
            if armed:
                moved = materialize(
                    next_assign.filter(F.col("_moved"))
                    .select(
                        F.col("vertex_id").alias("dst"),
                        F.col("comm").alias("c_new"),
                    )
                    .join(
                        assign.select(
                            F.col("vertex_id").alias("dst"),
                            F.col("comm").alias("c_old"),
                        ),
                        "dst",
                    )
                )
            else:
                # arm: next superstep full-recomputes into the cache;
                # delta merging starts the superstep after
                armed = True
                moved = None
        else:
            moved = None
        release(old_moved)
        release(vstate)
        release(mod_stats)
        old_assign = assign
        assign = adopt(next_assign.select("vertex_id", "comm"), next_assign)
        release(old_assign)
        if moves == 0:
            break
    sym.unpersist()
    release(wto_cache)
    release(moved)
    return assign, step + 1


def infomap_distributed(
    graph: Graph,
    max_levels: int = 10,
    max_supersteps: int = 64,
    min_gain: float = 1e-10,
    store=None,
    stage: str = "infomap_dist",
) -> tuple[DataFrame, float]:
    """Distributed multilevel two-level-map-equation partition — the scale
    path of :func:`enhance_infomap` for communities too large for one
    grouped-pandas task (north star: flow + repeated greedy module merge
    over edge DataFrames).

    Same optimization spec as :func:`infomap_local` with synchronous
    instead of sequential moves: local-move phases (down-only gated, see
    ``_infomap_move_phase``), then module contraction, repeated while the
    codelength of the composed partition on the ORIGINAL graph improves.
    The graph is treated as unweighted at level 0 (reference add_link
    semantics); contraction introduces weights exactly as the local
    kernel's weighted contraction does.  Returns ``((vertex_id, comm),
    codelength)`` with canonical min-vertex-id module labels.

    ``store`` (a checkpoint.CheckpointStore) makes the level loop
    resumable mid-algorithm: every completed level snapshots the
    contracted graph + composed partition + codelength and appends a
    lineage row; a relaunched call continues from the newest level.
    """
    from csd363_sin_spark.operators.louvain import _contract

    spark = graph.edges.sparkSession
    edges = materialize(
        graph.edges.filter(F.col("src") != F.col("dst")).select(
            "src", "dst", F.lit(1.0).alias("weight")
        )
    )
    vertices = materialize(graph.vertices.select("vertex_id"))
    composed = materialize(
        vertices.select("vertex_id", F.col("vertex_id").alias("comm"))
    )
    L_prev = map_equation_codelength_df(graph, composed)
    start_level = 0

    meta_key = f"{stage}_state"
    if store is not None and store.has_meta(meta_key):
        meta = store.load_meta(meta_key)
        composed = materialize(store.load_df(spark, f"{stage}_composed"))
        L_prev = meta["L_prev"]
        if meta.get("done"):
            return composed, L_prev
        edges = materialize(store.load_df(spark, f"{stage}_edges"))
        vertices = materialize(store.load_df(spark, f"{stage}_vertices"))
        start_level = meta["level"]

    def _snapshot(level_next: int, done: bool) -> None:
        if store is None:
            return
        store.save_df(f"{stage}_composed", composed)
        if not done:
            store.save_df(f"{stage}_edges", edges)
            store.save_df(f"{stage}_vertices", vertices)
        store.save_meta(
            meta_key, {"level": level_next, "L_prev": L_prev, "done": done}
        )
        store.lineage(
            stage, level_next, composed, kind="infomap_level", codelength=L_prev
        )

    for _level in range(start_level, max_levels):
        assign, _steps = _infomap_move_phase(edges, vertices, max_supersteps)
        new_composed = materialize(
            composed.join(
                assign.select(
                    F.col("vertex_id").alias("comm"), F.col("comm").alias("new_comm")
                ),
                "comm",
            ).select("vertex_id", F.col("new_comm").alias("comm"))
        )
        L = map_equation_codelength_df(graph, new_composed)
        if L >= L_prev - min_gain:
            release(new_composed)
            release(assign)
            break
        release(composed)
        composed, L_prev = new_composed, L
        old_edges, old_vertices = edges, vertices
        edges, vertices = _contract(edges, assign)
        edges = materialize(edges)
        vertices = materialize(vertices)
        # previous level's blocks are dead once the contraction is
        # materialized — retire them (level 0's edge frame dominates)
        release(assign)
        release(old_edges)
        release(old_vertices)
        if vertices.count() <= 1:
            break
        _snapshot(_level + 1, done=False)

    roots = composed.groupBy("comm").agg(F.min("vertex_id").alias("root"))
    out = materialize(
        composed.join(F.broadcast(roots), "comm").select(
            "vertex_id", F.col("root").alias("comm")
        )
    )
    release(composed)
    composed = out
    _snapshot(-1, done=True)
    return out, L_prev


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


def _enhance_infomap_driver(
    graph: Graph,
    assign: DataFrame,
    modularity_threshold: float,
    min_size: int,
    num_trials: int,
    dispatch_threshold: int,
) -> DataFrame | None:
    """Driver-side enhance for a graph small enough to collect — the SAME
    screen, kernel (infomap_local), and dense-rank splice as the
    distributed path, so outputs are identical (dispatch-parity test).
    Returns None when any selected community exceeds dispatch_threshold
    (that case belongs to the distributed kernel)."""
    from collections import defaultdict

    comm_of = {
        int(r["vertex_id"]): int(r["comm"])
        for r in assign.select("vertex_id", "comm").collect()
    }
    sizes: dict = defaultdict(int)
    for c in comm_of.values():
        sizes[c] += 1
    intra: dict = defaultdict(list)
    for r in graph.edges.select("src", "dst").collect():
        u, v = int(r["src"]), int(r["dst"])
        cu, cv = comm_of.get(u), comm_of.get(v)
        if cu is not None and cu == cv:
            intra[cu].append((u, v))
    # screen parity: >= min_size members, >= 1 intra edge, local
    # modularity (identically 0.0) below the threshold
    if not (0.0 < modularity_threshold):
        return assign
    selected = sorted(
        c for c in intra if sizes[c] >= min_size and len(intra[c]) > 0
    )
    if not selected:
        return assign
    if any(sizes[c] > dispatch_threshold for c in selected):
        return None  # huge community: distributed path owns it

    refined: list = []
    for c in selected:
        edges = intra[c]
        verts = sorted({x for e in edges for x in e})
        part, _L = infomap_local(edges, verts, num_trials=num_trials)
        refined.extend((v, c, int(s)) for v, s in part.items())
    max_comm = max(comm_of.values(), default=0)
    pairs = sorted({(p, s) for _, p, s in refined})
    idmap = {ps: max_comm + i + 1 for i, ps in enumerate(pairs)}
    new_comm = {v: idmap[(p, s)] for v, p, s in refined}
    out = [(v, new_comm.get(v, c)) for v, c in comm_of.items()]
    return materialize(
        graph.edges.sparkSession.createDataFrame(out, "vertex_id long, comm long")
    )


def enhance_infomap(
    graph: Graph,
    assign: DataFrame,
    modularity_threshold: float = 0.3,
    min_size: int = 10,
    num_trials: int = 1,
    dispatch_threshold: int = 10_000,
    local_edges_threshold: int = 100_000,
    store=None,
    stage: str = "infomap_enhance",
) -> DataFrame:
    """Re-partition low-local-modularity communities with the map-equation
    kernel, splicing module ids under fresh community ids (reference
    detection.py:193-240).

    ``store`` (a checkpoint.CheckpointStore) is forwarded to each huge
    community's :func:`infomap_distributed` run (stage key
    ``{stage}_c{comm}``), so a killed enhance resumes mid-level inside
    whichever community it died in.  Selected communities up to
    ``dispatch_threshold`` members run in parallel as grouped-pandas
    tasks; larger ones route through :func:`infomap_distributed` on the
    community subgraph (single-trial, deterministic) so a huge community
    never serializes into one executor task.  Both paths emit the same
    (parent, sub) rows with min-vertex-id sub labels, so the splice is
    path-independent.  Graphs at or below ``local_edges_threshold`` edges
    run the whole enhance driver-side (identical screen/kernel/splice,
    see ``_enhance_infomap_driver``)."""
    if (
        local_edges_threshold > 0
        and graph.edges.count() <= local_edges_threshold
    ):
        out = _enhance_infomap_driver(
            graph, assign, modularity_threshold, min_size, num_trials,
            dispatch_threshold,
        )
        if out is not None:
            return out
    selected = local_modularity_screen(graph, assign, modularity_threshold, min_size)
    if selected.isEmpty():
        return assign

    sizes = (
        assign.join(selected, "comm", "left_semi")
        .groupBy("comm")
        .agg(F.count(F.lit(1)).alias("size"))
        .persist()
    )
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
        .join(selected, "comm", "left_semi")
    )
    if huge_ids:
        intra_all = intra_all.persist()
    # Reference splice semantics (detection.py:211-223): only nodes that
    # appear in the community's intra-edge list are fed to Infomap and
    # reassigned; members with no intra edge keep their old community.
    grouped = intra_all.join(grouped_comms, "comm", "left_semi")
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

    # distributed path for huge communities — same (parent, sub) shape,
    # same canonical min-vertex module labels as the grouped kernel.
    for r in sorted(huge_rows, key=lambda r: int(r["comm"])):
        comm = int(r["comm"])
        sub_edges = intra_all.filter(F.col("comm") == comm).select(
            "src", "dst", F.lit(1.0).alias("weight")
        )
        endpoints = (
            sub_edges.select(F.col("src").alias("vertex_id"))
            .unionByName(sub_edges.select(F.col("dst").alias("vertex_id")))
            .distinct()
        )
        sub_assign, _L = infomap_distributed(
            Graph(vertices=endpoints, edges=sub_edges),
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
