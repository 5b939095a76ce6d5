"""Distributed Louvain community detection (SURVEY C1).

Algorithm family: Blondel et al., "Fast unfolding of communities in large
networks" (J. Stat. Mech. 2008), adapted to a deterministic synchronous
schedule (below) so distributed execution is reproducible and oracle-exact.

Replaces the reference's call into python-louvain ``best_partition``
(reference detection.py:11-42).  python-louvain is inherently sequential
(one node moved at a time with immediate updates), which cannot scale;
this module implements a **deterministic synchronous Louvain variant**
whose spec is pinned precisely so that a sequential oracle
(tests/louvain_oracle.py) reproduces it bit-for-bit — the exact-assignment
requirement of the north rule is checked against that spec oracle, and
solution *quality* (modularity) is checked against networkx's Louvain.

Spec (level = local-move phase + contraction, as in classic Louvain):

* ``m``     = total edge weight of the current level graph (self-loops
  counted once).
* ``k_v``   = strength of v (self-loops counted twice).
* ``S(c)``  = sum of strengths of members of c; ``S'(c)`` = S(c) with
  v's contribution removed when c is v's current community.
* ``k_in(v,c)`` = weight from v to neighbors (excluding v itself) in c.
* score(v,c) = 2m * k_in(v,c) - k_v * S'(c)   — the modularity gain
  times the positive constant 4m^2, so with integer edge weights every
  score is integer-valued and argmax comparisons are EXACT in doubles
  (no cross-engine FP ambiguity up to |score| < 2^53).
* target(v) = argmax over c in {neighbor comms} ∪ {current comm};
  ties broken by smallest community id; v moves only if
  score(target) > score(current) strictly.
* **Monotone down-only gating**: a vertex may only move to a community
  with a SMALLER id than its current one.  The sum of community ids then
  strictly decreases on every superstep that moves anything, so the phase
  PROVABLY terminates (no synchronous-Louvain swap/oscillation is
  possible), one zero-move superstep certifies convergence, and the
  schedule is reproducible at any parallelism.  Upward merges happen in
  reverse (members of the higher-id community move down) and across
  levels via contraction; measured quality matches networkx's sequential
  Louvain on planted-partition graphs.
* Local-move phase ends at the first zero-move superstep (or
  ``max_supersteps``).  Levels repeat while the composed partition's
  modularity (measured on the ORIGINAL graph) improves by > ``min_gain``.
* Contraction: new vertex ids = community ids; edge (c1, c2) weight =
  sum of inter-community weights (c1==c2 rows are the self-loops).

Scale notes: one superstep = one shuffle for neighbor-community weights
(map-side combined), one broadcastable community-totals aggregate, one
join to apply moves.  ``assign`` passes through
:func:`csd363_sin_spark.plans.lineage.materialize` every superstep —
truncating both lineage and the compounding size estimates that otherwise
melt Catalyst's stats visitor (see plans/lineage.py).  Hub-vertex
aggregation skew is absorbed by partial aggregation; AQE splits skewed
join partitions.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from csd363_sin_spark.plans.induce import Graph
from csd363_sin_spark.plans.lineage import adopt, materialize, release


@dataclass
class LouvainResult:
    assign: DataFrame  # (vertex_id long, comm long) on the ORIGINAL graph
    modularity: float
    levels: int
    supersteps: int
    history: list = field(default_factory=list)  # per-level modularity


def _strengths(edges: DataFrame) -> DataFrame:
    """(vertex_id, k) strength incl. self-loops twice.  ``edges`` canonical
    (src <= dst, one row per edge)."""
    contrib = edges.select(
        F.col("src").alias("vertex_id"),
        F.when(F.col("src") == F.col("dst"), 2.0 * F.col("weight")).otherwise(
            F.col("weight")
        ).alias("k"),
    ).unionAll(
        edges.filter(F.col("src") != F.col("dst")).select(
            F.col("dst").alias("vertex_id"), F.col("weight").alias("k")
        )
    )
    return contrib.groupBy("vertex_id").agg(F.sum("k").alias("k"))


def _decide_moves(k_in: DataFrame, state: DataFrame, comm_tot: DataFrame, m: float) -> DataFrame:
    """(vertex_id, next_comm) from the spec's integer-exact scoring: one
    argmax aggregation over the neighbor-community weight table.  Shared
    by the join-dataflow phase and the CSR/Arrow phase — the gather that
    PRODUCES k_in differs, the decision plan is identical."""
    scored = (
        k_in.join(state, "vertex_id")
        .join(comm_tot.withColumnRenamed("comm", "c_nbr"), "c_nbr")
        .select(
            "vertex_id",
            "comm",
            "k",
            "c_nbr",
            (
                2.0 * m * F.col("k_in")
                - F.col("k")
                * (
                    F.col("S")
                    - F.when(F.col("c_nbr") == F.col("comm"), F.col("k")).otherwise(
                        F.lit(0.0)
                    )
                )
            ).alias("score"),
        )
    )
    # one aggregation decides each vertex: global argmax over neighbor
    # comms (ties -> smallest id via negated id in the struct) plus the
    # stay score when the current comm is among the neighbors
    agg = scored.groupBy("vertex_id").agg(
        F.first("comm").alias("comm"),
        F.first("k").alias("k"),
        F.max(F.struct(F.col("score"), (-F.col("c_nbr")).alias("nc"))).alias("b"),
        F.max(F.when(F.col("c_nbr") == F.col("comm"), F.col("score"))).alias(
            "cur_opt"
        ),
    )
    # stay score when current comm had no neighbor row: k_in(cur)=0 =>
    # score = -k * (S_cur - k).  Equivalence to the spec's full-candidate
    # argmax: a strict b.score > cur_score makes b.c the argmax; on ties
    # the strict-improvement rule keeps the vertex anyway.
    return (
        agg.join(comm_tot, "comm")
        .withColumn(
            "cur_score",
            F.coalesce(
                F.col("cur_opt"), -F.col("k") * (F.col("S") - F.col("k"))
            ),
        )
        .withColumn("target", -F.col("b.nc"))
        .withColumn(
            "next_comm",
            F.when(
                (F.col("b.score") > F.col("cur_score"))
                & (F.col("target") < F.col("comm")),
                F.col("target"),
            ).otherwise(F.col("comm")),
        )
        .select("vertex_id", F.col("next_comm"))
    )


def _local_move_phase(
    edges: DataFrame,
    vertices: DataFrame,
    m: float,
    max_supersteps: int,
    on_superstep=None,
    delta_kin: bool = False,
    delta_arm_threshold: int | None = None,
    init_assign: DataFrame | None = None,
) -> tuple[DataFrame, int]:
    """Run down-only-gated synchronous local moves on one level graph.

    ``edges`` canonical (src <= dst); ``vertices`` single column vertex_id.
    Returns (assign, supersteps_used).

    ``init_assign`` (vertex_id, comm) seeds the starting partition
    (Leiden's parent-community carryover; labels must satisfy the
    down-only invariant comm <= vertex_id, which contraction labels —
    min member ids — always do).  Default: singletons.

    ``delta_kin``: after the first superstep, k_in(v, c) changes ONLY for
    vertices with a neighbor among that superstep's movers, so instead of
    re-joining the full 2|E|-row symmetric edge view every superstep, the
    phase keeps the (vertex, neighbor-comm, k_in) table and applies the
    movers' edge deltas (two signed rows per mover-incident edge: -w to
    the old comm, +w to the new) — shuffle volume drops from
    O(2E + |cand|) to O(movers' edges + |cand|) per superstep, the
    dominant win on converging graphs where movers shrink geometrically.
    The machinery ARMS only once a superstep's mover count falls below
    min(1M, |V|/8); delta merging relies on EXACT arithmetic, so it also
    auto-disables unless every edge weight is integral (co-occurrence
    counts and their contraction sums always are).  With integral weights
    the delta path is bit-identical to full recompute — asserted by
    tests/test_delta_supersteps.py.

    DEFAULT OFF — a measured decision (BENCH.md §1): at 4M edges on this
    sandbox the delta path was 1.4x SLOWER on a 12-superstep random graph
    (110.6 s vs 76.8 s, identical checksums) and at best neutral on the
    planted graph, because the pre-partitioned persisted sym view already
    reduces full recompute to a streamed cached scan + |V|-row exchange,
    while delta pays an O(|cand|) materialize + merge every armed
    superstep.  Delta wins only when the candidate table shrinks well
    below 2|E| (strong community coarsening) or when sym no longer fits
    the cluster cache (100 TB regime, where re-scanning 2|E| rows from
    shuffle storage dominates) — opt in with delta_kin=True there.
    """
    # Hash-partition the symmetric edge view by the join key ONCE and keep
    # it cached with the partitioning visible to Catalyst: every superstep's
    # k_in join then exchanges only the |V|-row assignment side, never the
    # 2|E|-row edge side (a union plan has unknown outputPartitioning, so
    # without this Spark re-shuffles sym on every superstep).
    spark = edges.sparkSession
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
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
    strengths = _strengths(edges).persist()
    strengths.count()

    assign = materialize(
        vertices.select("vertex_id", F.col("vertex_id").alias("comm"))
        if init_assign is None
        else init_assign.select("vertex_id", "comm")
    )

    # delta-k_in bookkeeping: exact only for integral weights (one scalar
    # job per phase).  The machinery ARMS only once a superstep's mover
    # count drops below ``arm_threshold`` — before that, fast-converging
    # phases pay zero overhead (no eager cand materialization, k_in stays
    # fused into the downstream aggregation); after arming, each superstep
    # touches only the movers' incident edges instead of the 2|E| view.
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
    cand: DataFrame | None = None
    moved: DataFrame | None = None

    step = 0
    for step in range(max_supersteps):
        # state: vertex -> (current comm, strength).  state feeds both the
        # community totals and the scoring join, and comm_tot is joined
        # twice — persist both for the superstep so the shared subplans
        # (assign exchange + strengths join) run once, not three times.
        state = assign.join(strengths, "vertex_id").persist()
        comm_tot = state.groupBy("comm").agg(F.sum("k").alias("S")).persist()
        if moved is None:
            a_dst = assign.select(
                F.col("vertex_id").alias("dst"), F.col("comm").alias("c_nbr")
            )
            k_in_new = (
                sym.join(a_dst, "dst")
                .groupBy(F.col("src").alias("vertex_id"), "c_nbr")
                .agg(F.sum("weight").alias("k_in"))
            )
        else:
            # movers' incident edges only: -w to the old comm, +w to the new
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
            k_in_new = (
                cand.select("vertex_id", "c_nbr", F.col("k_in").alias("dw"))
                .unionAll(delta)
                .groupBy("vertex_id", "c_nbr")
                .agg(F.sum("dw").alias("k_in"))
                .filter(F.col("k_in") != 0.0)
            )
        if armed:
            k_in = materialize(k_in_new)
            release(cand)
            cand = k_in
        else:
            k_in = k_in_new
        decided = _decide_moves(k_in, state, comm_tot, m)
        # vertices with no neighbors keep their community
        next_assign = materialize(
            assign.join(decided, "vertex_id", "left").select(
                "vertex_id",
                F.coalesce("next_comm", "comm").alias("comm"),
                (F.coalesce("next_comm", "comm") != F.col("comm")).alias("_moved"),
            )
        )
        moves = next_assign.filter(F.col("_moved")).count()
        state.unpersist()
        comm_tot.unpersist()
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
                # arm: the NEXT superstep full-recomputes into a cached
                # cand table; delta merging starts the superstep after
                armed = True
                moved = None
        else:
            moved = None  # full recompute next superstep
        release(old_moved)
        old_assign = assign
        assign = adopt(next_assign.select("vertex_id", "comm"), next_assign)
        # next_assign (and moved, when armed) are eagerly materialized
        # above, so the previous superstep's assignment blocks are dead —
        # retire them instead of pinning one RDD per superstep in the
        # block manager for the whole phase.
        if old_assign is not assign:
            release(old_assign)
        if on_superstep is not None:
            on_superstep(step, moves, assign)
        if moves == 0:
            # monotone schedule: an idle superstep is a fixpoint
            break
    sym.unpersist()
    strengths.unpersist()
    release(cand)
    release(moved)
    return assign, step + 1


def _local_move_phase_csr(
    edges: DataFrame,
    vertices: DataFrame,
    m: float,
    max_supersteps: int,
    num_blocks: int | None = None,
    salt_threshold: int | None = None,
) -> tuple[DataFrame, int]:
    """The SAME synchronous down-only spec as :func:`_local_move_phase`,
    with the k_in gather running as a numpy kernel over CSR adjacency
    blocks (plans/csr.py) instead of a row-level join — the north star's
    "modularity-gain aggregation via groupBy + applyInArrow" layout, the
    Louvain sibling of plans/csr.py::pagerank_csr.

    Per superstep: the static CSR blocks (hash-partitioned by source) are
    cogrouped with the current assignment (partitioned the same way); the
    kernel gathers comm[src] per edge with one numpy reindex, partially
    aggregates (dst, comm_src) -> weight inside the block via
    lexsort + reduceat, and a global groupBy merges the partials.  The
    decision plan (:func:`_decide_moves`) is shared with the join phase,
    so with integral weights the two phases are bit-identical —
    tests/test_csr.py::test_louvain_phase_csr_parity.  A/B at 4M edges is
    recorded in BENCH.md §1 (join vs CSR gather).
    """
    import numpy as np
    import pandas as pd

    from csd363_sin_spark.plans.csr import build_blocks

    spark = edges.sparkSession
    if num_blocks is None:
        num_blocks = max(1, spark.sparkContext.defaultParallelism)
    g = Graph(
        vertices=vertices,
        edges=edges.filter(F.col("src") != F.col("dst")).select(
            "src", "dst", "weight"
        ),
    )
    blocks = build_blocks(
        g, num_blocks=num_blocks, weighted=True, salt_threshold=salt_threshold
    ).persist()
    blocks.count()
    strengths = _strengths(edges).persist()
    strengths.count()
    assign = materialize(
        vertices.select("vertex_id", F.col("vertex_id").alias("comm"))
    )

    def kernel(key, block_pdf: pd.DataFrame, assign_pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"vertex_id": [], "c_nbr": [], "k_in": []}
        ).astype({"vertex_id": "int64", "c_nbr": "int64", "k_in": "float64"})
        if block_pdf.empty or assign_pdf.empty:
            return empty
        cmap = pd.Series(
            assign_pdf["comm"].to_numpy(),
            index=assign_pdf["vertex_id"].to_numpy(),
        )
        all_d, all_c, all_w = [], [], []
        for _, row in block_pdf.iterrows():
            srcs = np.asarray(row["src_sorted"], dtype=np.int64)
            offs = np.asarray(row["offsets"], dtype=np.int64)
            all_d.append(np.asarray(row["dst"], dtype=np.int64))
            all_w.append(np.asarray(row["weight"], dtype=np.float64))
            all_c.append(
                np.repeat(cmap.reindex(srcs).to_numpy(), np.diff(offs))
            )
        d = np.concatenate(all_d)
        c = np.concatenate(all_c).astype(np.int64)
        w = np.concatenate(all_w)
        if len(d) == 0:
            return empty
        order = np.lexsort((c, d))
        d, c, w = d[order], c[order], w[order]
        new = np.empty(len(d), dtype=bool)
        new[0] = True
        new[1:] = (d[1:] != d[:-1]) | (c[1:] != c[:-1])
        starts = np.flatnonzero(new)
        sums = np.add.reduceat(w, starts)
        return pd.DataFrame(
            {"vertex_id": d[starts], "c_nbr": c[starts], "k_in": sums}
        )

    step = 0
    for step in range(max_supersteps):
        state = assign.join(strengths, "vertex_id").persist()
        comm_tot = state.groupBy("comm").agg(F.sum("k").alias("S")).persist()
        assign_part = assign.withColumn(
            "part_id", F.pmod(F.col("vertex_id"), F.lit(num_blocks)).cast("int")
        )
        k_in = (
            blocks.groupBy("part_id")
            .cogroup(assign_part.groupBy("part_id"))
            .applyInPandas(kernel, "vertex_id long, c_nbr long, k_in double")
            .groupBy("vertex_id", "c_nbr")
            .agg(F.sum("k_in").alias("k_in"))
        )
        decided = _decide_moves(k_in, state, comm_tot, m)
        next_assign = materialize(
            assign.join(decided, "vertex_id", "left").select(
                "vertex_id",
                F.coalesce("next_comm", "comm").alias("comm"),
                (F.coalesce("next_comm", "comm") != F.col("comm")).alias("_moved"),
            )
        )
        moves = next_assign.filter(F.col("_moved")).count()
        state.unpersist()
        comm_tot.unpersist()
        old_assign = assign
        assign = adopt(next_assign.select("vertex_id", "comm"), next_assign)
        release(old_assign)
        if moves == 0:
            break
    blocks.unpersist()
    strengths.unpersist()
    return assign, step + 1


def _phase_local(
    edge_list: list,
    verts: list,
    m: float,
    max_supersteps: int,
    on_superstep=None,
    init: dict | None = None,
) -> tuple[dict, int]:
    """Pure-Python core of the synchronous down-only local-move spec,
    over ``edge_list`` = [(src, dst, weight)] canonical.  Returns
    (vertex -> comm, supersteps).

    ``init`` seeds the starting partition (Leiden's parent-community
    carryover); labels must satisfy the down-only invariant
    ``init[v] <= v`` (contraction labels are min member ids, so the
    carryover always does).  Default: singletons."""
    from collections import defaultdict

    strength: dict = defaultdict(float)
    adj: dict = defaultdict(dict)
    for u, v, w in edge_list:
        if u == v:
            strength[u] += 2.0 * w
        else:
            strength[u] += w
            strength[v] += w
            adj[u][v] = adj[u].get(v, 0.0) + w
            adj[v][u] = adj[v].get(u, 0.0) + w
    comm = {v: (init[v] if init is not None else v) for v in verts}
    S: dict = defaultdict(float)
    for v in verts:
        S[comm[v]] += strength.get(v, 0.0)

    steps = 0
    for step in range(max_supersteps):
        decisions = {}
        for v in verts:
            cur = comm[v]
            k = strength.get(v, 0.0)
            w_to: dict = defaultdict(float)
            for nb, w in adj.get(v, {}).items():
                w_to[comm[nb]] += w
            if not w_to:
                continue
            best_key, best_c = None, None
            for c, w_c in w_to.items():
                sc = 2.0 * m * w_c - k * (S[c] - (k if c == cur else 0.0))
                key = (sc, -c)
                if best_key is None or key > best_key:
                    best_key, best_c = key, c
            cur_score = (
                2.0 * m * w_to[cur] - k * (S[cur] - k)
                if cur in w_to
                else -k * (S[cur] - k)
            )
            if best_key[0] > cur_score and best_c < cur:
                decisions[v] = best_c
        for v, c in decisions.items():
            S[comm[v]] -= strength.get(v, 0.0)
            S[c] += strength.get(v, 0.0)
            comm[v] = c
        steps = step + 1
        if on_superstep is not None:
            on_superstep(step, len(decisions), dict(comm))
        if not decisions:
            break
    return dict(comm), steps


def _local_move_phase_driver(
    spark,
    edges: DataFrame,
    vertices: DataFrame,
    m: float,
    max_supersteps: int,
    on_superstep=None,
    init_assign: DataFrame | None = None,
) -> tuple[DataFrame, int]:
    """Driver-side execution of the SAME synchronous down-only spec for a
    level graph small enough to collect (adaptive dispatch, the mirror
    image of the GN/Infomap size dispatch).

    Every score is integer-valued by construction (see module docstring),
    so this pure-Python run and the distributed run produce BIT-IDENTICAL
    assignments — verified by test_louvain_phase_dispatch_parity.  At the
    100 TB target the first level runs distributed; contracted levels
    shrink geometrically and finish here, exactly like Spark's own AQE
    small-side strategies."""
    edge_list = [
        (r["src"], r["dst"], float(r["weight"])) for r in edges.collect()
    ]
    verts = [r["vertex_id"] for r in vertices.collect()]
    init = (
        None
        if init_assign is None
        else {r["vertex_id"]: r["comm"] for r in init_assign.collect()}
    )

    def _cb(step, n_moves, comm):
        if on_superstep is not None:
            step_df = spark.createDataFrame(
                list(comm.items()), "vertex_id long, comm long"
            )
            on_superstep(step, n_moves, step_df)

    comm, steps = _phase_local(
        edge_list, verts, m, max_supersteps,
        on_superstep=_cb if on_superstep is not None else None,
        init=init,
    )
    assign = materialize(
        spark.createDataFrame(list(comm.items()), "vertex_id long, comm long")
    )
    return assign, steps


def _louvain_driver(
    spark,
    edges: DataFrame,
    vertices: DataFrame,
    min_gain: float,
    max_levels: int,
    max_supersteps: int,
) -> LouvainResult:
    """Fully driver-side Louvain for a graph below the dispatch threshold:
    the SAME spec (phases via _phase_local, weight-preserving contraction,
    per-level modularity gain check on the original graph) without ~6
    Spark jobs per level.  Identical results to the distributed loop —
    asserted by the dispatch-parity and spec-oracle tests.  ``edges``
    carries the already-resolved weights (1.0 in unweighted mode)."""
    from collections import defaultdict

    orig = [
        (int(r["src"]), int(r["dst"]), float(r["weight"])) for r in edges.collect()
    ]
    verts = [int(r["vertex_id"]) for r in vertices.select("vertex_id").collect()]
    m = sum(w for _, _, w in orig)

    def _modularity(part: dict) -> float:
        if m == 0:
            return 0.0
        intra = 0.0
        vol: dict = defaultdict(float)
        for u, v, w in orig:
            cu, cv = part[u], part[v]
            if cu == cv:
                intra += w
            vol[cu] += w
            vol[cv] += w
        return intra / m - sum(x * x for x in vol.values()) / (4.0 * m * m)

    composed = {v: v for v in verts}
    level_edges = list(orig)
    level_verts = list(verts)
    q_prev = None
    history: list[float] = []
    total_steps = 0
    levels = 0

    for level in range(max_levels):
        if m == 0.0:
            break
        assign, steps = _phase_local(level_edges, level_verts, m, max_supersteps)
        total_steps += steps
        new_composed = {v: assign[composed[v]] for v in verts}
        q = _modularity(new_composed)
        levels = level + 1
        if q_prev is not None and q - q_prev <= min_gain:
            if q > q_prev:
                composed, history = new_composed, history + [q]
            break
        composed = new_composed
        history.append(q)
        q_prev = q
        agg: dict = defaultdict(float)
        for u, v, w in level_edges:
            a, b = assign[u], assign[v]
            if a > b:
                a, b = b, a
            agg[(a, b)] += w
        level_edges = [(a, b, w) for (a, b), w in agg.items()]
        level_verts = sorted(set(assign.values()))
        if len(level_verts) <= 1:
            break

    out = materialize(
        spark.createDataFrame(
            list(composed.items()), "vertex_id long, comm long"
        )
    )
    return LouvainResult(
        assign=out,
        modularity=history[-1] if history else 0.0,
        levels=levels,
        supersteps=total_steps,
        history=history,
    )


def _contract(edges: DataFrame, assign: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Contract communities into vertices; returns (edges2, vertices2)."""
    a1 = assign.select(F.col("vertex_id").alias("src"), F.col("comm").alias("c1"))
    a2 = assign.select(F.col("vertex_id").alias("dst"), F.col("comm").alias("c2"))
    edges2 = (
        edges.join(a1, "src")
        .join(a2, "dst")
        .select(
            F.least("c1", "c2").alias("src"),
            F.greatest("c1", "c2").alias("dst"),
            "weight",
        )
        .groupBy("src", "dst")
        .agg(F.sum("weight").alias("weight"))
    )
    vertices2 = assign.select(F.col("comm").alias("vertex_id")).distinct()
    return edges2, vertices2


def louvain(
    graph: Graph,
    weighted: bool = True,
    min_gain: float = 1.0e-7,
    max_levels: int = 10,
    max_supersteps: int = 64,
    store=None,
    stage: str = "louvain",
    local_phase_edges: int = 100_000,
) -> LouvainResult:
    """Run deterministic distributed Louvain; returns composed assignment
    on the original graph plus the final modularity.

    ``store`` (a :class:`csd363_sin_spark.checkpoint.CheckpointStore`)
    enables mid-algorithm resume: every level's contracted graph +
    composed assignment is snapshotted, and a relaunched call continues
    from the newest complete level (per-superstep lineage rows recorded).
    """
    from csd363_sin_spark.functions.metrics import modularity

    spark = graph.edges.sparkSession
    w = F.col("weight") if weighted else F.lit(1.0)
    edges = materialize(graph.edges.select("src", "dst", w.alias("weight")))
    vertices = materialize(graph.vertices.select("vertex_id"))

    # full driver-side dispatch: a graph below the threshold runs the
    # whole multi-level loop locally (identical spec, see
    # _louvain_driver); checkpointed runs keep the level machinery so
    # resume granularity is unchanged.
    if store is None and edges.count() <= local_phase_edges:
        return _louvain_driver(
            spark, edges, vertices, min_gain, max_levels, max_supersteps
        )

    # composed: original vertex -> current community label
    composed = vertices.select("vertex_id", F.col("vertex_id").alias("comm"))
    q_prev = None
    total_steps = 0
    history: list[float] = []
    levels = 0
    start_level = 0

    meta_key = f"{stage}_state"
    if store is not None and store.has_meta(meta_key):
        meta = store.load_meta(meta_key)
        composed = materialize(store.load_df(spark, f"{stage}_composed"))
        if meta.get("done"):
            return LouvainResult(
                assign=composed,
                modularity=meta["history"][-1] if meta["history"] else 0.0,
                levels=meta["levels"],
                supersteps=meta["total_steps"],
                history=meta["history"],
            )
        edges = materialize(store.load_df(spark, f"{stage}_edges"))
        vertices = materialize(store.load_df(spark, f"{stage}_vertices"))
        start_level = meta["level"]
        q_prev = meta["q_prev"]
        history = list(meta["history"])
        total_steps = meta["total_steps"]
        levels = meta["levels"]

    def _snapshot(level_next: int, done: bool) -> None:
        if store is None:
            return
        store.save_df(f"{stage}_composed", composed)
        if not done:
            store.save_df(f"{stage}_edges", edges)
            store.save_df(f"{stage}_vertices", vertices)
        store.save_meta(
            meta_key,
            {
                "level": level_next,
                "q_prev": q_prev,
                "history": history,
                "total_steps": total_steps,
                "levels": levels,
                "done": done,
            },
        )
        store.lineage(stage, level_next, composed)

    # total edge weight is INVARIANT under contraction (every level-k edge
    # aggregates a disjoint set of original edges), so one scalar job
    # serves every level's local-move phase and modularity evaluation.
    m_row = edges.agg(F.sum("weight")).collect()[0][0]
    m = float(m_row or 0.0)
    for level in range(start_level, max_levels):
        if m == 0.0:
            break
        def _superstep_lineage(step, moves, step_assign, _level=level):
            if store is not None:
                # per-superstep lineage row: rows + order-insensitive
                # checksum of the assignment (north rule: per-partition
                # lineage + iteration metrics)
                store.lineage(
                    stage,
                    _level * 1000 + step,
                    step_assign,
                    kind="superstep",
                    level=_level,
                    moves=moves,
                )

        # adaptive dispatch: a level graph below the threshold runs the
        # identical spec driver-side (one collect instead of ~10 Spark
        # stages per superstep); big levels run distributed.
        if edges.count() <= local_phase_edges:
            assign, steps = _local_move_phase_driver(
                spark, edges, vertices, m, max_supersteps,
                on_superstep=_superstep_lineage,
            )
        else:
            assign, steps = _local_move_phase(
                edges, vertices, m, max_supersteps, on_superstep=_superstep_lineage
            )
        total_steps += steps

        new_composed = materialize(
            composed.join(
                assign.select(
                    F.col("vertex_id").alias("comm"), F.col("comm").alias("new_comm")
                ),
                "comm",
            ).select("vertex_id", F.col("new_comm").alias("comm"))
        )
        q = modularity(graph, new_composed, weighted=weighted, m=m)
        levels = level + 1
        if q_prev is not None and q - q_prev <= min_gain:
            if q > q_prev:
                release(composed)
                composed, history = new_composed, history + [q]
            else:
                release(new_composed)
            release(assign)
            break
        release(composed)
        composed = new_composed
        history.append(q)
        q_prev = q

        old_edges, old_vertices = edges, vertices
        edges, vertices = _contract(edges, assign)
        edges = materialize(edges)
        vertices = materialize(vertices)
        # the contracted level is eagerly materialized, so the previous
        # level's edge/vertex/assignment blocks are dead — at scale the
        # level-0 edge frame is the largest object in the block manager.
        release(assign)
        release(old_edges)
        release(old_vertices)
        if vertices.count() <= 1:
            break
        _snapshot(level + 1, done=False)

    _snapshot(levels, done=True)
    return LouvainResult(
        assign=composed,
        modularity=history[-1] if history else 0.0,
        levels=levels,
        supersteps=total_steps,
        history=history,
    )


def louvain_phase(
    graph: Graph,
    max_supersteps: int = 6,
    weighted: bool = True,
    local_phase_edges: int = 100_000,
) -> DataFrame:
    """One deterministic down-only local-move phase on the ORIGINAL
    (level-0) graph; returns ``(vertex_id long, comm long)``.

    This is the ANSI-SQL-mirrorable unit of Louvain: every score is
    integer-valued (module docstring), so the driver kernel, the
    distributed superstep loop, and the driver gate's unrolled-CTE DuckDB
    oracle agree bit-for-bit.  ``louvain()`` composes these phases with
    contraction; exposing the single phase lets the correctness gate
    value-hash-check the superstep kernel itself, not just row counts."""
    spark = graph.edges.sparkSession
    w = F.col("weight") if weighted else F.lit(1.0)
    edges = graph.edges.select("src", "dst", w.alias("weight"))
    vertices = graph.vertices.select("vertex_id")
    m = float(edges.agg(F.sum("weight")).collect()[0][0] or 0.0)
    if m == 0.0:
        return vertices.select("vertex_id", F.col("vertex_id").alias("comm"))
    if local_phase_edges > 0 and edges.count() <= local_phase_edges:
        assign, _ = _local_move_phase_driver(
            spark, edges, vertices, m, max_supersteps
        )
    else:
        assign, _ = _local_move_phase(edges, vertices, m, max_supersteps)
    return assign
