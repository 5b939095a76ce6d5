"""Leiden community detection (Traag, Waltman & van Eck 2019,
"From Louvain to Leiden: guaranteeing well-connected communities",
Sci. Rep. 9:5233) — the deterministic distributed variant.

Louvain's defect (the paper's Fig. 1): the local-move phase can leave a
community internally DISCONNECTED, and contraction then fuses the parts
irreversibly — post-hoc splitting (operators/structure.py:
split_disconnected_communities) restores connectivity but cannot recover
the lost quality.  Leiden inserts a refinement phase between local move
and aggregation so the defect never propagates:

1. **local move** — the exact integer-valued down-only spec from
   operators/louvain.py (both dispatch paths), seeded with the previous
   level's parent partition (the canonical carryover: the aggregate
   graph does NOT restart from singletons);
2. **refinement** — each community is split into its connected parts
   (one intra-community edge filter + ONE global CC run, no
   per-community loop).  Canonical Leiden's refinement additionally
   merges RANDOMLY among well-connected candidates; this engine is
   bit-reproducible by design, so the deterministic connectivity split
   is used — it delivers the paper's headline guarantee (every
   aggregated vertex is a connected set) while keeping runs exactly
   replayable;
3. **aggregation on the refined partition**, with each part's initial
   community = its parent community from step 1.

A final connectivity split runs on the composed output, so the returned
partition provably contains only internally-connected communities; the
split can only raise modularity (splitting a disconnected community
leaves intra-edge mass unchanged — no edges join the parts — while the
squared-volume penalty strictly decreases).

Scale: identical per-superstep dataflow to louvain() (pre-partitioned
persisted symmetric view, |V|-row assignment exchange) plus one CC run
per level over intra-community edges only; the same adaptive driver
dispatch handles the geometrically-shrinking contracted levels.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from csd363_sin_spark.operators.components import connected_components
from csd363_sin_spark.operators.louvain import (
    LouvainResult,
    _local_move_phase,
    _local_move_phase_driver,
    _phase_local,
)
from csd363_sin_spark.plans.induce import Graph
from csd363_sin_spark.plans.lineage import materialize, release


def _connected_parts(
    edges: DataFrame,
    vertices: DataFrame,
    assign: DataFrame,
    local_edges_threshold: int,
) -> DataFrame:
    """(vertex_id, part): connected parts of each community of ``assign``
    within the level graph; part = min vertex id of the part (CC label
    convention — deterministic, path-independent, and <= every member,
    so parts are valid down-only contraction labels)."""
    a_src = assign.select(F.col("vertex_id").alias("src"), F.col("comm").alias("c1"))
    a_dst = assign.select(F.col("vertex_id").alias("dst"), F.col("comm").alias("c2"))
    intra = (
        edges.join(a_src, "src")
        .join(a_dst, "dst")
        .filter(F.col("c1") == F.col("c2"))
        .select("src", "dst", "weight")
    )
    parts = connected_components(
        Graph(vertices=vertices, edges=intra),
        local_edges_threshold=local_edges_threshold,
    )
    return parts.select("vertex_id", F.col("comp_id").alias("part"))


def _parts_local(edge_list: list, verts: list, comm: dict) -> dict:
    """Python mirror of :func:`_connected_parts` (BFS per community part,
    min-id labels) — the driver-dispatch twin."""
    adj: dict = {v: [] for v in verts}
    for u, v, _ in edge_list:
        if u != v and comm[u] == comm[v]:
            adj[u].append(v)
            adj[v].append(u)
    part: dict = {}
    for start in sorted(verts):
        if start in part:
            continue
        stack, seen = [start], {start}
        while stack:
            x = stack.pop()
            part[x] = start
            for nb in adj[x]:
                if nb not in seen:
                    seen.add(nb)
                    stack.append(nb)
    return part


def _leiden_driver(
    spark,
    edges: DataFrame,
    vertices: DataFrame,
    min_gain: float,
    max_levels: int,
    max_supersteps: int,
) -> LouvainResult:
    """Fully driver-side Leiden for sub-threshold graphs: the SAME spec
    (seeded phases, connectivity refinement, refined contraction, final
    split) in pure Python — bit-identical to the distributed loop, which
    the dispatch-parity test asserts."""
    from collections import defaultdict

    orig = [
        (int(r["src"]), int(r["dst"]), float(r["weight"])) for r in edges.collect()
    ]
    verts = [int(r["vertex_id"]) for r in vertices.select("vertex_id").collect()]
    m = sum(w for _, _, w in orig)

    def _modularity(part_map: dict) -> float:
        if m == 0:
            return 0.0
        intra = 0.0
        vol: dict = defaultdict(float)
        for u, v, w in orig:
            if part_map[u] == part_map[v]:
                intra += w
            vol[part_map[u]] += w
            vol[part_map[v]] += w
        return intra / m - sum(x * x for x in vol.values()) / (4.0 * m * m)

    composed = {v: v for v in verts}  # orig -> level vertex (refined part)
    level_edges = list(orig)
    level_verts = list(verts)
    init: dict | None = None
    q_prev = None
    history: list[float] = []
    total_steps = 0
    levels = 0
    final_comm = {v: v for v in verts}

    for level in range(max_levels):
        if m == 0.0:
            break
        assign, steps = _phase_local(
            level_edges, level_verts, m, max_supersteps, init=init
        )
        total_steps += steps
        cand = {v: assign[composed[v]] for v in verts}
        q = _modularity(cand)
        levels = level + 1
        if q_prev is not None and q - q_prev <= min_gain:
            if q > q_prev:
                final_comm, history = cand, history + [q]
            break
        final_comm = cand
        history.append(q)
        q_prev = q
        # refinement: connected parts within communities
        part = _parts_local(level_edges, level_verts, assign)
        composed = {v: part[composed[v]] for v in verts}
        # aggregate on parts; carry each part's parent community
        agg: dict = defaultdict(float)
        for u, v, w in level_edges:
            a, b = part[u], part[v]
            if a > b:
                a, b = b, a
            agg[(a, b)] += w
        level_edges = [(a, b, w) for (a, b), w in agg.items()]
        level_verts = sorted(set(part.values()))
        init = {p: assign[v] for v, p in part.items()}
        if len(level_verts) <= 1:
            break

    # final guarantee + canonical labels: split any disconnected output
    # community and relabel every community by its min member id
    # (identical in both dispatch paths; Q can only rise — see module
    # docstring — and is invariant under pure relabeling)
    final_comm = _parts_local(orig, verts, final_comm)
    history.append(_modularity(final_comm))

    out = materialize(
        spark.createDataFrame(
            list(final_comm.items()), "vertex_id long, comm long"
        )
    )
    return LouvainResult(
        assign=out,
        modularity=history[-1] if history else 0.0,
        levels=levels,
        supersteps=total_steps,
        history=history,
    )


def leiden_refine_phase(
    graph: Graph,
    max_supersteps: int = 6,
    weighted: bool = True,
    local_phase_edges: int = 100_000,
) -> DataFrame:
    """One local-move phase + one connectivity refinement on the ORIGINAL
    graph — the ANSI-SQL-mirrorable unit of Leiden (the full algorithm
    composes these with refined contraction).  Returns ``(vertex_id,
    comm, part)``: the phase community and its refined connected part
    (part = min member vertex id).  The gate value-hash-checks this
    against an unrolled-CTE + recursive-closure DuckDB oracle, pinning
    BOTH Leiden-specific kernels (seedable local move, community-
    restricted CC) at value level."""
    from csd363_sin_spark.operators.louvain import louvain_phase

    assign = louvain_phase(
        graph,
        max_supersteps=max_supersteps,
        weighted=weighted,
        local_phase_edges=local_phase_edges,
    )
    w = F.col("weight") if weighted else F.lit(1.0)
    edges = graph.edges.select("src", "dst", w.alias("weight"))
    parts = _connected_parts(
        edges, graph.vertices.select("vertex_id"), assign, local_phase_edges
    )
    return assign.join(parts, "vertex_id").select("vertex_id", "comm", "part")


def leiden(
    graph: Graph,
    weighted: bool = True,
    min_gain: float = 1.0e-7,
    max_levels: int = 10,
    max_supersteps: int = 64,
    local_phase_edges: int = 100_000,
    store=None,
    stage: str = "leiden",
) -> LouvainResult:
    """Deterministic distributed Leiden; returns the composed assignment
    on the original graph plus final modularity.  Every returned
    community is internally connected (asserted by tests); ties and
    orderings are fixed by the same down-only/min-label conventions as
    louvain(), so runs are bit-reproducible and dispatch paths agree
    exactly.

    ``store`` (a :class:`csd363_sin_spark.checkpoint.CheckpointStore`)
    enables mid-algorithm resume exactly like louvain(): every level's
    contracted graph, composed part map, carryover partition, and best
    assignment are snapshotted, per-superstep lineage rows are recorded,
    and a relaunched call continues from the newest complete level."""
    from csd363_sin_spark.functions.metrics import modularity

    spark = graph.edges.sparkSession
    w = F.col("weight") if weighted else F.lit(1.0)
    edges = materialize(graph.edges.select("src", "dst", w.alias("weight")))
    vertices = materialize(graph.vertices.select("vertex_id"))

    if store is None and edges.count() <= local_phase_edges:
        return _leiden_driver(
            spark, edges, vertices, min_gain, max_levels, max_supersteps
        )

    composed = vertices.select("vertex_id", F.col("vertex_id").alias("cur"))
    init: DataFrame | None = None
    q_prev = None
    history: list[float] = []
    total_steps = 0
    levels = 0
    start_level = 0
    final_assign = vertices.select("vertex_id", F.col("vertex_id").alias("comm"))

    meta_key = f"{stage}_state"
    if store is not None and store.has_meta(meta_key):
        meta = store.load_meta(meta_key)
        final_assign = materialize(store.load_df(spark, f"{stage}_assign"))
        if meta.get("done"):
            return LouvainResult(
                assign=final_assign,
                modularity=meta["history"][-1] if meta["history"] else 0.0,
                levels=meta["levels"],
                supersteps=meta["total_steps"],
                history=meta["history"],
            )
        composed = materialize(store.load_df(spark, f"{stage}_composed"))
        edges = materialize(store.load_df(spark, f"{stage}_edges"))
        vertices = materialize(store.load_df(spark, f"{stage}_vertices"))
        if meta.get("has_init"):
            init = materialize(store.load_df(spark, f"{stage}_init"))
        start_level = meta["level"]
        q_prev = meta["q_prev"]
        history = list(meta["history"])
        total_steps = meta["total_steps"]
        levels = meta["levels"]

    def _snapshot(level_next: int, done: bool) -> None:
        if store is None:
            return
        store.save_df(f"{stage}_assign", final_assign)
        if not done:
            store.save_df(f"{stage}_composed", composed)
            store.save_df(f"{stage}_edges", edges)
            store.save_df(f"{stage}_vertices", vertices)
            if init is not None:
                store.save_df(f"{stage}_init", init)
        store.save_meta(
            meta_key,
            {
                "level": level_next,
                "q_prev": q_prev,
                "history": history,
                "total_steps": total_steps,
                "levels": levels,
                "has_init": init is not None,
                "done": done,
            },
        )
        store.lineage(stage, level_next, final_assign)

    m = float(edges.agg(F.sum("weight")).collect()[0][0] or 0.0)
    for level in range(start_level, max_levels):
        if m == 0.0:
            break

        def _superstep_lineage(step, moves, step_assign, _level=level):
            if store is not None:
                store.lineage(
                    stage,
                    _level * 1000 + step,
                    step_assign,
                    kind="superstep",
                    level=_level,
                    moves=moves,
                )

        if edges.count() <= local_phase_edges:
            assign, steps = _local_move_phase_driver(
                spark, edges, vertices, m, max_supersteps, init_assign=init,
                on_superstep=_superstep_lineage,
            )
        else:
            assign, steps = _local_move_phase(
                edges, vertices, m, max_supersteps, init_assign=init,
                on_superstep=_superstep_lineage,
            )
        total_steps += steps
        cand = materialize(
            composed.join(
                assign.select(
                    F.col("vertex_id").alias("cur"), F.col("comm").alias("c")
                ),
                "cur",
            ).select("vertex_id", F.col("c").alias("comm"))
        )
        q = modularity(graph, cand, weighted=weighted, m=m)
        levels = level + 1
        if q_prev is not None and q - q_prev <= min_gain:
            if q > q_prev:
                release(final_assign)
                final_assign, history = cand, history + [q]
            else:
                release(cand)
            release(assign)
            break
        release(final_assign)
        final_assign = cand
        history.append(q)
        q_prev = q

        # refinement + aggregation on the refined parts
        refined = materialize(
            _connected_parts(edges, vertices, assign, local_phase_edges)
        )
        old_composed = composed
        composed = materialize(
            composed.join(
                refined.withColumnRenamed("vertex_id", "cur"), "cur"
            ).select("vertex_id", F.col("part").alias("cur"))
        )
        release(old_composed)
        next_init = materialize(
            refined.join(assign, "vertex_id")
            .select(F.col("part").alias("vertex_id"), "comm")
            .distinct()
        )
        release(init)
        init = next_init

        old_edges, old_vertices = edges, vertices
        part_as_assign = refined.select("vertex_id", F.col("part").alias("comm"))
        from csd363_sin_spark.operators.louvain import _contract

        edges, vertices = _contract(old_edges, part_as_assign)
        edges = materialize(edges)
        vertices = materialize(vertices)
        release(assign)
        release(refined)
        release(old_edges)
        release(old_vertices)
        if vertices.count() <= 1:
            break
        _snapshot(level + 1, done=False)

    # final guarantee: split any disconnected output community and
    # relabel by min member id (deterministic, path-independent)
    from csd363_sin_spark.operators.structure import (
        split_disconnected_communities,
    )

    split = split_disconnected_communities(
        graph, final_assign, local_edges_threshold=local_phase_edges
    )
    final_assign = materialize(
        split.select("vertex_id", F.col("sub_comm").alias("comm"))
    )
    history.append(modularity(graph, final_assign, weighted=weighted, m=m))
    _snapshot(levels, done=True)

    return LouvainResult(
        assign=final_assign,
        modularity=history[-1] if history else 0.0,
        levels=levels,
        supersteps=total_steps,
        history=history,
    )
