"""Distributed edge betweenness — batched multi-source Brandes (SURVEY C3/C4/M3).

Replaces ``nx.edge_betweenness_centrality`` (reference evaluation.py:130-185,
girvan_newman_wrapper.py:53-221) with a level-synchronous dataflow version:

* **forward**: a frontier DataFrame ``(s, v, dist, sigma)`` holding ALL
  sources of the batch at once is expanded one BFS level per superstep via
  a join against the symmetric edge table; path counts merge with a
  ``groupBy(s, v).sum(sigma)`` (SpMV-style gather);
* **backward**: walking levels deepest-first, each predecessor edge (v, w)
  with ``dist_w = dist_v + 1`` receives ``sigma_v / sigma_w * (1 + delta_w)``;
  per-vertex deltas accumulate with another grouped sum; per-edge
  contributions accumulate across levels and sources;
* final: ``groupBy(edge).sum / 2`` (undirected halving) — matches
  ``nx.edge_betweenness_centrality(G, normalized=False)`` exactly, and the
  normalized variant via the ``2/(n(n-1))`` factor.

Source sampling (reference girvan_newman_wrapper.py:77-80 uses
``k = min(1000, n/10)``): deterministic lowest-k vertex ids rather than a
seeded RNG, so reruns and the test oracle agree.

Scale notes: state is O(|sources| x |reached vertices|) rows — the batch
size bounds memory; callers shard sources into batches and sum.  Each
level is a handful of shuffles; every level's state is localCheckpoint-ed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from csd363_sin_spark.plans.induce import Graph
from csd363_sin_spark.plans.lineage import materialize, release


def edge_betweenness_batched(
    graph: Graph,
    batch_size: int = 256,
    k_sources: int | None = None,
    normalized: bool = False,
    max_depth: int = 64,
    local_edges_threshold: int = 100_000,
    gather: str = "join",
) -> DataFrame:
    """Exact (or k-sampled) edge betweenness with sources sharded into
    batches of ``batch_size`` — bounds the O(|sources| x |V|) frontier
    state, the memory knob for large graphs.  Per-edge sums across
    batches equal the single-batch result exactly.

    Source batches are built distributedly: a dense rank over the source
    ids (plans/ids.py — range partition + offsets, no global window)
    becomes a batch-id column, and each round filters one batch.  The
    driver holds only the source COUNT, never the vertex set — exact mode
    on a 10^8-vertex graph costs O(1) driver memory."""
    import math

    from pyspark.sql import functions as _F

    from csd363_sin_spark.plans.ids import dense_ids

    verts = graph.vertices.select("vertex_id")
    if k_sources is not None:
        verts = verts.orderBy("vertex_id").limit(int(k_sources))
    ranked = dense_ids(verts, "vertex_id", id_col="_rank")
    batched = ranked.withColumn(
        "_bid", _F.floor(_F.col("_rank") / batch_size)
    ).persist()
    n_sources = batched.count()
    spark = graph.edges.sparkSession
    total = None
    for i in range(int(math.ceil(n_sources / batch_size)) if n_sources else 0):
        chunk = batched.filter(_F.col("_bid") == i).select("vertex_id")
        raw = edge_betweenness(
            graph,
            source_batch=chunk,
            max_depth=max_depth,
            local_edges_threshold=local_edges_threshold,
            gather=gather,
        )
        part = raw.withColumnRenamed("betweenness", "b_part")
        if total is None:
            total = materialize(part.withColumnRenamed("b_part", "b_acc"))
        else:
            prev = total
            total = materialize(
                prev.join(part, ["src", "dst"], "outer")
                .fillna({"b_acc": 0.0, "b_part": 0.0})
                .select(
                    "src", "dst", (_F.col("b_acc") + _F.col("b_part")).alias("b_acc")
                )
            )
            release(prev)
        release(raw)  # retire this batch's bet checkpoint (folded into total)
    batched.unpersist()
    release(ranked)  # dense_ids hands back a checkpoint-backed frame
    if total is None:
        return spark.createDataFrame([], "src long, dst long, betweenness double")
    handle = getattr(total, "_ckpt_jrdd", None)
    out = total.withColumnRenamed("b_acc", "betweenness")
    if normalized:
        n = graph.vertices.count()
        scale = 2.0 / (n * (n - 1)) if n > 1 else 1.0
        out = out.select(
            "src", "dst", (_F.col("betweenness") * scale).alias("betweenness")
        )
    out._ckpt_jrdd = handle
    return out


def _edge_betweenness_driver(
    graph: Graph,
    k_sources: int | None,
    source_batch: DataFrame | None,
    normalized: bool,
    max_depth: int = 64,
    accumulate: str = "edges",
) -> DataFrame:
    """Driver-side Brandes (functions/brandes.py kernel) for a graph
    small enough to collect — same semantics as the dataflow version
    (sampled sources = lowest-k ids; untraversed edges 0.0; BFS truncated
    at the same ``max_depth``); values agree to FP-summation order
    (~1e-12).  Adaptive dispatch: the distributed GN loop recomputes
    betweenness every removal round, so medium community subgraphs skip
    the per-BFS-level join cascade."""
    from csd363_sin_spark.functions.brandes import edge_betweenness_local

    spark = graph.edges.sparkSession
    edge_rows = [
        (int(r["src"]), int(r["dst"])) for r in graph.edges.select("src", "dst").collect()
    ]
    verts = sorted(
        int(r["vertex_id"]) for r in graph.vertices.select("vertex_id").collect()
    )
    adj: dict = {v: set() for v in verts}
    for u, v in edge_rows:
        if u != v:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
    if source_batch is not None:
        sources = sorted(int(r[0]) for r in source_batch.collect())
    elif k_sources is not None:
        sources = sorted(adj)[: int(k_sources)]
    else:
        sources = None
    if accumulate == "vertices":
        from csd363_sin_spark.functions.brandes import vertex_betweenness_local

        vbet = vertex_betweenness_local(adj, sources=sources, max_depth=max_depth)
        n = len(verts)
        scale = (2.0 / ((n - 1) * (n - 2)) if n > 2 else 1.0) if normalized else 1.0
        return spark.createDataFrame(
            [(v, scale * vbet.get(v, 0.0)) for v in verts],
            "vertex_id long, betweenness double",
        )
    bet = edge_betweenness_local(adj, sources=sources, max_depth=max_depth)
    n = len(verts)
    scale = (2.0 / (n * (n - 1)) if n > 1 else 1.0) if normalized else 1.0
    out = [
        (u, v, scale * bet.get((u, v) if u < v else (v, u), 0.0))
        for u, v in edge_rows
    ]
    return spark.createDataFrame(out, "src long, dst long, betweenness double")


def edge_betweenness(
    graph: Graph,
    k_sources: int | None = None,
    source_batch: DataFrame | None = None,
    normalized: bool = False,
    max_depth: int = 64,
    local_edges_threshold: int = 100_000,
    gather: str = "join",
    accumulate: str = "edges",
) -> DataFrame:
    """Return ``(src, dst, betweenness)`` for every edge (src < dst).

    ``k_sources`` — run Brandes from the lowest-k vertex ids only
    (sampled approximation); ``source_batch`` — explicit (vertex_id)
    DataFrame of sources (overrides ``k_sources``).  Graphs at or below
    ``local_edges_threshold`` edges run the driver-side Brandes kernel.

    ``gather`` selects the frontier-expansion physical strategy (values
    identical to FP-summation order): ``"join"`` expands via a frontier
    JOIN against the persisted symmetric edge table; ``"csr"`` expands via
    the Arrow/numpy kernel over CSR adjacency blocks (plans/csr.csr_gather)
    — only the frontier side is exchanged per level, never the adjacency.

    ``accumulate="vertices"`` switches the backward pass to per-vertex
    dependency accumulation (Brandes δ) and returns ``(vertex_id,
    betweenness)`` for every vertex instead — the same forward wave and
    contribution algebra, so the two outputs stay consistent by
    construction (callers use the :func:`vertex_betweenness` wrapper).
    """
    if accumulate not in ("edges", "vertices"):
        raise ValueError(f"unknown accumulate {accumulate!r}")
    spark = graph.edges.sparkSession
    if local_edges_threshold > 0 and graph.edges.count() <= local_edges_threshold:
        return _edge_betweenness_driver(
            graph,
            k_sources,
            source_batch,
            normalized,
            max_depth=max_depth,
            accumulate=accumulate,
        )
    if gather not in ("join", "csr"):
        raise ValueError(f"unknown gather {gather!r}")
    blocks = None
    sym = None
    if gather == "csr":
        from csd363_sin_spark.plans.csr import build_blocks, csr_gather
        from csd363_sin_spark.plans.induce import Graph as _G

        num_blocks = max(1, spark.sparkContext.defaultParallelism)
        simple = _G(
            graph.vertices, graph.edges.filter(F.col("src") != F.col("dst"))
        )
        blocks = build_blocks(simple, num_blocks=num_blocks, weighted=False).persist()
        blocks.count()

        def expand(frontier: DataFrame, payload: str) -> DataFrame:
            # (s, v, payload) -> one row per neighbor w with payload copied
            out = csr_gather(
                blocks,
                frontier.select("s", "v", F.col(payload).alias("val")),
                num_blocks,
            )
            return out.select("s", "v", "w", F.col("val").alias(payload))

    else:
        sym = (
            graph.edges.filter(F.col("src") != F.col("dst"))
            .select("src", "dst")
            .unionAll(
                graph.edges.filter(F.col("src") != F.col("dst")).select(
                    F.col("dst").alias("src"), F.col("src").alias("dst")
                )
            )
            .persist()
        )
        sym.count()

        def expand(frontier: DataFrame, payload: str) -> DataFrame:
            return frontier.join(sym, frontier["v"] == sym["src"]).select(
                "s", "v", F.col("dst").alias("w"), payload
            )

    if source_batch is not None:
        sources = source_batch.select(F.col("vertex_id").alias("s"))
    elif k_sources is not None:
        sources = (
            graph.vertices.select(F.col("vertex_id").alias("s"))
            .orderBy("s")
            .limit(int(k_sources))
        )
    else:
        sources = graph.vertices.select(F.col("vertex_id").alias("s"))

    frontier = materialize(sources.select(
        "s", F.col("s").alias("v"), F.lit(0).alias("dist"), F.lit(1.0).alias("sigma")
    ))
    levels = [frontier]  # levels[d] = (s, v, dist, sigma) at distance d
    visited = materialize(frontier.select("s", "v"))

    depth = 0
    while depth < max_depth:
        expanded = expand(levels[-1], "sigma").select(
            "s", F.col("w").alias("v"), "sigma"
        )
        nxt = materialize(
            expanded.join(visited, ["s", "v"], "left_anti")
            .groupBy("s", "v")
            .agg(F.sum("sigma").alias("sigma"))
            .withColumn("dist", F.lit(depth + 1))
            .select("s", "v", "dist", "sigma")
        )
        if nxt.isEmpty():
            release(nxt)
            break
        levels.append(nxt)
        prev_visited = visited
        visited = materialize(visited.unionByName(nxt.select("s", "v")))
        release(prev_visited)
        depth += 1
    release(visited)  # forward-only state; the backward pass never reads it

    # backward accumulation — levels retire as the walk passes them so live
    # checkpoint storage stays O(2 levels + per-level contribs), not O(depth)
    contribs: list[DataFrame] = []
    vdeltas: list[DataFrame] = []
    pair_frames: list[DataFrame] = []
    delta = levels[-1].select("s", "v", F.lit(0.0).alias("delta"))
    for d in range(len(levels) - 1, 0, -1):
        w_side = levels[d].join(delta, ["s", "v"], "left").fillna({"delta": 0.0})
        w_side = w_side.select(
            "s",
            F.col("v").alias("w"),
            F.col("sigma").alias("sigma_w"),
            F.col("delta").alias("delta_w"),
        )
        v_side = levels[d - 1].select(
            "s", F.col("v"), F.col("sigma").alias("sigma_v")
        )
        pairs = (
            expand(v_side, "sigma_v")
            .join(w_side, ["s", "w"])
            .select(
                "s",
                "v",
                "w",
                (
                    F.col("sigma_v") / F.col("sigma_w") * (1.0 + F.col("delta_w"))
                ).alias("contrib"),
            )
        )
        pairs = materialize(pairs)
        # level d fed w_side above; iterations d-1.. only read levels[d-1]
        # downward and the (materialized) pairs — safe to retire now
        release(levels[d])
        pair_frames.append(pairs)
        if accumulate == "edges":
            contribs.append(
                pairs.select(
                    F.least("v", "w").alias("src"),
                    F.greatest("v", "w").alias("dst"),
                    "contrib",
                )
            )
        delta = pairs.groupBy("s", "v").agg(F.sum("contrib").alias("delta"))
        if accumulate == "vertices":
            # delta here is FINAL for the layer-(d-1) vertices: a vertex
            # collects all successor contributions in the single backward
            # step where it is the shallower side.  Sources (v == s,
            # layer 0) are excluded per Brandes: C_B[w] += delta[w], w != s.
            vdeltas.append(delta.filter(F.col("v") != F.col("s")))

    if sym is not None:
        sym.unpersist()
    if blocks is not None:
        blocks.unpersist()
    release(levels[0])
    if accumulate == "vertices":
        all_verts = graph.vertices.select("vertex_id")
        if not vdeltas:
            return all_verts.withColumn("betweenness", F.lit(0.0))
        all_d = vdeltas[0]
        for d in vdeltas[1:]:
            all_d = all_d.unionByName(d)
        vb = materialize(
            all_d.groupBy("v").agg((F.sum("delta") / 2.0).alias("betweenness"))
        )
        vb_handle = getattr(vb, "_ckpt_jrdd", None)
        for p in pair_frames:
            release(p)
        if normalized:
            n = graph.vertices.count()
            scale = 2.0 / ((n - 1) * (n - 2)) if n > 2 else 1.0
            vb = vb.select("v", (F.col("betweenness") * scale).alias("betweenness"))
        out = (
            all_verts.join(
                vb.withColumnRenamed("v", "vertex_id"), "vertex_id", "left"
            ).fillna({"betweenness": 0.0})
        )
        out._ckpt_jrdd = vb_handle
        return out
    if not contribs:
        return spark.createDataFrame([], "src long, dst long, betweenness double")
    all_c = contribs[0]
    for c in contribs[1:]:
        all_c = all_c.unionByName(c)
    bet = materialize(
        all_c.groupBy("src", "dst").agg((F.sum("contrib") / 2.0).alias("betweenness"))
    )
    bet_handle = getattr(bet, "_ckpt_jrdd", None)
    for p in pair_frames:
        release(p)
    if normalized:
        n = graph.vertices.count()
        scale = 2.0 / (n * (n - 1)) if n > 1 else 1.0
        bet = bet.select("src", "dst", (F.col("betweenness") * scale).alias("betweenness"))
    # include never-traversed edges (disconnected from sources) with 0
    out = (
        graph.edges.select("src", "dst")
        .join(bet, ["src", "dst"], "left")
        .fillna({"betweenness": 0.0})
    )
    # the only cached dependency left is the final bet checkpoint; hand its
    # handle to callers so release(result) frees everything this call cached
    out._ckpt_jrdd = bet_handle
    return out


def vertex_betweenness(
    graph: Graph,
    k_sources: int | None = None,
    source_batch: DataFrame | None = None,
    normalized: bool = False,
    max_depth: int = 64,
    local_edges_threshold: int = 100_000,
    gather: str = "join",
) -> DataFrame:
    """Vertex betweenness centrality ``(vertex_id, betweenness)`` for EVERY
    vertex (leaves 0.0) — matches ``nx.betweenness_centrality(G,
    normalized=False)`` exactly (``normalized=True`` applies nx's
    undirected ``2/((n-1)(n-2))`` factor).

    Same kernel family as :func:`edge_betweenness` (reference
    evaluation.py:130-185 computes the edge variant; the vertex variant is
    the standard Brandes companion): identical forward wave, the backward
    pass accumulates per-vertex dependencies delta instead of per-edge
    contributions, so sampled sources / ``max_depth`` / dispatch semantics
    are shared line for line."""
    return edge_betweenness(
        graph,
        k_sources=k_sources,
        source_batch=source_batch,
        normalized=normalized,
        max_depth=max_depth,
        local_edges_threshold=local_edges_threshold,
        gather=gather,
        accumulate="vertices",
    )


def vertex_betweenness_batched(
    graph: Graph,
    batch_size: int = 256,
    k_sources: int | None = None,
    normalized: bool = False,
    max_depth: int = 64,
    local_edges_threshold: int = 100_000,
    gather: str = "join",
) -> DataFrame:
    """Exact (or k-sampled) vertex betweenness with sources sharded into
    ``batch_size`` batches — the vertex twin of
    :func:`edge_betweenness_batched` (per-vertex sums across batches equal
    the single-batch result exactly; driver holds only the source count)."""
    import math

    from csd363_sin_spark.plans.ids import dense_ids

    verts = graph.vertices.select("vertex_id")
    if k_sources is not None:
        verts = verts.orderBy("vertex_id").limit(int(k_sources))
    ranked = dense_ids(verts, "vertex_id", id_col="_rank")
    batched = ranked.withColumn(
        "_bid", F.floor(F.col("_rank") / batch_size)
    ).persist()
    n_sources = batched.count()
    spark = graph.edges.sparkSession
    total: DataFrame | None = None
    for i in range(int(math.ceil(n_sources / batch_size)) if n_sources else 0):
        chunk = batched.filter(F.col("_bid") == i).select("vertex_id")
        part = vertex_betweenness(
            graph,
            source_batch=chunk,
            max_depth=max_depth,
            local_edges_threshold=local_edges_threshold,
            gather=gather,
        ).withColumnRenamed("betweenness", "b_part")
        if total is None:
            total = materialize(part.withColumnRenamed("b_part", "b_acc"))
        else:
            prev = total
            # every batch returns ALL vertices (0.0-filled) -> inner join
            total = materialize(
                prev.join(part, "vertex_id").select(
                    "vertex_id", (F.col("b_acc") + F.col("b_part")).alias("b_acc")
                )
            )
            release(prev)
        release(part)
    batched.unpersist()
    release(ranked)
    if total is None:
        return spark.createDataFrame([], "vertex_id long, betweenness double")
    handle = getattr(total, "_ckpt_jrdd", None)
    out = total.withColumnRenamed("b_acc", "betweenness")
    if normalized:
        n = graph.vertices.count()
        scale = 2.0 / ((n - 1) * (n - 2)) if n > 2 else 1.0
        out = out.select(
            "vertex_id", (F.col("betweenness") * scale).alias("betweenness")
        )
    out._ckpt_jrdd = handle
    return out
