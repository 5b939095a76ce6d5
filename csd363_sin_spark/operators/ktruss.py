"""k-truss decomposition (per-edge truss numbers) — beyond the reference.

The truss number t(e) is the largest k such that e belongs to the
k-truss: the maximal subgraph in which every edge closes at least k-2
triangles (nx.k_truss semantics).  Trusses are the standard
cohesive-subgraph ladder one level above k-cores — the "dense enough to
be a real community" filter on link graphs.

Scale design: the distributed kernel is the classic batched peel
(Cohen's MapReduce truss): per round, edge support is recomputed with
the SAME degree-ordered canonical triangle join as G9 triangle counting
(a < b < c by canonicality — hub-safe, AQE splits skewed keys), and ALL
edges below the current threshold are removed at once, so the round
count is the peel depth, not the edge count.  Edge state is
``materialize``d per round (flat lineage).  Driver dispatch below
``local_edges_threshold`` runs the textbook decremental-support peel
(O(E^1.5)); both paths produce identical integer truss numbers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from csd363_sin_spark.plans.induce import Graph
from csd363_sin_spark.plans.lineage import materialize, release


def _truss_driver(graph: Graph) -> DataFrame:
    spark = graph.edges.sparkSession
    adj: dict[int, set[int]] = {}
    for r in graph.edges.select("src", "dst").collect():
        a, b = int(r["src"]), int(r["dst"])
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    edges = {(min(a, b), max(a, b)) for a in adj for b in adj[a]}
    sup = {(u, v): len(adj[u] & adj[v]) for u, v in edges}
    truss: dict[tuple[int, int], int] = {}
    alive = set(edges)
    k = 2
    while alive:
        queue = [e for e in alive if sup[e] < k - 1]
        while queue:
            e = queue.pop()
            if e not in alive:
                continue
            u, v = e
            truss[e] = k
            alive.discard(e)
            for w in adj[u] & adj[v]:
                for f in ((min(u, w), max(u, w)), (min(v, w), max(v, w))):
                    if f in alive:
                        sup[f] -= 1
                        if sup[f] < k - 1:
                            queue.append(f)
            adj[u].discard(v)
            adj[v].discard(u)
        if alive:
            # plateau skip: the next k that can drop anything has
            # threshold just above the current minimum support
            k = max(k + 1, min(sup[e] for e in alive) + 2)
    return spark.createDataFrame(
        [(u, v, t) for (u, v), t in truss.items()], "u long, v long, truss long"
    )


def _edge_support(cur: DataFrame) -> DataFrame:
    """Per-edge triangle support within the current (canonical u < v)
    edge set — one degree-ordered closed-wedge join, corners exploded to
    the three participating edges and hash-aggregated."""
    e1 = cur.select(F.col("u").alias("a"), F.col("v").alias("b"))
    e2 = cur.select(F.col("u").alias("b"), F.col("v").alias("c"))
    e3 = cur.select(F.col("u").alias("a"), F.col("v").alias("c"))
    tri = e1.join(e2, "b").join(e3, ["a", "c"])
    pairs = (
        tri.select(F.col("a").alias("u"), F.col("b").alias("v"))
        .unionAll(tri.select(F.col("b").alias("u"), F.col("c").alias("v")))
        .unionAll(tri.select(F.col("a").alias("u"), F.col("c").alias("v")))
    )
    sup = pairs.groupBy("u", "v").agg(F.count(F.lit(1)).alias("sup"))
    return cur.join(sup, ["u", "v"], "left").fillna({"sup": 0})


def k_truss_edges(
    graph: Graph,
    k: int,
    local_edges_threshold: int = 100_000,
    max_rounds: int = 1000,
) -> DataFrame:
    """The edges of the k-truss: ``(u long, v long)`` canonical pairs.
    Batch peel: drop every edge with support < k-2, recompute, repeat to
    fixpoint (round count = peel depth)."""
    if graph.edges.count() <= local_edges_threshold:
        t = _truss_driver(graph)
        return t.filter(F.col("truss") >= k).select("u", "v")

    cur = materialize(
        graph.edges.select(
            F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    for _ in range(max_rounds):
        scored = materialize(_edge_support(cur))
        nxt = materialize(scored.filter(F.col("sup") >= k - 2).select("u", "v"))
        release(scored)
        n_prev, n_next = cur.count(), nxt.count()
        release(cur)
        cur = nxt
        if n_next == n_prev or n_next == 0:
            break
    return cur


def truss_number(
    graph: Graph,
    local_edges_threshold: int = 100_000,
    max_rounds: int = 10_000,
    store=None,
    stage: str = "truss",
) -> DataFrame:
    """Full decomposition: ``(u long, v long, truss long)`` for every
    canonical edge (t >= 2 always; higher = denser embedding).

    ``store`` (a checkpoint.CheckpointStore) snapshots the surviving
    edge set, the accumulated truss assignments, and (k, rounds) after
    every peel round, so a killed run resumes mid-decomposition with
    identical output — the same per-superstep lineage contract as the
    Louvain/GN/Infomap kernels."""
    if graph.edges.count() <= local_edges_threshold:
        return _truss_driver(graph)

    spark = graph.edges.sparkSession
    meta_key = f"{stage}_state"
    done_df: DataFrame | None = None
    if store is not None and store.has_meta(meta_key):
        meta = store.load_meta(meta_key)
        if meta.get("done"):
            return materialize(store.load_df(spark, f"{stage}_result"))
        cur = materialize(store.load_df(spark, f"{stage}_cur"))
        if store.has_df(f"{stage}_assign"):
            done_df = materialize(store.load_df(spark, f"{stage}_assign"))
        k, rounds = int(meta["k"]), int(meta["rounds"])
    else:
        cur = materialize(
            graph.edges.select(
                F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
            )
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        k, rounds = 2, 0

    def _snapshot() -> None:
        if store is None:
            return
        store.save_df(f"{stage}_cur", cur)
        if done_df is not None:
            store.save_df(f"{stage}_assign", done_df)
        store.save_meta(meta_key, {"k": k, "rounds": rounds, "done": False})
        store.lineage(stage, rounds, cur, kind="truss_round", k=k)

    while cur.count() > 0 and rounds < max_rounds:
        # peel phase for k: edges failing the (k+1)-truss bar get truss k
        s_min = None
        while rounds < max_rounds:
            rounds += 1
            scored = materialize(_edge_support(cur))
            drop = scored.filter(F.col("sup") < k - 1)
            if drop.limit(1).count() == 0:
                s_min = scored.agg(F.min("sup")).collect()[0][0]
                release(scored)
                break
            dropped = materialize(
                drop.select("u", "v", F.lit(k).cast("long").alias("truss"))
            )
            new_done = materialize(
                dropped if done_df is None else done_df.unionByName(dropped)
            )
            release(dropped)
            if done_df is not None:
                release(done_df)
            done_df = new_done
            nxt = materialize(scored.filter(F.col("sup") >= k - 1).select("u", "v"))
            release(scored)
            release(cur)
            cur = nxt
            _snapshot()
        # plateau skip: jump to the first threshold that can drop an edge
        k = max(k + 1, (s_min + 2) if s_min is not None else k + 1)
    out = (
        done_df
        if done_df is not None
        else spark.createDataFrame([], "u long, v long, truss long")
    )
    if store is not None:
        store.save_df(f"{stage}_result", out)
        store.save_meta(meta_key, {"done": True})
        store.lineage(stage, -1, out, kind="truss_done")
    return out
