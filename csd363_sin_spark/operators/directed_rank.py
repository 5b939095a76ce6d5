"""Directed link-analysis scores: PageRank and HITS on the handoff graph.

Beyond-reference directed-layer operators (the reference engine is
undirected-only).  Directed PageRank semantics are pinned to
``networkx.pagerank`` on a DiGraph, exactly as operators/pagerank.py
pins the undirected case:

* x0 = 1/n; out-strength = (weighted) out-degree;
* dangling vertices (out-degree 0 — common in directed graphs, unlike
  the undirected case where only isolates dangle) spread uniformly;
* x' = (1-a)/n + a * (M^T x + dangling/n); L1 convergence on n*tol.

HITS is a deterministic fixed-point spec (testable vs ``networkx.hits``
at convergence): per iteration ``auth(v) = sum_{u->v} w * hub(u)`` then
``hub(u) = sum_{u->v} w * auth(v)``, each L1-normalized; start hub =
1/n.  Both operators follow the engine's adaptive-dispatch pattern:
numpy power iteration driver-side at or below ``local_edges_threshold``
edges, join-dataflow supersteps above it, results allclose(1e-9) across
paths (FP summation order is the only difference).

Scale notes (distributed paths): the share/edge view is persisted and
pre-partitioned once; each iteration shuffles only the |V|-row score
vector into a map-side-combined sum (hub fan-in collapses per map task);
dangling mass is one scalar aggregate per iteration; lineage is cut per
iteration via localCheckpoint (plans/lineage.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from csd363_sin_spark.plans.directed import DiGraph
from csd363_sin_spark.plans.lineage import materialize, release


def _collect_arrays(dg: DiGraph, weighted: bool):
    import numpy as np

    vids = np.array(
        sorted(r[0] for r in dg.vertices.select("vertex_id").collect()),
        dtype=np.int64,
    )
    idx = {int(v): i for i, v in enumerate(vids)}
    rows = dg.edges.collect()
    src = np.empty(len(rows), dtype=np.int64)
    dst = np.empty(len(rows), dtype=np.int64)
    w = np.empty(len(rows), dtype=np.float64)
    for k, r in enumerate(rows):
        src[k] = idx[int(r["src"])]
        dst[k] = idx[int(r["dst"])]
        w[k] = float(r["weight"]) if weighted else 1.0
    return vids, src, dst, w


def _pagerank_directed_driver(
    dg: DiGraph, alpha: float, tol: float, max_iter: int, weighted: bool
) -> DataFrame:
    import numpy as np

    spark = dg.edges.sparkSession
    vids, src, dst, w = _collect_arrays(dg, weighted)
    n = len(vids)
    out_w = np.bincount(src, weights=w, minlength=n)
    dangling = out_w == 0
    share = w / np.where(out_w[src] == 0, 1.0, out_w[src])
    x = np.full(n, 1.0 / n)
    for _ in range(max_iter):
        in_mass = np.bincount(dst, weights=share * x[src], minlength=n)
        d_mass = float(x[dangling].sum()) if dangling.any() else 0.0
        x_new = (1.0 - alpha) / n + alpha * (in_mass + d_mass / n)
        err = float(np.abs(x_new - x).sum())
        x = x_new
        if tol > 0.0 and err < n * tol:
            break
    return spark.createDataFrame(
        [(int(v), float(x[i])) for i, v in enumerate(vids)],
        "vertex_id long, rank double",
    )


def pagerank_directed(
    dg: DiGraph,
    alpha: float = 0.85,
    tol: float = 1.0e-6,
    max_iter: int = 100,
    weighted: bool = True,
    local_edges_threshold: int = 100_000,
) -> DataFrame:
    """Return ``(vertex_id long, rank double)`` summing to 1."""
    spark = dg.edges.sparkSession
    n = dg.vertices.count()
    if n == 0:
        return spark.createDataFrame([], "vertex_id long, rank double")
    if dg.edges.count() <= local_edges_threshold:
        return _pagerank_directed_driver(dg, alpha, tol, max_iter, weighted)

    w = F.col("weight") if weighted else F.lit(1.0)
    e = dg.edges.select("src", "dst", w.alias("w"))
    out_str = e.groupBy("src").agg(F.sum("w").alias("out_w"))
    shares = (
        e.join(out_str, "src")
        .select("src", "dst", (F.col("w") / F.col("out_w")).alias("share"))
        .repartition("src")
        .persist()
    )
    shares.count()
    dangling = (
        dg.vertices.select("vertex_id")
        .join(
            out_str.withColumnRenamed("src", "vertex_id"),
            "vertex_id",
            "left_anti",
        )
        .persist()
    )
    has_dangling = not dangling.isEmpty()

    ranks = last_cut = materialize(
        dg.vertices.select("vertex_id", F.lit(1.0 / n).alias("rank"))
    )
    check_convergence = tol > 0.0
    for it in range(max_iter):
        contribs = (
            shares.join(ranks.withColumnRenamed("vertex_id", "src"), "src")
            .groupBy(F.col("dst").alias("vertex_id"))
            .agg(F.sum(F.col("share") * F.col("rank")).alias("in_mass"))
        )
        if has_dangling:
            d_row = (
                ranks.join(dangling, "vertex_id", "left_semi")
                .agg(F.sum("rank"))
                .collect()[0][0]
            )
            dangling_mass = float(d_row or 0.0)
        else:
            dangling_mass = 0.0
        base = (1.0 - alpha) / n + alpha * dangling_mass / n
        new_ranks = (
            dg.vertices.select("vertex_id")
            .join(contribs, "vertex_id", "left")
            .fillna({"in_mass": 0.0})
            .select(
                "vertex_id",
                (F.lit(base) + F.lit(alpha) * F.col("in_mass")).alias("rank"),
            )
        )
        new_is_cut = check_convergence or it % 3 == 2 or it == max_iter - 1
        if new_is_cut:
            new_ranks = materialize(new_ranks)
        if check_convergence:
            err = (
                new_ranks.join(
                    ranks.withColumnRenamed("rank", "old"), "vertex_id"
                )
                .agg(F.sum(F.abs(F.col("rank") - F.col("old"))))
                .collect()[0][0]
            )
            release(last_cut)
            ranks = last_cut = new_ranks
            if err < n * tol:
                break
        else:
            if new_is_cut:
                release(last_cut)
                last_cut = new_ranks
            ranks = new_ranks
    shares.unpersist()
    dangling.unpersist()
    return ranks


def _hits_driver(
    dg: DiGraph, iterations: int, weighted: bool
) -> DataFrame:
    import numpy as np

    spark = dg.edges.sparkSession
    vids, src, dst, w = _collect_arrays(dg, weighted)
    n = len(vids)
    hub = np.full(n, 1.0 / n)
    auth = np.zeros(n)
    for _ in range(iterations):
        auth = np.bincount(dst, weights=w * hub[src], minlength=n)
        s = float(auth.sum())
        if s > 0.0:
            auth = auth / s
        hub = np.bincount(src, weights=w * auth[dst], minlength=n)
        s = float(hub.sum())
        if s > 0.0:
            hub = hub / s
    return spark.createDataFrame(
        [(int(v), float(hub[i]), float(auth[i])) for i, v in enumerate(vids)],
        "vertex_id long, hub double, auth double",
    )


def hits(
    dg: DiGraph,
    iterations: int = 50,
    weighted: bool = True,
    local_edges_threshold: int = 100_000,
) -> DataFrame:
    """Hubs & authorities: ``(vertex_id, hub double, auth double)``, each
    vector L1-normalized.  Fixed ``iterations`` (no tolerance) so the
    spec is portable to an unrolled-CTE SQL oracle."""
    spark = dg.edges.sparkSession
    n = dg.vertices.count()
    if n == 0:
        return spark.createDataFrame(
            [], "vertex_id long, hub double, auth double"
        )
    if dg.edges.count() <= local_edges_threshold:
        return _hits_driver(dg, iterations, weighted)

    w = F.col("weight") if weighted else F.lit(1.0)
    e = dg.edges.select("src", "dst", w.alias("w")).repartition("src").persist()
    e.count()
    verts = dg.vertices.select("vertex_id")
    hub = hub_cut = materialize(
        verts.select("vertex_id", F.lit(1.0 / n).alias("hub"))
    )
    auth = auth_cut = None
    for _ in range(iterations):
        raw_auth = (
            e.join(hub.withColumnRenamed("vertex_id", "src"), "src")
            .groupBy(F.col("dst").alias("vertex_id"))
            .agg(F.sum(F.col("w") * F.col("hub")).alias("a"))
        )
        new_auth_cut = materialize(
            verts.join(raw_auth, "vertex_id", "left").fillna({"a": 0.0})
        )
        release(auth_cut)
        auth_cut = new_auth_cut
        a_sum = float(auth_cut.agg(F.sum("a")).collect()[0][0] or 0.0)
        auth = (
            auth_cut.select(
                "vertex_id", (F.col("a") / F.lit(a_sum)).alias("a")
            )
            if a_sum > 0.0
            else auth_cut
        )
        raw_hub = (
            e.join(auth.withColumnRenamed("vertex_id", "dst"), "dst")
            .groupBy(F.col("src").alias("vertex_id"))
            .agg(F.sum(F.col("w") * F.col("a")).alias("hub"))
        )
        new_hub = materialize(
            verts.join(raw_hub, "vertex_id", "left").fillna({"hub": 0.0})
        )
        h_sum = float(new_hub.agg(F.sum("hub")).collect()[0][0] or 0.0)
        if h_sum > 0.0:
            normed = materialize(
                new_hub.select(
                    "vertex_id", (F.col("hub") / F.lit(h_sum)).alias("hub")
                )
            )
            release(new_hub)
            new_hub = normed
        release(hub_cut)
        hub = hub_cut = new_hub
    out = hub.join(
        auth.withColumnRenamed("a", "auth")
        if auth is not None
        else verts.select("vertex_id", F.lit(0.0).alias("auth")),
        "vertex_id",
    ).select("vertex_id", "hub", "auth")
    result = materialize(out)
    e.unpersist()
    release(hub_cut)
    release(auth_cut)
    return result
