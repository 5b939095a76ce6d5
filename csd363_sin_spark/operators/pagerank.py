"""Distributed PageRank over the symmetric edge table (SURVEY G10).

The reference only has degree-proportional visit rates (reference
evaluation.py:204-207); the north rule requires full PageRank with scores
matching a trusted implementation to ``allclose(1e-6)``.  Semantics are
pinned to ``networkx.pagerank`` so the oracle test is exact:

* x0 = 1/n; out-strength = (weighted) degree;
* dangling vertices (isolates, for an undirected graph) redistribute
  their mass uniformly;
* x' = (1-a)/n + a * (M^T x + dangling/n);
* converge when sum_v |x'_v - x_v| < n * tol.

Scale notes: one shuffle per iteration (contribs groupBy dst) plus a
broadcast-sized scalar for the dangling mass.  The static "share" edge
view (weight / out-strength, precomputed once) is persisted so each
iteration only shuffles the rank vector.  Ranks are localCheckpoint-ed
every iteration to truncate lineage.  Hub-vertex skew on the gather side
is absorbed by map-side partial aggregation of contributions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from csd363_sin_spark.plans.induce import Graph
from csd363_sin_spark.plans.lineage import materialize, release


def _pagerank_driver(
    graph: Graph,
    alpha: float,
    tol: float,
    max_iter: int,
    weighted: bool,
    reset: DataFrame | None = None,
) -> DataFrame:
    """Driver-side numpy power iteration for a graph small enough to
    collect — the SAME semantics (init, dangling redistribution, L1
    convergence on n*tol) as the distributed loop; results agree to
    ~1e-12 (FP summation order is the only difference).  Adaptive
    dispatch mirror of operators/louvain.py `_local_move_phase_driver`:
    at scale the real graph runs distributed, a subgraph/contracted-level
    caller gets one collect instead of ~5 Spark jobs per iteration."""
    import numpy as np

    spark = graph.edges.sparkSession
    vids = np.array(
        sorted(r["vertex_id"] for r in graph.vertices.collect()), dtype=np.int64
    )
    n = len(vids)
    idx = {int(v): i for i, v in enumerate(vids)}
    rows = graph.edges.collect()
    src = np.empty(2 * len(rows), dtype=np.int64)
    dst = np.empty(2 * len(rows), dtype=np.int64)
    w = np.empty(2 * len(rows), dtype=np.float64)
    k = 0
    for r in rows:
        a, b = idx[int(r["src"])], idx[int(r["dst"])]
        wt = float(r["weight"]) if weighted else 1.0
        src[k], dst[k], w[k] = a, b, wt
        k += 1
        if a != b:
            src[k], dst[k], w[k] = b, a, wt
            k += 1
    src, dst, w = src[:k], dst[:k], w[:k]
    out_w = np.bincount(src, weights=w, minlength=n)
    dangling = out_w == 0
    share = w / np.where(out_w[src] == 0, 1.0, out_w[src])

    # teleport distribution: uniform, or the normalized reset vector
    # (networkx `personalization` semantics: x0 = p, teleport to p,
    # dangling mass redistributed proportionally to p)
    if reset is None:
        p = np.full(n, 1.0 / n)
    else:
        p = np.zeros(n)
        for r in reset.collect():
            p[idx[int(r["vertex_id"])]] = float(r["p"])
        p /= p.sum()

    x = p.copy()
    for _ in range(max_iter):
        in_mass = np.bincount(dst, weights=share * x[src], minlength=n)
        d_mass = float(x[dangling].sum()) if dangling.any() else 0.0
        x_new = (1.0 - alpha) * p + alpha * (in_mass + d_mass * p)
        err = float(np.abs(x_new - x).sum())
        x = x_new
        if tol > 0.0 and err < n * tol:
            break
    return spark.createDataFrame(
        [(int(v), float(x[i])) for i, v in enumerate(vids)],
        "vertex_id long, rank double",
    )


def pagerank(
    graph: Graph,
    alpha: float = 0.85,
    tol: float = 1.0e-6,
    max_iter: int = 100,
    weighted: bool = True,
    local_edges_threshold: int = 100_000,
    reset: DataFrame | None = None,
) -> DataFrame:
    """Return ``(vertex_id long, rank double)`` summing to 1.

    ``reset``: optional ``(vertex_id, p)`` teleport distribution
    (normalized internally; vertices absent from it get p = 0) — the
    networkx ``personalization`` semantics: x0 = p, (1-α) restarts land
    on p, dangling mass is redistributed proportionally to p.  ``None``
    keeps the classic uniform teleport (and its cheaper scalar-base
    plan: the personalized path pays one extra broadcast-sized join per
    iteration, nothing more).
    """
    spark = graph.edges.sparkSession
    n = graph.vertices.count()
    if n == 0:
        return spark.createDataFrame([], "vertex_id long, rank double")
    if reset is not None:
        tot = float(reset.agg(F.sum("p")).collect()[0][0])
        reset = reset.select("vertex_id", (F.col("p") / F.lit(tot)).alias("p"))
    if graph.edges.count() <= local_edges_threshold:
        return _pagerank_driver(graph, alpha, tol, max_iter, weighted, reset)

    w = F.col("weight") if weighted else F.lit(1.0)
    sym = graph.edges_sym().select("src", "dst", w.alias("w"))
    out_str = sym.groupBy("src").agg(F.sum("w").alias("out_w"))
    shares = (
        sym.join(out_str, "src")
        .select("src", "dst", (F.col("w") / F.col("out_w")).alias("share"))
        .persist()
    )
    shares.count()

    degs = graph.degrees()
    dangling = degs.filter(F.col("degree") == 0).select("vertex_id").persist()
    has_dangling = not dangling.isEmpty()

    if reset is not None:
        # full teleport vector (zeros for vertices outside the reset set),
        # persisted: it is joined once per iteration and never changes
        pvec = (
            graph.vertices.select("vertex_id")
            .join(reset, "vertex_id", "left")
            .fillna({"p": 0.0})
            .persist()
        )
        pvec.count()
        ranks = last_cut = materialize(
            pvec.select("vertex_id", F.col("p").alias("rank"))
        )
    else:
        pvec = None
        ranks = last_cut = materialize(graph.vertices.select(
            "vertex_id", F.lit(1.0 / n).alias("rank")
        ))

    check_convergence = tol > 0.0
    for it in range(max_iter):
        contribs = (
            shares.join(
                ranks.withColumnRenamed("vertex_id", "src"), "src"
            )
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
        if pvec is None:
            base = (1.0 - alpha) / n + alpha * dangling_mass / n
            new_ranks = (
                graph.vertices.select("vertex_id")
                .join(contribs, "vertex_id", "left")
                .fillna({"in_mass": 0.0})
                .select(
                    "vertex_id",
                    (F.lit(base) + F.lit(alpha) * F.col("in_mass")).alias("rank"),
                )
            )
        else:
            # per-vertex base: (1-α)p + α·d_mass·p (teleport follows p)
            new_ranks = (
                pvec.join(contribs, "vertex_id", "left")
                .fillna({"in_mass": 0.0})
                .select(
                    "vertex_id",
                    (
                        F.lit(1.0 - alpha) * F.col("p")
                        + F.lit(alpha)
                        * (F.col("in_mass") + F.lit(dangling_mass) * F.col("p"))
                    ).alias("rank"),
                )
            )
        # lineage/stats cut every few iterations is enough (plan depth
        # stays bounded); cutting every iteration doubles serialization
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
            # new_ranks is materialized and err is computed — the previous
            # checkpoint's blocks are dead; don't pin one per iteration
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
    if pvec is not None:
        pvec.unpersist()
    return ranks


def personalized_pagerank(
    graph: Graph,
    seeds: DataFrame,
    alpha: float = 0.85,
    tol: float = 1.0e-6,
    max_iter: int = 100,
    weighted: bool = True,
    local_edges_threshold: int = 100_000,
) -> DataFrame:
    """Random-walk-with-restart scores from a seed set: PageRank whose
    teleport distribution is uniform over ``seeds`` (a DataFrame with a
    ``vertex_id`` column) — the standard link-graph relatedness query
    ("what is near THESE nodes"), networkx
    ``pagerank(personalization=...)`` semantics.

    Same kernels and scale shape as :func:`pagerank`; the personalized
    distributed path adds one broadcast-sized join with the (persisted,
    |V|-row) teleport vector per iteration.
    """
    reset = seeds.select("vertex_id").distinct().withColumn("p", F.lit(1.0))
    return pagerank(
        graph,
        alpha=alpha,
        tol=tol,
        max_iter=max_iter,
        weighted=weighted,
        local_edges_threshold=local_edges_threshold,
        reset=reset,
    )


def visit_rates(graph: Graph) -> DataFrame:
    """Degree-proportional stationary distribution p_v = deg(v)/2m —
    the reference's random-walker visit rates (evaluation.py:204-207)."""
    m2 = 2.0 * graph.edges.count()
    return graph.degrees().select(
        "vertex_id", (F.col("degree") / F.lit(m2)).alias("rate")
    )
