"""Eigenvector centrality (weighted power iteration) — beyond the reference.

The HITS-family importance score on an undirected graph (where hubs ==
authorities == the principal eigenvector of the weighted adjacency):
iterate ``x' = (A + I) x`` and renormalize, starting from the all-ones
vector.  The +I shift is networkx's recurrence — it makes the iteration
aperiodic, so it converges on bipartite graphs too (pure ``A x``
oscillates on a star), while leaving the fixpoint eigenvector unchanged.
Normalization is by the MAX component, not the L2 norm — max-norm is a
pure division (no sqrt), which keeps every intermediate value exactly
reproducible in the DuckDB SQL oracle; the fixpoint direction is the
same (the two normalizations differ only by a positive scalar).

Scale design: each power iteration is the same shape as a PageRank
superstep — one map-side-combined ``groupBy(dst).sum(weight * x)``
gather over the symmetric edge view (the only O(E) exchange), one |V|
-row join to re-attach isolates, and one scalar max.  The sym view is
persisted with visible partitioning once; per-iteration state is
``materialize``d so lineage stays flat.  Driver dispatch below
``local_edges_threshold`` runs the identical recurrence as a numpy
kernel (cross-path parity ~1e-15, pinned by tests at 1e-9).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from csd363_sin_spark.plans.induce import Graph
from csd363_sin_spark.plans.lineage import materialize, release


def _eigenvector_driver(graph: Graph, max_iter: int, tol: float) -> DataFrame:
    import numpy as np

    spark = graph.edges.sparkSession
    ids = sorted(
        int(r["vertex_id"]) for r in graph.vertices.select("vertex_id").collect()
    )
    idx = {v: i for i, v in enumerate(ids)}
    edges = graph.edges.select("src", "dst", "weight").collect()
    n = len(ids)
    src = np.fromiter(
        (idx[int(r["src"])] for r in edges), dtype=np.int64, count=len(edges)
    )
    dst = np.fromiter(
        (idx[int(r["dst"])] for r in edges), dtype=np.int64, count=len(edges)
    )
    w = np.fromiter((float(r["weight"]) for r in edges), dtype=np.float64, count=len(edges))
    x = np.ones(n, dtype=np.float64)
    for _ in range(max_iter):
        g = x.copy()  # the +I term
        np.add.at(g, dst, w * x[src])
        np.add.at(g, src, w * x[dst])
        mx = g.max() if n else 0.0
        if mx == 0.0:
            x = g
            break
        xn = g / mx
        if tol > 0.0 and float(np.abs(xn - x).sum()) < tol:
            x = xn
            break
        x = xn
    return spark.createDataFrame(
        [(v, float(x[i])) for v, i in idx.items()], "vertex_id long, score double"
    )


def _katz_driver(
    graph: Graph, alpha: float, beta: float, max_iter: int, tol: float
) -> DataFrame:
    import numpy as np

    spark = graph.edges.sparkSession
    ids = sorted(
        int(r["vertex_id"]) for r in graph.vertices.select("vertex_id").collect()
    )
    idx = {v: i for i, v in enumerate(ids)}
    edges = graph.edges.select("src", "dst", "weight").collect()
    n = len(ids)
    src = np.fromiter((idx[int(r["src"])] for r in edges), dtype=np.int64, count=len(edges))
    dst = np.fromiter((idx[int(r["dst"])] for r in edges), dtype=np.int64, count=len(edges))
    w = np.fromiter((float(r["weight"]) for r in edges), dtype=np.float64, count=len(edges))
    x = np.zeros(n, dtype=np.float64)
    for _ in range(max_iter):
        g = np.zeros(n, dtype=np.float64)
        np.add.at(g, dst, w * x[src])
        np.add.at(g, src, w * x[dst])
        xn = alpha * g + beta
        if tol > 0.0 and float(np.abs(xn - x).sum()) < tol:
            x = xn
            break
        x = xn
    return spark.createDataFrame(
        [(v, float(x[i])) for v, i in idx.items()], "vertex_id long, score double"
    )


def katz_centrality(
    graph: Graph,
    alpha: float = 0.005,
    beta: float = 1.0,
    max_iter: int = 200,
    tol: float = 1e-10,
    local_edges_threshold: int = 100_000,
) -> DataFrame:
    """Katz centrality (networkx recurrence, UN-normalized): iterate
    ``x' = alpha * A x + beta`` from x0 = 0.  Converges iff alpha <
    1/lambda_max; with ``tol=0`` runs exactly ``max_iter`` steps (the
    fixed-work oracle mode, well-defined for any alpha).  Callers wanting
    networkx's ``normalized=True`` divide by the L2 norm afterwards.

    Same superstep shape as :func:`eigenvector_centrality` (one
    map-side-combined gather over the src-pre-partitioned sym view per
    iteration) minus the scalar max job — Katz needs no per-step
    normalization, which makes it the cheapest of the three
    power-iteration centralities per superstep."""
    if graph.edges.count() <= local_edges_threshold:
        return _katz_driver(graph, alpha, beta, max_iter, tol)

    sym = (
        graph.edges_sym()
        .select("src", "dst", "weight")
        .repartition("src")
        .persist()
    )
    sym.count()
    verts = graph.vertices.select("vertex_id")
    x = materialize(verts.select("vertex_id", F.lit(0.0).alias("score")))
    for _ in range(max_iter):
        xs = x.select(F.col("vertex_id").alias("src"), F.col("score").alias("xs"))
        gather = (
            sym.join(xs, "src")
            .groupBy(F.col("dst").alias("vertex_id"))
            .agg(F.sum(F.col("weight") * F.col("xs")).alias("gather"))
        )
        new_x = materialize(
            x.join(gather, "vertex_id", "left")
            .fillna({"gather": 0.0})
            .select(
                "vertex_id",
                (F.lit(alpha) * F.col("gather") + F.lit(beta)).alias("score"),
            )
        )
        if tol > 0.0:
            delta = (
                new_x.withColumnRenamed("score", "s_new")
                .join(x, "vertex_id")
                .agg(F.sum(F.abs(F.col("s_new") - F.col("score"))))
                .collect()[0][0]
            )
        else:
            delta = None
        release(x)
        x = new_x
        if delta is not None and delta < tol:
            break
    sym.unpersist()
    return x


def eigenvector_centrality(
    graph: Graph,
    max_iter: int = 100,
    tol: float = 1e-10,
    local_edges_threshold: int = 100_000,
) -> DataFrame:
    """``(vertex_id long, score double)`` with scores max-normalized to
    [0, 1].  ``tol=0`` disables early stop (fixed-work oracle mode);
    isolates score 0."""
    if graph.edges.count() <= local_edges_threshold:
        return _eigenvector_driver(graph, max_iter, tol)

    # pre-partitioned on the per-iteration join key (src) and persisted
    # with VISIBLE partitioning, so each gather join exchanges only the
    # |V|-row score side — the same shuffle-trim as the Louvain sym view
    sym = (
        graph.edges_sym()
        .select("src", "dst", "weight")
        .repartition("src")
        .persist()
    )
    sym.count()
    verts = graph.vertices.select("vertex_id")
    x = materialize(verts.select("vertex_id", F.lit(1.0).alias("score")))
    for _ in range(max_iter):
        xs = x.select(F.col("vertex_id").alias("src"), F.col("score").alias("xs"))
        gather = (
            sym.join(xs, "src")
            .groupBy(F.col("dst").alias("vertex_id"))
            .agg(F.sum(F.col("weight") * F.col("xs")).alias("gather"))
        )
        combined = materialize(
            x.join(gather, "vertex_id", "left")
            .fillna({"gather": 0.0})
            .select(
                "vertex_id", (F.col("score") + F.col("gather")).alias("comb")
            )
        )
        mx = combined.agg(F.max("comb")).collect()[0][0]
        if mx is None or mx == 0.0:  # empty vertex set only
            release(combined)
            break
        new_x = materialize(
            combined.select(
                "vertex_id", (F.col("comb") / F.lit(float(mx))).alias("score")
            )
        )
        release(combined)
        if tol > 0.0:
            delta = (
                new_x.withColumnRenamed("score", "s_new")
                .join(x, "vertex_id")
                .agg(F.sum(F.abs(F.col("s_new") - F.col("score"))))
                .collect()[0][0]
            )
        else:
            delta = None
        release(x)
        x = new_x
        if delta is not None and delta < tol:
            break
    sym.unpersist()
    return x


def _fiedler_start_expr(key_col):
    # deterministic engine-portable pseudo-random start in [0, 1):
    # (md5-prefix hash of the key) % 1000003 / 1000003
    from csd363_sin_spark.functions.dedup import portable_hash64

    return F.pmod(
        portable_hash64(F.concat(F.lit("fiedler:"), key_col.cast("string"))),
        F.lit(1000003),
    ) / F.lit(1000003.0)


def _fiedler_driver(graph: Graph, start_rows: list, max_iter: int, tol: float) -> DataFrame:
    import numpy as np

    spark = graph.edges.sparkSession
    ids = sorted(int(v) for v, _ in start_rows)
    idx = {v: i for i, v in enumerate(ids)}
    n = len(ids)
    x = np.zeros(n, dtype=np.float64)
    for v, s in start_rows:
        x[idx[int(v)]] = float(s)
    edges = graph.edges.select("src", "dst", "weight").collect()
    src = np.fromiter((idx[int(r["src"])] for r in edges), dtype=np.int64, count=len(edges))
    dst = np.fromiter((idx[int(r["dst"])] for r in edges), dtype=np.int64, count=len(edges))
    w = np.fromiter((float(r["weight"]) for r in edges), dtype=np.float64, count=len(edges))
    deg = np.zeros(n, dtype=np.float64)
    np.add.at(deg, src, w)
    np.add.at(deg, dst, w)
    c = 1.0 + 2.0 * (deg.max() if n else 0.0)
    for _ in range(max_iter):
        g = (c - deg) * x
        np.add.at(g, dst, w * x[src])
        np.add.at(g, src, w * x[dst])
        y = g - (g.sum() / n if n else 0.0)
        mx = float(np.abs(y).max()) if n else 0.0
        if mx == 0.0:
            x = y
            break
        xn = y / mx
        if tol > 0.0 and float(np.abs(xn - x).sum()) < tol:
            x = xn
            break
        x = xn
    return spark.createDataFrame(
        [(v, float(x[i])) for v, i in idx.items()], "vertex_id long, fiedler double"
    )


def fiedler_vector(
    graph: Graph,
    max_iter: int = 100,
    tol: float = 0.0,
    local_edges_threshold: int = 100_000,
    start: DataFrame | None = None,
) -> DataFrame:
    """Fiedler vector (second-smallest Laplacian eigenvector) by deflated
    power iteration — the spectral-bipartition signal (Fiedler 1973;
    sign(fiedler) splits the graph along a small cut).

    Iterates the shifted Laplacian ``M = cI - L`` with ``c = 1 + 2*d_max``
    (a strict upper bound of lambda_max(L), so M is PSD with the constant
    vector dominant); subtracting the mean every step deflates that
    trivial eigenvector, leaving the Fiedler direction dominant.  Exact
    recurrence (the spec the driver kernel, distributed kernel, and SQL
    oracle all share):

        g = (c - deg) * x + A x        # one gather, PageRank-shaped
        y = g - avg(g)                 # deflate the constant vector
        x = y / max(|y|)               # max-norm (no sqrt -> portable)

    ``start`` — optional ``(vertex_id, score)`` start vector (must not be
    orthogonal to the Fiedler direction); default = engine-portable hash
    of the vertex id in [0, 1).  ``tol=0`` runs exactly ``max_iter``
    steps (fixed-work oracle mode).  On disconnected graphs the limit
    lives in the component-indicator eigenspace (lambda = 0 multiplicity)
    — an even stronger cut signal; the fixed-K run is deterministic
    regardless.  Returns ``(vertex_id, fiedler)``; callers bipartition by
    ``fiedler >= 0``.

    Scale shape: identical superstep to :func:`eigenvector_centrality`
    (one map-side-combined gather over the src-pre-partitioned sym view,
    the only O(E) exchange) plus two scalar jobs (mean, max-abs)."""
    verts = graph.vertices.select("vertex_id")
    if start is None:
        start_df = verts.select(
            "vertex_id", _fiedler_start_expr(F.col("vertex_id")).alias("score")
        )
    else:
        start_df = start.select("vertex_id", "score")
    if graph.edges.count() <= local_edges_threshold:
        rows = [(r["vertex_id"], r["score"]) for r in start_df.collect()]
        return _fiedler_driver(graph, rows, max_iter, tol)

    sym = (
        graph.edges_sym()
        .select("src", "dst", "weight")
        .repartition("src")
        .persist()
    )
    sym.count()
    deg = sym.groupBy(F.col("src").alias("vertex_id")).agg(
        F.sum("weight").alias("deg")
    )
    deg = verts.join(deg, "vertex_id", "left").fillna({"deg": 0.0}).persist()
    c = 1.0 + 2.0 * float(deg.agg(F.max("deg")).collect()[0][0] or 0.0)
    n = verts.count()
    x = materialize(start_df)
    for _ in range(max_iter):
        xs = x.select(F.col("vertex_id").alias("src"), F.col("score").alias("xs"))
        gather = (
            sym.join(xs, "src")
            .groupBy(F.col("dst").alias("vertex_id"))
            .agg(F.sum(F.col("weight") * F.col("xs")).alias("gather"))
        )
        g = materialize(
            x.join(deg, "vertex_id")
            .join(gather, "vertex_id", "left")
            .fillna({"gather": 0.0})
            .select(
                "vertex_id",
                (
                    (F.lit(c) - F.col("deg")) * F.col("score") + F.col("gather")
                ).alias("g"),
            )
        )
        mean = float(g.agg(F.sum("g")).collect()[0][0] or 0.0) / n if n else 0.0
        y = g.select("vertex_id", (F.col("g") - F.lit(mean)).alias("y"))
        mx = float(g.select(F.max(F.abs(F.col("g") - F.lit(mean)))).collect()[0][0] or 0.0)
        if mx == 0.0:
            new_x = materialize(y.withColumnRenamed("y", "score"))
            release(g)
            release(x)
            x = new_x
            break
        new_x = materialize(
            y.select("vertex_id", (F.col("y") / F.lit(mx)).alias("score"))
        )
        release(g)
        if tol > 0.0:
            delta = (
                new_x.withColumnRenamed("score", "s_new")
                .join(x, "vertex_id")
                .agg(F.sum(F.abs(F.col("s_new") - F.col("score"))))
                .collect()[0][0]
            )
        else:
            delta = None
        release(x)
        x = new_x
        if delta is not None and delta < tol:
            break
    sym.unpersist()
    deg.unpersist()
    return x.withColumnRenamed("score", "fiedler")


def spectral_embedding(
    graph: Graph,
    max_iter: int = 8,
    local_edges_threshold: int = 100_000,
    start: DataFrame | None = None,
    start2: DataFrame | None = None,
) -> DataFrame:
    """Two-coordinate spectral embedding ``(vertex_id, f1, f2)``: f1 is
    the :func:`fiedler_vector` (fixed ``max_iter`` deflated power
    iterations), f2 repeats the same recurrence additionally
    orthogonalized against the FIXED f1 each step —

        g  = (c - deg) * x + A x
        g -= avg(g)
        g -= (sum(g * f1) / sum(f1 * f1)) * f1
        x  = g / max(|g|)

    so f2 approximates the third-smallest Laplacian eigenvector.  Both
    vectors are defined at exactly ``max_iter`` steps (the fixed-work
    portability contract — deflating against the K-step f1 rather than
    the true eigenvector keeps the spec reproducible in any engine).
    The f2 loop is one gather + three scalar jobs per step; f1 dispatches
    through fiedler_vector as usual."""
    f1 = fiedler_vector(
        graph,
        max_iter=max_iter,
        tol=0.0,
        local_edges_threshold=local_edges_threshold,
        start=start,
    ).withColumnRenamed("fiedler", "f1")
    f1 = materialize(f1)
    verts = graph.vertices.select("vertex_id")
    if start2 is None:
        start2 = verts.select(
            "vertex_id", _fiedler_start_expr2(F.col("vertex_id")).alias("score")
        )
    sym = (
        graph.edges_sym()
        .select("src", "dst", "weight")
        .repartition("src")
        .persist()
    )
    sym.count()
    deg = sym.groupBy(F.col("src").alias("vertex_id")).agg(
        F.sum("weight").alias("deg")
    )
    deg = verts.join(deg, "vertex_id", "left").fillna({"deg": 0.0}).persist()
    c = 1.0 + 2.0 * float(deg.agg(F.max("deg")).collect()[0][0] or 0.0)
    n = verts.count()
    norm1 = float(
        f1.agg(F.sum(F.col("f1") * F.col("f1"))).collect()[0][0] or 0.0
    )
    x = materialize(start2.select("vertex_id", "score"))
    for _ in range(max_iter):
        xs = x.select(F.col("vertex_id").alias("src"), F.col("score").alias("xs"))
        gather = (
            sym.join(xs, "src")
            .groupBy(F.col("dst").alias("vertex_id"))
            .agg(F.sum(F.col("weight") * F.col("xs")).alias("gather"))
        )
        g = materialize(
            x.join(deg, "vertex_id")
            .join(gather, "vertex_id", "left")
            .fillna({"gather": 0.0})
            .select(
                "vertex_id",
                (
                    (F.lit(c) - F.col("deg")) * F.col("score") + F.col("gather")
                ).alias("g"),
            )
        )
        mean = float(g.agg(F.sum("g")).collect()[0][0] or 0.0) / n if n else 0.0
        gj = g.join(f1, "vertex_id")
        dot = float(
            gj.agg(F.sum((F.col("g") - F.lit(mean)) * F.col("f1"))).collect()[0][0]
            or 0.0
        )
        coef = dot / norm1 if norm1 > 0 else 0.0
        y = gj.select(
            "vertex_id",
            (F.col("g") - F.lit(mean) - F.lit(coef) * F.col("f1")).alias("y"),
        )
        mx = float(y.agg(F.max(F.abs(F.col("y")))).collect()[0][0] or 0.0)
        new_x = materialize(
            y.select(
                "vertex_id",
                (F.col("y") / F.lit(mx if mx > 0 else 1.0)).alias("score"),
            )
        )
        release(g)  # only after new_x is checkpointed — y reads g
        release(x)
        x = new_x
    sym.unpersist()
    deg.unpersist()
    out = f1.join(x.withColumnRenamed("score", "f2"), "vertex_id").select(
        "vertex_id", "f1", "f2"
    )
    out = materialize(out)
    release(f1)
    release(x)
    return out


def _fiedler_start_expr2(key_col):
    from csd363_sin_spark.functions.dedup import portable_hash64

    return F.pmod(
        portable_hash64(F.concat(F.lit("fiedler2:"), key_col.cast("string"))),
        F.lit(1000003),
    ) / F.lit(1000003.0)


def spectral_clustering(
    graph: Graph,
    n_clusters: int = 4,
    max_iter: int = 8,
    kmeans_iters: int = 3,
    local_edges_threshold: int = 100_000,
    start: DataFrame | None = None,
    start2: DataFrame | None = None,
    portable: bool = False,
) -> DataFrame:
    """Spectral clustering (Shi-Malik style, k > 2): spherical k-means
    over the LIFTED spectral embedding ``[f1, f2, 1]`` with the seeded
    deterministic Lloyd quantizer (functions/similarity.ivf_flat_index —
    cosine metric, seeds = lowest-id vertices, first-index tie-breaks).
    The constant bias coordinate makes cosine-of-lifted-points behave
    like positional closeness on the (f1, f2) plane and keeps
    near-origin vertices well-defined.  Coordinates are 6-dp rounded
    before clustering so the k-means input is engine-portable.  Returns
    ``(vertex_id, cluster)``."""
    from csd363_sin_spark.functions.similarity import ivf_flat_index

    emb = spectral_embedding(
        graph,
        max_iter=max_iter,
        local_edges_threshold=local_edges_threshold,
        start=start,
        start2=start2,
    )
    coords = emb.select(
        F.col("vertex_id").alias("vec_id"),
        F.array(F.round("f1", 6), F.round("f2", 6), F.lit(1.0)).alias("embedding"),
    )
    assigned, _ = ivf_flat_index(
        coords,
        dim=3,
        n_clusters=n_clusters,
        iters=kmeans_iters,
        quantize=6 if portable else None,
        score_round=9 if portable else None,
    )
    return assigned.select(F.col("vec_id").alias("vertex_id"), "cluster")
