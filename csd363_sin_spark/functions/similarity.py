"""Similarity search over embedding columns (training-data pipeline ops).

Brute-force cosine top-k as the exact baseline, and a deterministic
random-hyperplane LSH bucketing as the scale path (probe only matching
buckets; recall tunable by number of tables/bits).

Embeddings are ``array<float/double>`` columns; all math is built-in
(``F.zip_with`` + ``F.aggregate`` dot products, JVM-side) — no Python in
the hot path.  Hyperplane coefficients are derived from ``xxhash64`` of
(table, plane, dim), so plans are reproducible with no RNG state.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine_similarity_col(a, b):
    """Cosine similarity expression between two array columns."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    embeddings: DataFrame,
    probes: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id_col: str = "probe_id",
    probe_vec_col: str = "probe_vec",
) -> DataFrame:
    """Exact brute-force cosine top-k: for every probe vector, the k
    nearest corpus vectors.  Deterministic ties -> lowest corpus id.

    Scale note: cost is |probes| x |corpus| similarity evaluations; the
    corpus side streams (no shuffle) when probes broadcast.  Use
    :func:`lsh_topk` when both sides are large.
    """
    cast = lambda c: F.transform(F.col(c), lambda x: x.cast("double"))
    corpus = embeddings.select(
        F.col(id_col).alias("vec_id"), cast(vec_col).alias("v")
    )
    ps = probes.select(
        F.col(probe_id_col).alias("probe_id"), cast(probe_vec_col).alias("p")
    )
    scored = corpus.crossJoin(F.broadcast(ps)).select(
        "probe_id",
        "vec_id",
        F.round(cosine_similarity_col(F.col("v"), F.col("p")), 6).alias("cosine"),
    )
    return _topk(scored, k)


def _topk(scored: DataFrame, k: int) -> DataFrame:
    """Two-phase top-k per probe: a window partitioned only by probe_id
    caps parallelism at #probes, so first take the top-k WITHIN each input
    partition (parallelism = #probes x #partitions), then rank the
    surviving k x P rows globally — the scale-correct plan."""
    local_w = Window.partitionBy("probe_id", "_pid").orderBy(
        F.desc("cosine"), F.asc("vec_id")
    )
    survivors = (
        scored.withColumn("_pid", F.spark_partition_id())
        .withColumn("_lr", F.row_number().over(local_w))
        .filter(F.col("_lr") <= k)
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        survivors.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "vec_id", "cosine", "rank")
    )


def portable_plane_coeffs(table: int, plane: int, dim: int) -> list[float]:
    """Engine-portable hyperplane coefficients in [-1, 1]: derived from
    md5 of "table:plane:dim" (see functions/dedup.py portable_hash64) so
    the SQL oracle can embed the SAME literal planes.  Computed in plain
    Python — coefficients are plan-time constants either way."""
    import hashlib

    out = []
    for d in range(dim):
        h = int(hashlib.md5(f"{table}:{plane}:{d}".encode()).hexdigest()[:15], 16)
        out.append((h % 2000003) / 1000001.5 - 1.0)
    return out


def hyperplane_bucket(
    vec_col, dim: int, num_planes: int = 8, table: int = 0, portable: bool = False
):
    """Deterministic LSH bucket id: sign bits of ``num_planes``
    pseudo-random hyperplane projections.  Coefficient for (plane p,
    dimension d) = xxhash64(table, p, d) scaled to [-1, 1]; with
    ``portable=True`` the md5-derived :func:`portable_plane_coeffs` are
    embedded as literals instead (bit-identical planes in the DuckDB
    oracle)."""
    bucket = F.lit(0).cast("long")
    for p in range(num_planes):
        if portable:
            coeffs = F.array(
                *[F.lit(c) for c in portable_plane_coeffs(table, p, dim)]
            )
        else:
            coeffs = F.array(
                *[
                    (
                        F.pmod(
                            F.xxhash64(F.lit(table), F.lit(p), F.lit(d)), F.lit(2000003)
                        ).cast("double")
                        / F.lit(1000001.5)
                        - F.lit(1.0)
                    )
                    for d in range(dim)
                ]
            )
        proj = F.aggregate(
            F.zip_with(vec_col, coeffs, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket.bitwiseOR(
            F.when(proj >= 0, F.shiftleft(F.lit(1).cast("long"), p)).otherwise(F.lit(0).cast("long"))
        )
    return bucket


def lsh_topk(
    embeddings: DataFrame,
    probes: DataFrame,
    dim: int,
    k: int = 5,
    num_planes: int = 8,
    num_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id_col: str = "probe_id",
    probe_vec_col: str = "probe_vec",
    portable: bool = False,
) -> DataFrame:
    """Approximate cosine top-k: probe only corpus vectors sharing an LSH
    bucket in any of ``num_tables`` tables, then exact-rank the candidates.
    The scale path — candidate generation is an equi-join on (table,
    bucket), never an all-pairs compare."""
    corpus = embeddings.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v"))
    ps = probes.select(
        F.col(probe_id_col).alias("probe_id"), F.col(probe_vec_col).alias("p")
    )
    c_buckets = corpus.select(
        "vec_id",
        "v",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("tbl"),
                        hyperplane_bucket(
                            F.col("v"), dim, num_planes, t, portable=portable
                        ).alias("bkt"),
                    )
                    for t in range(num_tables)
                ]
            )
        ).alias("tb"),
    ).select("vec_id", "v", F.col("tb.tbl").alias("tbl"), F.col("tb.bkt").alias("bkt"))
    p_buckets = ps.select(
        "probe_id",
        "p",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("tbl"),
                        hyperplane_bucket(
                            F.col("p"), dim, num_planes, t, portable=portable
                        ).alias("bkt"),
                    )
                    for t in range(num_tables)
                ]
            )
        ).alias("tb"),
    ).select("probe_id", "p", F.col("tb.tbl").alias("tbl"), F.col("tb.bkt").alias("bkt"))

    cands = (
        c_buckets.join(p_buckets, ["tbl", "bkt"])
        .select("probe_id", "vec_id", "v", "p")
        .distinct()
    )
    scored = cands.select(
        "probe_id",
        "vec_id",
        F.round(
            cosine_similarity_col(
                F.transform("v", lambda x: x.cast("double")),
                F.transform("p", lambda x: x.cast("double")),
            ),
            6,
        ).alias("cosine"),
    )
    return _topk(scored, k)


def _nearest_centroid_expr(vec_col, centroids: list[list[float]], round_to: int | None = None):
    """Index of the max-cosine centroid for an array column; centroids are
    plan-time literals (tiny: n_clusters x dim doubles).  ``round_to``
    rounds each score first (portable mode: cross-engine double math
    agrees to ~1e-13, so 9-dp rounding makes the argmax engine-stable)."""
    norms = [sum(v * v for v in c) ** 0.5 for c in centroids]
    raw = [
        _dot(vec_col, F.array(*[F.lit(float(x)) for x in c]))
        / (F.lit(max(n, 1e-30)) * F.greatest(_norm(vec_col), F.lit(1e-30)))
        for c, n in zip(centroids, norms)
    ]
    if round_to is not None:
        raw = [F.round(s, round_to) for s in raw]
    scores = F.array(*raw)
    # array_position is 1-based; ties resolve to the FIRST (lowest index),
    # deterministic across engines
    return (F.array_position(scores, F.array_max(scores)) - 1).cast("int")


def ivf_flat_index(
    embeddings: DataFrame,
    dim: int,
    n_clusters: int = 16,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quantize: int | None = None,
    score_round: int | None = None,
    engine: str = "arrow",
) -> tuple[DataFrame, list[list[float]]]:
    """Deterministic IVF coarse quantizer: Lloyd iterations with centroids
    seeded from the ``n_clusters`` lowest-id vectors (no RNG state).

    Per iteration: one row-local argmax over literal centroids (no
    shuffle) + one element-wise mean aggregation (posexplode -> one
    shuffle of N x dim value rows, map-side combined); the new centroids
    (n_clusters x dim doubles) are collected to the driver and re-embedded
    as literals — the standard broadcast-k-means shape.  Returns
    ``((vec_id, cluster), centroids)``.

    ``quantize``/``score_round`` (portable mode): round each Lloyd-mean
    coordinate to ``quantize`` decimals in-plan and each assignment score
    to ``score_round`` decimals, so a SQL engine replaying the same
    unrolled iterations reproduces the quantizer exactly (the same trick
    that makes the LSH family oracle-checkable).

    ``engine="arrow"`` (default) assigns via the Arrow-batched numpy
    kernel (centroids in the UDF closure — plan size flat in n_clusters
    x dim); ``engine="expr"`` embeds centroids as plan literals.
    """
    cast = lambda c: F.transform(F.col(c), lambda x: x.cast("double"))  # noqa: E731
    e = embeddings.select(F.col(id_col).alias("vec_id"), cast(vec_col).alias("v"))
    e = e.persist()
    seeds = e.orderBy("vec_id").limit(n_clusters).collect()
    centroids = [[float(x) for x in r["v"]] for r in seeds]

    def _assign(vec_col, cents):
        if engine == "arrow":
            return _nearest_centroid_arrow(cents, round_to=score_round)(vec_col)
        return _nearest_centroid_expr(vec_col, cents, round_to=score_round)

    mean_col = F.avg("x") if quantize is None else F.round(F.avg("x"), quantize)
    for _ in range(max(iters, 1)):
        assigned = e.select(
            "vec_id",
            "v",
            _assign(F.col("v"), centroids).alias("cluster"),
        )
        means = (
            assigned.select("cluster", F.posexplode("v").alias("pos", "x"))
            .groupBy("cluster", "pos")
            .agg(mean_col.alias("m"))
            .collect()
        )
        by_cluster: dict = {}
        for r in means:
            by_cluster.setdefault(int(r["cluster"]), {})[int(r["pos"])] = float(r["m"])
        centroids = [
            [by_cluster.get(c, {}).get(d, centroids[c][d]) for d in range(dim)]
            for c in range(n_clusters)
        ]
    # re-assign against the FINAL centroids so the returned buckets describe
    # exactly the centroids probes will rank against (an assignment computed
    # from the penultimate centroids silently degrades n_probe recall)
    final_assigned = e.select(
        "vec_id",
        _assign(F.col("v"), centroids).alias("cluster"),
    )
    e.unpersist()
    return final_assigned, centroids


def ivf_topk(
    embeddings: DataFrame,
    probes: DataFrame,
    dim: int,
    k: int = 5,
    n_clusters: int = 16,
    n_probe: int = 4,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id_col: str = "probe_id",
    probe_vec_col: str = "probe_vec",
    portable: bool = False,
    engine: str = "arrow",
) -> DataFrame:
    """Approximate cosine top-k via an IVF-flat index (the second ANN
    scale path next to :func:`lsh_topk`): corpus vectors are bucketed by
    nearest coarse centroid; each probe scans only its ``n_probe``
    nearest buckets, then candidates are exact-ranked.  Candidate
    generation is an equi-join on cluster id — cost ~ (n_probe /
    n_clusters) x corpus per probe, never all-pairs.  Fully
    deterministic (seeded centroids, first-index tie-breaks).

    ``portable=True`` quantizes Lloyd means to 6 decimals and assignment/
    probe scores to 9 per iteration, so the DuckDB oracle
    (__spark_entry__._ivf_topk_sql) replays the identical quantizer —
    value-hash-checkable end to end.  The default (unquantized) path
    shares every line of algorithm code."""
    cast = lambda c: F.transform(F.col(c), lambda x: x.cast("double"))  # noqa: E731
    score_round = 9 if portable else None
    assigned, centroids = ivf_flat_index(
        embeddings, dim, n_clusters=n_clusters, iters=iters,
        id_col=id_col, vec_col=vec_col,
        quantize=6 if portable else None, score_round=score_round,
        engine=engine,
    )
    corpus = embeddings.select(
        F.col(id_col).alias("vec_id"), cast(vec_col).alias("v")
    ).join(assigned, "vec_id")

    ps = probes.select(
        F.col(probe_id_col).alias("probe_id"), cast(probe_vec_col).alias("p")
    )
    norms = [sum(v * v for v in c) ** 0.5 for c in centroids]

    def _pscore(c, n):
        s = _dot(F.col("p"), F.array(*[F.lit(float(x)) for x in c])) / (
            F.lit(max(n, 1e-30))
            * F.greatest(_norm(F.col("p")), F.lit(1e-30))
        )
        return F.round(s, score_round) if score_round is not None else s

    cscores = F.array(
        *[
            F.struct(_pscore(c, n).alias("s"), F.lit(i).alias("cluster"))
            for i, (c, n) in enumerate(zip(centroids, norms))
        ]
    )
    p_clusters = ps.select(
        "probe_id",
        "p",
        F.explode(
            F.slice(F.reverse(F.array_sort(cscores)), 1, n_probe)
        ).alias("cs"),
    ).select("probe_id", "p", F.col("cs.cluster").alias("cluster"))

    cands = corpus.join(p_clusters, "cluster").select("probe_id", "vec_id", "v", "p")
    scored = cands.select(
        "probe_id",
        "vec_id",
        F.round(cosine_similarity_col(F.col("v"), F.col("p")), 6).alias("cosine"),
    )
    return _topk(scored, k)


def embedding_near_dups(
    embeddings: DataFrame,
    threshold: float = 0.95,
    dim: int | None = None,
    num_planes: int = 6,
    num_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exact: bool = False,
) -> DataFrame:
    """(id_a, id_b, cosine) pairs with cosine >= threshold.

    ``exact=True`` compares all pairs (oracle/small mode); otherwise LSH
    buckets bound the candidate set."""
    cast = lambda c: F.transform(F.col(c), lambda x: x.cast("double"))
    e = embeddings.select(F.col(id_col).alias("id"), cast(vec_col).alias("v"))
    if exact:
        a = e.select(F.col("id").alias("id_a"), F.col("v").alias("va"))
        b = e.select(F.col("id").alias("id_b"), F.col("v").alias("vb"))
        pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    else:
        assert dim is not None, "dim required for LSH mode"
        bucketed = e.select(
            "id",
            "v",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(t).alias("tbl"),
                            hyperplane_bucket(F.col("v"), dim, num_planes, t).alias(
                                "bkt"
                            ),
                        )
                        for t in range(num_tables)
                    ]
                )
            ).alias("tb"),
        ).select("id", "v", F.col("tb.tbl").alias("tbl"), F.col("tb.bkt").alias("bkt"))
        pairs = (
            bucketed.alias("x")
            .join(bucketed.alias("y"), ["tbl", "bkt"])
            .filter(F.col("x.id") < F.col("y.id"))
            .select(
                F.col("x.id").alias("id_a"),
                F.col("y.id").alias("id_b"),
                F.col("x.v").alias("va"),
                F.col("y.v").alias("vb"),
            )
            .distinct()
        )
    return (
        pairs.withColumn(
            "cosine", F.round(cosine_similarity_col(F.col("va"), F.col("vb")), 6)
        )
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def semantic_dedup(
    embeddings: DataFrame,
    dim: int,
    threshold: float = 0.95,
    n_clusters: int = 16,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    portable: bool = False,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): k-means-cluster the embeddings with the seeded
    deterministic Lloyd quantizer (:func:`ivf_flat_index`), compare pairs
    WITHIN each cluster only, and inside every group of mutually-similar
    items (cosine >= ``threshold``) keep the item LEAST similar to its
    centroid (the paper's diversity-preserving keeper rule); ties break
    to the lowest id.

    Returns ``(vec_id, cluster, centroid_sim, keep)`` for every vector.
    The drop rule is pairwise (no transitive closure): v is dropped iff
    some same-cluster u with cosine(u, v) >= threshold has
    (centroid_sim, id) lexicographically below v's.

    Scale shape: candidate pairs are bounded per cluster (the SemDeDup
    point — n_clusters grows with the corpus so cluster sizes stay
    bounded), generated by one equi-join on cluster id, never all-pairs.
    ``portable=True`` reuses the quantized Lloyd/score mode so the DuckDB
    oracle replays the identical pipeline."""
    cast = lambda c: F.transform(F.col(c), lambda x: x.cast("double"))  # noqa: E731
    score_round = 9 if portable else None
    assigned, centroids = ivf_flat_index(
        embeddings, dim, n_clusters=n_clusters, iters=iters,
        id_col=id_col, vec_col=vec_col,
        quantize=6 if portable else None, score_round=score_round,
    )
    e = embeddings.select(
        F.col(id_col).alias("vec_id"), cast(vec_col).alias("v")
    ).join(assigned, "vec_id")
    cents = F.array(
        *[F.array(*[F.lit(float(x)) for x in c]) for c in centroids]
    )
    csim = cosine_similarity_col(F.col("v"), F.element_at(cents, F.col("cluster") + 1))
    if score_round is not None:
        csim = F.round(csim, score_round)
    e = e.withColumn("centroid_sim", csim)
    x = e.select(
        "cluster",
        F.col("vec_id").alias("id_x"),
        F.col("v").alias("vx"),
        F.col("centroid_sim").alias("cs_x"),
    )
    y = e.select(
        "cluster",
        F.col("vec_id").alias("id_y"),
        F.col("v").alias("vy"),
        F.col("centroid_sim").alias("cs_y"),
    )
    dropped = (
        x.join(y, "cluster")
        .filter(F.col("id_x") != F.col("id_y"))
        .filter(
            F.round(cosine_similarity_col(F.col("vx"), F.col("vy")), 6)
            >= threshold
        )
        .filter(
            (F.col("cs_x") < F.col("cs_y"))
            | ((F.col("cs_x") == F.col("cs_y")) & (F.col("id_x") < F.col("id_y")))
        )
        .select(F.col("id_y").alias("vec_id"))
        .distinct()
        .withColumn("_drop", F.lit(True))
    )
    return (
        e.join(dropped, "vec_id", "left")
        .select(
            "vec_id",
            F.col("cluster").cast("int").alias("cluster"),
            F.round("centroid_sim", 6).alias("centroid_sim"),
            F.coalesce(F.col("_drop") == F.lit(False), F.lit(True)).alias("keep"),
        )
    )


def quantize_embeddings(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Symmetric per-vector int8 quantization (the standard storage/serving
    compression for embedding tables): ``scale = max(|x|) / 127``, codes =
    round-half-up(x / scale) clamped to [-127, 127]; all-zero vectors get
    scale 0 and all-zero codes.

    Returns ``(vec_id, scale_ppb, codes array<int>, codes_csv,
    max_err_ppm)``: ``scale_ppb`` is the scale in integer nano-units and
    ``max_err_ppm`` the per-vector worst reconstruction error
    ``max|x - code*scale|`` in micro-units — the quantization-quality
    audit column (integer units because decimal round() string
    conversion differs between engines at midpoints; floor(x*k + 0.5) is
    exact IEEE).  Pure map-side higher-order functions, zero shuffle;
    the explicit FLOOR(x + 0.5) code rounding is engine-portable too."""
    cast = lambda c: F.transform(F.col(c), lambda x: x.cast("double"))  # noqa: E731
    e = embeddings.select(F.col(id_col).alias("vec_id"), cast(vec_col).alias("v"))
    max_abs = F.array_max(F.transform(F.col("v"), lambda x: F.abs(x)))
    e = e.withColumn("scale", max_abs / F.lit(127.0))
    code = lambda x: F.greatest(  # noqa: E731
        F.lit(-127),
        F.least(
            F.lit(127),
            F.floor(x / F.col("scale") + F.lit(0.5)).cast("int"),
        ),
    )
    codes = F.when(
        F.col("scale") > 0, F.transform(F.col("v"), code)
    ).otherwise(F.transform(F.col("v"), lambda x: F.lit(0)))
    out = e.withColumn("codes", codes)
    err = F.array_max(
        F.zip_with(
            F.col("v"),
            F.col("codes"),
            lambda x, c: F.abs(x - c.cast("double") * F.col("scale")),
        )
    )
    return out.select(
        "vec_id",
        # integer nano-units: floor(x*1e9 + 0.5) is exact IEEE on the
        # engine-identical double, unlike decimal round() whose string
        # conversion differs between engines at midpoints
        F.floor(F.col("scale") * 1e9 + F.lit(0.5)).cast("long").alias("scale_ppb"),
        "codes",
        F.array_join(
            F.transform(F.col("codes"), lambda c: c.cast("string")), ","
        ).alias("codes_csv"),
        F.floor(err * 1e6 + F.lit(0.5)).cast("long").alias("max_err_ppm"),
    )


def pca_top_component(
    embeddings: DataFrame,
    dim: int,
    iters: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    portable: bool = False,
) -> DataFrame:
    """Top principal component of the embedding table by covariance-FREE
    power iteration (never materializes the d x d covariance): per step

        s_i = (x_i - mu) . v          (one map-side pass)
        w   = sum_i s_i (x_i - mu) / N  (one elementwise aggregation)
        v   = w / max|w|               (sqrt-free, engine-portable)

    with mu the coordinate mean and v seeded from the portable hash of
    the position.  The running vector lives as plan literals (the
    broadcast-k-means pattern ivf_flat_index uses), so each iteration is
    two aggregations over the exploded (vec_id, pos, val) relation —
    O(N*d) per step, the PCA-at-scale standard.

    Returns ``(pos, loading)`` (dim rows, loading 6-dp).  ``portable``
    quantizes mu to 6 decimals and each iterate to 9 so the DuckDB
    oracle replays the identical trajectory."""
    import hashlib

    cast = lambda c: F.transform(F.col(c), lambda x: x.cast("double"))  # noqa: E731
    xp = (
        embeddings.select(F.col(id_col).alias("vec_id"), cast(vec_col).alias("v"))
        .select("vec_id", F.posexplode("v").alias("pos", "val"))
        .persist()
    )
    n = xp.count() // dim if dim else 0
    mu_round = 6 if portable else None
    mu_col = F.avg("val") if mu_round is None else F.round(F.avg("val"), mu_round)
    mu_rows = xp.groupBy("pos").agg(mu_col.alias("m")).collect()
    mu = [0.0] * dim
    for r in mu_rows:
        mu[int(r["pos"])] = float(r["m"])
    v = [
        (int(hashlib.md5(f"pca:{j}".encode()).hexdigest()[:15], 16) % 1000003)
        / 1000003.0
        for j in range(dim)
    ]
    w_round = 9 if portable else None
    for _ in range(max(iters, 1)):
        mu_lit = F.array(*[F.lit(m) for m in mu])
        v_lit = F.array(*[F.lit(x) for x in v])
        centered = F.col("val") - F.element_at(mu_lit, F.col("pos") + 1)
        s = xp.groupBy("vec_id").agg(
            F.sum(centered * F.element_at(v_lit, F.col("pos") + 1)).alias("s")
        )
        w_rows = (
            xp.join(s, "vec_id")
            .groupBy("pos")
            .agg((F.sum(F.col("s") * centered) / F.lit(float(n))).alias("w"))
            .collect()
        )
        w = [0.0] * dim
        for r in w_rows:
            w[int(r["pos"])] = float(r["w"])
        mx = max(abs(x) for x in w) if w else 0.0
        if mx == 0.0:
            v = w
            break
        v = [x / mx for x in w]
        if w_round is not None:
            v = [round(x, w_round) for x in v]
    xp.unpersist()
    spark = embeddings.sparkSession
    return spark.createDataFrame(
        [(j, round(v[j], 6)) for j in range(dim)], "pos int, loading double"
    )


def knn_graph(
    embeddings: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    candidates: str = "exact",
    dim: int | None = None,
    num_planes: int = 3,
    num_tables: int = 12,
    n_clusters: int = 16,
    n_probe: int = 4,
    iters: int = 2,
    portable: bool = False,
) -> DataFrame:
    """Mutual k-NN graph over an embedding column: edge (src, dst) iff
    each vector is in the other's top-k by (6-dp-rounded cosine DESC, id
    ASC), self excluded, top-k taken over the candidate set.  Returns
    canonical ``(src, dst, cosine)`` rows (src < dst) — the similarity
    graph that bridges the embedding operators into the link-graph layer.

    ``candidates`` selects the generator; the rank/mutual/canonicalize
    tail is identical across all three:

    - ``"exact"`` — all pairs (|V|^2; the oracle baseline: corpus side
      streams, probes broadcast).
    - ``"lsh"`` — only pairs sharing a hyperplane-LSH bucket in any of
      ``num_tables`` tables (equi-join on (table, bucket); requires
      ``dim``).  The production default shape: candidate count ~
      corpus x expected bucket occupancy, never all-pairs.
    - ``"ivf"`` — multi-probe: every vector registers in its ``n_probe``
      nearest coarse k-means cells of the deterministic IVF quantizer; a
      candidate pair is any shared cell (equi-join on cluster id;
      requires ``dim``).  Candidate count ~ corpus x n_probe x expected
      cell occupancy, never all-pairs.

    ``portable=True`` makes the approximate modes oracle-mirrorable:
    lsh uses the md5-derived literal planes, ivf the quantized Lloyd
    path (means 6 dp, scores 9 dp) with 9-dp-rounded multi-probe scores.
    """
    cast = lambda c: F.transform(F.col(c), lambda x: x.cast("double"))
    corpus = embeddings.select(F.col(id_col).alias("vec_id"), cast(vec_col).alias("v"))
    probes = corpus.select(
        F.col("vec_id").alias("probe_id"), F.col("v").alias("p")
    )
    if candidates == "exact":
        cand = corpus.crossJoin(F.broadcast(probes))
    elif candidates in ("lsh", "ivf"):
        if dim is None:
            raise ValueError(f"candidates={candidates!r} requires dim")
        if candidates == "lsh":
            keyed = corpus.select(
                "vec_id",
                F.explode(
                    F.array(
                        *[
                            F.struct(
                                F.lit(t).alias("tbl"),
                                hyperplane_bucket(
                                    F.col("v"), dim, num_planes, t,
                                    portable=portable,
                                ).alias("bkt"),
                            )
                            for t in range(num_tables)
                        ]
                    )
                ).alias("tb"),
            ).select(
                "vec_id", F.col("tb.tbl").alias("tbl"), F.col("tb.bkt").alias("bkt")
            )
            join_keys = ["tbl", "bkt"]
        else:
            _, centroids = ivf_flat_index(
                embeddings, dim, n_clusters=n_clusters, iters=iters,
                id_col=id_col, vec_col=vec_col,
                quantize=6 if portable else None,
                score_round=9 if portable else None,
            )
            keyed = corpus.select(
                "vec_id",
                F.explode(
                    _topk_centroids_arrow(
                        centroids, n_probe, round_to=9 if portable else None
                    )(F.col("v"))
                ).alias("cluster"),
            )
            join_keys = ["cluster"]
        pairs = (
            keyed.join(
                keyed.select(
                    F.col("vec_id").alias("probe_id"), *join_keys
                ),
                join_keys,
            )
            .select("probe_id", "vec_id")
            .distinct()
        )
        cand = pairs.join(corpus, "vec_id").join(probes, "probe_id")
    else:
        raise ValueError(f"unknown candidates mode {candidates!r}")
    scored = (
        cand.filter(F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id",
            "vec_id",
            F.round(cosine_similarity_col(F.col("v"), F.col("p")), 6).alias(
                "cosine"
            ),
        )
    )
    top = _topk(scored, k)
    e1 = top.select(
        F.col("probe_id").alias("a"), F.col("vec_id").alias("b"), "cosine"
    )
    rev = e1.select(F.col("b").alias("a"), F.col("a").alias("b"))
    return (
        e1.join(rev, ["a", "b"], "left_semi")
        .filter(F.col("a") < F.col("b"))
        .select(F.col("a").alias("src"), F.col("b").alias("dst"), "cosine")
    )


def semantic_clusters(
    embeddings: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    candidates: str = "exact",
    dim: int | None = None,
) -> DataFrame:
    """Semantic clustering = connected components over the mutual k-NN
    graph (the classic density-free clustering of an embedded corpus).
    Returns ``(vec_id, cluster_id, cluster_size)`` for EVERY vector —
    cluster_id = the minimum vec_id in the component (isolated vectors
    are singleton clusters).  The CC kernel is the engine's large-star/
    small-star operator, so the component step scales independently of
    the candidate generator."""
    from csd363_sin_spark.operators.components import connected_components
    from csd363_sin_spark.plans.induce import Graph

    edges = knn_graph(
        embeddings, k=k, id_col=id_col, vec_col=vec_col,
        candidates=candidates, dim=dim,
    )
    verts = embeddings.select(F.col(id_col).alias("vertex_id"))
    labels = connected_components(
        Graph(
            vertices=verts,
            edges=edges.select(
                "src", "dst", F.col("cosine").alias("weight")
            ),
        )
    )
    sizes = labels.groupBy("comp_id").agg(F.count(F.lit(1)).alias("cluster_size"))
    return (
        labels.join(sizes, "comp_id")
        .select(
            F.col("vertex_id").alias("vec_id"),
            F.col("comp_id").alias("cluster_id"),
            "cluster_size",
        )
    )


def _sub_slice(vec_col, j: int, sub: int):
    """1-based slice of subspace ``j`` (sub doubles) from an array col."""
    return F.slice(vec_col, j * sub + 1, sub)


def _codebook_lit(codebooks: list[list[list[float]]]):
    """m x n_codes x sub nested literal (tiny: the whole PQ model)."""
    return F.array(
        *[
            F.array(
                *[F.array(*[F.lit(float(x)) for x in code]) for code in book]
            )
            for book in codebooks
        ]
    )


def _pq_assign_arrow(codebooks: list[list[list[float]]], round_to: int | None = None):
    """Arrow-batched PQ assignment: the codebook travels as a numpy
    closure serialized WITH the UDF (shipped once per executor — a
    broadcast, not a plan literal), so expression-tree size and codegen
    time no longer scale with m x n_codes.  This is the production path:
    at real codebook sizes (m=16, n_codes=256, d=768) the literal-
    expression form would put ~3M doubles in the plan.  Same math and
    the same first-index tie-break as :func:`_pq_assign_expr`."""
    from pyspark.sql.functions import pandas_udf

    cb = np.asarray(codebooks, dtype=np.float64)  # (m, n_codes, sub)
    m, _, sub = cb.shape

    @pandas_udf("array<int>")
    def assign(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype=object)
        x = np.array(
            [np.asarray(row, dtype=np.float64) for row in v]
        ).reshape(len(v), m, sub)
        diff = x[:, :, None, :] - cb[None]
        d = np.einsum("nmcs,nmcs->nmc", diff, diff)
        if round_to is not None:
            d = np.round(d, round_to)
        return pd.Series(list(d.argmin(axis=2).astype(np.int32)))

    return assign


def _pq_score_arrow(codebooks: list[list[list[float]]], score_round: int = 6):
    """Arrow-batched ADC scoring (codes + query vector -> approximate
    inner product); codebook as a numpy closure, see _pq_assign_arrow."""
    from pyspark.sql.functions import pandas_udf

    cb = np.asarray(codebooks, dtype=np.float64)  # (m, n_codes, sub)
    m, _, sub = cb.shape
    rows = np.arange(m)[None, :]

    @pandas_udf("double")
    def score(codes: pd.Series, qv: pd.Series) -> pd.Series:
        if len(codes) == 0:
            return pd.Series([], dtype=np.float64)
        c = np.array([np.asarray(row, dtype=np.int64) for row in codes])
        q = np.array(
            [np.asarray(row, dtype=np.float64) for row in qv]
        ).reshape(len(c), m, sub)
        recon = cb[rows, c]  # (n, m, sub)
        return pd.Series(np.round(np.einsum("nms,nms->n", q, recon), score_round))

    return score


def _nearest_centroid_arrow(
    centroids: list[list[float]], round_to: int | None = None
):
    """Arrow-batched max-cosine centroid assignment (production twin of
    :func:`_nearest_centroid_expr`: centroids as a numpy closure instead
    of plan literals; identical formula and first-index tie-break)."""
    from pyspark.sql.functions import pandas_udf

    c = np.asarray(centroids, dtype=np.float64)  # (k, dim)
    cn = np.maximum(np.sqrt((c * c).sum(axis=1)), 1e-30)

    @pandas_udf("int")
    def assign(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype=np.int32)
        x = np.array([np.asarray(row, dtype=np.float64) for row in v])
        qn = np.maximum(np.sqrt((x * x).sum(axis=1, keepdims=True)), 1e-30)
        s = (x @ c.T) / (cn[None, :] * qn)
        if round_to is not None:
            s = np.round(s, round_to)
        return pd.Series(s.argmax(axis=1).astype(np.int32))

    return assign


def _topk_centroids_arrow(
    centroids: list[list[float]], p: int, round_to: int | None = None
):
    """Arrow-batched multi-probe assignment: the ``p`` max-cosine
    centroid ids per vector (score DESC, centroid id ASC on ties — numpy
    stable sort).  Centroids ride in the UDF closure; used by the IVF
    candidate generator of :func:`knn_graph`."""
    from pyspark.sql.functions import pandas_udf

    c = np.asarray(centroids, dtype=np.float64)  # (k, dim)
    cn = np.maximum(np.sqrt((c * c).sum(axis=1)), 1e-30)

    @pandas_udf("array<int>")
    def probe(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype=object)
        x = np.array([np.asarray(row, dtype=np.float64) for row in v])
        qn = np.maximum(np.sqrt((x * x).sum(axis=1, keepdims=True)), 1e-30)
        s = (x @ c.T) / (cn[None, :] * qn)
        if round_to is not None:
            s = np.round(s, round_to)
        order = np.argsort(-s, axis=1, kind="stable")[:, :p].astype(np.int32)
        return pd.Series(list(order))

    return probe


def _pq_assign_expr(
    sv_col, book: list[list[float]], round_to: int | None = None
):
    """Index of the min-L2 code for a subvector column (codes are plan
    literals; ties to the FIRST code, deterministic across engines).
    ``round_to`` rounds each squared distance (portable mode)."""
    dists = [
        F.aggregate(
            F.zip_with(
                sv_col,
                F.array(*[F.lit(float(x)) for x in code]),
                lambda a, b: (a - b) * (a - b),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        for code in book
    ]
    if round_to is not None:
        dists = [F.round(d, round_to) for d in dists]
    arr = F.array(*dists)
    return (F.array_position(arr, F.array_min(arr)) - 1).cast("int")


def pq_train(
    embeddings: DataFrame,
    dim: int,
    m: int = 8,
    n_codes: int = 16,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quantize: int | None = None,
    round_to: int | None = None,
    engine: str = "arrow",
) -> list[list[list[float]]]:
    """Product-quantization codebooks (Jegou et al. 2011, "Product
    Quantization for Nearest Neighbor Search"): split each vector into
    ``m`` subvectors of ``dim/m`` dims and run the deterministic Lloyd
    quantizer (seeded from the ``n_codes`` lowest-id vectors' subvectors,
    no RNG — the ivf_flat_index recipe) independently per subspace, all
    subspaces trained in the SAME jobs.

    Per iteration: one map-side (vec, subspace) explode with a literal-
    codebook argmin (no shuffle for assignment) + ONE element-wise mean
    aggregation over (subspace, code, pos) — map-side combined, output
    m x n_codes x sub rows, collected and re-embedded as plan literals
    (broadcast-k-means shape; the model is tiny by construction).

    ``quantize``/``round_to`` = portable mode: Lloyd means rounded to
    ``quantize`` decimals in-plan and assignment distances to
    ``round_to``, so a SQL engine replaying the unrolled iterations
    reproduces the codebooks exactly.

    ``engine="arrow"`` (default) assigns via the Arrow-batched numpy
    kernel — codebooks ship as a UDF closure, so plan size and codegen
    don't scale with m x n_codes (the production shape at m=16,
    n_codes=256, d=768).  ``engine="expr"`` embeds them as plan literals
    (pure-SQL-mirrorable; the oracle gate's mode)."""
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sub = dim // m
    cast = lambda c: F.transform(F.col(c), lambda x: x.cast("double"))  # noqa: E731
    e = embeddings.select(F.col(id_col).alias("vec_id"), cast(vec_col).alias("v"))
    e = e.persist()
    seeds = e.orderBy("vec_id").limit(n_codes).collect()
    codebooks = [
        [[float(x) for x in r["v"][j * sub : (j + 1) * sub]] for r in seeds]
        for j in range(m)
    ]

    mean_col = F.avg("x") if quantize is None else F.round(F.avg("x"), quantize)
    for _ in range(max(iters, 1)):
        # one row per (vector, subspace); assignment entirely map-side
        if engine == "arrow":
            coded = e.select(
                "v",
                _pq_assign_arrow(codebooks, round_to=round_to)(F.col("v")).alias(
                    "codes"
                ),
            )
            assigned = coded.select(
                F.explode(
                    F.array(
                        *[
                            F.struct(
                                F.lit(j).alias("sub_j"),
                                _sub_slice(F.col("v"), j, sub).alias("sv"),
                                F.element_at(F.col("codes"), j + 1).alias("code"),
                            )
                            for j in range(m)
                        ]
                    )
                ).alias("s")
            ).select(F.col("s.sub_j"), F.col("s.sv"), F.col("s.code"))
        else:
            assigned = e.select(
                "vec_id",
                F.explode(
                    F.array(
                        *[
                            F.struct(
                                F.lit(j).alias("sub_j"),
                                _sub_slice(F.col("v"), j, sub).alias("sv"),
                                _pq_assign_expr(
                                    _sub_slice(F.col("v"), j, sub),
                                    codebooks[j],
                                    round_to=round_to,
                                ).alias("code"),
                            )
                            for j in range(m)
                        ]
                    )
                ).alias("s"),
            ).select(F.col("s.sub_j"), F.col("s.sv"), F.col("s.code"))
        means = (
            assigned.select("sub_j", "code", F.posexplode("sv").alias("pos", "x"))
            .groupBy("sub_j", "code", "pos")
            .agg(mean_col.alias("mn"))
            .collect()
        )
        got: dict = {}
        for r in means:
            got.setdefault((int(r["sub_j"]), int(r["code"])), {})[int(r["pos"])] = (
                float(r["mn"])
            )
        codebooks = [
            [
                [
                    got.get((j, c), {}).get(p, codebooks[j][c][p])
                    for p in range(sub)
                ]
                for c in range(n_codes)
            ]
            for j in range(m)
        ]
    e.unpersist()
    return codebooks


def pq_encode(
    embeddings: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int | None = None,
    engine: str = "arrow",
) -> DataFrame:
    """``(vec_id, codes array<int>)`` — each vector compressed to m
    codebook indices (m bytes at n_codes <= 256 in a real store; the
    columnar array keeps the gate portable).  Pure map-side; with
    ``engine="arrow"`` (default) the codebook rides in the UDF closure
    instead of the plan, so encode cost is flat in m x n_codes."""
    m = len(codebooks)
    sub = len(codebooks[0][0])
    cast = lambda c: F.transform(F.col(c), lambda x: x.cast("double"))  # noqa: E731
    e = embeddings.select(F.col(id_col).alias("vec_id"), cast(vec_col).alias("v"))
    if engine == "arrow":
        return e.select(
            "vec_id",
            _pq_assign_arrow(codebooks, round_to=round_to)(F.col("v")).alias("codes"),
        )
    return e.select(
        "vec_id",
        F.array(
            *[
                _pq_assign_expr(
                    _sub_slice(F.col("v"), j, sub), codebooks[j], round_to=round_to
                )
                for j in range(m)
            ]
        ).alias("codes"),
    )


def pq_topk(
    embeddings: DataFrame,
    probes: DataFrame,
    dim: int,
    k: int = 10,
    m: int = 8,
    n_codes: int = 16,
    iters: int = 3,
    codebooks: list[list[list[float]]] | None = None,
    portable: bool = False,
    score_round: int = 6,
    engine: str = "arrow",
) -> DataFrame:
    """Approximate inner-product top-k via asymmetric distance (ADC):
    score(q, x) ~= sum_j <q_j, codebook_j[code_j(x)]> — the query stays
    exact, the corpus is compressed to m codes per vector.  The third
    ANN scale path next to hyperplane-LSH (bucketed) and IVF (probed):
    PQ is the MEMORY-bound regime — a 100 TB corpus of float32x64
    vectors shrinks 32x, and the scan is a broadcast probe join over
    code columns with literal-codebook lookups, no float vectors read.

    Returns ``(probe_id, vec_id, score, rank)``, rank 1..k per probe by
    (score DESC, vec_id ASC) — deterministic.  ``portable=True``
    quantizes Lloyd means to 6 dp and rounds distances/scores so the
    unrolled DuckDB mirror reproduces training, encoding, and ranking
    exactly."""
    q = 6 if portable else None
    r = 9 if portable else None
    if codebooks is None:
        codebooks = pq_train(
            embeddings, dim, m=m, n_codes=n_codes, iters=iters,
            quantize=q, round_to=r, engine=engine,
        )
    sub = dim // m
    enc = pq_encode(embeddings, codebooks, round_to=r, engine=engine)
    cast = lambda c: F.transform(F.col(c), lambda x: x.cast("double"))  # noqa: E731
    p = probes.select(
        F.col("probe_id"), cast("probe_vec").alias("qv")
    )
    if engine == "arrow":
        scored = enc.join(F.broadcast(p)).select(
            "probe_id",
            "vec_id",
            # _topk ranks by the column named "cosine"; PQ's metric is
            # the approximate inner product — renamed "score" on the way
            _pq_score_arrow(codebooks, score_round)(
                F.col("codes"), F.col("qv")
            ).alias("cosine"),
        )
        return _topk(scored, k).withColumnRenamed("cosine", "score")
    cb = _codebook_lit(codebooks)
    score = None
    for j in range(m):
        contrib = F.aggregate(
            F.zip_with(
                _sub_slice(F.col("qv"), j, sub),
                F.element_at(
                    F.element_at(cb, j + 1),
                    F.element_at(F.col("codes"), j + 1) + 1,
                ),
                lambda a, b: a * b,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        score = contrib if score is None else score + contrib
    scored = enc.join(F.broadcast(p)).select(
        "probe_id",
        "vec_id",
        # _topk ranks by the column named "cosine"; PQ's metric is the
        # approximate inner product — renamed to "score" on the way out
        F.round(score, score_round).alias("cosine"),
    )
    return _topk(scored, k).withColumnRenamed("cosine", "score")
