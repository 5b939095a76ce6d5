"""CSR-partitioned adjacency blocks + Arrow-vectorized kernels (north star).

The engine's custom physical layout: the symmetric edge table is hash-
partitioned by source vertex into P blocks; each block is ONE DataFrame row

    (part_id int, src_sorted array<long>, offsets array<int>,
     dst array<long>, weight array<double>)

holding a compressed-sparse-row image of its slice of the adjacency:
``src_sorted`` lists the block's distinct sources ascending, and
``dst/weight[offsets[i]:offsets[i+1]]`` are the neighbors of
``src_sorted[i]``.  Per-vertex kernels then run as *numpy gathers* inside
grouped-pandas (Arrow-batched) UDFs — never per-row Python.

Hub skew: a hub vertex's adjacency can be split across ``salt`` sub-rows
(``ceil(deg/salt_threshold)`` replicas on the gather side); partial
results merge in the follow-up ``groupBy(vertex)`` — aggregation-side
skew handling that AQE alone cannot do.

``pagerank_csr`` demonstrates the kernel pattern end-to-end: each
iteration co-groups the static CSR blocks with the current rank vector
(hash-partitioned the same way), computes all contributions of a block
with two numpy ops (gather + segment-sum), and reduces by destination.
Results match operators/pagerank.py (same semantics) to 1e-12.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from csd363_sin_spark.plans.induce import Graph
from csd363_sin_spark.plans.lineage import materialize

BLOCK_SCHEMA = (
    "part_id int, src_sorted array<long>, offsets array<int>, "
    "dst array<long>, weight array<double>"
)


def build_blocks(
    graph: Graph,
    num_blocks: int | None = None,
    weighted: bool = True,
    salt_threshold: int | None = None,
) -> DataFrame:
    """Build the CSR block DataFrame from ``graph.edges_sym()``.

    ``salt_threshold``: sources with more neighbors than this are split
    across multiple CSR rows within their block (same part_id), bounding
    the work of any single gather and smoothing hub skew.
    """
    spark = graph.edges.sparkSession
    if num_blocks is None:
        num_blocks = max(1, spark.sparkContext.defaultParallelism)
    w = F.col("weight") if weighted else F.lit(1.0)
    sym = graph.edges_sym().select(
        F.pmod(F.col("src"), F.lit(num_blocks)).cast("int").alias("part_id"),
        "src",
        "dst",
        w.alias("weight"),
    )
    thr = salt_threshold

    def to_csr(pdf: pd.DataFrame) -> pd.DataFrame:
        pid = int(pdf["part_id"].iloc[0])
        order = np.lexsort((pdf["dst"].to_numpy(), pdf["src"].to_numpy()))
        src = pdf["src"].to_numpy()[order]
        dst = pdf["dst"].to_numpy()[order]
        wgt = pdf["weight"].to_numpy()[order]
        uniq, starts = np.unique(src, return_index=True)
        bounds = np.append(starts, len(src))
        rows = []

        def emit(u_slice, s, e):
            # u_slice: indices into uniq covered by this row
            offs = [0]
            dsts, ws, srcs = [], [], []
            for ui in u_slice:
                a, b = bounds[ui], bounds[ui + 1]
                srcs.append(int(uniq[ui]))
                dsts.extend(dst[a:b].tolist())
                ws.extend(wgt[a:b].tolist())
                offs.append(len(dsts))
            rows.append((pid, srcs, offs, dsts, ws))

        if thr is None:
            emit(range(len(uniq)), 0, len(src))
        else:
            # salt: each hub source becomes its own row(s) capped at thr nbrs
            normal = []
            for ui in range(len(uniq)):
                deg = bounds[ui + 1] - bounds[ui]
                if deg <= thr:
                    normal.append(ui)
                else:
                    a = bounds[ui]
                    while a < bounds[ui + 1]:
                        b = min(a + thr, bounds[ui + 1])
                        rows.append(
                            (
                                pid,
                                [int(uniq[ui])],
                                [0, int(b - a)],
                                dst[a:b].tolist(),
                                wgt[a:b].tolist(),
                            )
                        )
                        a = b
            if normal:
                emit(normal, 0, 0)
        return pd.DataFrame(
            rows, columns=["part_id", "src_sorted", "offsets", "dst", "weight"]
        )

    return sym.groupBy("part_id").applyInPandas(to_csr, BLOCK_SCHEMA)


def blocks_stats(blocks: DataFrame) -> DataFrame:
    """Per-block row/edge counts (observability + test support)."""
    return blocks.select(
        "part_id",
        F.size("src_sorted").alias("num_sources"),
        F.size("dst").alias("num_edges"),
    )


def csr_gather(
    blocks: DataFrame, frontier: DataFrame, num_blocks: int
) -> DataFrame:
    """SpMV-style frontier expansion over CSR blocks (north star: "batched
    multi-source BFS ... over SpMV-style gather-scatter frontiers").

    ``frontier`` is ``(s long, v long, val double)`` — one row per (source
    s, frontier vertex v) carrying a numeric payload (BFS sigma, Brandes
    sigma_v, ...).  Returns ``(s, v, w, val)``: one row per neighbor ``w``
    of each frontier vertex, payload replicated — the caller reduces
    (groupBy / anti-join) as the algorithm requires.

    The expansion itself is pure numpy inside a cogrouped-Arrow kernel
    (searchsorted into the block's sorted source array + a ragged index
    gather), replacing the per-level ``frontier JOIN edges`` shuffle with
    a co-partitioned block-local gather: only the |frontier|-row side is
    exchanged per superstep, never the O(|E|) adjacency.  Salted hub rows
    (build_blocks ``salt_threshold``) are handled transparently: a hub's
    sub-rows each contribute their slice and the caller's reduce merges.
    """
    fr = frontier.withColumn(
        "part_id", F.pmod(F.col("v"), F.lit(num_blocks)).cast("int")
    )

    def kernel(key, bl: pd.DataFrame, fr_pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"s": [], "v": [], "w": [], "val": []}
        ).astype({"s": "int64", "v": "int64", "w": "int64", "val": "float64"})
        if bl.empty or fr_pdf.empty:
            return empty
        s_arr = fr_pdf["s"].to_numpy(dtype=np.int64)
        v_arr = fr_pdf["v"].to_numpy(dtype=np.int64)
        val_arr = fr_pdf["val"].to_numpy(dtype=np.float64)
        out_s, out_v, out_w, out_val = [], [], [], []
        for _, row in bl.iterrows():
            srcs = np.asarray(row["src_sorted"], dtype=np.int64)
            offs = np.asarray(row["offsets"], dtype=np.int64)
            dsts = np.asarray(row["dst"], dtype=np.int64)
            if len(srcs) == 0:
                continue
            pos = np.searchsorted(srcs, v_arr)
            pos_c = np.minimum(pos, len(srcs) - 1)
            hit = (pos < len(srcs)) & (srcs[pos_c] == v_arr)
            if not hit.any():
                continue
            vi = pos_c[hit]
            starts = offs[vi]
            cnts = (offs[vi + 1] - starts).astype(np.int64)
            total = int(cnts.sum())
            if total == 0:
                continue
            # ragged gather: absolute index = start of each slice + offset
            # within the slice
            csum = np.cumsum(cnts)
            intra = np.arange(total, dtype=np.int64) - np.repeat(csum - cnts, cnts)
            idx = np.repeat(starts, cnts) + intra
            out_w.append(dsts[idx])
            out_s.append(np.repeat(s_arr[hit], cnts))
            out_v.append(np.repeat(v_arr[hit], cnts))
            out_val.append(np.repeat(val_arr[hit], cnts))
        if not out_w:
            return empty
        return pd.DataFrame(
            {
                "s": np.concatenate(out_s),
                "v": np.concatenate(out_v),
                "w": np.concatenate(out_w),
                "val": np.concatenate(out_val),
            }
        )

    return (
        blocks.groupBy("part_id")
        .cogroup(fr.groupBy("part_id"))
        .applyInPandas(kernel, "s long, v long, w long, val double")
    )


def pagerank_csr(
    graph: Graph,
    alpha: float = 0.85,
    tol: float = 1.0e-6,
    max_iter: int = 100,
    weighted: bool = True,
    num_blocks: int | None = None,
    salt_threshold: int | None = None,
) -> DataFrame:
    """PageRank via Arrow kernels over CSR blocks.

    Identical semantics to :func:`csd363_sin_spark.operators.pagerank.
    pagerank` (networkx-compatible); the gather-scatter inner loop is
    numpy inside a cogrouped-pandas UDF instead of a row-level join.
    """
    spark = graph.edges.sparkSession
    n = graph.vertices.count()
    if n == 0:
        return spark.createDataFrame([], "vertex_id long, rank double")
    if num_blocks is None:
        num_blocks = max(1, spark.sparkContext.defaultParallelism)

    blocks = build_blocks(
        graph, num_blocks=num_blocks, weighted=weighted, salt_threshold=salt_threshold
    ).persist()
    blocks.count()

    degs = graph.degrees()
    out_w = graph.edges_sym().groupBy(F.col("src").alias("vertex_id")).agg(
        (F.sum("weight") if weighted else F.count(F.lit(1)).cast("double")).alias("out_w")
    )
    dangling = degs.filter(F.col("degree") == 0).select("vertex_id").persist()
    has_dangling = not dangling.isEmpty()

    ranks = graph.vertices.select(
        "vertex_id",
        F.lit(1.0 / n).alias("rank"),
    ).join(out_w, "vertex_id", "left").fillna({"out_w": 1.0})
    ranks = materialize(ranks.withColumn(
        "part_id", F.pmod(F.col("vertex_id"), F.lit(num_blocks)).cast("int")
    ))

    def kernel(key, block_pdf: pd.DataFrame, rank_pdf: pd.DataFrame) -> pd.DataFrame:
        if block_pdf.empty or rank_pdf.empty:
            return pd.DataFrame({"vertex_id": [], "partial": []}).astype(
                {"vertex_id": "int64", "partial": "float64"}
            )
        rmap = pd.Series(
            (rank_pdf["rank"] / rank_pdf["out_w"]).to_numpy(),
            index=rank_pdf["vertex_id"].to_numpy(),
        )
        outs_v: list[np.ndarray] = []
        outs_p: list[np.ndarray] = []
        for _, row in block_pdf.iterrows():
            srcs = np.asarray(row["src_sorted"], dtype=np.int64)
            offs = np.asarray(row["offsets"], dtype=np.int64)
            dsts = np.asarray(row["dst"], dtype=np.int64)
            ws = np.asarray(row["weight"], dtype=np.float64)
            shares = rmap.reindex(srcs).fillna(0.0).to_numpy()
            per_edge = np.repeat(shares, np.diff(offs)) * ws
            # segment-sum by destination within the block
            uniq_dst, inv = np.unique(dsts, return_inverse=True)
            sums = np.bincount(inv, weights=per_edge)
            outs_v.append(uniq_dst)
            outs_p.append(sums)
        return pd.DataFrame(
            {
                "vertex_id": np.concatenate(outs_v),
                "partial": np.concatenate(outs_p),
            }
        )

    for _ in range(max_iter):
        contribs = (
            blocks.groupBy("part_id")
            .cogroup(ranks.groupBy("part_id"))
            .applyInPandas(kernel, "vertex_id long, partial double")
            .groupBy("vertex_id")
            .agg(F.sum("partial").alias("in_mass"))
        )
        if has_dangling:
            d = (
                ranks.join(dangling, "vertex_id", "left_semi")
                .agg(F.sum("rank"))
                .collect()[0][0]
            )
            dangling_mass = float(d or 0.0)
        else:
            dangling_mass = 0.0
        base = (1.0 - alpha) / n + alpha * dangling_mass / n
        new_ranks = (
            graph.vertices.select("vertex_id")
            .join(contribs, "vertex_id", "left")
            .fillna({"in_mass": 0.0})
            .select(
                "vertex_id",
                (F.lit(base) + F.lit(alpha) * F.col("in_mass")).alias("rank"),
            )
            .join(out_w, "vertex_id", "left")
            .fillna({"out_w": 1.0})
            .withColumn(
                "part_id", F.pmod(F.col("vertex_id"), F.lit(num_blocks)).cast("int")
            )
        )
        new_ranks = materialize(new_ranks)
        err = (
            new_ranks.select("vertex_id", "rank")
            .join(
                ranks.select("vertex_id", F.col("rank").alias("old")), "vertex_id"
            )
            .agg(F.sum(F.abs(F.col("rank") - F.col("old"))))
            .collect()[0][0]
        )
        ranks = new_ranks
        if err < n * tol:
            break
    blocks.unpersist()
    dangling.unpersist()
    return ranks.select("vertex_id", "rank")


def lpa_csr(
    graph: Graph,
    max_iterations: int = 20,
    num_blocks: int | None = None,
    salt_threshold: int | None = None,
) -> DataFrame:
    """Label propagation via Arrow kernels over CSR blocks.

    Identical deterministic spec to :func:`csd363_sin_spark.operators.
    lpa.label_propagation` (synchronous weighted neighbor vote, smallest-
    label ties, isolates keep their label, fixpoint stop) — asserted
    bit-identical by tests/test_csr.py.  The per-superstep neighbor-label
    vote runs as a numpy/pandas gather inside a cogrouped-Arrow kernel:
    each block joins its sources' labels block-locally (only the |V|-row
    label vector is exchanged per superstep, never the O(|E|) adjacency)
    and emits per-(neighbor, label) weight partials, pre-aggregated
    within the block — the same map-side-combine shape as pagerank_csr's
    segment-sum.  Completes the north-star CSR kernel family across all
    four named link-graph operators (PageRank, CC via csr_gather BFS,
    Louvain gain gather, LPA vote gather).
    """
    spark = graph.edges.sparkSession
    if num_blocks is None:
        num_blocks = max(1, spark.sparkContext.defaultParallelism)
    blocks = build_blocks(
        graph, num_blocks=num_blocks, weighted=True, salt_threshold=salt_threshold
    ).persist()
    blocks.count()

    labels = materialize(
        graph.vertices.select(
            "vertex_id",
            F.col("vertex_id").alias("label"),
            F.pmod(F.col("vertex_id"), F.lit(num_blocks)).cast("int").alias("part_id"),
        )
    )

    def kernel(key, block_pdf: pd.DataFrame, label_pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"vertex_id": [], "label": [], "partial": []}).astype(
            {"vertex_id": "int64", "label": "int64", "partial": "float64"}
        )
        if block_pdf.empty or label_pdf.empty:
            return empty
        lmap = pd.Series(
            label_pdf["label"].to_numpy(dtype=np.int64),
            index=label_pdf["vertex_id"].to_numpy(dtype=np.int64),
        )
        parts = []
        for _, row in block_pdf.iterrows():
            srcs = np.asarray(row["src_sorted"], dtype=np.int64)
            offs = np.asarray(row["offsets"], dtype=np.int64)
            dsts = np.asarray(row["dst"], dtype=np.int64)
            ws = np.asarray(row["weight"], dtype=np.float64)
            if len(srcs) == 0:
                continue
            src_labels = lmap.reindex(srcs).to_numpy()
            per_edge_label = np.repeat(src_labels, np.diff(offs)).astype(np.int64)
            parts.append(
                pd.DataFrame(
                    {"vertex_id": dsts, "label": per_edge_label, "partial": ws}
                )
            )
        if not parts:
            return empty
        # block-local combine: one partial row per (neighbor, label)
        return (
            pd.concat(parts)
            .groupby(["vertex_id", "label"], as_index=False, sort=False)["partial"]
            .sum()
        )

    try:
        for _ in range(max_iterations):
            votes = (
                blocks.groupBy("part_id")
                .cogroup(labels.groupBy("part_id"))
                .applyInPandas(kernel, "vertex_id long, label long, partial double")
                .groupBy("vertex_id", "label")
                .agg(F.sum("partial").alias("score"))
            )
            picked = (
                votes.groupBy("vertex_id")
                .agg(
                    F.max(
                        F.struct(F.col("score"), (-F.col("label")).alias("neg"))
                    ).alias("m")
                )
                .select("vertex_id", (-F.col("m.neg")).alias("new_label"))
            )
            merged = materialize(
                labels.join(picked, "vertex_id", "left").select(
                    "vertex_id",
                    F.coalesce("new_label", "label").alias("label"),
                    "part_id",
                    (F.coalesce("new_label", "label") != F.col("label"))
                    .cast("long")
                    .alias("_chg"),
                )
            )
            changed = merged.agg(F.sum("_chg")).collect()[0][0] or 0
            from csd363_sin_spark.plans.lineage import adopt, release

            release(labels)
            labels = adopt(merged.select("vertex_id", "label", "part_id"), merged)
            if changed == 0:
                break
    finally:
        blocks.unpersist()
    return labels.select("vertex_id", "label")
