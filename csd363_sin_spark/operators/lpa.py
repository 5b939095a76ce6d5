"""Label propagation — deterministic synchronous weighted LPA.

The north rule names label propagation as a core link-graph operator
alongside PageRank / connected components / triangle count; the reference
covers the *modularity-gain* LPA variant inside Louvain (reference
algorithms/louvain_wrapper.py drives python-louvain's one-level moves),
but ships no plain LPA.  This module supplies the classic operator
(Raghavan et al. 2007, "Near linear time algorithm to detect community
structures in large-scale networks") with a fully deterministic spec so
Spark, the driver kernel, and the DuckDB oracle agree bit-for-bit:

* ``label_0(v) = v`` (the vertex's own dense id);
* superstep ``t``: every vertex with >= 1 neighbor adopts
  ``argmax_L sum(w(v,u) for u in N(v) if label_{t-1}(u) == L)``,
  ties broken toward the SMALLEST label; isolates keep their label;
* stop at a fixpoint (labels identical to the previous superstep) or
  after ``max_iterations``.

Synchronous + smallest-label tie-break makes the run reproducible (no
RNG, no visit order) and SQL-expressible: the driver gate mirrors K
supersteps as unrolled CTE layers in DuckDB over actor strings — valid
because :func:`csd363_sin_spark.plans.ids.dense_ids` is key-order dense,
so smallest-id tie-breaks coincide with smallest-actor-string tie-breaks.

Scale notes (the distributed path): one superstep = one join of the
symmetric edge view against the |V|-row label table plus one
(vertex, label) partial-aggregated shuffle and one argmax aggregation —
the same two-exchange shape as a Louvain local-move superstep, with the
big edge side pre-partitioned and persisted once so only the label table
moves per superstep.  ``materialize`` truncates lineage each superstep
(the iterative-DataFrame pitfall) and superseded label frames are
released.  Dispatch parity with the driver kernel is exact when edge
weights are integral-valued doubles (conversation co-occurrence counts
are), because per-label score sums are then order-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from csd363_sin_spark.plans.induce import Graph
from csd363_sin_spark.plans.lineage import adopt, materialize, release


def _lpa_driver(graph: Graph, max_iterations: int) -> DataFrame:
    """Driver-side kernel — identical spec, one collect, for graphs at or
    below the dispatch threshold (mirror of the PageRank/Louvain/CC
    driver paths: the gate-scale graphs are far cheaper to fold on the
    driver than to run O(iterations) shuffle rounds on)."""
    adj: dict[int, list[tuple[int, float]]] = {}
    for r in graph.vertices.select("vertex_id").collect():
        adj[int(r["vertex_id"])] = []
    for r in graph.edges.select("src", "dst", "weight").collect():
        u, v, w = int(r["src"]), int(r["dst"]), float(r["weight"])
        adj.setdefault(u, []).append((v, w))
        adj.setdefault(v, []).append((u, w))
    labels = {v: v for v in adj}
    for _ in range(max_iterations):
        new = {}
        for v, nbrs in adj.items():
            if not nbrs:
                new[v] = labels[v]
                continue
            scores: dict[int, float] = {}
            for u, w in nbrs:
                lu = labels[u]
                scores[lu] = scores.get(lu, 0.0) + w
            # max score, then smallest label
            new[v] = max(scores.items(), key=lambda kv: (kv[1], -kv[0]))[0]
        if new == labels:
            break
        labels = new
    return graph.edges.sparkSession.createDataFrame(
        sorted(labels.items()), "vertex_id long, label long"
    )


def label_propagation(
    graph: Graph,
    max_iterations: int = 20,
    use_reliable_checkpoint: bool = False,
    local_edges_threshold: int = 100_000,
) -> DataFrame:
    """Return ``(vertex_id long, label long)`` — converged LPA labels.

    Graphs at or below ``local_edges_threshold`` edges run the driver
    kernel; larger graphs (or threshold 0) run the distributed superstep
    loop.  Both paths implement the identical deterministic spec.
    """
    if (
        local_edges_threshold > 0
        and graph.edges.count() <= local_edges_threshold
    ):
        return _lpa_driver(graph, max_iterations)

    spark = graph.edges.sparkSession
    num_part = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    # the O(E) side of every superstep join, shuffled once and pinned:
    # keyed by dst so the per-superstep join only moves the |V|-row labels.
    # persist (NOT materialize): a localCheckpoint re-wrap hides the hash
    # partitioning from Catalyst, which would re-shuffle the 2|E| side
    # every superstep — the exact pitfall louvain's sym view documents
    sym = graph.edges_sym().repartition(num_part, "dst").persist()
    sym.count()
    labels = materialize(
        graph.vertices.select(
            "vertex_id", F.col("vertex_id").alias("label")
        ),
        use_reliable_checkpoint,
    )
    try:
        for _ in range(max_iterations):
            votes = (
                sym.join(
                    labels.select(F.col("vertex_id").alias("dst"), "label"), "dst"
                )
                .groupBy(F.col("src").alias("vertex_id"), "label")
                .agg(F.sum("weight").alias("score"))
            )
            # argmax by (score, -label): one aggregation, no window —
            # max of the struct is the best score with the smallest label
            picked = (
                votes.groupBy("vertex_id")
                .agg(
                    F.max(
                        F.struct(
                            F.col("score"), (-F.col("label")).alias("neg")
                        )
                    ).alias("m")
                )
                .select("vertex_id", (-F.col("m.neg")).alias("new_label"))
            )
            merged = materialize(
                labels.join(picked, "vertex_id", "left").select(
                    "vertex_id",
                    F.coalesce("new_label", "label").alias("label"),
                    (F.coalesce("new_label", "label") != F.col("label"))
                    .cast("long")
                    .alias("_chg"),
                ),
                use_reliable_checkpoint,
            )
            changed = merged.agg(F.sum("_chg")).collect()[0][0] or 0
            release(labels)
            labels = adopt(merged.select("vertex_id", "label"), merged)
            if changed == 0:
                break
    finally:
        sym.unpersist()
    return labels


def _spreading_driver(
    graph: Graph, seeds: dict[int, int], max_iterations: int
) -> DataFrame:
    adj: dict[int, list[tuple[int, float]]] = {}
    for r in graph.vertices.select("vertex_id").collect():
        adj[int(r["vertex_id"])] = []
    for r in graph.edges.select("src", "dst", "weight").collect():
        u, v, w = int(r["src"]), int(r["dst"]), float(r["weight"])
        adj.setdefault(u, []).append((v, w))
        adj.setdefault(v, []).append((u, w))
    labels: dict[int, int] = dict(seeds)
    for _ in range(max_iterations):
        new = dict(seeds)
        for v, nbrs in adj.items():
            if v in seeds:
                continue
            scores: dict[int, float] = {}
            for u, w in nbrs:
                lu = labels.get(u)
                if lu is not None:
                    scores[lu] = scores.get(lu, 0.0) + w
            if scores:
                new[v] = max(scores.items(), key=lambda kv: (kv[1], -kv[0]))[0]
        if new == labels:
            break
        labels = new
    return graph.edges.sparkSession.createDataFrame(
        sorted(labels.items()), "vertex_id long, label long"
    )


def label_spreading(
    graph: Graph,
    seeds: DataFrame,
    max_iterations: int = 20,
    use_reliable_checkpoint: bool = False,
    local_edges_threshold: int = 100_000,
) -> DataFrame:
    """Seeded semi-supervised label spreading (hard-clamped seeds) —
    classify every vertex from a few labeled ones, the transductive SSL
    primitive (Zhu-Ghahramani '02 label propagation with clamping, here
    in the deterministic argmax form so all paths agree bit-for-bit).

    ``seeds``: DataFrame ``(vertex_id long, label long)`` — these labels
    never change.  Each superstep recomputes every non-seed vertex's
    label from scratch as the weighted-majority label among its
    currently-labeled neighbors (ties to the SMALLEST label); vertices
    with no labeled neighbor stay unlabeled.  Stops at a fixpoint or
    after ``max_iterations`` — the from-scratch recompute is idempotent
    at a fixpoint, so a fixed-K unrolled mirror (the DuckDB oracle)
    matches the early-stopped run exactly.

    Returns ``(vertex_id long, label long)`` for LABELED vertices only
    (unreached vertices are absent — nx/sklearn convention for
    disconnected transductive classification).

    Scale shape: identical to :func:`label_propagation` — the 2|E| sym
    view is shuffled once and pinned, each superstep exchanges only the
    |V|-row nullable-label table (one vote join + one struct-argmax
    aggregation), lineage truncated per round.
    """
    if (
        local_edges_threshold > 0
        and graph.edges.count() <= local_edges_threshold
    ):
        seed_map = {
            int(r["vertex_id"]): int(r["label"])
            for r in seeds.select("vertex_id", "label").collect()
        }
        return _spreading_driver(graph, seed_map, max_iterations)

    spark = graph.edges.sparkSession
    num_part = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    sym = graph.edges_sym().repartition(num_part, "dst").persist()
    sym.count()
    seed_tbl = (
        seeds.select("vertex_id", F.col("label").cast("long").alias("seed"))
        .distinct()
        .persist()
    )
    seed_tbl.count()
    state = materialize(
        graph.vertices.select("vertex_id")
        .join(seed_tbl, "vertex_id", "left")
        .select("vertex_id", F.col("seed").alias("label")),
        use_reliable_checkpoint,
    )
    try:
        for _ in range(max_iterations):
            votes = (
                sym.join(
                    state.filter(F.col("label").isNotNull()).select(
                        F.col("vertex_id").alias("dst"), "label"
                    ),
                    "dst",
                )
                .groupBy(F.col("src").alias("vertex_id"), "label")
                .agg(F.sum("weight").alias("score"))
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
                graph.vertices.select("vertex_id")
                .join(seed_tbl, "vertex_id", "left")
                .join(picked, "vertex_id", "left")
                .join(
                    state.select(
                        "vertex_id", F.col("label").alias("old_label")
                    ),
                    "vertex_id",
                    "left",
                )
                .select(
                    "vertex_id",
                    F.coalesce("seed", "new_label").alias("label"),
                    (
                        ~F.coalesce("seed", "new_label").eqNullSafe(
                            F.col("old_label")
                        )
                    )
                    .cast("long")
                    .alias("_chg"),
                ),
                use_reliable_checkpoint,
            )
            changed = merged.agg(F.sum("_chg")).collect()[0][0] or 0
            release(state)
            state = adopt(merged.select("vertex_id", "label"), merged)
            if changed == 0:
                break
    finally:
        sym.unpersist()
        seed_tbl.unpersist()
    return state.filter(F.col("label").isNotNull())
