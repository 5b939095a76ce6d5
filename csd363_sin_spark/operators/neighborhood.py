"""HyperANF: per-vertex neighborhood function via HLL register dataflow.

The neighborhood function NF(v, t) = |{u : dist(v, u) <= t}| answers the
"how big is the world around each vertex" questions (average distance,
effective diameter, reachable mass) that exact all-pairs BFS cannot at
scale (O(V*E)).  HyperANF (Boldi, Rosa & Vigna, WWW 2011) replaces each
vertex's exact ball set with a HyperLogLog sketch and exploits that HLL
union = register-wise max: one superstep per radius,

    regs_t(v) = max( regs_{t-1}(v), max over neighbors u regs_{t-1}(u) )

which in DataFrame terms is one join of the sparse register table
against the src-pre-partitioned symmetric edge view plus a map-side-
combined max — O(m * E) shuffle rows per superstep with m = 64
registers, the canonical HyperANF cost.  State is bounded by m rows per
vertex; lineage is cut per superstep (plans/lineage.py).

Determinism: the sketch (functions/sketch.py) is the engine-portable
md5-hash HLL, so per-vertex ball estimates are bit-identical across
runs, retries AND engines — the driver gate mirrors every superstep in
DuckDB SQL.  Values hash over vertex *labels* (caller-provided strings,
e.g. actor names) so the oracle needs no dense-id mapping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from csd363_sin_spark.functions.sketch import (
    hll_estimate_expr,
    hll_registers,
)
from csd363_sin_spark.plans.induce import Graph
from csd363_sin_spark.plans.lineage import materialize, release


def neighborhood_function(
    graph: Graph, max_t: int = 4, labels: DataFrame | None = None
) -> DataFrame:
    """Per-vertex HLL ball-size estimates for radii 0..max_t.

    Returns ``(vertex_id long, t int, ball_est double)``.  ``labels``
    optionally maps ``(vertex_id, label string)`` — the hashed identity
    of each vertex (defaults to the decimal string of ``vertex_id``);
    distinct labels are required for the estimates to mean |ball|.
    """
    if labels is None:
        labels = graph.vertices.select(
            "vertex_id", F.col("vertex_id").cast("string").alias("label")
        )
    sym = (
        graph.edges.select("src", "dst")
        .unionByName(
            graph.edges.select(
                F.col("dst").alias("src"), F.col("src").alias("dst")
            )
        )
        .repartition("src")
        .persist()
    )
    sym.count()

    state = materialize(hll_registers(labels, ["vertex_id"], "label"))
    agg, est = hll_estimate_expr()

    def _estimates(regs: DataFrame, t: int) -> DataFrame:
        return (
            regs.groupBy("vertex_id")
            .agg(*agg)
            .select(
                "vertex_id",
                F.lit(t).cast("int").alias("t"),
                est().alias("ball_est"),
            )
        )

    frames = [materialize(_estimates(state, 0))]
    for t in range(1, max_t + 1):
        prop = (
            state.withColumnRenamed("vertex_id", "src")
            .join(sym, "src")
            .select(F.col("dst").alias("vertex_id"), "idx", "reg")
        )
        new_state = materialize(
            state.unionByName(prop)
            .groupBy("vertex_id", "idx")
            .agg(F.max("reg").alias("reg"))
        )
        release(state)
        state = new_state
        frames.append(materialize(_estimates(state, t)))
    release(state)
    sym.unpersist()
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


def effective_diameter(nf: DataFrame, q: float = 0.9) -> DataFrame:
    """Effective diameter from a :func:`neighborhood_function` result:
    the smallest radius t where the total neighborhood mass reaches a
    fraction ``q`` of its value at the largest computed radius.  Returns
    one row ``(effective_diameter int, total_mass double)``."""
    totals = nf.groupBy("t").agg(F.sum("ball_est").alias("mass"))
    tmax = totals.agg(F.max("t")).collect()[0][0]
    final_mass = float(
        totals.filter(F.col("t") == tmax).collect()[0]["mass"]
    )
    hit = (
        totals.filter(F.col("mass") >= q * final_mass)
        .agg(F.min("t"))
        .collect()[0][0]
    )
    return nf.sparkSession.createDataFrame(
        [(int(hit), final_mass)], "effective_diameter int, total_mass double"
    )
