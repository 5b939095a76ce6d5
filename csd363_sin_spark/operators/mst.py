"""Minimum spanning forest — distributed Borůvka.

Borůvka (1926) is THE MapReduce/Pregel-friendly MSF algorithm: each
round every component selects its minimum-key incident inter-component
edge, the selected edges join the forest, and touching components
contract.  Components at least halve per round, so O(log V) rounds.

Determinism: edges are totally ordered by the key ``(weight, src,
dst)`` — distinct for distinct edges — so the keyed graph has all-
distinct "weights" and therefore a UNIQUE minimum spanning forest; any
correct algorithm over the same key order (the pytest mirror runs
Kruskal) produces bit-identical output, and the run is a pure function
of the edge set.

Scale shape per round: one component-annotation join (two hash joins on
vertex id), one min-by-key aggregation per component (map-side
combinable — the struct min is a single-pass semigroup), and one
connected-components pass over the PICKED component-level edges only
(≤ one edge per component, a graph that shrinks geometrically).  The
label relabel join is |V| rows against the (small) merge mapping.  No
per-row Python, no driver materialization of anything O(V).

No reference counterpart (the reference is community detection only);
included as a link-graph supporting operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from csd363_sin_spark.operators.components import connected_components
from csd363_sin_spark.plans.induce import Graph
from csd363_sin_spark.plans.lineage import materialize, release


def minimum_spanning_forest(
    graph: Graph,
    max_rounds: int = 40,
    local_merge_threshold: int = 100_000,
) -> DataFrame:
    """Return the unique minimum spanning forest under the total edge
    order ``(weight, src, dst)`` as ``(src long, dst long, weight
    double)`` rows (canonical src < dst, one row per forest edge).

    Parallel edges collapse to their minimum weight first (the MSF of a
    multigraph never uses a dominated parallel edge).  Isolated vertices
    contribute no rows.  ``local_merge_threshold`` is passed through to
    the per-round connected-components merge (the engine's usual
    adaptive driver dispatch for small merge graphs; both paths are
    label-identical)."""
    e = materialize(
        graph.edges.filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.min("weight").alias("weight"))
    )
    comp = materialize(
        graph.vertices.select("vertex_id", F.col("vertex_id").alias("comp"))
    )
    spark = graph.vertices.sparkSession
    forest_parts: list[DataFrame] = []
    for _ in range(max_rounds):
        cu = comp.select(F.col("vertex_id").alias("src"), F.col("comp").alias("cu"))
        cv = comp.select(F.col("vertex_id").alias("dst"), F.col("comp").alias("cv"))
        live = (
            e.join(cu, "src").join(cv, "dst").filter(F.col("cu") != F.col("cv"))
        )
        key = F.struct("weight", "src", "dst").alias("k")
        cand = live.select(F.col("cu").alias("c"), key).unionAll(
            live.select(F.col("cv").alias("c"), key)
        )
        picked = materialize(
            cand.groupBy("c")
            .agg(F.min("k").alias("k"))
            .select("k.src", "k.dst", "k.weight")
            .distinct()
        )
        if picked.isEmpty():
            release(picked)
            break
        forest_parts.append(picked)
        # contract: CC over the component-level picked pairs; untouched
        # components keep their label via the left join + coalesce
        cpairs = (
            picked.join(cu, "src")
            .join(cv, "dst")
            .select(
                F.least("cu", "cv").alias("src"),
                F.greatest("cu", "cv").alias("dst"),
                F.lit(1.0).alias("weight"),
            )
            .distinct()
        )
        merge_nodes = cpairs.select(F.col("src").alias("vertex_id")).unionAll(
            cpairs.select(F.col("dst").alias("vertex_id"))
        ).distinct()
        labels = connected_components(
            Graph(vertices=merge_nodes, edges=cpairs),
            local_edges_threshold=local_merge_threshold,
        ).select(F.col("vertex_id").alias("comp"), F.col("comp_id").alias("new_comp"))
        prev = comp
        comp = materialize(
            prev.join(labels, "comp", "left").select(
                "vertex_id",
                F.coalesce("new_comp", F.col("comp")).alias("comp"),
            )
        )
        release(prev)
    release(comp)
    release(e)
    if not forest_parts:
        return spark.createDataFrame([], "src long, dst long, weight double")
    out = forest_parts[0]
    for p in forest_parts[1:]:
        out = out.unionByName(p)
    res = materialize(out.select("src", "dst", "weight"))
    for p in forest_parts:
        release(p)
    return res
