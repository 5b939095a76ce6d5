"""Link prediction over the co-occurrence graph (beyond the reference).

Classic neighborhood-overlap predictors for candidate edges — the
link-graph workload's "which edges are missing" query (Liben-Nowell &
Kleinberg 2003): for every NON-adjacent pair (u, v) sharing at least one
neighbor,

* ``common_neighbors``  |N(u) ∩ N(v)|
* ``jaccard``           |N(u) ∩ N(v)| / |N(u) ∪ N(v)|
* ``adamic_adar``       Σ_{w ∈ N(u) ∩ N(v)} 1 / ln(deg(w))

matching ``nx.jaccard_coefficient`` / ``nx.adamic_adar_index`` semantics
on simple unweighted graphs (a common neighbor always has degree >= 2,
so ln(deg) > 0).

Scale design: candidate generation is the wedge self-join of the
symmetric edge view on the CENTER vertex — the same shape as triangle
counting (operators/triangles.py), so Catalyst sort-merge-joins it and
AQE splits skewed centers.  The quadratic hazard is a hub center with
degree d contributing d² pairs; ``max_center_degree`` caps it exactly
like ``max_shingle_freq`` caps dedup's inverted index (functions/
dedup.py) — hubs carry the LEAST signal for Adamic-Adar (weight
1/ln(deg) → 0), so dropping them changes scores only by the tail the
estimator already down-weights.  Exclusion of existing edges is one
anti-join on the canonical edge table; everything else is hash
aggregation with map-side combine.  No Python in the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from csd363_sin_spark.plans.induce import Graph


def link_prediction_scores(
    graph: Graph, max_center_degree: int | None = None
) -> DataFrame:
    """All non-adjacent candidate pairs with the three overlap scores.

    Returns ``(u, v, common_neighbors, jaccard, adamic_adar)`` with
    ``u < v`` (dense vertex ids).  ``max_center_degree`` drops wedge
    centers with degree above the cap (hub guard, see module docstring);
    ``None`` = exact.
    """
    deg = graph.degrees()
    sym = graph.edges_sym().select("src", "dst")
    degw = deg.select(
        F.col("vertex_id").alias("w"), F.col("degree").alias("deg_w")
    )
    if max_center_degree is not None:
        degw = degw.filter(F.col("deg_w") <= F.lit(float(max_center_degree)))
    s1 = sym.select(F.col("src").alias("w"), F.col("dst").alias("u"))
    s2 = sym.select(F.col("src").alias("w"), F.col("dst").alias("v"))
    wedges = (
        s1.join(s2, "w")
        .filter(F.col("u") < F.col("v"))
        .join(degw, "w")  # inner: also applies the hub cap when set
    )
    scored = wedges.groupBy("u", "v").agg(
        F.count(F.lit(1)).alias("common_neighbors"),
        F.sum(F.lit(1.0) / F.log(F.col("deg_w"))).alias("adamic_adar"),
    )
    # drop pairs that are already edges (canonical table has src < dst)
    nonadj = scored.join(
        graph.edges.select(
            F.col("src").alias("u"), F.col("dst").alias("v")
        ),
        ["u", "v"],
        "left_anti",
    )
    du = deg.select(F.col("vertex_id").alias("u"), F.col("degree").alias("deg_u"))
    dv = deg.select(F.col("vertex_id").alias("v"), F.col("degree").alias("deg_v"))
    return (
        nonadj.join(du, "u")
        .join(dv, "v")
        .select(
            "u",
            "v",
            "common_neighbors",
            F.round(
                F.col("common_neighbors")
                / (F.col("deg_u") + F.col("deg_v") - F.col("common_neighbors")),
                6,
            ).alias("jaccard"),
            F.round("adamic_adar", 6).alias("adamic_adar"),
        )
    )


def link_prediction_topk(
    graph: Graph, k: int = 20, max_center_degree: int | None = None
) -> DataFrame:
    """Top-k candidate edges by Adamic-Adar (6-dp rounded), deterministic
    tie-break on (u, v) — the ranking a link-recommendation job emits.

    Scale: the global top-k is a TakeOrderedAndProject over the scored
    pairs (per-partition top-k then one k-row merge), never a full sort.
    """
    return link_prediction_scores(graph, max_center_degree).orderBy(
        F.desc("adamic_adar"), F.asc("u"), F.asc("v")
    ).limit(k)
