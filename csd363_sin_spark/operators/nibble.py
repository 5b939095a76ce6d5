"""PageRank-Nibble local community detection — beyond the reference.

Seed-set community extraction in the Andersen-Chung-Lang '06 shape:
personalized PageRank from the seeds, then a *conductance sweep* — order
vertices by score/degree, and over the growing prefix sets S_1 ⊂ S_2 ⊂ …
pick the prefix with minimum conductance cut(S)/min(vol(S), vol(V\\S)).
ACL's theorem says a low-conductance set near the seeds shows up as a
prefix of this order; the sweep finds it without ever enumerating
subsets.  The reference's global pipeline has no local-query operator —
this is the "what community does THIS node live in" primitive a
link-graph engine needs at interactive latency.

Scale design: the PPR comes from operators/pagerank.py (join-dataflow /
driver dispatch, already both-path oracle-pinned); everything after it
is bounded by ``top_m``: the swept prefix order is a sort-limit (per-
partition top-m + driver merge, the select_landmarks pattern — never a
global sort), the rank map is broadcast back against the edge table for
the intra-edge counts (one O(E) broadcast join, no shuffle), and the
prefix sums / argmin run as windows over ≤ top_m rows.  Degrees, cuts
and volumes are exact integers, so conductance is a ratio of exact
integers — engine-portable; the only FP in the operator is the PPR
score itself, which is rounded to ``score_round`` dp *for ordering*
(ties broken by vertex id) so the sweep order is identical in Spark,
DuckDB and the python test mirror.

Degree-0 vertices are excluded (score/deg undefined; a singleton's
conductance is undefined too).  Weights are used for the PPR walk, not
for conductance (degree/cut/vol are edge COUNTS, nx.conductance
default).
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from csd363_sin_spark.operators.pagerank import personalized_pagerank
from csd363_sin_spark.plans.induce import Graph


class NibbleResult(NamedTuple):
    """``sweep``: one row per prefix (rank, vertex_id, score, vol, cut,
    conductance); ``community``: the argmin-conductance prefix (rank,
    vertex_id) — smallest rank wins conductance ties."""

    sweep: DataFrame
    community: DataFrame


def conductance_sweep(
    graph: Graph,
    scores: DataFrame,
    top_m: int = 64,
    score_round: int = 6,
) -> DataFrame:
    """Sweep-cut table over the ``top_m`` best vertices of ``scores``
    ((vertex_id, rank) — any per-vertex relevance, PPR here).

    Returns ``(rank, vertex_id, score, vol, cut, conductance)`` where
    row k describes the prefix set S_k of the first k vertices in
    (round(rank/degree, score_round) DESC, vertex_id ASC) order:
    ``vol`` = sum of S_k's degrees, ``cut`` = edges leaving S_k,
    ``conductance`` = cut / min(vol, 2|E| - vol) (NULL when the
    denominator is 0 — S_k covers everything).
    """
    deg = graph.degrees().filter(F.col("degree") > 0)
    ranked = (
        scores.join(deg, "vertex_id")
        .select(
            "vertex_id",
            F.round(F.col("rank") / F.col("degree"), score_round).alias("score"),
            F.col("degree").cast("long").alias("deg"),
        )
        .orderBy(F.desc("score"), F.asc("vertex_id"))
        .limit(top_m)
    )
    # windows below run over <= top_m rows (bounded by construction)
    w_ord = Window.orderBy(F.desc("score"), F.asc("vertex_id"))
    ranked = ranked.withColumn("rank", F.row_number().over(w_ord))

    rk_a = ranked.select(F.col("vertex_id").alias("src"), F.col("rank").alias("ra"))
    rk_b = ranked.select(F.col("vertex_id").alias("dst"), F.col("rank").alias("rb"))
    # intra edge (both endpoints swept) joins the prefix at max(ra, rb)
    intra = (
        graph.edges.join(F.broadcast(rk_a), "src")
        .join(F.broadcast(rk_b), "dst")
        .select(F.greatest("ra", "rb").alias("rank"))
        .groupBy("rank")
        .agg(F.count(F.lit(1)).alias("new_intra"))
    )
    m2 = graph.edges.count() * 2
    w_pfx = Window.orderBy("rank").rowsBetween(Window.unboundedPreceding, 0)
    swept = (
        ranked.join(intra, "rank", "left")
        .withColumn("vol", F.sum("deg").over(w_pfx))
        .withColumn("intra", F.sum(F.coalesce("new_intra", F.lit(0))).over(w_pfx))
        .withColumn("cut", F.col("vol") - 2 * F.col("intra"))
        .withColumn(
            "den", F.least(F.col("vol"), F.lit(m2) - F.col("vol"))
        )
        .withColumn(
            "conductance",
            F.when(F.col("den") > 0, F.col("cut") / F.col("den")),
        )
        .select("rank", "vertex_id", "score", "vol", "cut", "conductance")
    )
    return swept


def pagerank_nibble(
    graph: Graph,
    seeds: DataFrame,
    alpha: float = 0.85,
    tol: float = 1.0e-6,
    max_iter: int = 100,
    weighted: bool = True,
    top_m: int = 64,
    score_round: int = 6,
    local_edges_threshold: int = 100_000,
) -> NibbleResult:
    """Local community around ``seeds`` (a vertex_id DataFrame): PPR +
    conductance sweep; community = argmin-conductance prefix (ties to
    the smallest prefix)."""
    ppr = personalized_pagerank(
        graph,
        seeds,
        alpha=alpha,
        tol=tol,
        max_iter=max_iter,
        weighted=weighted,
        local_edges_threshold=local_edges_threshold,
    )
    sweep = conductance_sweep(graph, ppr, top_m=top_m, score_round=score_round)
    best = (
        sweep.filter(F.col("conductance").isNotNull())
        .orderBy(F.asc("conductance"), F.asc("rank"))
        .limit(1)
        .select(F.col("rank").alias("best_rank"))
    )
    community = (
        sweep.join(F.broadcast(best), sweep["rank"] <= best["best_rank"])
        .select("rank", "vertex_id")
    )
    return NibbleResult(sweep, community)
