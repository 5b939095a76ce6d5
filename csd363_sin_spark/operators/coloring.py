"""Deterministic maximal independent set + distance-1 coloring.

Luby's classic distributed MIS (Luby 1986, "A Simple Parallel Algorithm
for the Maximal Independent Set Problem") derandomized with the engine-
portable hash family (functions/dedup.portable_hash64 md5 prefix), the
same trick the walk corpus uses: a vertex joins the MIS in round r iff
its priority string is the STRICT minimum over itself and all still-
undecided neighbors; the MIS and its closed neighborhood then leave the
residual graph.  Priorities are ``md5(salt:actor) || ':' || actor`` —
totally ordered and collision-free (the actor suffix breaks any md5
collision identically in every engine), so the whole run is a pure
function of the edge set.

``hash_coloring`` iterates the same extraction but removes ONLY the MIS
each round and assigns ``color = round`` (iterated-MIS coloring — the
simple Jones-Plassmann variant that trades a few extra colors for an
unrollable, engine-mirrorable rule; a smallest-available-color pass
would need per-vertex color-set scans).

Scale shape per round: one self-join of the symmetric edge view against
the undecided set + one min aggregation + two anti-joins — all O(E_resid)
with map-side combining; the residual edge set shrinks geometrically
(MIS removes closed neighborhoods), so total work is O(E log V) in
expectation over the hash draw.  No reference counterpart (the reference
has no MIS/coloring); included as a link-graph supporting operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from csd363_sin_spark.plans.lineage import materialize, release


def _prio(salt: str):
    return F.concat(
        F.md5(F.concat(F.lit(salt + ":"), F.col("actor"))),
        F.lit(":"),
        F.col("actor"),
    )


def _sym_named(edges_named: DataFrame) -> DataFrame:
    e = edges_named.filter(F.col("src_actor") != F.col("dst_actor"))
    return (
        e.select(F.col("src_actor").alias("u"), F.col("dst_actor").alias("v"))
        .unionAll(
            e.select(F.col("dst_actor").alias("u"), F.col("src_actor").alias("v"))
        )
        .distinct()
    )


def _extract_rounds(
    vertices_named: DataFrame,
    edges_named: DataFrame,
    salt: str,
    max_rounds: int,
    remove_neighbors: bool,
) -> DataFrame:
    """Shared Luby loop.  Returns ``(actor, round)`` for every vertex
    selected in some round; vertices never selected within ``max_rounds``
    are absent (callers emit them as -1, identically to the SQL mirror)."""
    sym = _sym_named(edges_named).persist()
    sym.count()
    und = materialize(
        vertices_named.select("actor").distinct().withColumn("prio", _prio(salt))
    )
    picked: list[DataFrame] = []
    spark = vertices_named.sparkSession
    for r in range(max_rounds):
        if und.isEmpty():
            break
        u_side = und.select(F.col("actor").alias("u"))
        v_side = und.select(F.col("actor").alias("v"), F.col("prio").alias("pv"))
        nbr_min = (
            sym.join(u_side, "u")
            .join(v_side, "v")
            .groupBy("u")
            .agg(F.min("pv").alias("minp"))
            .withColumnRenamed("u", "actor")
        )
        winners = materialize(
            und.join(nbr_min, "actor", "left")
            .filter(F.col("minp").isNull() | (F.col("prio") < F.col("minp")))
            .select("actor")
        )
        picked.append(winners.withColumn("round", F.lit(r)))
        removed = winners
        if remove_neighbors:
            nbrs = (
                sym.join(winners.select(F.col("actor").alias("u")), "u", "left_semi")
                .select(F.col("v").alias("actor"))
                .distinct()
            )
            removed = winners.unionByName(nbrs).distinct()
        prev = und
        und = materialize(prev.join(removed, "actor", "left_anti"))
        release(prev)
    release(und)
    sym.unpersist()
    if not picked:
        return spark.createDataFrame([], "actor string, round int")
    out = picked[0]
    for p in picked[1:]:
        out = out.unionByName(p)
    res = materialize(out)
    for p in picked:
        release(p)
    return res


def maximal_independent_set(
    vertices_named: DataFrame,
    edges_named: DataFrame,
    salt: str = "mis",
    max_rounds: int = 20,
) -> DataFrame:
    """Deterministic Luby MIS over actor-named edges.

    Returns ``(actor, in_mis, mis_round)`` for EVERY vertex:
    ``mis_round`` = the round the vertex entered the MIS, -1 if it was
    removed as a neighbor (or the round cap hit first — callers mirroring
    in SQL unroll the same cap, so both engines agree regardless).
    Isolated vertices enter in round 0.  The result is independent (no
    two MIS members adjacent) and, at fixpoint, maximal."""
    sel = _extract_rounds(
        vertices_named, edges_named, salt, max_rounds, remove_neighbors=True
    )
    return (
        vertices_named.select("actor")
        .distinct()
        .join(sel, "actor", "left")
        .select(
            "actor",
            F.col("round").isNotNull().alias("in_mis"),
            F.coalesce(F.col("round"), F.lit(-1)).alias("mis_round"),
        )
    )


def hash_coloring(
    vertices_named: DataFrame,
    edges_named: DataFrame,
    salt: str = "color",
    max_rounds: int = 40,
) -> DataFrame:
    """Iterated-MIS distance-1 coloring: round r's MIS gets color r (a
    proper coloring — MIS members are pairwise non-adjacent; each round
    removes only the MIS, so neighbors recompete later).  Returns
    ``(actor, color)`` with -1 for vertices still undecided at the round
    cap (mirrored identically by the SQL oracle)."""
    sel = _extract_rounds(
        vertices_named, edges_named, salt, max_rounds, remove_neighbors=False
    )
    return (
        vertices_named.select("actor")
        .distinct()
        .join(sel, "actor", "left")
        .select("actor", F.coalesce(F.col("round"), F.lit(-1)).alias("color"))
    )


def _edge_prio(salt: str, weighted: bool = False):
    key = F.concat(F.col("u"), F.lit("|"), F.col("v"))
    prio = F.concat(F.md5(F.concat(F.lit(salt + ":"), key)), F.lit(":"), key)
    if weighted:
        # heavier edge = smaller priority string: prefix with the
        # zero-padded 10^15 complement of the ppm-quantized weight
        # (exact for weights below 10^9; ties fall through to the hash)
        wkey = F.lpad(
            (F.lit(10**15) - F.floor(F.col("w") * 1e6 + F.lit(0.5)))
            .cast("long")
            .cast("string"),
            16,
            "0",
        )
        prio = F.concat(wkey, F.lit("~"), prio)
    return prio


def maximal_matching(
    vertices_named: DataFrame,
    edges_named: DataFrame,
    salt: str = "match",
    max_rounds: int = 20,
    weighted: bool = False,
) -> DataFrame:
    """Deterministic maximal matching (Israeli & Itai 1986 style,
    derandomized with the portable md5 hash family): in round r a live
    edge is matched iff its priority string is the minimum over ALL live
    edges sharing either endpoint; matched endpoints leave, repeat.
    Distinct priorities (the u|v suffix breaks md5 ties) make winners
    vertex-disjoint by construction, and the globally-minimum edge always
    wins, so every round makes progress; in expectation over the hash
    draw a constant fraction of live edges retires per round (O(log E)
    rounds).

    Returns ``(actor, mate_actor, match_round)`` for EVERY vertex —
    ``mate_actor = ''`` / ``match_round = -1`` for unmatched vertices
    (or the round cap hit first; SQL mirrors unroll the same cap, so
    both engines agree regardless).

    ``weighted=True`` orders priorities by ppm-quantized edge weight
    DESCENDING before the hash — the locally-heaviest-edge handshake
    (Preis 1999 style), a deterministic 1/2-approximation of the
    maximum-weight matching (every matched edge is at least as heavy as
    every edge it excludes at selection time).  Parallel edges collapse
    to their max weight.

    Scale shape per round: one endpoint-explode + min aggregation
    (map-side combinable) + one self-annotating join + two anti-joins,
    all O(E_live); the live set shrinks geometrically.  No reference
    counterpart; included as a link-graph supporting operator."""
    e = (
        edges_named.filter(F.col("src_actor") != F.col("dst_actor"))
        .groupBy(
            F.least("src_actor", "dst_actor").alias("u"),
            F.greatest("src_actor", "dst_actor").alias("v"),
        )
        .agg(F.max("weight").alias("w"))
    )
    live = materialize(
        e.withColumn("prio", _edge_prio(salt, weighted)).select("u", "v", "prio")
    )
    spark = vertices_named.sparkSession
    picked: list[DataFrame] = []
    for r in range(max_rounds):
        if live.isEmpty():
            break
        ends = live.select(F.col("u").alias("actor"), "prio").unionAll(
            live.select(F.col("v").alias("actor"), "prio")
        )
        minp = ends.groupBy("actor").agg(F.min("prio").alias("minp"))
        mu = minp.select(F.col("actor").alias("u"), F.col("minp").alias("mu"))
        mv = minp.select(F.col("actor").alias("v"), F.col("minp").alias("mv"))
        winners = materialize(
            live.join(mu, "u")
            .join(mv, "v")
            .filter((F.col("prio") == F.col("mu")) & (F.col("prio") == F.col("mv")))
            .select("u", "v")
        )
        picked.append(winners.withColumn("round", F.lit(r)))
        mvert = winners.select(F.col("u").alias("m")).unionAll(
            winners.select(F.col("v").alias("m"))
        )
        prev = live
        live = materialize(
            prev.join(mvert.select(F.col("m").alias("u")), "u", "left_anti")
            .join(mvert.select(F.col("m").alias("v")), "v", "left_anti")
        )
        release(prev)
    release(live)
    if picked:
        pairs = picked[0]
        for p in picked[1:]:
            pairs = pairs.unionByName(p)
    else:
        pairs = spark.createDataFrame([], "u string, v string, round int")
    mates = pairs.select(
        F.col("u").alias("actor"), F.col("v").alias("mate_actor"), "round"
    ).unionByName(
        pairs.select(
            F.col("v").alias("actor"), F.col("u").alias("mate_actor"), "round"
        )
    )
    out = materialize(
        vertices_named.select("actor")
        .distinct()
        .join(mates, "actor", "left")
        .select(
            "actor",
            F.coalesce("mate_actor", F.lit("")).alias("mate_actor"),
            F.coalesce(F.col("round"), F.lit(-1)).cast("int").alias("match_round"),
        )
    )
    for p in picked:
        release(p)
    return out


def wl_refinement(
    vertices_named: DataFrame,
    edges_named: DataFrame,
    rounds: int = 3,
    salt: str = "wl",
) -> DataFrame:
    """Weisfeiler-Leman color refinement (1-WL / naive vertex refinement,
    Weisfeiler & Leman 1968): iterate

        color_{r+1}(v) = md5(salt : color_r(v) : sorted neighbor colors)

    from the uniform start color.  After r rounds two vertices share a
    color only if their depth-r neighborhood trees agree — the standard
    structural-role / graph-isomorphism primitive (and the expressive
    ceiling of message-passing GNNs, Xu et al. 2019).

    Returns ``(actor, wl_color, class_size)`` — the round-``rounds``
    color (md5 hex) and how many vertices share it.  Per round: one
    sym-edge join + one sorted-list aggregation per vertex (the sort is
    per-group over neighbor colors, map-side combinable by Spark's
    collect_list + sort_array) — O(E log d) work, the distributed-WL
    standard.  Isolated vertices keep hashing their own color alone."""
    sym = _sym_named(edges_named).persist()
    sym.count()
    colors = materialize(
        vertices_named.select("actor").distinct().withColumn(
            "color", F.md5(F.lit(salt + ":init"))
        )
    )
    for _ in range(rounds):
        nb = colors.select(
            F.col("actor").alias("v"), F.col("color").alias("nb_color")
        )
        agg = (
            sym.join(nb, "v")
            .groupBy(F.col("u").alias("actor"))
            .agg(
                F.array_join(
                    F.sort_array(F.collect_list("nb_color")), ","
                ).alias("nbs")
            )
        )
        prev = colors
        colors = materialize(
            prev.join(agg, "actor", "left")
            .fillna({"nbs": ""})
            .select(
                "actor",
                F.md5(
                    F.concat(
                        F.lit(salt + ":"), F.col("color"), F.lit(":"), F.col("nbs")
                    )
                ).alias("color"),
            )
        )
        release(prev)
    sym.unpersist()
    sizes = colors.groupBy("color").agg(F.count(F.lit(1)).alias("class_size"))
    return (
        colors.join(sizes, "color")
        .select("actor", F.col("color").alias("wl_color"), "class_size")
    )


def densest_subgraph(
    vertices_named: DataFrame,
    edges_named: DataFrame,
    eps: float = 0.5,
    max_rounds: int = 30,
) -> DataFrame:
    """Densest-subgraph 2(1+eps)-approximation by parallel peeling
    (Bahmani, Kumar & Vassilvitskii, VLDB 2012): each round computes the
    current density rho = |E(S)|/|S| and removes EVERY vertex whose
    degree within S is <= 2(1+eps)*rho; the answer is the round snapshot
    with the highest density (earliest round on ties).  O(log_{1+eps} n)
    rounds, each one semi-join + one degree aggregation over the
    shrinking S — the canonical MapReduce formulation.

    Returns ``(actor, in_densest, density_ppm, best_round)`` for every
    vertex (the scalar best columns repeated per row; density in integer
    micro-units — floor(rho*1e6 + 0.5) is exact IEEE on the
    integer-derived double, unlike decimal rounding).  All peel
    comparisons are exact IEEE too, so the peel is engine-portable round
    by round; a ``max_rounds`` cap below the fixpoint leaves the same
    best-so-far in both engines."""
    e = edges_named.filter(F.col("src_actor") != F.col("dst_actor")).select(
        F.col("src_actor").alias("u"), F.col("dst_actor").alias("v")
    ).distinct().persist()
    e.count()
    sym = e.unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    all_v = vertices_named.select("actor").distinct()
    s = materialize(all_v)
    snapshots: list = []
    best_rho, best_round = -1.0, -1
    for r in range(max_rounds):
        n_s = s.count()
        if n_s == 0:
            break
        su = s.select(F.col("actor").alias("u"))
        sv = s.select(F.col("actor").alias("v"))
        es = e.join(su, "u", "left_semi").join(sv, "v", "left_semi")
        m_s = es.count()
        rho = m_s / n_s
        snapshots.append((r, rho, s))
        if rho > best_rho:
            best_rho, best_round = rho, r
        if m_s == 0:
            break
        deg = (
            sym.join(su, "u", "left_semi")
            .join(sv, "v", "left_semi")
            .groupBy(F.col("u").alias("actor"))
            .agg(F.count(F.lit(1)).alias("d"))
        )
        thresh = 2.0 * (1.0 + eps) * rho
        s = materialize(
            s.join(deg, "actor", "left")
            .fillna({"d": 0})
            .filter(F.col("d") > thresh)
            .select("actor")
        )
    import math

    best_s = next(df for r, _, df in snapshots if r == best_round)
    density_ppm = int(math.floor(best_rho * 1e6 + 0.5)) if best_rho >= 0 else -1
    out = all_v.join(
        best_s.withColumn("_in", F.lit(True)), "actor", "left"
    ).select(
        "actor",
        F.coalesce(F.col("_in"), F.lit(False)).alias("in_densest"),
        F.lit(density_ppm).alias("density_ppm"),
        F.lit(best_round).alias("best_round"),
    )
    out = materialize(out)
    for _, _, df in snapshots:
        release(df)
    e.unpersist()
    return out
