"""Community-quality metrics (SURVEY.md §2.4 M1-M8).

All metrics reduce to ONE shared aggregation: join the symmetric edge view
with the assignment on both endpoints, then compute per-community
half-edge statistics (volume, cut, internal).  Every metric below is a
scalar combine over that one shuffled aggregate — no sampling needed at
any scale (the reference samples conductance >50k nodes and estimates
coverage >100k edges purely because it is single-threaded; see reference
evaluation.py:455-459, :471-493 — exact is cheap for us).

Semantics matched to the reference:
* modularity  — reference evaluation.py:11-47 (python-louvain formula
  Q = sum_c [ L_c/m - (d_c/2m)^2 ]);
* conductance — reference evaluation.py:49-128 (cut counted once per
  inside endpoint, min-volume denominator, 0/1 degenerate cases, clamped);
* coverage    — reference evaluation.py:469-506 (intra-edge fraction);
* description length — reference evaluation.py:187-248 (map-equation
  approximation with visit rates deg/2m);
* NMI         — reference evaluation.py:250-289 (sklearn
  normalized_mutual_info_score, arithmetic-mean normalization, computed
  on the overlap of partition and ground truth).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from csd363_sin_spark.plans.induce import Graph


def _labeled_half_edges(graph: Graph, assign: DataFrame, weighted: bool) -> DataFrame:
    """(c1, c2, w) for every directed half-edge, labeled by endpoint comms."""
    w = F.col("weight") if weighted else F.lit(1.0)
    a_src = assign.select(F.col("vertex_id").alias("src"), F.col("comm").alias("c1"))
    a_dst = assign.select(F.col("vertex_id").alias("dst"), F.col("comm").alias("c2"))
    return (
        graph.edges_sym()
        .join(a_src, "src")
        .join(a_dst, "dst")
        .select("c1", "c2", w.alias("w"))
    )


def community_edge_stats(graph: Graph, assign: DataFrame, weighted: bool = False) -> DataFrame:
    """Per-community half-edge stats: (comm, vol, cut, internal).

    vol      = sum of degrees of members (weighted: strengths)
    cut      = boundary half-edges leaving the community
    internal = internal half-edges (= 2 * intra-community edges)

    The single shuffle behind every metric.  Isolated-member communities
    appear with zeros via the assignment-side left join.
    """
    he = _labeled_half_edges(graph, assign, weighted)
    stats = he.groupBy(F.col("c1").alias("comm")).agg(
        F.sum("w").alias("vol"),
        F.sum(F.when(F.col("c1") != F.col("c2"), F.col("w")).otherwise(F.lit(0.0))).alias("cut"),
        F.sum(F.when(F.col("c1") == F.col("c2"), F.col("w")).otherwise(F.lit(0.0))).alias(
            "internal"
        ),
    )
    all_comms = assign.select("comm").distinct()
    return (
        all_comms.join(stats, "comm", "left")
        .fillna({"vol": 0.0, "cut": 0.0, "internal": 0.0})
    )


def _total_edge_weight(graph: Graph, weighted: bool) -> float:
    if weighted:
        row = graph.edges.agg(F.sum("weight").alias("m")).collect()[0]
        return float(row["m"] or 0.0)
    return float(graph.edges.count())


def modularity(
    graph: Graph,
    assign: DataFrame,
    weighted: bool = False,
    stats: DataFrame | None = None,
    m: float | None = None,
    resolution: float = 1.0,
) -> float:
    """Q = sum_c [ (internal_c/2)/m - gamma * (vol_c/(2m))^2 ]
    (reference evaluation.py:31; ``resolution`` is the Reichardt-Bornholdt
    gamma — gamma > 1 favors more/smaller communities, < 1 fewer/larger;
    1.0 is the reference's plain Newman-Girvan Q).

    ``m`` — precomputed total edge weight; pass it in iterative callers
    (one scalar job saved per call)."""
    if m is None:
        m = _total_edge_weight(graph, weighted)
    if m == 0:
        return 0.0
    if stats is None:
        stats = community_edge_stats(graph, assign, weighted)
    row = stats.agg(
        F.sum(F.col("internal") / 2.0).alias("intra"),
        F.sum(F.col("vol") * F.col("vol")).alias("vol_sq"),
    ).collect()[0]
    return float(row["intra"]) / m - resolution * float(row["vol_sq"]) / (
        4.0 * m * m
    )


def conductance(
    graph: Graph, assign: DataFrame, weighted: bool = False, stats: DataFrame | None = None
) -> tuple[DataFrame, float]:
    """Per-community conductance + average (reference evaluation.py:49-128).

    Returns ``(per_comm_df(comm, conductance), avg)``.
    """
    if stats is None:
        stats = community_edge_stats(graph, assign, weighted)
    m2 = 2.0 * _total_edge_weight(graph, weighted)  # total volume
    cond = (
        F.when(
            F.least(F.col("vol"), F.lit(m2) - F.col("vol")) > 0,
            F.col("cut") / F.least(F.col("vol"), F.lit(m2) - F.col("vol")),
        )
        .when(F.col("cut") == 0, F.lit(0.0))
        .otherwise(F.lit(1.0))
    )
    per = stats.select(
        "comm", F.least(F.lit(1.0), F.greatest(F.lit(0.0), cond)).alias("conductance")
    )
    avg_row = per.agg(F.avg("conductance").alias("a")).collect()[0]
    return per, float(avg_row["a"] or 0.0)


def coverage(
    graph: Graph, assign: DataFrame, weighted: bool = False, stats: DataFrame | None = None
) -> float:
    """Fraction of edges intra-community (reference evaluation.py:469-506).

    Always exact — a single mean over the labeled edge table; the
    reference's >100k-edge sampling estimate is unnecessary in Spark.
    """
    m = _total_edge_weight(graph, weighted)
    if m == 0:
        return 0.0
    if stats is None:
        stats = community_edge_stats(graph, assign, weighted)
    row = stats.agg(F.sum(F.col("internal") / 2.0).alias("intra")).collect()[0]
    return float(row["intra"]) / m


def description_length(
    graph: Graph, assign: DataFrame, stats: DataFrame | None = None
) -> tuple[float, DataFrame]:
    """Map-equation approximation (reference evaluation.py:187-248).

    visit rate p_v = deg(v)/2m  =>  p_comm = vol_c/2m;
    p_exit = cut_c/(cut_c + internal_c);
    H = sum_c -p_comm * (p_exit log2 p_exit + (1-p_exit) log2 (1-p_exit)),
    terms with p_exit in {0,1} skipped, matching the reference's guard.
    Unweighted degree counts, as in the reference.
    """
    m = float(graph.edges.count())
    if m == 0:
        empty = assign.sparkSession.createDataFrame([], "comm long, entropy double")
        return 0.0, empty
    if stats is None:
        stats = community_edge_stats(graph, assign, weighted=False)
    p_comm = F.col("vol") / (2.0 * m)
    denom = F.col("cut") + F.col("internal")
    p_exit = F.col("cut") / denom
    term = -p_comm * (
        p_exit * F.log2(p_exit) + (1.0 - p_exit) * F.log2(1.0 - p_exit)
    )
    per = (
        stats.filter((denom > 0) & (F.col("cut") > 0) & (F.col("cut") < denom))
        .filter(p_comm > 0)
        .select("comm", term.alias("entropy"))
    )
    row = per.agg(F.sum("entropy").alias("h")).collect()[0]
    return float(row["h"] or 0.0), per


def nmi(assign: DataFrame, ground_truth: DataFrame) -> float:
    """Normalized mutual information, sklearn-compatible
    (arithmetic-mean normalization; reference evaluation.py:250-289).

    ``assign``: (vertex_id, comm); ``ground_truth``: (vertex_id, comm).
    Computed on the overlap only, fully distributed: a contingency
    aggregation plus three marginal aggregations.
    """
    pred = assign.select("vertex_id", F.col("comm").alias("pred"))
    true = ground_truth.select("vertex_id", F.col("comm").alias("true"))
    joined = pred.join(true, "vertex_id")
    cont = joined.groupBy("pred", "true").agg(F.count(F.lit(1)).alias("n_ij"))
    cont = cont.persist()
    n = cont.agg(F.sum("n_ij")).collect()[0][0]
    if not n:
        cont.unpersist()
        return 0.0
    n = float(n)
    a = cont.groupBy("pred").agg(F.sum("n_ij").alias("a_i"))
    b = cont.groupBy("true").agg(F.sum("n_ij").alias("b_j"))

    mi_row = (
        cont.join(a, "pred")
        .join(b, "true")
        .agg(
            F.sum(
                (F.col("n_ij") / n)
                * F.log((F.lit(n) * F.col("n_ij")) / (F.col("a_i") * F.col("b_j")))
            ).alias("mi")
        )
        .collect()[0]
    )
    hu_row = a.agg(F.sum(-(F.col("a_i") / n) * F.log(F.col("a_i") / n)).alias("h")).collect()[0]
    hv_row = b.agg(F.sum(-(F.col("b_j") / n) * F.log(F.col("b_j") / n)).alias("h")).collect()[0]
    cont.unpersist()
    mi = max(0.0, float(mi_row["mi"] or 0.0))
    h_u, h_v = float(hu_row["h"] or 0.0), float(hv_row["h"] or 0.0)
    if h_u == 0.0 and h_v == 0.0:
        return 1.0  # both single-cluster: sklearn special case
    denom = (h_u + h_v) / 2.0
    if denom == 0.0 or mi == 0.0:
        return 0.0
    return min(1.0, mi / denom)


def adjusted_rand(assign: DataFrame, ground_truth: DataFrame) -> float:
    """Adjusted Rand index between two labelings, sklearn-compatible
    (pair-counting with expected-index correction; complements
    reference evaluation.py's NMI as a chance-corrected agreement
    score).

    ``assign``: (vertex_id, comm); ``ground_truth``: (vertex_id, comm).
    Computed on the overlap only: one contingency aggregation, then
    three scalar aggregates over the (tiny) contingency table —
    distributed regardless of label cardinality.
    """
    pred = assign.select("vertex_id", F.col("comm").alias("pred"))
    true = ground_truth.select("vertex_id", F.col("comm").alias("true"))
    joined = pred.join(true, "vertex_id")
    cont = joined.groupBy("pred", "true").agg(F.count(F.lit(1)).alias("n_ij"))
    cont = cont.persist()
    n = cont.agg(F.sum("n_ij")).collect()[0][0]
    if not n or n < 2:
        cont.unpersist()
        return 1.0 if n else 0.0
    n = float(n)
    c2 = lambda c: c * (c - 1.0) / 2.0  # noqa: E731
    sum_ij = float(
        cont.agg(F.sum(c2(F.col("n_ij").cast("double")))).collect()[0][0] or 0.0
    )
    sum_a = float(
        cont.groupBy("pred")
        .agg(F.sum("n_ij").alias("a_i"))
        .agg(F.sum(c2(F.col("a_i").cast("double"))))
        .collect()[0][0]
        or 0.0
    )
    sum_b = float(
        cont.groupBy("true")
        .agg(F.sum("n_ij").alias("b_j"))
        .agg(F.sum(c2(F.col("b_j").cast("double"))))
        .collect()[0][0]
        or 0.0
    )
    cont.unpersist()
    expected = sum_a * sum_b / c2(n)
    max_index = (sum_a + sum_b) / 2.0
    if max_index == expected:
        # both labelings trivial (all one cluster / all singletons):
        # sklearn returns 1.0
        return 1.0
    return (sum_ij - expected) / (max_index - expected)


def community_profile(
    graph: Graph, assign: DataFrame, weighted: bool = False
) -> DataFrame:
    """Per-community report table: ``(comm, size, internal_edges,
    cut_edges, internal_density, conductance, modularity_contribution)``
    — the community-level breakdown behind the scalar metrics (each
    community's term of the modularity sum, its own conductance, and its
    induced density), 6-dp rounded for SQL portability.

    One half-edge shuffle (community_edge_stats) + one size aggregation
    + one scalar total-weight job; output is |communities| rows, so the
    report stays broadcast-sized even at 100 TB inputs.
    """
    stats = community_edge_stats(graph, assign, weighted)
    sizes = assign.groupBy("comm").agg(F.count(F.lit(1)).alias("size"))
    m = _total_edge_weight(graph, weighted)
    joined = sizes.join(stats, "comm", "left").fillna(
        {"vol": 0.0, "cut": 0.0, "internal": 0.0}
    )
    # conventions (community_edge_stats over the symmetric view): vol =
    # member degree sum, internal = 2 * intra edges, cut = boundary edge
    # weight seen once from this community's side
    internal_edges = F.col("internal") / 2.0
    pairs = F.col("size") * (F.col("size") - 1) / 2.0
    density = F.when(pairs > 0, internal_edges / pairs).otherwise(F.lit(0.0))
    m2 = 2.0 * m
    cond = (
        F.when(
            F.least(F.col("vol"), F.lit(m2) - F.col("vol")) > 0,
            F.col("cut") / F.least(F.col("vol"), F.lit(m2) - F.col("vol")),
        )
        .when(F.col("cut") == 0, F.lit(0.0))
        .otherwise(F.lit(1.0))
    )
    cond = F.least(F.lit(1.0), F.greatest(F.lit(0.0), cond))
    # multiplication, not pow(): Math.pow and SQL x*x can differ in the
    # last ulp, which the 6 dp round would occasionally expose
    vol_frac = F.col("vol") / F.lit(m2)
    contrib = (
        internal_edges / F.lit(m) - vol_frac * vol_frac if m else F.lit(0.0)
    )
    return joined.select(
        "comm",
        "size",
        F.round(internal_edges, 6).alias("internal_edges"),
        F.round(F.col("cut"), 6).alias("cut_edges"),
        F.round(density, 6).alias("internal_density"),
        F.round(cond, 6).alias("conductance"),
        F.round(contrib, 6).alias("modularity_contribution"),
    )


def node_roles(
    graph: Graph,
    assign: DataFrame,
    weighted: bool = False,
    classify: bool = False,
) -> DataFrame:
    """Guimerà-Amaral node roles (Nature 433, 2005): per-vertex
    ``(vertex_id, degree, within_degree, participation, z_score)``.

    * participation  P_i = 1 - sum_c (k_ic / k_i)^2 — how evenly i's
      edges spread over communities (0 = all in one module);
    * z-score  z_i = (kappa_i - mean_{j in s_i} kappa_j) / std_pop —
      how strongly i connects inside its OWN module relative to its
      peers (the hub/non-hub axis of the role taxonomy).

    Conventions: P_i = 0 when k_i = 0; z_i = 0 when the module's
    population std is 0 (incl. singleton modules).  6-dp rounded for
    SQL portability.  Plan: one symmetric-edge join against the
    assignment (the same half-edge shuffle every metric shares), one
    (vertex, neighbor-community) aggregation, one per-community window
    over the |V|-row within-degree table — no joins beyond the labeled
    half-edges, so the 100 TB cost is the metric suite's usual O(E).
    """
    from pyspark.sql import Window

    w = F.col("weight") if weighted else F.lit(1.0)
    a_u = assign.select(F.col("vertex_id").alias("src"), F.col("comm").alias("c_u"))
    a_v = assign.select(F.col("vertex_id").alias("dst"), F.col("comm").alias("c_v"))
    half = (
        graph.edges_sym()
        .join(a_u, "src")
        .join(a_v, "dst")
        .select(F.col("src").alias("vertex_id"), "c_u", "c_v", w.alias("w"))
    )
    per_comm = half.groupBy("vertex_id", "c_u", "c_v").agg(
        F.sum("w").alias("k_ic")
    )
    per_vertex = per_comm.groupBy("vertex_id", F.col("c_u").alias("comm")).agg(
        F.sum("k_ic").alias("k"),
        F.sum(F.col("k_ic") * F.col("k_ic")).alias("sum_sq"),
        F.coalesce(
            F.sum(F.when(F.col("c_v") == F.col("c_u"), F.col("k_ic"))),
            F.lit(0.0),
        ).alias("kappa"),
    )
    # isolates: degree 0, kappa 0, in their own community
    base = (
        assign.join(per_vertex.drop("comm"), "vertex_id", "left")
        .fillna({"k": 0.0, "sum_sq": 0.0, "kappa": 0.0})
    )
    wc = Window.partitionBy("comm")
    stats = base.select(
        "vertex_id",
        "comm",
        "k",
        "sum_sq",
        "kappa",
        F.avg("kappa").over(wc).alias("mu"),
        F.stddev_pop("kappa").over(wc).alias("sd"),
    )
    participation = F.when(
        F.col("k") > 0,
        F.lit(1.0) - F.col("sum_sq") / (F.col("k") * F.col("k")),
    ).otherwise(F.lit(0.0))
    z = F.when(
        F.col("sd") > 0, (F.col("kappa") - F.col("mu")) / F.col("sd")
    ).otherwise(F.lit(0.0))
    out = stats.select(
        "vertex_id",
        F.col("k").alias("degree"),
        F.col("kappa").alias("within_degree"),
        F.round(participation, 6).alias("participation"),
        F.round(z, 6).alias("z_score"),
    )
    if not classify:
        return out
    # the paper's R1-R7 cartography cutoffs (Guimerà-Amaral Fig. 2),
    # applied to the 6-dp-rounded coordinates so the class is identical
    # in Spark and the SQL oracle
    p_, z_ = F.col("participation"), F.col("z_score")
    role = (
        F.when((z_ < 2.5) & (p_ < 0.05), "R1_ultra_peripheral")
        .when((z_ < 2.5) & (p_ < 0.62), "R2_peripheral")
        .when((z_ < 2.5) & (p_ < 0.80), "R3_connector")
        .when(z_ < 2.5, "R4_kinless")
        .when(p_ < 0.30, "R5_provincial_hub")
        .when(p_ < 0.75, "R6_connector_hub")
        .otherwise("R7_kinless_hub")
    )
    return out.select("*", role.alias("role"))


def evaluate_all(
    graph: Graph,
    assign: DataFrame,
    ground_truth: DataFrame | None = None,
    algorithm_type: str | None = None,
    weighted: bool = False,
) -> dict:
    """Full evaluation bundle (reference evaluation.py:368-559).

    Size stats use exact percentile/stddev_pop to match numpy's
    median/std (population std, reference :424-431).
    """
    stats = community_edge_stats(graph, assign, weighted).persist()
    m = _total_edge_weight(graph, weighted)

    sizes = assign.groupBy("comm").agg(F.count(F.lit(1)).alias("size"))
    srow = sizes.agg(
        F.count(F.lit(1)).alias("k"),
        F.min("size").alias("mn"),
        F.max("size").alias("mx"),
        F.avg("size").alias("mean"),
        F.expr("percentile(size, 0.5)").alias("median"),
        F.stddev_pop("size").alias("std"),
        F.sum("size").alias("n_assigned"),
    ).collect()[0]

    q = modularity(graph, assign, weighted, stats=stats)
    per_cond, avg_cond = conductance(graph, assign, weighted, stats=stats)
    cov = coverage(graph, assign, weighted, stats=stats)
    intra = cov * m
    avg_internal_degree = (
        2.0 * intra / float(srow["n_assigned"]) if srow["n_assigned"] else 0.0
    )

    out = {
        "num_communities": int(srow["k"]),
        "size_stats": {
            "min": int(srow["mn"]),
            "max": int(srow["mx"]),
            "mean": float(srow["mean"]),
            "median": float(srow["median"]),
            "std": float(srow["std"] or 0.0),
        },
        "modularity": q,
        "avg_conductance": avg_cond,
        "coverage": cov,
        "avg_internal_degree": avg_internal_degree,
        "nmi": None,
    }
    if ground_truth is not None:
        out["nmi"] = nmi(assign, ground_truth)
    if algorithm_type == "infomap":
        h, _ = description_length(graph, assign, stats=stats)
        out["description_length"] = h
    stats.unpersist()
    return out
