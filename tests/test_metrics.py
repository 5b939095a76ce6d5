"""Metric operators vs reference-formula oracles + networkx cross-check."""

from __future__ import annotations

import networkx as nx
import pytest
from pyspark.sql import functions as F

from csd363_sin_spark.functions.metrics import (
    conductance,
    coverage,
    description_length,
    evaluate_all,
    modularity,
    nmi,
)
from csd363_sin_spark.plans.induce import graph_from_edges, induce_graph
from csd363_sin_spark.sources.synth import synth_ground_truth, synth_transcripts

from tests.conftest import graph_to_networkx
from tests.oracles import (
    oracle_conductance,
    oracle_coverage,
    oracle_description_length,
    oracle_modularity,
    oracle_nmi,
)

TWO_TRI = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]
SPLIT = {0: 0, 1: 0, 2: 0, 3: 1, 4: 1, 5: 1}


def _assign_df(spark, partition):
    return spark.createDataFrame(
        [(int(k), int(v)) for k, v in partition.items()], "vertex_id long, comm long"
    )


@pytest.fixture(scope="module")
def medium(spark):
    """Induced graph (~80 vertices) + a few partitions to test against."""
    t = synth_transcripts(spark, n_convs=80, n_tools=16, n_clusters=4, seed=42)
    g = induce_graph(t, binarize=True)
    for df in (g.vertices, g.edges):
        df.persist().count()
    nxg = graph_to_networkx(g)
    partitions = {
        "all_one": {v: 0 for v in nxg.nodes()},
        "mod4": {v: v % 4 for v in nxg.nodes()},
        "louvain": {
            v: i
            for i, cc in enumerate(nx.community.louvain_communities(nxg, seed=7))
            for v in cc
        },
    }
    return g, nxg, partitions


def test_modularity_micro(spark):
    g = graph_from_edges(spark, TWO_TRI)
    nxg = graph_to_networkx(g)
    q = modularity(g, _assign_df(spark, SPLIT))
    assert q == pytest.approx(oracle_modularity(nxg, SPLIT), abs=1e-12)
    # cross-check against networkx's own modularity
    nx_q = nx.community.modularity(nxg, [{0, 1, 2}, {3, 4, 5}])
    assert q == pytest.approx(nx_q, abs=1e-12)
    # hand value: m=7, intra=3+3, degs: [2,2,3,3,2,2] per side -> 7 each
    assert q == pytest.approx(6 / 7 - 2 * (7 / 14) ** 2, abs=1e-12)


@pytest.mark.parametrize("pname", ["all_one", "mod4", "louvain"])
def test_metrics_vs_oracles(spark, medium, pname):
    g, nxg, partitions = medium
    part = partitions[pname]
    assign = _assign_df(spark, part)

    assert modularity(g, assign) == pytest.approx(oracle_modularity(nxg, part), abs=1e-9)

    per_df, avg = conductance(g, assign)
    o_per, o_avg = oracle_conductance(nxg, part)
    got_per = {r["comm"]: r["conductance"] for r in per_df.collect()}
    assert avg == pytest.approx(o_avg, abs=1e-9)
    for c, v in o_per.items():
        assert got_per[c] == pytest.approx(v, abs=1e-9)

    assert coverage(g, assign) == pytest.approx(oracle_coverage(nxg, part), abs=1e-9)

    h, per = description_length(g, assign)
    o_h, o_per_dl = oracle_description_length(nxg, part)
    assert h == pytest.approx(o_h, abs=1e-9)
    got_dl = {r["comm"]: r["entropy"] for r in per.collect()}
    assert got_dl == pytest.approx(o_per_dl, abs=1e-9)


def test_nmi_against_oracle_and_planted(spark, medium):
    g, nxg, partitions = medium
    pred = partitions["louvain"]
    true = partitions["mod4"]
    a = _assign_df(spark, pred)
    b = _assign_df(spark, true)
    assert nmi(a, b) == pytest.approx(oracle_nmi(pred, true), abs=1e-9)
    # identity => 1, single-cluster vs itself => 1, independence-ish < 1
    assert nmi(a, a) == pytest.approx(1.0, abs=1e-12)
    ones = _assign_df(spark, {v: 0 for v in pred})
    assert nmi(ones, ones) == pytest.approx(1.0)
    assert nmi(a, ones) == pytest.approx(0.0)


def test_nmi_partial_overlap(spark):
    pred = {0: 0, 1: 0, 2: 1, 3: 1}
    true = {2: 5, 3: 5, 4: 6}
    a = _assign_df(spark, pred)
    b = _assign_df(spark, true)
    assert nmi(a, b) == pytest.approx(oracle_nmi(pred, true), abs=1e-12)


def _oracle_ari(pred: dict, true: dict) -> float:
    """Pair-counting ARI over the key overlap — independent oracle."""
    import itertools

    keys = sorted(set(pred) & set(true))
    if len(keys) < 2:
        return 1.0 if keys else 0.0
    same_p = same_t = same_both = 0
    total = 0
    for u, v in itertools.combinations(keys, 2):
        sp, st = pred[u] == pred[v], true[u] == true[v]
        same_p += sp
        same_t += st
        same_both += sp and st
        total += 1
    expected = same_p * same_t / total
    max_index = (same_p + same_t) / 2.0
    if max_index == expected:
        return 1.0
    return (same_both - expected) / (max_index - expected)


def test_adjusted_rand_against_oracle(spark, medium):
    from csd363_sin_spark.functions.metrics import adjusted_rand

    g, nxg, partitions = medium
    pred = partitions["louvain"]
    true = partitions["mod4"]
    a = _assign_df(spark, pred)
    b = _assign_df(spark, true)
    assert adjusted_rand(a, b) == pytest.approx(_oracle_ari(pred, true), abs=1e-9)
    # identity => 1; vs single cluster => 0 (chance-corrected)
    assert adjusted_rand(a, a) == pytest.approx(1.0, abs=1e-12)
    ones = _assign_df(spark, {v: 0 for v in pred})
    assert adjusted_rand(ones, ones) == pytest.approx(1.0)
    assert adjusted_rand(a, ones) == pytest.approx(0.0, abs=1e-12)
    # partial overlap: computed on the joined keys only
    p2 = {0: 0, 1: 0, 2: 1, 3: 1, 9: 4}
    t2 = {0: 5, 1: 5, 2: 5, 3: 6, 8: 7}
    assert adjusted_rand(
        _assign_df(spark, p2), _assign_df(spark, t2)
    ) == pytest.approx(_oracle_ari(p2, t2), abs=1e-12)


def test_evaluate_all_bundle(spark, medium):
    g, nxg, partitions = medium
    part = partitions["louvain"]
    assign = _assign_df(spark, part)
    gt = synth_ground_truth(spark, n_convs=80, n_tools=16, n_clusters=4, seed=42)
    gt_ids = g.vertices.join(gt, "actor").select("vertex_id", "comm")
    out = evaluate_all(g, assign, ground_truth=gt_ids, algorithm_type="infomap")
    assert out["num_communities"] == len(set(part.values()))
    assert out["modularity"] == pytest.approx(oracle_modularity(nxg, part), abs=1e-9)
    o_h, _ = oracle_description_length(nxg, part)
    assert out["description_length"] == pytest.approx(o_h, abs=1e-9)
    sizes = sorted(
        len([v for v in part if part[v] == c]) for c in set(part.values())
    )
    assert out["size_stats"]["min"] == sizes[0]
    assert out["size_stats"]["max"] == sizes[-1]
    import numpy as np

    assert out["size_stats"]["median"] == pytest.approx(float(np.median(sizes)))
    assert out["size_stats"]["std"] == pytest.approx(float(np.std(sizes)), abs=1e-9)
    assert 0.0 <= out["nmi"] <= 1.0
    # louvain on the planted-cluster graph should recover structure well
    assert out["nmi"] > 0.5


def test_modularity_resolution_parameter(spark):
    """gamma=1 is plain Q; gamma=0 is coverage (intra/m); Q decreases in
    gamma; matches networkx's resolution-parameter modularity."""
    from csd363_sin_spark.functions.metrics import coverage, modularity

    t = synth_transcripts(spark, n_convs=40, n_tools=10, n_clusters=2, seed=42)
    g = induce_graph(t, binarize=True)
    assign = g.vertices.select(
        "vertex_id", F.pmod(F.col("vertex_id"), F.lit(3)).alias("comm")
    )
    q1 = modularity(g, assign)
    assert modularity(g, assign, resolution=1.0) == pytest.approx(q1, abs=1e-12)
    cov = coverage(g, assign)
    assert modularity(g, assign, resolution=0.0) == pytest.approx(cov, abs=1e-9)
    qs = [modularity(g, assign, resolution=gamma) for gamma in (0.5, 1.0, 2.0)]
    assert qs[0] > qs[1] > qs[2]
    nxg = graph_to_networkx(g)
    comm_of = {r["vertex_id"]: r["comm"] for r in assign.collect()}
    comms = [
        {v for v, c in comm_of.items() if c == k} for k in set(comm_of.values())
    ]
    for gamma in (0.5, 2.0):
        expected = nx.algorithms.community.modularity(
            nxg, comms, resolution=gamma
        )
        assert modularity(g, assign, resolution=gamma) == pytest.approx(
            expected, abs=1e-9
        )


def test_modularity_weighted_vs_networkx(spark):
    """weighted=True modularity (strength-based vol, weighted m) matches
    networkx's weighted modularity on the co-occurrence graph."""
    from csd363_sin_spark.functions.metrics import modularity

    t = synth_transcripts(spark, n_convs=40, n_tools=10, n_clusters=2, seed=42)
    g = induce_graph(t)  # keep real co-occurrence weights
    assign = g.vertices.select(
        "vertex_id", F.pmod(F.col("vertex_id"), F.lit(4)).alias("comm")
    )
    nxg = nx.Graph()
    for r in g.edges.collect():
        nxg.add_edge(r["src"], r["dst"], weight=r["weight"])
    for r in g.vertices.collect():
        nxg.add_node(r["vertex_id"])
    comm_of = {r["vertex_id"]: r["comm"] for r in assign.collect()}
    comms = [
        {v for v, c in comm_of.items() if c == k} for k in set(comm_of.values())
    ]
    expected = nx.algorithms.community.modularity(nxg, comms, weight="weight")
    assert modularity(g, assign, weighted=True) == pytest.approx(expected, abs=1e-9)


def test_degree_centralization_anchors(spark):
    from csd363_sin_spark.operators.degree import degree_centralization
    from csd363_sin_spark.plans.induce import graph_from_edges

    star = graph_from_edges(spark, [(0, i) for i in range(1, 7)])
    assert degree_centralization(star).collect()[0][0] == 1.0
    cycle = graph_from_edges(spark, [(i, (i + 1) % 7) for i in range(7)])
    assert degree_centralization(cycle).collect()[0][0] == 0.0
    # networkx parity on an irregular graph
    import networkx as nx
    from tests.conftest import graph_to_networkx

    g = graph_from_edges(spark, [(0, 1), (0, 2), (0, 3), (2, 3), (3, 4)])
    nxg = graph_to_networkx(g)
    n = nxg.number_of_nodes()
    degs = [d for _, d in nxg.degree()]
    expected = sum(max(degs) - d for d in degs) / ((n - 1) * (n - 2))
    got = degree_centralization(g).collect()[0][0]
    assert abs(got - round(expected, 6)) < 1e-9


def test_community_profile_hand_computed(spark):
    from csd363_sin_spark.functions.metrics import community_profile
    from csd363_sin_spark.plans.induce import graph_from_edges

    # triangle {0,1,2} + pendant 3 attached to 2; comms {0,1,2} and {3}
    g = graph_from_edges(spark, [(0, 1), (1, 2), (0, 2), (2, 3)])
    assign = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 0), (3, 3)], "vertex_id long, comm long"
    )
    rows = {r["comm"]: r for r in community_profile(g, assign).collect()}
    m = 4.0
    c0 = rows[0]
    assert (c0["size"], c0["internal_edges"], c0["cut_edges"]) == (3, 3.0, 1.0)
    assert c0["internal_density"] == 1.0
    # vol(c0) = 2+2+3 = 7; min(7, 8-7)=1 -> conductance = 1/1 clamped to 1
    assert c0["conductance"] == 1.0
    assert c0["modularity_contribution"] == round(3 / 4 - (7 / 8) ** 2, 6)
    c3 = rows[3]
    assert (c3["size"], c3["internal_edges"], c3["cut_edges"]) == (1, 0.0, 1.0)
    assert c3["internal_density"] == 0.0
    assert c3["conductance"] == 1.0
    assert c3["modularity_contribution"] == round(0 - (1 / 8) ** 2, 6)

    # sum of contributions == modularity
    from csd363_sin_spark.functions.metrics import modularity

    q = modularity(g, assign)
    total = sum(r["modularity_contribution"] for r in rows.values())
    assert abs(total - q) < 1e-5


def test_node_roles_hand_computed(spark):
    """Guimerà-Amaral roles on a hand-checkable graph + python mirror."""
    from collections import defaultdict

    from csd363_sin_spark.functions.metrics import node_roles
    from csd363_sin_spark.plans.induce import graph_from_edges

    # two triangles bridged by vertex 2-3 edge; comms = the triangles
    edges = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]
    comm = {0: 0, 1: 0, 2: 0, 3: 3, 4: 3, 5: 3}
    g = graph_from_edges(spark, edges)
    assign = spark.createDataFrame(
        list(comm.items()), "vertex_id long, comm long"
    )
    got = {r["vertex_id"]: r for r in node_roles(g, assign).collect()}

    # python mirror straight from the definitions
    adj = defaultdict(list)
    for u, v in edges:
        adj[u].append(v)
        adj[v].append(u)
    for v in comm:
        k_ic = defaultdict(float)
        for nb in adj[v]:
            k_ic[comm[nb]] += 1.0
        k = sum(k_ic.values())
        p = 1.0 - sum((x / k) ** 2 for x in k_ic.values()) if k else 0.0
        kappa = k_ic[comm[v]]
        members = [u for u in comm if comm[u] == comm[v]]
        kappas = []
        for u in members:
            kappas.append(
                sum(1.0 for nb in adj[u] if comm[nb] == comm[u])
            )
        mu = sum(kappas) / len(kappas)
        var = sum((x - mu) ** 2 for x in kappas) / len(kappas)
        z = (kappa - mu) / var**0.5 if var > 0 else 0.0
        row = got[v]
        assert row["degree"] == k
        assert row["within_degree"] == kappa
        assert row["participation"] == round(p, 6), v
        assert row["z_score"] == round(z, 6), v

    # bridge endpoints (2, 3) are the only ones with participation > 0
    assert got[2]["participation"] > 0 and got[3]["participation"] > 0
    assert got[0]["participation"] == 0.0 and got[4]["participation"] == 0.0


def test_node_roles_classification(spark):
    from csd363_sin_spark.functions.metrics import node_roles
    from csd363_sin_spark.plans.induce import graph_from_edges

    edges = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]
    g = graph_from_edges(spark, edges)
    assign = spark.createDataFrame(
        [(v, 0 if v < 3 else 3) for v in range(6)],
        "vertex_id long, comm long",
    )
    got = {r["vertex_id"]: r["role"] for r in
           node_roles(g, assign, classify=True).collect()}
    # pure-triangle members: P=0, z<2.5 -> ultra-peripheral
    assert got[0] == "R1_ultra_peripheral" and got[4] == "R1_ultra_peripheral"
    # bridge endpoints: P = 1 - (2/3)^2 - (1/3)^2 = 0.4444 -> peripheral
    assert got[2] == "R2_peripheral" and got[3] == "R2_peripheral"
