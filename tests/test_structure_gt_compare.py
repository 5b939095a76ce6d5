"""Structure helpers, ground-truth ladder, compare/tracking tests."""

from __future__ import annotations

import os
import tempfile

import networkx as nx
import pytest
from pyspark.sql import functions as F

from csd363_sin_spark.functions.compare import (
    calculate_improvement,
    compare_algorithms,
    track_algorithm_metrics,
)
from csd363_sin_spark.operators.structure import (
    community_subgraph,
    inter_community_edges,
    remove_isolates,
    subgraph,
)
from csd363_sin_spark.plans.induce import Graph, graph_from_edges
from csd363_sin_spark.sources.groundtruth import (
    filter_ground_truth,
    ground_truth_from_components,
    load_ground_truth,
    synthetic_ground_truth,
)

from tests.conftest import graph_to_networkx
from tests.oracles import oracle_modularity

TWO_TRI = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]


def _assign(spark, part):
    return spark.createDataFrame(
        [(int(k), int(v)) for k, v in part.items()], "vertex_id long, comm long"
    )


def test_subgraph_and_community_subgraph(spark):
    g = graph_from_edges(spark, TWO_TRI)
    assign = _assign(spark, {0: 0, 1: 0, 2: 0, 3: 1, 4: 1, 5: 1})
    sub = community_subgraph(g, assign, 0)
    assert sorted(r["vertex_id"] for r in sub.vertices.collect()) == [0, 1, 2]
    assert sub.edges.count() == 3  # bridge 2-3 excluded
    sub2 = subgraph(g, _assign(spark, {2: 0, 3: 0}).select("vertex_id"))
    assert sub2.edges.count() == 1


def test_remove_isolates(spark):
    g = graph_from_edges(spark, [(0, 1)])
    iso = spark.createDataFrame(
        [(9, "v:9", "v")], "vertex_id long, actor string, kind string"
    )
    g = Graph(vertices=g.vertices.unionByName(iso), edges=g.edges)
    out = remove_isolates(g)
    assert sorted(r["vertex_id"] for r in out.vertices.collect()) == [0, 1]


def test_inter_community_edges(spark):
    g = graph_from_edges(spark, TWO_TRI)
    assign = _assign(spark, {0: 0, 1: 0, 2: 0, 3: 1, 4: 1, 5: 1})
    rows = inter_community_edges(g, assign).collect()
    assert len(rows) == 1
    assert (rows[0]["comm_a"], rows[0]["comm_b"], rows[0]["num_edges"]) == (0, 1, 1)


def test_contract_graph(spark):
    from csd363_sin_spark.operators.structure import contract_graph

    g = graph_from_edges(spark, TWO_TRI, weights=[1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0])
    assign = _assign(spark, {0: 0, 1: 0, 2: 0, 3: 1, 4: 1, 5: 1})
    cg = contract_graph(g, assign)
    got = {(r["src"], r["dst"]): r["weight"] for r in cg.edges.collect()}
    # intra weights sum into self-loops; the single bridge edge crosses
    intra0 = sum(
        w for (u, v), w in zip(TWO_TRI, [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0])
        if u in (0, 1, 2) and v in (0, 1, 2)
    )
    intra1 = sum(
        w for (u, v), w in zip(TWO_TRI, [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0])
        if u in (3, 4, 5) and v in (3, 4, 5)
    )
    bridge = sum(
        w for (u, v), w in zip(TWO_TRI, [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0])
        if (u in (0, 1, 2)) != (v in (0, 1, 2))
    )
    assert got == {(0, 0): intra0, (1, 1): intra1, (0, 1): bridge}
    assert {r["vertex_id"] for r in cg.vertices.collect()} == {0, 1}
    # no self-loops mode drops the intra mass
    cg2 = contract_graph(g, assign, keep_self_loops=False)
    assert {(r["src"], r["dst"]): r["weight"] for r in cg2.edges.collect()} == {
        (0, 1): bridge
    }


def test_avg_neighbor_degree_vs_networkx(spark):
    from csd363_sin_spark.operators.degree import avg_neighbor_degree

    g = graph_from_edges(spark, TWO_TRI + [(6, 7)])
    iso = spark.createDataFrame(
        [(20, "v:20", "v")], "vertex_id long, actor string, kind string"
    )
    g = Graph(vertices=g.vertices.unionByName(iso), edges=g.edges)
    got = {r["vertex_id"]: r["avg_nbr_degree"] for r in avg_neighbor_degree(g).collect()}
    nxg = nx.Graph(TWO_TRI + [(6, 7)])
    exp = nx.average_neighbor_degree(nxg)
    for v, e in exp.items():
        assert got[v] == pytest.approx(round(e, 6), abs=1e-9)
    assert got[20] == 0.0


def test_ground_truth_ladder(spark):
    g = graph_from_edges(spark, [(0, 1), (1, 2), (5, 6)])
    cc_gt = {r["vertex_id"]: r["comm"] for r in ground_truth_from_components(g).collect()}
    assert cc_gt == {0: 0, 1: 0, 2: 0, 5: 5, 6: 5}

    rand = synthetic_ground_truth(g, mode="random", num_communities=3)
    vals = {r["comm"] for r in rand.collect()}
    assert vals <= {0, 1, 2}
    rand2 = synthetic_ground_truth(g, mode="random", num_communities=3)
    assert sorted(rand.collect()) == sorted(rand2.collect())  # deterministic

    lv = synthetic_ground_truth(g, mode="louvain")
    assert lv.count() == 5

    # filter-to-sample: labels for unknown vertices dropped
    gt_big = _assign(spark, {0: 1, 1: 1, 99: 7})
    assert filter_ground_truth(gt_big, g).count() == 2

    # dispatch default = components
    default = {r["vertex_id"]: r["comm"] for r in load_ground_truth(spark, g).collect()}
    assert default == cc_gt


def test_ground_truth_pair_file_roundtrip(spark):
    g = graph_from_edges(spark, [(0, 1), (1, 2)])
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "gt.txt")
        with open(p, "w") as f:
            f.write("# node comm\n0 7\n1 7\n2 8\n")
        gt = load_ground_truth(spark, g, pairs_path=p)
        got = {r["vertex_id"]: r["comm"] for r in gt.collect()}
        assert got == {0: 7, 1: 7, 2: 8}


def test_track_and_compare(spark):
    g = graph_from_edges(spark, TWO_TRI)
    nxg = graph_to_networkx(g)
    good = {0: 0, 1: 0, 2: 0, 3: 1, 4: 1, 5: 1}
    bad = {v: v % 2 for v in range(6)}
    tracked = track_algorithm_metrics(
        g, [_assign(spark, bad), _assign(spark, good)], algorithm_type="girvan_newman"
    )
    assert tracked["num_steps"] == 2
    assert tracked["steps"][1]["modularity"] == pytest.approx(
        oracle_modularity(nxg, good), abs=1e-9
    )
    cmp = compare_algorithms(
        g, {"good": _assign(spark, good), "bad": _assign(spark, bad)}
    )
    assert cmp["best"]["modularity"] == "good"
    imp = calculate_improvement(cmp["metrics"]["bad"], cmp["metrics"]["good"])
    assert imp["modularity"] > 0


def test_sparsify_topk_kout_properties(spark):
    from pyspark.sql import functions as F

    from csd363_sin_spark.operators.structure import sparsify_topk
    from csd363_sin_spark.plans.induce import induce_actor_edges
    from csd363_sin_spark.sources.synth import synth_transcripts

    t = synth_transcripts(spark, n_convs=50, n_tools=10, n_clusters=3, seed=9)
    en = induce_actor_edges(t)
    k = 3
    sp = sparsify_topk(en, k=k)
    orig = {(r["src_actor"], r["dst_actor"]) for r in en.collect()}
    kept = {(r["src_actor"], r["dst_actor"]) for r in sp.collect()}
    assert kept <= orig and len(kept) < len(orig)

    # k-out guarantee: every vertex keeps at least min(degree, k) edges
    def degs(pairs):
        d = {}
        for u, v in pairs:
            d[u] = d.get(u, 0) + 1
            d[v] = d.get(v, 0) + 1
        return d

    d0, d1 = degs(orig), degs(kept)
    for v, dv in d0.items():
        assert d1.get(v, 0) >= min(dv, k), v
    # deterministic across runs
    again = {(r["src_actor"], r["dst_actor"]) for r in sparsify_topk(en, k=k).collect()}
    assert again == kept


def test_split_disconnected_communities(spark):
    """Leiden-style well-connectedness refinement: a community whose
    induced subgraph is disconnected splits into its parts (labeled by
    min vertex id); connected communities keep exactly one part; nx
    mirror on a synthetic graph."""
    from csd363_sin_spark.operators.structure import (
        split_disconnected_communities,
    )

    # two triangles + a bridge pair; comm 0 = {0,1,2, 6,7} (disconnected:
    # triangle 0-1-2 and edge 6-7), comm 1 = {3,4,5} (connected triangle)
    edges = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (6, 7), (2, 3)]
    g = graph_from_edges(spark, edges)
    assign = spark.createDataFrame(
        [(v, 0 if v in (0, 1, 2, 6, 7) else 1) for v in range(8)],
        "vertex_id long, comm long",
    )
    got = {
        r["vertex_id"]: (r["comm"], r["sub_comm"])
        for r in split_disconnected_communities(g, assign).collect()
    }
    assert got == {
        0: (0, 0), 1: (0, 0), 2: (0, 0),
        6: (0, 6), 7: (0, 6),
        3: (1, 3), 4: (1, 3), 5: (1, 3),
    }
    # nx mirror on a synthetic graph with a hash-bucket partition (heavily
    # disconnected inside communities), forced through BOTH dispatch paths
    from csd363_sin_spark.sources.synth import synth_transcripts
    from csd363_sin_spark.plans.induce import induce_graph

    t = synth_transcripts(spark, n_convs=40, n_tools=10, n_clusters=2, seed=42)
    g2 = induce_graph(t, binarize=True)
    a2 = g2.vertices.select(
        "vertex_id", F.pmod(F.col("vertex_id"), F.lit(7)).alias("comm")
    )
    from tests.conftest import graph_to_networkx

    nxg = graph_to_networkx(g2)
    comm_of = {r["vertex_id"]: r["comm"] for r in a2.collect()}
    expected = {}
    for c in set(comm_of.values()):
        members = [v for v, cc in comm_of.items() if cc == c]
        sub = nxg.subgraph(members)
        for part in nx.connected_components(sub):
            label = min(part)
            for v in part:
                expected[v] = (c, label)
    for thr in (100_000, 0):
        got2 = {
            r["vertex_id"]: (r["comm"], r["sub_comm"])
            for r in split_disconnected_communities(
                g2, a2, local_edges_threshold=thr
            ).collect()
        }
        assert got2 == expected
