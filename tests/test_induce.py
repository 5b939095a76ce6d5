"""Graph induction + analysis vs hand-computed / networkx oracles."""

from __future__ import annotations

import networkx as nx
import pytest
from pyspark.sql import functions as F

from csd363_sin_spark.operators.degree import analyze_graph, degree_stats
from csd363_sin_spark.plans.induce import graph_from_edges, induce_actor_edges, induce_graph
from csd363_sin_spark.sources.synth import synth_transcripts

from tests.conftest import graph_to_networkx


@pytest.fixture(scope="module")
def tiny_transcripts(spark):
    df = synth_transcripts(spark, n_convs=20, n_tools=8, n_clusters=2, seed=42)
    df = df.persist()
    df.count()
    return df


def test_transcripts_shape_and_determinism(spark, tiny_transcripts):
    rows = tiny_transcripts.collect()
    assert {r["conv_id"] for r in rows} == {f"conv_{i:08d}" for i in range(20)}
    assert all(r["role"] in ("user", "assistant", "tool") for r in rows)
    assert all((r["tool"] is not None) == (r["role"] == "tool") for r in rows)
    # regenerate: identical rows (determinism under re-planning)
    again = synth_transcripts(spark, n_convs=20, n_tools=8, n_clusters=2, seed=42).collect()
    key = lambda r: (r["conv_id"], r["turn_idx"])
    assert sorted(rows, key=key) == sorted(again, key=key)


def test_induce_actor_edges_oracle(spark, tiny_transcripts):
    """Edge weights must equal a python-side recount of co-occurrences."""
    got = {
        (r["src_actor"], r["dst_actor"]): r["weight"]
        for r in induce_actor_edges(tiny_transcripts).collect()
    }
    convs = {}
    for r in tiny_transcripts.collect():
        convs.setdefault(r["conv_id"], set()).add(f"conv:{r['conv_id']}")
        if r["tool"] is not None:
            convs[r["conv_id"]].add(f"tool:{r['tool']}")
    expected = {}
    for actors in convs.values():
        acts = sorted(actors)
        for i in range(len(acts)):
            for j in range(i + 1, len(acts)):
                expected[(acts[i], acts[j])] = expected.get((acts[i], acts[j]), 0) + 1
    assert got == {k: float(v) for k, v in expected.items()}


def test_induce_graph_ids_dense_and_sorted(spark, tiny_transcripts):
    g = induce_graph(tiny_transcripts)
    verts = sorted(g.vertices.collect(), key=lambda r: r["vertex_id"])
    assert [r["vertex_id"] for r in verts] == list(range(len(verts)))
    actors = [r["actor"] for r in verts]
    assert actors == sorted(actors)  # ids follow actor sort order
    # every edge endpoint resolves; canonical src < dst
    for r in g.edges.collect():
        assert r["src"] < r["dst"]


def test_degree_stats_vs_networkx(spark, tiny_transcripts):
    g = induce_graph(tiny_transcripts, binarize=True)
    nxg = graph_to_networkx(g)
    row = degree_stats(g).collect()[0]
    assert row["num_nodes"] == nxg.number_of_nodes()
    assert row["num_edges"] == nxg.number_of_edges()
    assert row["density"] == pytest.approx(nx.density(nxg), abs=1e-12)
    degs = [d for _, d in nxg.degree()]
    assert row["avg_degree"] == pytest.approx(sum(degs) / len(degs))
    assert row["max_degree"] == max(degs)
    assert row["isolated_nodes"] == nx.number_of_isolates(nxg)


def test_analyze_graph_micro(spark):
    # two triangles + bridge (FIXTURES.md F5)
    g = graph_from_edges(spark, [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)])
    out = analyze_graph(g)
    assert out["num_nodes"] == 6
    assert out["num_edges"] == 7
    assert out["max_degree"] == 3.0
    assert out["isolated_nodes"] == 0


def test_weighted_vs_binarized(spark, tiny_transcripts):
    gw = induce_graph(tiny_transcripts, binarize=False)
    gb = induce_graph(tiny_transcripts, binarize=True)
    assert gw.edges.count() == gb.edges.count()
    wsum = gw.edges.agg(F.sum("weight")).collect()[0][0]
    bsum = gb.edges.agg(F.sum("weight")).collect()[0][0]
    assert wsum >= bsum


def test_dense_ids_dispatch_parity(spark):
    """Driver-side enumeration vs range-partitioned path: identical
    key-order-dense ids (the mapping is defined by key order)."""
    from pyspark.sql import functions as F

    from csd363_sin_spark.plans.ids import dense_ids

    df = spark.range(3000).select(
        F.format_string("a_%05d", (F.col("id") * 37) % 3000).alias("actor")
    )
    local = {r["actor"]: r["vertex_id"] for r in dense_ids(df, "actor").collect()}
    dist = {
        r["actor"]: r["vertex_id"]
        for r in dense_ids(df, "actor", local_threshold=0).collect()
    }
    assert local == dist and len(local) == 3000
