"""Forced-distributed gate twins match the default (dispatch) queries.

The ``*_dist`` entries in __spark_entry__.queries() force
local_edges_threshold=0 / local_phase_edges=0 so the driver gate
exercises the distributed kernels a 100x-scale run would use.  This test
pins each twin to the default path's output at sf0.001:

* connected_components_dist / louvain_dist — exact row-set equality (the
  CC min-label contract and the integer-exact Louvain score spec make
  both paths bit-identical).
* pagerank_dist — allclose 1e-7 on the 8-dp-rounded ranks (paths agree
  to ~1e-9 pre-rounding; rounding can flip the last printed digit).
* betweenness_topk_dist — same edge set (scores equal to 4 dp by the
  shared deterministic source-sampling spec).
* gn_refine_dist / infomap_enhance_dist — the distributed optimizers may
  settle in a different (equally valid) basin than the grouped kernels,
  so parity here is structural: a full partition of the same vertex set
  whose modularity is no worse than 0.05 below the default path's.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_cc_dist_exact(spark):
    assert _rows(entry.q_connected_components_dist(spark, SF)) == _rows(
        entry.q_connected_components(spark, SF)
    )


def test_louvain_dist_exact(spark):
    assert _rows(entry.q_louvain_dist(spark, SF)) == _rows(
        entry.q_louvain(spark, SF)
    )


def test_pagerank_dist_allclose(spark):
    a = {r["actor"]: r["rank"] for r in entry.q_pagerank(spark, SF).collect()}
    b = {r["actor"]: r["rank"] for r in entry.q_pagerank_dist(spark, SF).collect()}
    assert a.keys() == b.keys()
    assert all(abs(a[k] - b[k]) <= 1e-7 for k in a)


def test_betweenness_dist_same_edges(spark):
    a = {(r["src_actor"], r["dst_actor"]): r["betweenness"]
         for r in entry.q_betweenness_topk(spark, SF).collect()}
    b = {(r["src_actor"], r["dst_actor"]): r["betweenness"]
         for r in entry.q_betweenness_topk_dist(spark, SF).collect()}
    assert a.keys() == b.keys()
    assert all(abs(a[k] - b[k]) <= 1e-3 for k in a)


@pytest.mark.parametrize(
    "q_default, q_dist",
    [
        (entry.q_gn_refine, entry.q_gn_refine_dist),
        (entry.q_infomap_enhance, entry.q_infomap_enhance_dist),
    ],
    ids=["gn_refine", "infomap_enhance"],
)
def test_refine_dist_structural(spark, q_default, q_dist):
    from csd363_sin_spark.functions.metrics import modularity

    g = entry._graph(spark, SF)
    a = q_default(spark, SF)
    b = q_dist(spark, SF)
    actors_a = {r["actor"] for r in a.select("actor").collect()}
    actors_b = {r["actor"] for r in b.select("actor").collect()}
    assert actors_a == actors_b  # full partition of the same vertex set
    assert b.count() == b.select("actor").distinct().count()

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    def q_of(df):
        comm_ids = (
            df.select("comm_actor").distinct()
            .withColumn("comm", F.dense_rank().over(Window.orderBy("comm_actor")).cast("long"))
        )
        assign = (
            df.join(g.vertices, "actor")
            .join(comm_ids, "comm_actor")
            .select("vertex_id", "comm")
        )
        return modularity(g, assign)

    assert q_of(b) >= q_of(a) - 0.05


def test_streaming_refresh_equals_louvain(spark):
    # the streaming ingest -> store -> refresh path reproduces the batch
    # induction + Louvain bit-for-bit (canonical labels)
    assert _rows(entry.q_streaming_refresh(spark, SF)) == _rows(
        entry.q_louvain(spark, SF)
    )
