"""Streaming community maintenance (streaming/communities.py).

Exactness claims tested:
* refresh == batch Louvain on the same data (the refresh IS the batch
  plan over the store snapshot — asserted bit-identically);
* attach_new_actors follows its deterministic spec exactly (pandas
  oracle: max-weight community, tie -> smallest comm, no-neighbor ->
  fresh deterministic singleton) and never moves existing actors;
* refresh after more data == batch Louvain on all data (drift erased).
"""

from __future__ import annotations

import os
import tempfile

from csd363_sin_spark.operators.louvain import louvain
from csd363_sin_spark.plans.induce import induce_graph
from csd363_sin_spark.sources.synth import synth_transcripts
from csd363_sin_spark.streaming.communities import (
    attach_new_actors,
    read_communities,
    refresh_communities,
)
from csd363_sin_spark.streaming.ingest import read_edge_store, run_incremental_induction


def _batch_louvain_named(spark, transcripts):
    g = induce_graph(transcripts)
    res = louvain(g)
    return {
        r["actor"]: r["comm"]
        for r in res.assign.join(g.vertices, "vertex_id")
        .select("actor", "comm")
        .collect()
    }


def test_refresh_matches_batch_and_attach_spec(spark):
    from pyspark.sql import functions as F

    t_all = synth_transcripts(spark, n_convs=60, n_tools=10, n_clusters=3, seed=11)
    # conv_id is a string — split on a hash, not an ANSI cast
    key = F.pmod(F.xxhash64("conv_id"), F.lit(2))
    half1 = t_all.filter(key == 0)
    half2 = t_all.filter(key == 1)
    with tempfile.TemporaryDirectory() as d:
        inp = os.path.join(d, "in")
        store = os.path.join(d, "store")
        comms = os.path.join(d, "comms")

        # phase 1: ingest half the conversations, exact refresh v1
        half1.write.mode("overwrite").parquet(inp)
        run_incremental_induction(spark, inp, store)
        v1 = refresh_communities(spark, store, comms, version=1)
        got_v1 = {r["actor"]: r["comm"] for r in v1.collect()}
        assert got_v1 == _batch_louvain_named(spark, half1)

        # phase 2: more conversations arrive; attach without refresh
        half2.write.mode("append").parquet(inp)
        run_incremental_induction(spark, inp, store)
        attached = attach_new_actors(spark, store, read_communities(spark, comms, 1))
        got_at = {r["actor"]: r["comm"] for r in attached.collect()}

        # existing actors never move
        for a, c in got_v1.items():
            assert got_at[a] == c

        # pandas oracle for the attach spec
        edges = read_edge_store(spark, store).collect()
        all_actors = {r["src_actor"] for r in edges} | {r["dst_actor"] for r in edges}
        new = sorted(all_actors - set(got_v1))
        assert new, "fixture must introduce new actors"
        w_to: dict = {a: {} for a in new}
        for r in edges:
            for a, b in ((r["src_actor"], r["dst_actor"]), (r["dst_actor"], r["src_actor"])):
                if a in w_to and b in got_v1:
                    c = got_v1[b]
                    w_to[a][c] = w_to[a].get(c, 0.0) + r["weight"]
        base = max(got_v1.values())
        leftovers = sorted(a for a in new if not w_to[a])
        for a in new:
            if w_to[a]:
                expect = min(
                    (c for c in w_to[a]),
                    key=lambda c: (-w_to[a][c], c),
                )
                assert got_at[a] == expect, (a, w_to[a], got_at[a])
            else:
                assert got_at[a] == base + 1 + leftovers.index(a)
        assert set(got_at) == all_actors

        # phase 3: exact refresh v2 erases attach drift — equals batch
        v2 = refresh_communities(spark, store, comms, version=2)
        got_v2 = {r["actor"]: r["comm"] for r in v2.collect()}
        assert got_v2 == _batch_louvain_named(spark, t_all)


def test_refresh_graph_stats_split_invariant(spark):
    """Two-wave ingest -> graph-stats refresh == batch analyzers on the
    union (degree stats AND triangle count, bit-identical)."""
    from pyspark.sql import functions as F

    from csd363_sin_spark.operators.degree import degree_stats
    from csd363_sin_spark.operators.triangles import triangle_count
    from csd363_sin_spark.streaming.communities import refresh_graph_stats

    t_all = synth_transcripts(spark, n_convs=50, n_tools=10, n_clusters=3, seed=5)
    key = F.pmod(F.xxhash64("conv_id"), F.lit(2))
    with tempfile.TemporaryDirectory() as d:
        inp = os.path.join(d, "in")
        store = os.path.join(d, "store")
        t_all.filter(key == 0).write.mode("overwrite").parquet(inp)
        run_incremental_induction(spark, inp, store)
        t_all.filter(key == 1).write.mode("overwrite").parquet(inp)
        run_incremental_induction(spark, inp, store)

        got = refresh_graph_stats(spark, store).collect()[0].asDict()
        g = induce_graph(t_all)
        want = degree_stats(g).collect()[0].asDict()
        want["triangles"] = triangle_count(g)
        assert got == want
