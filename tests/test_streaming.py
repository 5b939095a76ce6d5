"""Structured Streaming incremental induction tests."""

from __future__ import annotations

import os
import tempfile

from csd363_sin_spark.plans.induce import induce_actor_edges
from csd363_sin_spark.sources.synth import synth_transcripts
from csd363_sin_spark.streaming.ingest import (
    read_edge_store,
    run_incremental_induction,
)


def test_incremental_induction_matches_batch(spark):
    t = synth_transcripts(spark, n_convs=30, n_tools=8, n_clusters=2, seed=42)
    with tempfile.TemporaryDirectory() as d:
        inp = os.path.join(d, "in")
        out = os.path.join(d, "out")
        t.write.mode("overwrite").parquet(inp)
        run_incremental_induction(spark, inp, out)
        got = {
            (r["src_actor"], r["dst_actor"]): r["weight"]
            for r in read_edge_store(spark, out).collect()
        }
        expected = {
            (r["src_actor"], r["dst_actor"]): r["weight"]
            for r in induce_actor_edges(t).collect()
        }
        assert got == expected


def test_conversation_spanning_micro_batches_exact_weights(spark):
    """A conversation whose turns (and therefore actors) arrive in two
    different micro-batches must still produce the same edge weights as
    batch induction — including the cross-batch pair (tool:a, tool:b) and
    WITHOUT double-counting pairs seen in both batches."""
    t = synth_transcripts(spark, n_convs=12, n_tools=6, n_clusters=2, seed=44)
    with tempfile.TemporaryDirectory() as d:
        inp = os.path.join(d, "in")
        out = os.path.join(d, "out")
        # split by turn index so most conversations span both batches
        t.filter(t.turn_idx % 2 == 0).write.mode("overwrite").parquet(inp)
        run_incremental_induction(spark, inp, out)
        t.filter(t.turn_idx % 2 == 1).write.mode("append").parquet(inp)
        run_incremental_induction(spark, inp, out)
        got = {
            (r["src_actor"], r["dst_actor"]): r["weight"]
            for r in read_edge_store(spark, out).collect()
        }
        expected = {
            (r["src_actor"], r["dst_actor"]): r["weight"]
            for r in induce_actor_edges(t).collect()
        }
        assert got == expected


def test_incremental_induction_two_batches_idempotent_restart(spark):
    t = synth_transcripts(spark, n_convs=20, n_tools=8, n_clusters=2, seed=43)
    with tempfile.TemporaryDirectory() as d:
        inp = os.path.join(d, "in")
        out = os.path.join(d, "out")
        # batch 1: first half of conversations
        half1 = t.filter(t.conv_id < "conv_00000010")
        half2 = t.filter(t.conv_id >= "conv_00000010")
        half1.write.mode("overwrite").parquet(inp)
        run_incremental_induction(spark, inp, out)
        # batch 2: more files arrive; same checkpoint -> only new files read
        half2.write.mode("append").parquet(inp)
        run_incremental_induction(spark, inp, out)
        got = {
            (r["src_actor"], r["dst_actor"]): r["weight"]
            for r in read_edge_store(spark, out).collect()
        }
        expected = {
            (r["src_actor"], r["dst_actor"]): r["weight"]
            for r in induce_actor_edges(t).collect()
        }
        # conversations are wholly inside one half => exact equality
        assert got == expected
        # re-running with nothing new must not change the store
        run_incremental_induction(spark, inp, out)
        again = {
            (r["src_actor"], r["dst_actor"]): r["weight"]
            for r in read_edge_store(spark, out).collect()
        }
        assert again == expected


def test_windowed_activity_stateful_watermark(spark):
    """The stateful windowed aggregate uses the watermark for real: counts
    match batch groupBy for on-time data, and a turn arriving far older
    than the watermark horizon after state moved on is DROPPED."""
    from pyspark.sql import functions as F

    from csd363_sin_spark.streaming.ingest import (
        read_windowed_activity,
        run_windowed_activity,
        streaming_edge_counts,
    )

    t = synth_transcripts(spark, n_convs=10, n_tools=4, n_clusters=2, seed=45)
    t = t.persist()
    with tempfile.TemporaryDirectory() as d:
        inp = os.path.join(d, "in")
        out = os.path.join(d, "out")
        ckpt = os.path.join(d, "ckpt")
        t.write.mode("overwrite").parquet(inp)
        run_windowed_activity(
            spark, inp, out, ckpt, watermark="10 minutes", window="1 hour"
        )
        got = read_windowed_activity(spark, out)
        exp = (
            streaming_edge_counts(t)
            .groupBy(F.window("ts", "1 hour"), "actor")
            .agg(F.count(F.lit(1)).alias("turns"))
        )
        got_map = {(r["window_start"], r["actor"]): r["turns"] for r in got.collect()}
        exp_map = {(r["window"]["start"], r["actor"]): r["turns"] for r in exp.collect()}
        assert got_map == exp_map

        # feed one VERY late turn (2 days before the max ts already seen):
        # the resumed watermark has advanced past its window -> dropped,
        # so the final read equals the on-time-only aggregation unchanged
        late = t.limit(1).select(
            "conv_id", "turn_idx", "role", "text", "tool",
            (F.col("ts") - F.expr("INTERVAL 2 DAYS")).alias("ts"),
        )
        late.write.mode("append").parquet(inp)
        run_windowed_activity(
            spark, inp, out, ckpt, watermark="10 minutes", window="1 hour"
        )
        again = {
            (r["window_start"], r["actor"]): r["turns"]
            for r in read_windowed_activity(spark, out).collect()
        }
        assert again == exp_map
