"""Structured Streaming ingest: transcripts stream -> incremental edges.

The reference is pure batch (SURVEY §2.5: no streaming operators); this
module adds the streaming ingest a production transcript pipeline needs:
new conversation turns arrive continuously, and the co-occurrence edge
table is maintained incrementally.

Design (kappa-style: streaming maintains state, batch supersteps run on
snapshots):

* ``stream_transcripts`` — file-source stream over a transcripts parquet
  directory (schema = BASELINE input_hint), with a watermark on ``ts``.
  NOTE the watermark only bounds state for STATEFUL downstream operators
  (windowed aggs, dropDuplicates) — the foreachBatch path below is
  stateless, so late turns are NOT dropped; they are *harmless by
  design*: a late sighting merely appends another (conv_id, actor) row
  and the snapshot reader's DISTINCT absorbs it;
* ``streaming_edge_counts`` — stateless per-row expansion of each turn
  into its (conv_id, actor) sightings;
* ``run_incremental_induction`` — ``foreachBatch`` writes each
  micro-batch's DISTINCT (conv_id, actor) rows to
  ``output_dir/batch=<id>``.  The store is the (conv, actor) RELATION,
  not pre-aggregated pair counts: a conversation whose actors arrive in
  different micro-batches still yields every co-occurrence pair exactly
  once at read time — per-batch pair expansion could neither produce
  cross-batch pairs nor avoid double-counting repeated ones.
  Idempotency: a replayed batch id overwrites its own ``batch=<id>``
  directory, and the reader's DISTINCT collapses any overlap between
  batch directories.
* ``read_edge_store`` — snapshot reader: distinct (conv, actor) across
  batch dirs, then the SAME pair-expansion plan as the batch induction
  (plans/induce.py induce_actor_edges), so streamed weights equal batch
  weights exactly, regardless of how conversations were split across
  micro-batches.

Scale notes: the stored relation is bounded by sum_c |A_c| (one row per
conversation-actor sighting — same order as the input turn volume after
distinct), and the read-side expansion is the identical bounded self-join
the batch path uses.  Used with ``trigger(availableNow=True)`` in tests —
real continuous triggers behave identically per micro-batch.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from csd363_sin_spark.sources.transcripts import TRANSCRIPT_SCHEMA


def stream_transcripts(
    spark: SparkSession, path: str, watermark: str = "1 hour"
) -> DataFrame:
    """readStream over a transcripts parquet directory with a ts watermark
    (state-bounding for stateful consumers; see module docstring for why
    the sighting store itself needs no late-row handling)."""
    return (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .parquet(path)
        .withWatermark("ts", watermark)
    )


def streaming_edge_counts(transcripts_stream: DataFrame) -> DataFrame:
    """Per-turn (conv_id, ts, actor) sightings from a streaming frame.

    Stateless per-row expansion (conv actor + tool actor per tool turn);
    deduplication and pair expansion happen downstream where batch
    semantics are exact (see module docstring).
    """
    t = transcripts_stream
    conv_actor = t.select(
        "conv_id", "ts", F.concat(F.lit("conv:"), F.col("conv_id")).alias("actor")
    )
    tool_actor = t.filter(F.col("tool").isNotNull()).select(
        "conv_id", "ts", F.concat(F.lit("tool:"), F.col("tool")).alias("actor")
    )
    return conv_actor.unionByName(tool_actor)


def run_incremental_induction(
    spark: SparkSession,
    input_path: str,
    output_dir: str,
    checkpoint_dir: str | None = None,
    watermark: str = "1 hour",
):
    """Maintain the incremental (conv_id, actor) sighting store.

    Each micro-batch's distinct (conv_id, actor) rows land in
    ``output_dir/batch=<id>`` (replay-safe: the directory is overwritten
    for a replayed batch id; the stream checkpoint tracks consumed
    files).  Returns the query handle (already awaited when run with
    availableNow).
    """
    ckpt = checkpoint_dir or os.path.join(output_dir, "_stream_ckpt")
    actors = streaming_edge_counts(stream_transcripts(spark, input_path, watermark))

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.select("conv_id", "actor").distinct().write.mode(
            "overwrite"
        ).parquet(os.path.join(output_dir, f"batch={batch_id}"))

    query = (
        actors.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return query


def windowed_actor_activity(
    transcripts_stream: DataFrame, window: str = "1 hour"
) -> DataFrame:
    """STATEFUL streaming aggregate: turns per actor per event-time
    window.  This is where the source watermark actually bites: windows
    older than the watermark horizon are evicted from state, and turns
    arriving later than that are DROPPED (the deterministic late-data
    policy) — unlike the stateless sighting store, which absorbs late
    rows by design.

    Returns a streaming frame ``(window struct, actor, turns)``; run with
    ``outputMode("update")`` (or append once windows close).  One shuffle
    per micro-batch, state bounded by (actors x open windows).
    """
    return (
        streaming_edge_counts(transcripts_stream)
        .groupBy(F.window("ts", window), "actor")
        .agg(F.count(F.lit(1)).alias("turns"))
    )


def run_windowed_activity(
    spark: SparkSession,
    input_path: str,
    output_dir: str,
    checkpoint_dir: str,
    watermark: str = "1 hour",
    window: str = "1 hour",
):
    """Drive :func:`windowed_actor_activity` (update mode; availableNow)
    into per-batch parquet update logs under ``output_dir/batch=<id>`` —
    a checkpoint-recoverable sink (the in-memory sink cannot resume).
    Re-running with the same checkpoint resumes the watermark, so a later
    run feeding data older than the horizon demonstrates deterministic
    late-row drop.  Readers take the LAST update per (window, actor)
    across batch ids."""
    agg = windowed_actor_activity(
        stream_transcripts(spark, input_path, watermark), window
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "actor",
            "turns",
        ).write.mode("overwrite").parquet(
            os.path.join(output_dir, f"batch={batch_id}")
        )

    query = (
        agg.writeStream.foreachBatch(process_batch)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return query


def read_windowed_activity(spark: SparkSession, output_dir: str) -> DataFrame:
    """Latest update per (window_start, actor) across the update log."""
    df = spark.read.option("basePath", output_dir).parquet(
        os.path.join(output_dir, "batch=*")
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("window_start", "actor").orderBy(F.desc("batch"))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("window_start", "window_end", "actor", "turns")
    )


def read_edge_store(spark: SparkSession, output_dir: str) -> DataFrame:
    """Snapshot the edge table from the sighting store — EXACT batch
    semantics.

    Distinct (conv_id, actor) across all batch directories (collapsing
    replays and conversations that span micro-batches), then the same
    bounded per-conversation pair expansion as the batch induction:
    weight = number of conversations in which the pair co-occurs.
    """
    a = (
        spark.read.option("basePath", output_dir)
        .parquet(os.path.join(output_dir, "batch=*"))
        .select("conv_id", "actor")
        .distinct()
    )
    b = a.withColumnRenamed("actor", "actor_b")
    return (
        a.join(b, "conv_id")
        .filter(F.col("actor") < F.col("actor_b"))
        .groupBy(
            F.col("actor").alias("src_actor"), F.col("actor_b").alias("dst_actor")
        )
        .agg(F.count(F.lit(1)).cast("double").alias("weight"))
    )
