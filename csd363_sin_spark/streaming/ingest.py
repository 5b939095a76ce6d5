"""Structured Streaming ingest: transcripts stream -> incremental edges.

The reference is pure batch (SURVEY §2.5: no streaming operators); this
module adds the streaming ingest a production transcript pipeline needs:
new conversation turns arrive continuously, and the co-occurrence edge
table is maintained incrementally.

Design (kappa-style: streaming maintains state, batch supersteps run on
snapshots):

* ``stream_transcripts`` — file-source stream over a transcripts parquet
  directory (schema = BASELINE input_hint), with a watermark on ``ts``
  so late turns older than the horizon are dropped deterministically;
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
    """readStream over a transcripts parquet directory with a ts watermark."""
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
