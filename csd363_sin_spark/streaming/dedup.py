"""Streaming exact deduplication — kappa-style, batch-equivalent.

Documents arrive continuously; the pipeline must decide, for every
document ever seen, whether it is the keeper of its content group or a
duplicate.  Same design contract as the streaming edge store
(streaming/ingest.py): the stream maintains a MINIMAL relation and the
batch-equivalent answer is derived at read time, so the result is
EXACTLY the batch ``dedup_exact`` on the union of all micro-batches, no
matter how documents were split across them.

* ``run_streaming_dedup`` — foreachBatch writes each micro-batch's
  distinct ``(fp, doc_id)`` fingerprint sightings to
  ``output_dir/batch=<id>`` (md5 of the normalized tokens — the same
  fingerprint as functions/dedup.py).  Replay-idempotent: a replayed
  batch id overwrites its own directory.
* ``read_dedup_decisions`` — snapshot reader: distinct sightings across
  batch dirs, keeper = min(doc_id) per fingerprint (min is associative
  and order-independent, hence split-invariant) → ``(doc_id, fp,
  is_keeper)``.
* ``read_deduped_ids`` — just the surviving doc_ids (the streaming twin
  of ``dedup_exact``'s keep set).

Scale: the stored relation is one row per document (bounded by input
volume), the read-side keeper aggregation is one map-side-combined
groupBy on the fingerprint, and fingerprints are computed inside the
stream with built-in expressions only.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from csd363_sin_spark.functions.text import _tokens

DOCUMENTS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)


def _fingerprints(docs: DataFrame) -> DataFrame:
    return docs.select(
        F.md5(F.concat_ws(" ", _tokens(F.col("text")))).alias("fp"), "doc_id"
    )


def run_streaming_dedup(
    spark: SparkSession,
    input_path: str,
    output_dir: str,
    checkpoint_dir: str | None = None,
):
    """Maintain the incremental fingerprint-sighting store over a
    documents parquet directory; returns the (awaited) query handle."""
    ckpt = checkpoint_dir or os.path.join(output_dir, "_stream_ckpt")
    stream = spark.readStream.schema(DOCUMENTS_SCHEMA).parquet(input_path)
    fps = _fingerprints(stream)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.distinct().write.mode("overwrite").parquet(
            os.path.join(output_dir, f"batch={batch_id}")
        )

    query = (
        fps.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return query


def read_dedup_decisions(spark: SparkSession, output_dir: str) -> DataFrame:
    """Snapshot of the dedup state: ``(doc_id, fp, is_keeper)`` — keeper
    = lowest doc_id per fingerprint across everything ingested so far."""
    sightings = spark.read.parquet(
        os.path.join(output_dir, "batch=*")
    ).distinct()
    keeper = sightings.groupBy("fp").agg(F.min("doc_id").alias("_keep_id"))
    return (
        sightings.join(keeper, "fp")
        .select(
            "doc_id", "fp", (F.col("doc_id") == F.col("_keep_id")).alias("is_keeper")
        )
    )


def read_deduped_ids(spark: SparkSession, output_dir: str) -> DataFrame:
    """The surviving doc_ids — equals batch ``dedup_exact`` on the union
    of all micro-batches."""
    return (
        read_dedup_decisions(spark, output_dir)
        .filter(F.col("is_keeper"))
        .select("doc_id")
    )


# --- streaming NEAR-duplicate maintenance (MinHash + LSH) -----------------
#
# Same batch-equivalence contract as the exact store above, extended to
# near-dups: the stream persists each micro-batch's distinct LSH band
# rows (functions/dedup.minhash_band_rows — a pure function of each
# document's text, hence split/batch-invariant), and the read side
# derives candidates from the accumulated store and exact-verifies them
# against the document lake.  Because the stored band rows are identical
# to what the batch operator computes, the verified pairs EXACTLY equal
# batch ``minhash_lsh_pairs`` on the union of all micro-batches.  The
# win over re-running batch: signatures (the expensive shingle +
# num_hashes aggregation) are computed once per document at ingest, not
# once per refresh.


def run_streaming_minhash(
    spark: SparkSession,
    input_path: str,
    output_dir: str,
    checkpoint_dir: str | None = None,
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    hash_mode: str = "xxhash64",
):
    """Maintain the incremental LSH band-row store; replay-idempotent
    (a replayed batch id overwrites its own directory)."""
    from csd363_sin_spark.functions.dedup import minhash_band_rows

    ckpt = checkpoint_dir or os.path.join(output_dir, "_stream_ckpt")
    stream = spark.readStream.schema(DOCUMENTS_SCHEMA).parquet(input_path)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        minhash_band_rows(
            batch_df, n=n, num_hashes=num_hashes, bands=bands, hash_mode=hash_mode
        ).distinct().write.mode("overwrite").parquet(
            os.path.join(output_dir, f"batch={batch_id}")
        )

    query = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return query


def read_near_dup_pairs(
    spark: SparkSession,
    output_dir: str,
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Near-duplicate pairs over everything ingested so far:
    candidates = self-join of the accumulated band rows, exact-verified
    against ``docs`` (the document lake the stream also feeds) — equals
    batch ``minhash_lsh_pairs`` on the union of all micro-batches."""
    from csd363_sin_spark.functions.dedup import verify_candidate_pairs

    banded = spark.read.parquet(os.path.join(output_dir, "batch=*")).distinct()
    cands = (
        banded.alias("x")
        .join(banded.alias("y"), ["band", "bh"])
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"))
        .distinct()
    )
    return verify_candidate_pairs(cands, docs, n, threshold)
