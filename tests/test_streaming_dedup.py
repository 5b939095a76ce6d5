"""Streaming exact dedup: batch-equivalent across micro-batch splits."""

from __future__ import annotations

import os
import tempfile

from csd363_sin_spark.functions.dedup import dedup_exact
from csd363_sin_spark.streaming.dedup import (
    read_dedup_decisions,
    read_deduped_ids,
    run_streaming_dedup,
)


def _docs(spark, ids_texts):
    return spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in ids_texts],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def test_streaming_dedup_matches_batch_across_splits(spark):
    # duplicates split across ingest waves: keeper decisions must equal
    # batch dedup_exact on the union, regardless of arrival order
    wave1 = [(4, "Hello, world!"), (2, "unique one"), (7, "another doc")]
    wave2 = [(1, "hello  WORLD"), (9, "another doc"), (3, "brand new")]
    all_docs = _docs(spark, wave1 + wave2)
    with tempfile.TemporaryDirectory() as d:
        inp, out = os.path.join(d, "in"), os.path.join(d, "out")
        _docs(spark, wave1).write.mode("overwrite").parquet(inp)
        run_streaming_dedup(spark, inp, out)
        _docs(spark, wave2).write.mode("append").parquet(inp)
        run_streaming_dedup(spark, inp, out)

        kept = {r["doc_id"] for r in read_deduped_ids(spark, out).collect()}
        expected = {r["doc_id"] for r in dedup_exact(all_docs).collect()}
        assert kept == expected
        # doc 1 normalizes to doc 4's content and has the lower id -> keeper
        decisions = {
            r["doc_id"]: r["is_keeper"]
            for r in read_dedup_decisions(spark, out).collect()
        }
        assert decisions[1] and not decisions[4]
        assert decisions[7] and not decisions[9]
        assert decisions[2] and decisions[3]


def test_streaming_dedup_restart_idempotent(spark):
    docs = [(i, f"text number {i % 3}") for i in range(9)]
    with tempfile.TemporaryDirectory() as d:
        inp, out = os.path.join(d, "in"), os.path.join(d, "out")
        _docs(spark, docs).write.mode("overwrite").parquet(inp)
        run_streaming_dedup(spark, inp, out)
        # a re-run with the same checkpoint consumes nothing new and
        # changes nothing
        run_streaming_dedup(spark, inp, out)
        kept = {r["doc_id"] for r in read_deduped_ids(spark, out).collect()}
        assert kept == {0, 1, 2}  # lowest id per content group


def test_streaming_minhash_matches_batch_across_splits(spark):
    """Near-dup pairs from the incremental band-row store equal batch
    minhash_lsh_pairs on the union, with a near-dup pair SPLIT across
    ingest waves (the case an incremental system must get right)."""
    from csd363_sin_spark.functions.dedup import minhash_lsh_pairs
    from csd363_sin_spark.streaming.dedup import (
        read_near_dup_pairs,
        run_streaming_minhash,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    wave1 = [(10, base), (20, "completely different text about spark engines")]
    wave2 = [
        (11, base.replace("kappa", "lambda")),  # near dup of 10, later wave
        (21, "short text"),
        (12, base),                              # exact dup of 10
    ]
    all_docs = _docs(spark, wave1 + wave2)
    with tempfile.TemporaryDirectory() as d:
        inp, out = os.path.join(d, "in"), os.path.join(d, "out")
        _docs(spark, wave1).write.mode("overwrite").parquet(inp)
        run_streaming_minhash(spark, inp, out)
        _docs(spark, wave2).write.mode("append").parquet(inp)
        run_streaming_minhash(spark, inp, out)

        got = {
            (r["doc_a"], r["doc_b"]): r["jaccard"]
            for r in read_near_dup_pairs(
                spark, out, all_docs, threshold=0.5
            ).collect()
        }
        expected = {
            (r["doc_a"], r["doc_b"]): r["jaccard"]
            for r in minhash_lsh_pairs(all_docs, threshold=0.5).collect()
        }
        assert got == expected
        assert (10, 11) in got and (10, 12) in got  # the cross-wave pairs
        # replay idempotency: re-running changes nothing
        run_streaming_minhash(spark, inp, out)
        again = {
            (r["doc_a"], r["doc_b"]): r["jaccard"]
            for r in read_near_dup_pairs(
                spark, out, all_docs, threshold=0.5
            ).collect()
        }
        assert again == got
