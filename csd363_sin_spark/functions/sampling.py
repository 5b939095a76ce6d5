"""Deterministic sampling / splitting operators for training-data curation.

Not part of the reference repo (which is graph-only), but first-class
components of this engine per the build brief: a 100 TB corpus pipeline
needs reproducible subsampling (per-stratum mixing rates) and a stable
train/holdout split that never changes when the job is re-run, resumed,
or re-partitioned.

All operators key the decision on an engine-portable content hash of the
row key (``portable_hash64`` — first 15 hex chars of md5), NOT on
``rand()`` or partition-local RNG:

* deterministic across runs, executors, partitionings, and retries
  (a task re-run after executor loss samples the same rows);
* purely map-side — a scan + filter, zero shuffles, trivially scales;
* exactly reproducible in the DuckDB oracles (same md5 formula).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from csd363_sin_spark.functions.dedup import portable_hash64


def hash_bucket(key: Column, salt: str, buckets: int = 1000) -> Column:
    """Uniform pseudo-random bucket in [0, buckets) from an md5 of
    ``salt || ':' || key`` — the portable primitive behind every sampler
    here.  Distinct salts give independent assignments, so a sample and
    a train/holdout split drawn from the same table do not correlate."""
    keyed = F.concat(F.lit(salt + ":"), key.cast("string"))
    return F.pmod(portable_hash64(keyed), F.lit(buckets))


def stratified_sample(
    docs: DataFrame,
    rates_permille: dict[str, int],
    default_permille: int,
    strata_col: str = "source",
    salt: str = "sample",
) -> DataFrame:
    """Deterministic stratified subsample: keep each document with a
    per-stratum probability (permille), e.g. down-weight a crawl source
    and up-weight books when composing a training mixture.

    Returns ``(doc_id, <strata_col>, lang, bucket)`` for the kept rows.
    The rate map is a literal CASE chain (strata counts are small by
    definition), so the whole operator is one codegen'd scan+filter.
    """
    rate = F.lit(default_permille)
    for stratum, permille in sorted(rates_permille.items()):
        rate = F.when(F.col(strata_col) == stratum, F.lit(permille)).otherwise(rate)
    bucket = hash_bucket(F.col("doc_id"), salt)
    return (
        docs.select("doc_id", strata_col, "lang", bucket.alias("bucket"), rate.alias("_r"))
        .filter(F.col("bucket") < F.col("_r"))
        .drop("_r")
    )


def shard_by_token_budget(
    docs: DataFrame,
    tokens_per_shard: int,
    num_partitions: int | None = None,
    local_threshold: int = 1_000_000,
) -> DataFrame:
    """Pack documents into output shards of ~``tokens_per_shard`` tokens
    in doc_id order — the dataset-writer step of a training pipeline
    (fixed-budget shards give the loader uniform work units).  Returns
    ``(doc_id, n_tokens, shard)`` with
    ``shard = floor(tokens_before_this_doc / tokens_per_shard)``.

    The prefix sum is the scale hazard: a global ``sum() OVER (ORDER
    BY)`` window funnels the whole corpus through ONE partition.
    Instead this mirrors ``plans/ids.py dense_ids``: range-repartition by
    doc_id, per-partition running sums (parallel window), then add
    per-partition offsets from a tiny collected totals table — one
    collected row per partition, works at billions of docs.  Corpora at
    or below ``local_threshold`` docs take the driver path; both paths
    are identical integer math.
    """
    from csd363_sin_spark.functions.text import token_stats

    toks = token_stats(docs).select(
        "doc_id", F.col("n_tokens").cast("long").alias("n_tokens")
    )
    spark = toks.sparkSession
    if local_threshold > 0 and toks.count() <= local_threshold:
        rows = sorted(
            ((int(r["doc_id"]), int(r["n_tokens"])) for r in toks.collect())
        )
        out, acc = [], 0
        for doc_id, n in rows:
            out.append((doc_id, n, acc // tokens_per_shard))
            acc += n
        return spark.createDataFrame(
            out, "doc_id long, n_tokens long, shard long"
        )

    if num_partitions is None:
        num_partitions = max(1, spark.sparkContext.defaultParallelism)
    parted = toks.repartitionByRange(num_partitions, F.col("doc_id")).withColumn(
        "_pid", F.spark_partition_id()
    )
    parted = parted.persist()
    totals = parted.groupBy("_pid").agg(F.sum("n_tokens").alias("t")).collect()
    offsets, acc = {}, 0
    for row in sorted(totals, key=lambda r: r["_pid"]):
        offsets[row["_pid"]] = acc
        acc += int(row["t"])
    offset_df = spark.createDataFrame(
        [(pid, off) for pid, off in offsets.items()], "_pid int, _offset long"
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("_pid")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = (
        parted.withColumn("_before", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
        .join(F.broadcast(offset_df), "_pid")
        .select(
            "doc_id",
            "n_tokens",
            F.floor((F.col("_before") + F.col("_offset")) / tokens_per_shard)
            .cast("long")
            .alias("shard"),
        )
    )
    from csd363_sin_spark.plans.lineage import materialize

    out = materialize(out)
    parted.unpersist()
    return out


def train_holdout_split(
    docs: DataFrame, holdout_permille: int = 50, salt: str = "split"
) -> DataFrame:
    """Stable train/holdout assignment: ``(doc_id, split, bucket)`` with
    split = 'holdout' for bucket < holdout_permille else 'train'.  The
    assignment is a pure function of doc_id, so re-ingesting, resuming,
    or growing the corpus never moves an existing document across the
    split boundary (the property that keeps eval sets uncontaminated)."""
    bucket = hash_bucket(F.col("doc_id"), salt)
    return docs.select(
        "doc_id",
        F.when(bucket < holdout_permille, F.lit("holdout"))
        .otherwise(F.lit("train"))
        .alias("split"),
        bucket.alias("bucket"),
    )


def resample_to_mix(
    docs: DataFrame,
    weights: dict[str, float],
    strata_col: str = "source",
    default_weight: float = 1.0,
    salt: str = "mix",
) -> DataFrame:
    """Deterministic corpus re-mixing: per-document copy counts that
    realize a target per-stratum sampling multiplier — the "upsample
    wikipedia 3x, downsample web 0.5x" step of training-data curation.

    A document in a stratum with multiplier ``w`` gets
    ``floor(w) + (u < frac(w))`` copies, where ``u`` is the portable
    per-doc uniform ``(hash(salt:doc_id) % 2^53) / 2^53`` — so the
    EXPECTED multiplicity is exactly ``w``, the realized corpus is a
    pure function of (doc ids, weights, salt) across runs / retries /
    engines, and growing the corpus never changes an existing doc's
    count (the stability property train_holdout_split guarantees).
    Returns the input plus ``n_copies int`` (0 = dropped).  Pure
    map-side column math — no shuffle at all.

    :func:`explode_copies` materializes the repeated corpus.
    """
    u = (
        F.pmod(
            portable_hash64(
                F.concat(F.lit(salt + ":"), F.col("doc_id").cast("string"))
            ),
            F.lit(1 << 53),
        )
        / F.lit(float(1 << 53))
    )
    w = None
    for stratum, wt in sorted(weights.items()):
        cond = F.col(strata_col) == stratum
        w = F.when(cond, F.lit(float(wt))) if w is None else w.when(
            cond, F.lit(float(wt))
        )
    w = F.lit(float(default_weight)) if w is None else w.otherwise(
        F.lit(float(default_weight))
    )
    n = (
        F.floor(w).cast("int")
        + (u < (w - F.floor(w))).cast("int")
    )
    return docs.withColumn("n_copies", n)


def explode_copies(df: DataFrame) -> DataFrame:
    """Materialize a :func:`resample_to_mix` result: one row per copy
    with ``copy_idx`` in [0, n_copies); zero-copy rows drop out."""
    return df.filter(F.col("n_copies") > 0).withColumn(
        "copy_idx",
        F.explode(F.sequence(F.lit(0), F.col("n_copies") - 1)),
    )


def pack_sequences(
    docs: DataFrame,
    seq_tokens: int = 128,
    shuffle_salt: str | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """GPT-style token-stream packing: concatenate the corpus in a
    deterministic order and cut it every ``seq_tokens`` tokens — the
    standard pretraining sequence-preparation step (documents split at
    sequence boundaries; no padding waste, unlike per-document chunking).

    Order: ``doc_id`` ascending, or — with ``shuffle_salt`` — the
    engine-portable md5 order ``(portable_hash64(salt:doc_id), doc_id)``,
    the deterministic corpus shuffle every trainer wants (reproducible
    across runs/retries/partitionings, no ``rand()``).

    Returns one row per (sequence x document) fragment:
    ``(seq_id, seq_offset, doc_id, doc_start, n_tokens, frag_text)`` with
    ``seq_offset`` the fragment's 0-based position inside the sequence,
    ``doc_start`` the 1-based token offset inside the document, and
    ``frag_text`` the fragment's shared-tokenizer tokens — so
    ``GROUP BY seq_id ORDER BY seq_offset`` reassembles exact
    ``seq_tokens``-length training rows (the tail sequence may be short).

    Scale shape: the global token offset is the same two-phase prefix
    sum as :func:`shard_by_token_budget` (range-repartition on the order
    key, per-partition running sums, one collected row per partition —
    never a single-partition global window), then a pure map-side
    ``sequence`` explode of each document onto the sequences it overlaps
    (output rows ~ docs + tokens/seq_tokens, no shuffle after the
    prefix sum).
    """
    from pyspark.sql import Window

    from csd363_sin_spark.functions.text import _tokens
    from csd363_sin_spark.plans.lineage import materialize

    spark = docs.sparkSession
    if num_partitions is None:
        num_partitions = max(1, spark.sparkContext.defaultParallelism)
    base = docs.select(
        "doc_id",
        F.when(
            F.length(F.trim(F.col("text"))) == 0,
            F.array().cast("array<string>"),
        )
        .otherwise(_tokens(F.col("text")))
        .alias("toks"),
    ).withColumn("n", F.size("toks").cast("long"))
    base = base.filter(F.col("n") > 0)
    if shuffle_salt is not None:
        okey = portable_hash64(
            F.concat(F.lit(shuffle_salt + ":"), F.col("doc_id").cast("string"))
        )
    else:
        okey = F.col("doc_id").cast("long")
    parted = (
        base.withColumn("_ord", okey)
        .repartitionByRange(num_partitions, "_ord", "doc_id")
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    totals = parted.groupBy("_pid").agg(F.sum("n").alias("t")).collect()
    offsets, acc = {}, 0
    for row in sorted(totals, key=lambda r: r["_pid"]):
        offsets[row["_pid"]] = acc
        acc += int(row["t"])
    offset_df = spark.createDataFrame(
        [(pid, off) for pid, off in offsets.items()], "_pid int, _offset long"
    )
    w = (
        Window.partitionBy("_pid")
        .orderBy("_ord", "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off = (F.coalesce(F.sum("n").over(w), F.lit(0)) + F.col("_offset")).alias("off")
    placed = parted.join(F.broadcast(offset_df), "_pid").select(
        "doc_id", "toks", "n", off
    )
    c = F.lit(int(seq_tokens))
    exploded = placed.select(
        "doc_id",
        "toks",
        "n",
        "off",
        F.explode(
            F.sequence(
                F.floor(F.col("off") / c),
                F.floor((F.col("off") + F.col("n") - 1) / c),
            )
        ).alias("seq_id"),
    )
    gstart = F.greatest(F.col("off"), F.col("seq_id") * c)
    gend = F.least(F.col("off") + F.col("n"), (F.col("seq_id") + 1) * c)
    doc_start = gstart - F.col("off") + 1
    out = exploded.select(
        F.col("seq_id").cast("long").alias("seq_id"),
        (gstart - F.col("seq_id") * c).cast("long").alias("seq_offset"),
        "doc_id",
        doc_start.cast("long").alias("doc_start"),
        (gend - gstart).cast("long").alias("n_tokens"),
        F.array_join(
            F.slice(F.col("toks"), doc_start.cast("int"), (gend - gstart).cast("int")),
            " ",
        ).alias("frag_text"),
    )
    out = materialize(out)
    parted.unpersist()
    return out
