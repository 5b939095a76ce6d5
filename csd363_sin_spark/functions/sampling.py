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
