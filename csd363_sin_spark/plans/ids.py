"""Deterministic dense id assignment without a global single-partition sort.

The reference uses raw Python ints as node ids (reference data_io.py:104).
We dictionary-encode actor strings to dense longs.  ``row_number`` over a
global window would funnel everything through one partition; instead we

1. range-repartition by the key (Spark samples split points — deterministic
   for a fixed input),
2. rank within each partition (parallel window),
3. add per-partition offsets computed from a tiny collected count table.

This scales to billions of keys: step 3 collects only one row per
partition.  Ids are dense, start at 0, and follow the global sort order of
the key, so the mapping is reproducible run-to-run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dense_ids(
    df: DataFrame,
    key: str,
    id_col: str = "vertex_id",
    num_partitions: int | None = None,
    local_threshold: int = 1_000_000,
) -> DataFrame:
    """Return ``df[key]`` (distinct) with a dense ``id_col`` in key order.

    Dictionaries at or below ``local_threshold`` keys are enumerated
    driver-side (collect distinct, sort, enumerate) — the mapping is
    DEFINED as key-order-dense, so both paths produce identical ids; the
    range-partitioned path below owns the billions-of-keys regime."""
    distinct = df.select(key).distinct()
    if local_threshold > 0 and distinct.count() <= local_threshold:
        spark = distinct.sparkSession
        keys = sorted(r[0] for r in distinct.collect())
        dtype = distinct.schema[key].dataType.simpleString()
        # no persist: this is a LocalTableScan over a driver list — recompute
        # is free, and persisting here leaked cache across long pipelines
        return spark.createDataFrame(
            [(k, i) for i, k in enumerate(keys)], f"{key} {dtype}, {id_col} long"
        )
    if num_partitions is None:
        num_partitions = max(1, distinct.sparkSession.sparkContext.defaultParallelism)
    parted = distinct.repartitionByRange(num_partitions, F.col(key)).withColumn(
        "_pid", F.spark_partition_id()
    )
    # cache: the count pass and the rank pass must see identical partitioning
    parted = parted.persist()
    counts = parted.groupBy("_pid").count().collect()
    offsets = {}
    acc = 0
    for row in sorted(counts, key=lambda r: r["_pid"]):
        offsets[row["_pid"]] = acc
        acc += row["count"]
    offset_df = parted.sparkSession.createDataFrame(
        [(pid, off) for pid, off in offsets.items()], "_pid int, _offset long"
    )
    w = Window.partitionBy("_pid").orderBy(key)
    out = (
        parted.withColumn("_rn", F.row_number().over(w) - 1)
        .join(F.broadcast(offset_df), "_pid")
        .select(key, (F.col("_rn") + F.col("_offset")).alias(id_col))
    )
    # checkpoint (not a bare persist): pins the ids so recompute can never
    # re-sample range boundaries, cuts the lineage back to a LogicalRDD,
    # and — unlike the old persist() — hands callers a releasable handle
    # (plans.lineage.release) so long pipelines don't accumulate one
    # cached dictionary per induction (ADVICE r2)
    from csd363_sin_spark.plans.lineage import materialize

    out = materialize(out)
    parted.unpersist()
    return out
