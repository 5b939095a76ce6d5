"""Lineage truncation for iterative DataFrames (the engine's superstep cut).

Spark >= 3.4's ``localCheckpoint`` keeps the *origin plan's estimated
statistics* on the resulting LogicalRDD (to help AQE).  In an iterative
algorithm those estimates COMPOUND: every superstep's plan multiplies the
previous checkpoint's sizeInBytes through its joins, so after k supersteps
the BigInt estimate has ~c^k digits and Catalyst's stats visitor grinds
BigInteger arithmetic for minutes — the job appears to hang (observed:
1000+-digit sizes after 3 supersteps of the Louvain local-move, unbounded
growth by level 2).

:func:`materialize` truncates BOTH lineage and statistics:

* local mode (default): ``localCheckpoint`` then re-wrap the checkpointed
  RDD via ``createDataFrame(rdd, schema)`` — a fresh LogicalRDD with
  default stats (constant digits, forever);
* ``reliable=True``: round-trip through parquet in the checkpoint dir —
  real file-based stats, survives executor loss; the right mode for long
  cluster runs (swap the path for object storage / an Iceberg table).
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame


def materialize(df: DataFrame, reliable: bool = False) -> DataFrame:
    """Materialize ``df`` and return a stats-clean, lineage-free frame."""
    spark = df.sparkSession
    if reliable:
        ckpt_dir = spark.sparkContext.getCheckpointDir()
        path = os.path.join(ckpt_dir or "/tmp", "df_ckpt", uuid.uuid4().hex)
        df.write.mode("overwrite").parquet(path)
        return spark.read.parquet(path)
    jdf = df._jdf.localCheckpoint(True)
    jdf2 = spark._jsparkSession.createDataFrame(jdf.toJavaRDD(), jdf.schema())
    out = DataFrame(jdf2, spark)
    try:
        # handle to the checkpointed RDD so release() can free its blocks
        out._ckpt_jrdd = jdf.queryExecution().logical().rdd()
    except Exception:
        pass
    return out


def adopt(derived: DataFrame, src: DataFrame) -> DataFrame:
    """Carry ``src``'s checkpoint handle onto ``derived`` (a narrow
    projection/rename of it) so ``release(derived)`` frees the blocks."""
    jrdd = getattr(src, "_ckpt_jrdd", None)
    if jrdd is not None:
        derived._ckpt_jrdd = jrdd
    return derived


def release(df: DataFrame | None) -> None:
    """Free the cached blocks behind a :func:`materialize`-d frame.

    localCheckpoint truncates lineage, so after release the frame CANNOT
    be recomputed — only call once every consumer is done with it.
    Iterative operators (betweenness backward pass, GN removal loop) use
    this to retire per-superstep state instead of holding every level's
    blocks until session end.  No-op for plain / reliable frames."""
    jrdd = getattr(df, "_ckpt_jrdd", None) if df is not None else None
    if jrdd is not None:
        try:
            jrdd.unpersist(False)
        except Exception:
            pass
