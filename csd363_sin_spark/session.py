"""SparkSession factory with scale-oriented defaults.

Design notes (100 TB target, tested on local[N]):
* AQE on (coalesce post-shuffle partitions, skew-join splitting) — the
  co-occurrence graph has hub actors (a popular tool touches most
  conversations), so join-side skew is expected and AQE handles it; the
  aggregation-side skew is handled by explicit salting in plans/csr.py.
* Arrow on — every Python kernel in this engine is a grouped Arrow/pandas
  UDF; row-at-a-time Python UDFs are banned (tests/test_lint_no_slow_paths.py).
* Checkpoint dir set — iterative operators (components, PageRank, Louvain,
  betweenness) truncate lineage every few supersteps; without this, plan
  depth grows per iteration and planning time explodes.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "csd363-sin-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (or ``local[*]``)
    in the sandbox; on a real cluster the caller passes nothing and lets
    spark-submit decide.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = int(
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", DEFAULT_SHUFFLE_PARTITIONS)
        )

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    if not spark.sparkContext.getCheckpointDir():
        spark.sparkContext.setCheckpointDir(
            os.path.join(tempfile.gettempdir(), "csd363_sin_spark_ckpt")
        )
    return spark
