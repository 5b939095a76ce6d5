"""Superstep checkpointing, lineage + metrics tables, resume (SURVEY §4).

The reference caches only the parsed graph pickle (data_io.py:198-265) and
writes metrics JSON at the end (__main__.py:139-183); a killed run starts
over.  Our engine checkpoints every stage boundary AND every Louvain level
to a run directory (parquet + JSON meta), appends per-superstep lineage
rows (stage, superstep, rows, checksum, wall time), and every stage knows
how to resume from the newest complete snapshot — a killed pipeline
relaunches mid-algorithm.

Layout (portable parquet; on a cluster point ``run_dir`` at object
storage, or swap the writes for an Iceberg catalog — the API is format-
agnostic):

    <run_dir>/state/<key>/            parquet snapshots
    <run_dir>/meta/<key>.json         small JSON state (loop counters, Q)
    <run_dir>/lineage.jsonl           append-only lineage rows
    <run_dir>/metrics.jsonl           per-stage metric bundles
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class CheckpointStore:
    def __init__(self, run_dir: str, run_id: str | None = None):
        self.run_dir = run_dir
        self.run_id = run_id or os.path.basename(os.path.normpath(run_dir))
        os.makedirs(os.path.join(run_dir, "state"), exist_ok=True)
        os.makedirs(os.path.join(run_dir, "meta"), exist_ok=True)

    # -- dataframe snapshots -------------------------------------------------
    def _state_path(self, key: str) -> str:
        return os.path.join(self.run_dir, "state", key)

    def has_df(self, key: str) -> bool:
        return os.path.exists(os.path.join(self._state_path(key), "_SUCCESS"))

    def save_df(self, key: str, df: DataFrame) -> None:
        df.write.mode("overwrite").parquet(self._state_path(key))

    def load_df(self, spark: SparkSession, key: str) -> DataFrame:
        return spark.read.parquet(self._state_path(key))

    # -- small json state ----------------------------------------------------
    def _meta_path(self, key: str) -> str:
        return os.path.join(self.run_dir, "meta", f"{key}.json")

    def has_meta(self, key: str) -> bool:
        return os.path.exists(self._meta_path(key))

    def save_meta(self, key: str, obj: dict) -> None:
        tmp = self._meta_path(key) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(obj, f)
        os.replace(tmp, self._meta_path(key))

    def load_meta(self, key: str) -> dict:
        with open(self._meta_path(key)) as f:
            return json.load(f)

    # -- lineage / metrics ---------------------------------------------------
    def _append(self, fname: str, obj: dict) -> None:
        with open(os.path.join(self.run_dir, fname), "a") as f:
            f.write(json.dumps(obj) + "\n")

    def lineage(self, stage: str, superstep: int, df: DataFrame | None = None, **extra) -> None:
        """Append one lineage row; ``df`` (if given) contributes row count +
        an order-insensitive checksum so a resumed run can verify state."""
        row = {
            "run_id": self.run_id,
            "stage": stage,
            "superstep": superstep,
            "ts": time.time(),
            **extra,
        }
        if df is not None:
            # decimal accumulator: a long sum of 64-bit hashes overflows
            # under ANSI mode
            agg = df.agg(
                F.count(F.lit(1)).alias("rows"),
                F.sum(F.xxhash64(*df.columns).cast("decimal(38,0)")).alias("checksum"),
            ).collect()[0]
            row["rows"] = int(agg["rows"])
            row["checksum"] = int(agg["checksum"] or 0)
        self._append("lineage.jsonl", row)

    def metrics(self, stage: str, metrics: dict) -> None:
        self._append(
            "metrics.jsonl",
            {"run_id": self.run_id, "stage": stage, "ts": time.time(), "metrics": metrics},
        )

    def read_lineage(self) -> list[dict]:
        p = os.path.join(self.run_dir, "lineage.jsonl")
        if not os.path.exists(p):
            return []
        with open(p) as f:
            return [json.loads(line) for line in f if line.strip()]
