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

    def read_metrics(self) -> list[dict]:
        """Reader twin of :meth:`metrics` — the recorded per-stage metric
        bundles, in append order (feeds the per-step charts in viz.py the
        same way read_lineage feeds the superstep series)."""
        p = os.path.join(self.run_dir, "metrics.jsonl")
        if not os.path.exists(p):
            return []
        with open(p) as f:
            return [json.loads(line) for line in f if line.strip()]


def format_metrics_summary(out: dict, timestamp: str | None = None) -> str:
    """Fixed-width text summary of a ``run_pipeline`` result — output
    parity with the reference's formatter (extract_metrics.py:173-277):
    same header, 80/50/65-char rules, {:<20}{:<15} column layout, NMI and
    improvement sections, m/s runtime line.  Input is the structured
    metrics dict (the engine records structured metrics from the start;
    this formatter is the S12 presentation sink)."""
    s: list[str] = []
    s.append("=" * 80)
    s.append("COMMUNITY DETECTION PIPELINE - METRICS SUMMARY")
    if timestamp:
        s.append(f"Run date: {timestamp}")
    s.append("=" * 80)

    g = out.get("graph_analysis") or {}
    s.append("\nGRAPH STATISTICS:")
    s.append("-" * 50)
    if g:
        s.append(f"Nodes: {g.get('num_nodes', 'N/A')}")
        s.append(f"Edges: {g.get('num_edges', 'N/A')}")
        s.append(f"Density: {g.get('density', 0.0):.8f}")
        s.append(f"Connected Components: {g.get('num_components', 'N/A')}")
        if "largest_component_size" in g:
            s.append(
                f"Largest Component: {g['largest_component_size']} nodes "
                f"({g.get('largest_component_pct', 0):.2f}% of graph)"
            )

    s.append("\nALGORITHM PERFORMANCE:")
    s.append("-" * 50)
    s.append(
        "{:<20} {:<15} {:<15} {:<15}".format(
            "Algorithm", "Communities", "Modularity", "Conductance"
        )
    )
    s.append("-" * 65)
    stages = [
        ("Baseline", "baseline"),
        ("Louvain", "louvain"),
        ("Girvan-Newman", "girvan_newman"),
        ("Infomap", "infomap"),
    ]
    for label, key in stages:
        m = out.get(key)
        if m:
            s.append(
                "{:<20} {:<15} {:<15.4f} {:<15.4f}".format(
                    label,
                    m.get("num_communities", "N/A"),
                    m.get("modularity", 0) or 0,
                    m.get("avg_conductance", 0) or 0,
                )
            )

    if any((out.get(k) or {}).get("nmi") is not None for _, k in stages):
        s.append("\nNORMALIZED MUTUAL INFORMATION (NMI):")
        s.append("-" * 50)
        s.append("{:<20} {:<15}".format("Algorithm", "NMI Score"))
        s.append("-" * 35)
        for label, key in stages:
            m = out.get(key) or {}
            if m.get("nmi") is not None:
                s.append("{:<20} {:<15.4f}".format(label, m["nmi"]))

    s.append("\nIMPROVEMENT SUMMARY:")
    s.append("-" * 50)
    lv, bl = out.get("louvain") or {}, out.get("baseline") or {}
    im, gn = out.get("infomap") or {}, out.get("girvan_newman") or {}
    if "modularity" in lv and "modularity" in bl:
        s.append(
            f"Louvain vs Baseline (Modularity): "
            f"+{lv['modularity'] - bl['modularity']:.4f}"
        )
    if "modularity" in im and "modularity" in gn:
        s.append(
            f"Infomap vs Girvan-Newman (Modularity): "
            f"+{im['modularity'] - gn['modularity']:.4f}"
        )
    if "modularity" in im and "modularity" in bl:
        s.append(
            f"Overall Improvement (Modularity): "
            f"+{im['modularity'] - bl['modularity']:.4f}"
        )

    runtime = (out.get("summary") or {}).get("total_runtime")
    if runtime is not None:
        minutes, seconds = divmod(runtime, 60)
        s.append(f"\nTotal Runtime: {int(minutes)}m {seconds:.2f}s")
    return "\n".join(s)
