"""spark-submit entry point (north rule: ``spark-submit --py-files``).

Usage:
    spark-submit --py-files csd363_sin_spark.zip run_pipeline.py \
        [--config config.yaml] \
        [--transcripts PATH | --input-edge-file FILE | --synth-convs N] \
        [--run-dir DIR] [--size-threshold N] [--modularity-threshold F] \
        [--fast-mode 0|1]

Mirrors the reference entry contract (reference __main__.py:64-75 config
loading, 581-595 merge, 77-111 argparse): ``--config`` accepts the
reference's YAML/JSON config.yaml keys, and values resolve CLI >
config-file > defaults.  Output is a metrics JSON to stdout + the final
assignment parquet under --run-dir (plus per-stage checkpoints enabling
resume — rerun the same command after a crash and completed stages load
from the store).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

DEFAULTS = {
    "transcripts": None,
    "input_edge_file": None,
    "data_dir": "data",
    "ground_truth_file": None,
    "sample_size": None,
    "synth_convs": 2000,
    "synth_tools": 32,
    "synth_clusters": 8,
    "run_dir": "./runs/default",
    "output_dir": None,  # reference alias for run_dir (config.yaml:22)
    "size_threshold": 5000,
    "target_subcommunities": 5,
    "modularity_threshold": 0.3,
    "max_iterations": None,
    "time_limit": None,
    "fast_mode": 1,
    "base_algorithm": "louvain",  # engine addition: "leiden" opt-in
    "viz": 1,
    "visualization_dir": "viz",
    "master": None,
}


def resolve_config(argv=None) -> dict:
    """Parse CLI + optional --config file into the effective settings
    (CLI explicit > config file > DEFAULTS, reference merge order)."""
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", help="YAML/JSON config file (reference config.yaml keys)")
    ap.add_argument("--transcripts", help="parquet path of transcripts table")
    ap.add_argument(
        "--input-edge-file", dest="input_edge_file",
        help="whitespace edge-list text file (reference data_io.py loader), "
        "resolved under --data-dir when relative",
    )
    ap.add_argument(
        "--ground-truth-file", dest="ground_truth_file",
        help="ground-truth file for NMI (reference __main__.py:108 / "
        "load_ground_truth:368-383 semantics: pair format, or an edge "
        "file labelled by connected component), resolved under --data-dir "
        "when relative",
    )
    ap.add_argument("--data-dir", dest="data_dir")
    ap.add_argument(
        "--sample-size", dest="sample_size", type=int,
        help="prefix edge sample (first N valid edge lines, reference S2 semantics)",
    )
    ap.add_argument("--synth-convs", dest="synth_convs", type=int)
    ap.add_argument("--synth-tools", dest="synth_tools", type=int)
    ap.add_argument("--synth-clusters", dest="synth_clusters", type=int)
    ap.add_argument("--run-dir", dest="run_dir")
    ap.add_argument("--size-threshold", dest="size_threshold", type=int)
    ap.add_argument("--target-subcommunities", dest="target_subcommunities", type=int)
    ap.add_argument("--modularity-threshold", dest="modularity_threshold", type=float)
    ap.add_argument("--max-iterations", dest="max_iterations", type=int)
    ap.add_argument("--fast-mode", dest="fast_mode", type=int)
    ap.add_argument(
        "--base-algorithm",
        dest="base_algorithm",
        choices=["louvain", "leiden"],
    )
    ap.add_argument(
        "--viz", dest="viz", type=int,
        help="render SVG charts + report.html under RUN_DIR/<visualization_dir> (S13 sinks)",
    )
    ap.add_argument("--master", dest="master")
    args = vars(ap.parse_args(argv))

    from csd363_sin_spark.config import load_config, merge_config

    config_path = args.pop("config", None)
    file_cfg = load_config(config_path) if config_path else {}
    cfg = merge_config(args, file_cfg, DEFAULTS)
    # reference config.yaml calls the run directory output_dir; an
    # explicit run_dir (CLI) wins over it
    if cfg.get("output_dir") and args.get("run_dir") is None:
        cfg["run_dir"] = cfg["output_dir"]
    if cfg.get("time_limit") is not None:
        print(
            "warning: time_limit accepted for config compatibility; the Spark "
            "pipeline uses checkpoint/resume instead of per-stage wall budgets",
            file=sys.stderr,
        )
    return cfg


def main(argv=None) -> int:
    cfg = resolve_config(argv)

    from pyspark.sql import functions as F

    from csd363_sin_spark.checkpoint import CheckpointStore
    from csd363_sin_spark.pipeline import PipelineConfig, run_pipeline
    from csd363_sin_spark.plans.induce import Graph, induce_graph
    from csd363_sin_spark.session import get_spark
    from csd363_sin_spark.sources.synth import synth_transcripts
    from csd363_sin_spark.sources.transcripts import read_edge_list

    spark = get_spark(app_name="csd363-sin-pipeline", master=cfg["master"])
    spark.sparkContext.setLogLevel("WARN")

    if cfg["input_edge_file"]:
        path = cfg["input_edge_file"]
        if not os.path.isabs(path) and cfg["data_dir"]:
            path = os.path.join(cfg["data_dir"], path)
        raw = read_edge_list(spark, path, sample_size=cfg["sample_size"])
        # Intentional divergence from the reference loader (data_io.py
        # load_graph keeps nx self-loops): the engine's graph model is
        # loop-free — every operator (modularity's degree terms, triangle
        # wedges, the symmetric adjacency views) assumes src != dst — so
        # self-loop lines are dropped, and LOGGED so the divergence is
        # visible instead of silent.
        n_loops = raw.filter(F.col("src") == F.col("dst")).count()
        if n_loops:
            print(
                f"warning: discarded {n_loops} self-loop line(s) from "
                f"{path} (the reference's nx.Graph keeps self-loops; this "
                "engine's graph model is loop-free)",
                file=sys.stderr,
            )
        edges = (
            raw.filter(F.col("src") != F.col("dst"))
            .select(
                F.least("src", "dst").alias("src"),
                F.greatest("src", "dst").alias("dst"),
                "weight",
            )
            .distinct()
        )
        vertices = (
            edges.select(F.col("src").alias("vertex_id"))
            .unionAll(edges.select(F.col("dst").alias("vertex_id")))
            .distinct()
            .select(
                "vertex_id",
                F.col("vertex_id").cast("string").alias("actor"),
                F.lit("v").alias("kind"),
            )
        )
        graph = Graph(vertices=vertices, edges=edges)
    else:
        if cfg["transcripts"]:
            transcripts = spark.read.parquet(cfg["transcripts"])
        else:
            transcripts = synth_transcripts(
                spark,
                n_convs=cfg["synth_convs"],
                n_tools=cfg["synth_tools"],
                n_clusters=cfg["synth_clusters"],
            )
        graph = induce_graph(transcripts)

    # ground truth for NMI (reference __main__.py:368-383: a configured
    # ground_truth_file is loaded as pairs-or-edge-file, missing file
    # warns and falls through to no-NMI)
    ground_truth = None
    if cfg["ground_truth_file"]:
        gt_path = cfg["ground_truth_file"]
        if not os.path.isabs(gt_path) and cfg["data_dir"]:
            gt_path = os.path.join(cfg["data_dir"], gt_path)
        if os.path.exists(gt_path):
            from csd363_sin_spark.sources.groundtruth import load_ground_truth

            ground_truth = load_ground_truth(spark, graph, edge_path=gt_path)
        else:
            print(
                f"warning: ground_truth_file not found: {gt_path}; "
                "NMI will not be calculated",
                file=sys.stderr,
            )

    os.makedirs(cfg["run_dir"], exist_ok=True)
    store = CheckpointStore(cfg["run_dir"])
    pipe_cfg = PipelineConfig(
        size_threshold=cfg["size_threshold"],
        target_subcommunities=cfg["target_subcommunities"],
        modularity_threshold=cfg["modularity_threshold"],
        max_iterations=cfg["max_iterations"],
        fast_mode=bool(cfg["fast_mode"]),
        base_algorithm=cfg["base_algorithm"],
    )
    out = run_pipeline(graph, ground_truth=ground_truth, config=pipe_cfg, store=store)
    final = out.pop("final_assign")
    final.write.mode("overwrite").parquet(os.path.join(cfg["run_dir"], "final_assign"))
    if cfg["viz"]:
        from csd363_sin_spark.viz import render_pipeline_report

        paths = render_pipeline_report(
            graph, final, out,
            os.path.join(cfg["run_dir"], cfg["visualization_dir"]),
            store=store,
        )
        out["viz_artifacts"] = paths
    from csd363_sin_spark.checkpoint import format_metrics_summary

    summary_txt = format_metrics_summary(
        out, timestamp=__import__("datetime").datetime.now().isoformat(" ", "seconds")
    )
    with open(os.path.join(cfg["run_dir"], "metrics_summary.txt"), "w") as f:
        f.write(summary_txt + "\n")
    print(json.dumps(out, default=str, indent=2))
    print(summary_txt)
    return 0


if __name__ == "__main__":
    sys.exit(main())
