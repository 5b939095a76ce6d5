"""spark-submit entry point (north rule: ``spark-submit --py-files``).

Usage:
    spark-submit --py-files csd363_sin_spark.zip run_pipeline.py \
        [--transcripts PATH | --synth-convs N] [--run-dir DIR] \
        [--size-threshold N] [--modularity-threshold F] [--fast-mode 0|1]

Mirrors the reference CLI (reference __main__.py:77-111): config values
resolve CLI > defaults; output is a metrics JSON to stdout + the final
assignment parquet under --run-dir (plus per-stage checkpoints enabling
resume — rerun the same command after a crash and completed stages load
from the store).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--transcripts", help="parquet path of transcripts table")
    ap.add_argument("--synth-convs", type=int, default=2000)
    ap.add_argument("--synth-tools", type=int, default=32)
    ap.add_argument("--synth-clusters", type=int, default=8)
    ap.add_argument("--run-dir", default="./runs/default")
    ap.add_argument("--size-threshold", type=int, default=5000)
    ap.add_argument("--target-subcommunities", type=int, default=5)
    ap.add_argument("--modularity-threshold", type=float, default=0.3)
    ap.add_argument("--max-iterations", type=int, default=None)
    ap.add_argument("--fast-mode", type=int, default=1)
    ap.add_argument(
        "--viz", type=int, default=1,
        help="render SVG charts + report.html under RUN_DIR/viz (S13 sinks)",
    )
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    from csd363_sin_spark.checkpoint import CheckpointStore
    from csd363_sin_spark.pipeline import PipelineConfig, run_pipeline
    from csd363_sin_spark.plans.induce import induce_graph
    from csd363_sin_spark.session import get_spark
    from csd363_sin_spark.sources.synth import synth_transcripts

    spark = get_spark(app_name="csd363-sin-pipeline", master=args.master)
    spark.sparkContext.setLogLevel("WARN")

    if args.transcripts:
        transcripts = spark.read.parquet(args.transcripts)
    else:
        transcripts = synth_transcripts(
            spark,
            n_convs=args.synth_convs,
            n_tools=args.synth_tools,
            n_clusters=args.synth_clusters,
        )
    graph = induce_graph(transcripts)

    os.makedirs(args.run_dir, exist_ok=True)
    store = CheckpointStore(args.run_dir)
    cfg = PipelineConfig(
        size_threshold=args.size_threshold,
        target_subcommunities=args.target_subcommunities,
        modularity_threshold=args.modularity_threshold,
        max_iterations=args.max_iterations,
        fast_mode=bool(args.fast_mode),
    )
    out = run_pipeline(graph, config=cfg, store=store)
    final = out.pop("final_assign")
    final.write.mode("overwrite").parquet(os.path.join(args.run_dir, "final_assign"))
    if args.viz:
        from csd363_sin_spark.viz import render_pipeline_report

        paths = render_pipeline_report(
            graph, final, out, os.path.join(args.run_dir, "viz")
        )
        out["viz_artifacts"] = paths
    from csd363_sin_spark.checkpoint import format_metrics_summary

    summary_txt = format_metrics_summary(
        out, timestamp=__import__("datetime").datetime.now().isoformat(" ", "seconds")
    )
    with open(os.path.join(args.run_dir, "metrics_summary.txt"), "w") as f:
        f.write(summary_txt + "\n")
    print(json.dumps(out, default=str, indent=2))
    print(summary_txt)
    return 0


if __name__ == "__main__":
    sys.exit(main())
