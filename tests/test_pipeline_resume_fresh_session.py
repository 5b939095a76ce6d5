"""Reliable resume across a FRESH session (simulated executor loss).

Three subprocesses, each with its own SparkSession/JVM (see
tests/resume_worker.py): a run that dies mid-Louvain after the level-1
snapshot, a fresh-session run that resumes from the parquet-backed
CheckpointStore, and a storeless clean run.  The resumed assignment must
equal the clean one exactly (the deterministic spec makes this
checkable).  Also covers PipelineConfig.checkpoint_dir wiring the store
through the pipeline surface in-session.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _worker(mode, ckpt, out):
    return subprocess.run(
        [sys.executable, "tests/resume_worker.py", mode, ckpt, out],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=600,
    )


def test_louvain_resume_after_fresh_session(spark, tmp_path):
    ckpt = str(tmp_path / "store")
    out_resumed = str(tmp_path / "resumed.parquet")
    out_clean = str(tmp_path / "clean.parquet")

    crash = _worker("crash", ckpt, "-")
    assert crash.returncode == 17, crash.stderr[-2000:]

    resumed = _worker("resume", ckpt, out_resumed)
    assert resumed.returncode == 0, resumed.stderr[-2000:]
    clean = _worker("clean", "-", out_clean)
    assert clean.returncode == 0, clean.stderr[-2000:]

    a = {r["vertex_id"]: r["comm"] for r in spark.read.parquet(out_resumed).collect()}
    b = {r["vertex_id"]: r["comm"] for r in spark.read.parquet(out_clean).collect()}
    assert a == b


def test_pipeline_checkpoint_dir_creates_store(spark, tmp_path):
    from csd363_sin_spark.pipeline import PipelineConfig, run_pipeline
    from csd363_sin_spark.plans.induce import induce_graph
    from csd363_sin_spark.sources.synth import synth_transcripts

    t = synth_transcripts(spark, n_convs=80, n_tools=12, n_clusters=3, seed=4)
    g = induce_graph(t)
    ckpt = str(tmp_path / "pstore")
    cfg = PipelineConfig(checkpoint_dir=ckpt, size_threshold=30)
    out = run_pipeline(g, config=cfg)
    assert out["final_assign"].count() == g.vertices.count()
    # stage snapshots landed in the configured store directory
    names = set()
    for _root, _dirs, files in os.walk(ckpt):
        names.update(files)
    assert names, "checkpoint_dir stayed empty"
    # a second run resumes from the finished stage snapshots (no recompute):
    out2 = run_pipeline(g, config=cfg)
    a = {r["vertex_id"]: r["comm"] for r in out["final_assign"].collect()}
    b = {r["vertex_id"]: r["comm"] for r in out2["final_assign"].collect()}
    assert a == b
