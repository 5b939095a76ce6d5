"""North-rule launch contract: the pipeline runs via spark-submit
--py-files with the package shipped as a zip (no repo on the
executors' PYTHONPATH), writes its artifacts, and exits 0."""

from __future__ import annotations

import os
import shutil
import subprocess
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _zip_package(dest: str) -> str:
    pkg = os.path.join(REPO, "csd363_sin_spark")
    zpath = os.path.join(dest, "csd363_sin_spark.zip")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                z.write(full, os.path.relpath(full, REPO))
    return zpath


def test_spark_submit_py_files_launch(tmp_path):
    spark_submit = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"
    zpath = _zip_package(str(tmp_path))
    run_dir = str(tmp_path / "run")
    env = dict(os.environ)
    # the package must come from --py-files, not the working directory
    env["PYTHONPATH"] = ""
    proc = subprocess.run(
        [
            spark_submit,
            "--master", "local[4]",
            "--py-files", zpath,
            os.path.join(REPO, "run_pipeline.py"),
            "--synth-convs", "120",
            "--synth-tools", "12",
            "--synth-clusters", "3",
            "--run-dir", run_dir,
            "--viz", "0",
            "--size-threshold", "30",
        ],
        cwd=str(tmp_path),  # NOT the repo: import must resolve via the zip
        env=env,
        capture_output=True,
        text=True,
        timeout=540,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    # artifacts landed
    assert os.path.isdir(os.path.join(run_dir, "final_assign"))
    assert os.path.exists(os.path.join(run_dir, "metrics_summary.txt"))
    # stdout carries the metrics JSON + fixed-width summary
    assert '"modularity"' in proc.stdout
    assert "Louvain" in proc.stdout
