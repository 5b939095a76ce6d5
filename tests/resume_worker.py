"""Subprocess worker for the fresh-session resume test.

Each invocation is its own python process => its own SparkSession/JVM, so
localCheckpoint state from a previous run is genuinely GONE — the closest
sandbox analogue of losing every executor mid-algorithm.  Only the
parquet-backed CheckpointStore survives between invocations.

Usage: python tests/resume_worker.py <mode> <ckpt_dir> <out_parquet>
  mode=crash  : run Louvain with a store, raise after the level-1
                snapshot (mid-algorithm kill) -> exit 17
  mode=resume : fresh session, same store dir -> must complete; asserts
                the crashed run's snapshot was actually loaded
  mode=clean  : no store -> reference output
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from csd363_sin_spark.checkpoint import CheckpointStore
from csd363_sin_spark.operators import louvain as lv
from csd363_sin_spark.plans.induce import induce_graph
from csd363_sin_spark.session import get_spark
from csd363_sin_spark.sources.synth import synth_transcripts


def main() -> int:
    mode, ckpt_dir, out_path = sys.argv[1], sys.argv[2], sys.argv[3]
    spark = get_spark(
        app_name=f"resume-{mode}", master="local[4]", shuffle_partitions=4
    )
    spark.sparkContext.setLogLevel("ERROR")
    t = synth_transcripts(spark, n_convs=200, n_tools=24, n_clusters=5, seed=9)
    g = induce_graph(t)

    if mode == "clean":
        res = lv.louvain(g, weighted=True)
        res.assign.write.mode("overwrite").parquet(out_path)
        return 0

    store = CheckpointStore(ckpt_dir)
    if mode == "crash":
        calls = {"n": 0}
        orig = lv._local_move_phase_driver

        def bomb(*a, **kw):
            calls["n"] += 1
            if calls["n"] == 2:  # level 0 snapshotted; die inside level 1
                raise RuntimeError("simulated executor loss")
            return orig(*a, **kw)

        lv._local_move_phase_driver = bomb
        try:
            lv.louvain(g, weighted=True, store=store)
        except RuntimeError:
            return 17
        return 3  # graph converged in one level: fixture must be retuned

    # resume: the store must already hold a mid-algorithm snapshot
    assert store.has_meta("louvain_state"), "no snapshot to resume from"
    meta = store.load_meta("louvain_state")
    assert not meta.get("done") and meta["level"] >= 1, meta
    res = lv.louvain(g, weighted=True, store=store)
    res.assign.write.mode("overwrite").parquet(out_path)
    return 0


if __name__ == "__main__":
    sys.exit(main())
