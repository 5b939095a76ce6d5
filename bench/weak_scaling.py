"""Data-size scaling at fixed parallelism (supports BENCH.md §2.3).

Runs PageRank (fixed 4 iterations) at a fixed local[8] on growing
synthetic graphs and reports edges/sec per size — evidence that
per-superstep fixed costs amortize (throughput per core rises toward an
asymptote as data grows, the regime a large cluster operates in).

Usage: python bench/weak_scaling.py [--sizes 125000,500000,2000000]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

WORKER = r"""
import json, sys, time
convs = int(sys.argv[1])
from csd363_sin_spark.session import get_spark
from csd363_sin_spark.sources.synth import synth_transcripts
from csd363_sin_spark.plans.induce import induce_graph
from csd363_sin_spark.operators.pagerank import pagerank
spark = get_spark(app_name=f"weak-{convs}", master="local[8]",
                  shuffle_partitions=16,
                  extra_conf={"spark.sql.adaptive.coalescePartitions.enabled": "false"})
spark.sparkContext.setLogLevel("ERROR")
t = synth_transcripts(spark, n_convs=convs, n_tools=64, n_clusters=8)
g = induce_graph(t)
g.edges.persist().count(); g.vertices.persist().count()
n_edges = g.edges.count()
g.degrees().count()  # warmup
t0 = time.time()
pagerank(g, max_iter=4, tol=0.0).count()
dt = time.time() - t0
print(json.dumps({"convs": convs, "edges": n_edges,
                  "pagerank_sec": round(dt, 2),
                  "edges_per_sec": round(n_edges * 2 * 4 / dt)}))
spark.stop()
"""


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="125000,500000,2000000")
    args = ap.parse_args()
    results = []
    for convs in (int(x) for x in args.sizes.split(",")):
        out = subprocess.run(
            [sys.executable, "-c", WORKER, str(convs)],
            capture_output=True, text=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            timeout=3600,
        )
        lines = [line for line in out.stdout.splitlines() if line.startswith("{")]
        if not lines:
            raise RuntimeError(f"worker[{convs}] failed:\n{out.stderr[-1500:]}")
        results.append(json.loads(lines[-1]))
    print(json.dumps({"fixed_cores": 8, "pagerank_iters": 4, "points": results},
                     indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
