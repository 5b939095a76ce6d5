"""A/B: edge-betweenness BFS frontier expansion — edge-join vs CSR gather.

Measures the two physical strategies of ``edge_betweenness(gather=...)``
on the same synthetic transcript graph at a scale where the distributed
dataflow path (not the driver dispatch) runs:

* ``join``  — per BFS level, frontier JOIN the persisted symmetric edge
  table (both sides shuffle on the join key);
* ``csr``   — per BFS level, cogroup the frontier with static CSR
  adjacency blocks (plans/csr.csr_gather): the adjacency never moves,
  only the frontier rows exchange, and the expansion itself is a numpy
  searchsorted + ragged gather inside an Arrow kernel.

Each variant runs in its own subprocess (cold JVM each, same input
seed).  Values are parity-tested in tests/test_csr.py; this harness is
the throughput half of the evidence.  BENCH.md records the canonical
numbers.

Usage:  python bench/gather_ab.py [--convs 500000] [--sources 48]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

WORKER = r"""
import json, sys, time
gather = sys.argv[1]; convs = int(sys.argv[2]); k_sources = int(sys.argv[3])
from csd363_sin_spark.session import get_spark
from csd363_sin_spark.sources.synth import synth_transcripts
from csd363_sin_spark.plans.induce import induce_graph
from csd363_sin_spark.operators.betweenness import edge_betweenness
from pyspark.sql import functions as F

spark = get_spark(app_name=f"gather-ab-{gather}", master="local[32]",
                  shuffle_partitions=64)
spark.sparkContext.setLogLevel("ERROR")

t = synth_transcripts(spark, n_convs=convs, n_tools=64, n_clusters=8)
g = induce_graph(t, binarize=True)
g.edges.persist().count(); g.vertices.persist().count()
n_edges = g.edges.count()
g.degrees().count()  # warmup

t0 = time.time()
bet = edge_betweenness(g, k_sources=k_sources, local_edges_threshold=0,
                       gather=gather)
checksum = bet.agg(F.sum("betweenness"), F.count(F.lit(1))).collect()[0]
wall = time.time() - t0
print(json.dumps({
    "gather": gather, "edges": n_edges, "k_sources": k_sources,
    "wall_sec": round(wall, 2),
    # one BFS wave touches each traversed edge twice (fwd + back)
    "edge_visits_per_sec": round(n_edges * 2 * 2 / wall),
    "checksum": round(float(checksum[0]), 6), "rows": int(checksum[1]),
}))
spark.stop()
"""


def run_variant(gather: str, convs: int, sources: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", WORKER, gather, str(convs), str(sources)],
        capture_output=True,
        text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        timeout=3600,
    )
    lines = [line for line in out.stdout.splitlines() if line.startswith("{")]
    if not lines:
        raise RuntimeError(f"worker[{gather}] failed:\n{out.stderr[-2000:]}")
    return json.loads(lines[-1])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--convs", type=int, default=500000)
    ap.add_argument("--sources", type=int, default=48)
    args = ap.parse_args()
    join = run_variant("join", args.convs, args.sources)
    csr = run_variant("csr", args.convs, args.sources)
    result = {
        "join": join,
        "csr": csr,
        "checksum_match": abs(join["checksum"] - csr["checksum"])
        <= 1e-6 * max(1.0, abs(join["checksum"])),
        "speedup_csr_over_join": round(join["wall_sec"] / csr["wall_sec"], 3),
    }
    print(json.dumps(result, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
