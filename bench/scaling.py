"""Two-parallelism scaling evidence (BASELINE.json criterion).

The north rule requires >= 0.8 throughput scaling efficiency between N
and 4N executors.  No real cluster exists in this sandbox, so we run the
IDENTICAL job at two parallelism levels on the same input using Spark's
``local-cluster[K, cores, mem]`` master — which spawns K REAL executor
JVMs (separate heaps, GC, shuffle servers), the closest sandbox analogue
of an N- vs 4N-executor cluster: **2 executors x 4 cores (N=8)** vs
**8 executors x 4 cores (4N=32)**.  Efficiency =
throughput_4N / (4 * throughput_N).

(A plain ``local[8]`` vs ``local[32]`` comparison is misleading here:
all 32 threads share ONE JVM's allocator/GC/shuffle manager, which
saturates far below 32 threads — measured single-JVM efficiency was
~0.2-0.4 even for embarrassingly parallel scans, while the multi-JVM
local-cluster restores executor-style isolation.)

Each level runs in its own subprocess.  The workload is sized so compute
dominates scheduling: a synthetic transcript graph of millions of
half-edges, PageRank with a FIXED iteration count (tol=0 so both levels
do identical work), fixed Louvain supersteps, and a brute-force cosine
scan (map-side only).

Usage:  python bench/scaling.py [--convs 2000000] [--iters 6]
Writes results JSON to stdout; BENCH.md records the canonical numbers.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

WORKER = r"""
import json, sys, time
execs = int(sys.argv[1]); convs = int(sys.argv[2]); iters = int(sys.argv[3])
cores_per = 4
cores = execs * cores_per
from csd363_sin_spark.session import get_spark
from csd363_sin_spark.sources.synth import synth_transcripts
from csd363_sin_spark.plans.induce import induce_graph
from csd363_sin_spark.operators.pagerank import pagerank
from csd363_sin_spark.operators.louvain import _local_move_phase
from pyspark.sql import functions as F

import os
os.environ.setdefault("SPARK_HOME", "/opt/spark")
spark = get_spark(app_name=f"scaling-{execs}x{cores_per}",
                  master=f"local-cluster[{execs},{cores_per},6144]",
                  shuffle_partitions=cores * 2,
                  extra_conf={
                      # fixed-size comparison: AQE's post-shuffle coalescing
                      # would collapse both levels to the same few partitions
                      "spark.sql.adaptive.coalescePartitions.enabled": "false",
                      "spark.driver.memory": "8g",
                      "spark.executor.memory": "6g",
                      "spark.default.parallelism": str(cores * 2),
                  })
spark.sparkContext.setLogLevel("ERROR")

t = synth_transcripts(spark, n_convs=convs, n_tools=64, n_clusters=8)
g = induce_graph(t)
g.edges.persist().count(); g.vertices.persist().count()
n_edges = g.edges.count()

# warmup one tiny action so JIT/codegen caches are hot
g.degrees().count()

t0 = time.time()
pr = pagerank(g, max_iter=iters, tol=0.0)   # fixed work: tol 0 => all iters
pr.count()
t_pr = time.time() - t0

m = float(g.edges.agg(F.sum("weight")).collect()[0][0])
t0 = time.time()
assign, steps = _local_move_phase(
    g.edges.select("src","dst","weight"), g.vertices.select("vertex_id"), m, 4)
assign.count()
t_lv = time.time() - t0

# distributed LPA supersteps (north-rule-named operator): fixed 4
# rounds of the join+argmax kernel; deterministic, so both levels do
# identical work and the efficiency ratio is exact
from csd363_sin_spark.operators.lpa import label_propagation
t0 = time.time()
label_propagation(g, max_iterations=4, local_edges_threshold=0).count()
t_lpa = time.time() - t0

# distributed map-equation supersteps (infomap kernel) — same shape of
# evidence for the Infomap scale path
from csd363_sin_spark.operators.infomap import _infomap_move_phase
t0 = time.time()
iassign, isteps = _infomap_move_phase(
    g.edges.select("src","dst","weight"), g.vertices.select("vertex_id"), 2)
iassign.count()
t_im = time.time() - t0

# distributed SCC (trim + coloring + backward-confirm peel) on the
# directed handoff graph induced from the same transcripts; the kernel
# is deterministic, so both levels do identical supersteps
from csd363_sin_spark.plans.directed import digraph_from_named_edges, handoff_edges
from csd363_sin_spark.operators.scc import _scc_distributed
dg = digraph_from_named_edges(handoff_edges(t))
dg.edges.persist().count(); dg.vertices.persist().count()
n_dedges = dg.edges.count()
t0 = time.time()
_scc_distributed(dg).count()
t_scc = time.time() - t0

# one HyperANF radius superstep (register max-merge propagation) + the
# per-vertex estimate job — the per-superstep unit cost of the
# neighborhood-function operator
from csd363_sin_spark.operators.neighborhood import neighborhood_function
t0 = time.time()
neighborhood_function(g, max_t=1).count()
t_anf = time.time() - t0

# Boruvka MSF end-to-end (struct-min per component + CC merges over the
# geometrically-shrinking picked-pair graph); deterministic, identical
# work at both levels
from csd363_sin_spark.operators.mst import minimum_spanning_forest
t0 = time.time()
minimum_spanning_forest(g).count()
t_msf = time.time() - t0

# derandomized maximal matching end-to-end (handshake rounds over the
# named edge table; live set shrinks geometrically)
from csd363_sin_spark.plans.induce import induce_actor_edges
from csd363_sin_spark.operators.coloring import maximal_matching
enamed = induce_actor_edges(t).persist()
vnamed = enamed.selectExpr("src_actor AS actor").union(
    enamed.selectExpr("dst_actor AS actor")).distinct()
enamed.count()
t0 = time.time()
maximal_matching(vnamed, enamed).count()
t_mm = time.time() - t0

# bridge decomposition end-to-end (CC + BFS forest + subtree-sum DP +
# confirmation CC); deterministic, identical supersteps at both levels
from csd363_sin_spark.operators.bridges import bridge_decomposition
t0 = time.time()
bridge_decomposition(g, local_edges_threshold=0).bridges.count()
t_br = time.time() - t0

# Leiden refinement unit (r4 kernel): fixed local-move supersteps + one
# community-restricted connectivity refinement on the original graph;
# deterministic, identical work at both levels (local_edges_threshold 0
# forces the distributed path)
from csd363_sin_spark.operators.leiden import leiden_refine_phase
t0 = time.time()
leiden_refine_phase(g, max_supersteps=2, local_phase_edges=0).count()
t_ld = time.time() - t0

# triad census (r4/r5 kernel), degree-oriented scale path: per-center
# closed forms + degree-oriented triangle listing over the handoff
# digraph — deterministic, fan-out bounded by core number
from csd363_sin_spark.operators.triads import triad_census
t0 = time.time()
triad_census(dg, order="degree").count()
t_tc = time.time() - t0

# embarrassingly parallel workload: brute-force cosine scan (no shuffle)
from csd363_sin_spark.functions.similarity import cosine_topk
dim = 64
vecs = spark.range(2_000_000).select(
    F.col("id").alias("vec_id"),
    F.transform(F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda d: (F.pmod(F.xxhash64(F.col("id"), d), F.lit(1000003)).cast("double")
                   / 500001.5 - 1.0)).alias("embedding"),
).persist()
vecs.count()
probes = vecs.limit(4).selectExpr("vec_id as probe_id", "embedding as probe_vec")
# warmup pass: per-executor JIT/codegen of the dot-product expression is a
# fixed cost that would otherwise be billed to the measured pass
cosine_topk(vecs, probes.limit(1), k=10).count()
t0 = time.time()
cosine_topk(vecs, probes, k=10).count()
t_ann = time.time() - t0
n_vec = 2_000_000

print(json.dumps({
    "executors": execs, "cores": cores, "edges": n_edges,
    "pagerank_sec": round(t_pr, 2),
    "pagerank_edges_per_sec": round(n_edges * 2 * iters / t_pr),
    "louvain_supersteps": steps,
    "louvain_sec": round(t_lv, 2),
    "louvain_edges_per_sec": round(n_edges * 2 * steps / t_lv),
    "lpa_sec": round(t_lpa, 2),
    "lpa_edges_per_sec": round(n_edges * 2 * 4 / t_lpa),
    "infomap_supersteps": isteps,
    "infomap_sec": round(t_im, 2),
    "infomap_edges_per_sec": round(n_edges * 2 * isteps / t_im),
    "ann_sec": round(t_ann, 2),
    "ann_sims_per_sec": round(n_vec * 4 / t_ann),
    "scc_sec": round(t_scc, 2),
    "scc_edges_per_sec": round(n_dedges / t_scc),
    "hyperanf_sec": round(t_anf, 2),
    "hyperanf_reg_rows_per_sec": round(n_edges * 2 / t_anf),
    "msf_sec": round(t_msf, 2),
    "msf_edges_per_sec": round(n_edges / t_msf),
    "matching_sec": round(t_mm, 2),
    "matching_edges_per_sec": round(n_edges / t_mm),
    "bridges_sec": round(t_br, 2),
    "bridges_edges_per_sec": round(n_edges / t_br),
    "leiden_sec": round(t_ld, 2),
    "leiden_edges_per_sec": round(n_edges / t_ld),
    "triads_sec": round(t_tc, 2),
    "triads_edges_per_sec": round(n_dedges / t_tc),
}))
spark.stop()
"""


def run_level(execs: int, convs: int, iters: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", WORKER, str(execs), str(convs), str(iters)],
        capture_output=True,
        text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        timeout=3600,
    )
    lines = [line for line in out.stdout.splitlines() if line.startswith("{")]
    if not lines:
        raise RuntimeError(f"worker[{execs}] failed:\n{out.stderr[-2000:]}")
    return json.loads(lines[-1])


def _burn(n):
    x = 0
    for i in range(n):
        x += i * i
    return x


def _cpu_baseline(low: int, high: int) -> dict:
    """Pure-CPU multiprocessing scaling on the same box — the ceiling any
    JVM workload can reach here (captures turbo-frequency effects)."""
    import multiprocessing as mp
    import time

    out = {}
    for procs in (low, high):
        t0 = time.time()
        with mp.Pool(procs) as pool:
            pool.map(_burn, [3_000_000] * 128)
        out[f"procs_{procs}_sec"] = round(time.time() - t0, 2)
    out["efficiency"] = round(
        out[f"procs_{low}_sec"] / out[f"procs_{high}_sec"] / (high / low), 3
    )
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--convs", type=int, default=2000000)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--low", type=int, default=2, help="executors at N")
    ap.add_argument("--high", type=int, default=8, help="executors at 4N")
    args = ap.parse_args()

    low = run_level(args.low, args.convs, args.iters)
    high = run_level(args.high, args.convs, args.iters)
    factor = args.high / args.low
    cpu_base = _cpu_baseline(args.low * 4, args.high * 4)
    result = {
        "workload": {"convs": args.convs, "pagerank_iters": args.iters},
        "low": low,
        "high": high,
        "hardware_baseline": cpu_base,
        "efficiency": {
            "pagerank": round(
                high["pagerank_edges_per_sec"]
                / (factor * low["pagerank_edges_per_sec"]),
                3,
            ),
            "louvain": round(
                high["louvain_edges_per_sec"]
                / (factor * low["louvain_edges_per_sec"]),
                3,
            ),
            "lpa": round(
                high["lpa_edges_per_sec"] / (factor * low["lpa_edges_per_sec"]), 3
            ),
            "infomap": round(
                high["infomap_edges_per_sec"]
                / (factor * low["infomap_edges_per_sec"]),
                3,
            ),
            "ann_scan": round(
                high["ann_sims_per_sec"] / (factor * low["ann_sims_per_sec"]), 3
            ),
            "scc": round(
                high["scc_edges_per_sec"] / (factor * low["scc_edges_per_sec"]), 3
            ),
            "hyperanf": round(
                high["hyperanf_reg_rows_per_sec"]
                / (factor * low["hyperanf_reg_rows_per_sec"]),
                3,
            ),
            "msf": round(
                high["msf_edges_per_sec"] / (factor * low["msf_edges_per_sec"]), 3
            ),
            "matching": round(
                high["matching_edges_per_sec"]
                / (factor * low["matching_edges_per_sec"]),
                3,
            ),
            "bridges": round(
                high["bridges_edges_per_sec"]
                / (factor * low["bridges_edges_per_sec"]),
                3,
            ),
            "leiden": round(
                high["leiden_edges_per_sec"]
                / (factor * low["leiden_edges_per_sec"]),
                3,
            ),
            "triads": round(
                high["triads_edges_per_sec"]
                / (factor * low["triads_edges_per_sec"]),
                3,
            ),
        },
    }
    print(json.dumps(result, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
