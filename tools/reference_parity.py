"""Run the engine on the REFERENCE'S OWN data and compare quality.

The reference repo ships LiveJournal prefix samples
(/root/reference/data/livejournal_{10000,40000,50000,100000}.pkl as
pickled networkx graphs, plus edge_file.txt).  This script loads one
(read-only), runs our pipeline stages with the reference's config
(size_threshold=5000, modularity_threshold=0.3, fast_mode), and reports
stage metrics side by side with a networkx-Louvain quality anchor on the
same graph.

Usage: python tools/reference_parity.py [pkl_size: 10000|40000|50000|100000]
       python tools/reference_parity.py SIZE leiden
           — stage-level Louvain-vs-Leiden comparison on the same sample:
             both base algorithms run on the reference graph, Leiden's
             output is additionally checked for the property Louvain does
             not guarantee (every community internally connected), and
             both are reported against the networkx-Louvain anchor.
"""

from __future__ import annotations

import json
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    size = sys.argv[1] if len(sys.argv) > 1 else "10000"
    path = f"/root/reference/data/livejournal_{size}.pkl"

    import networkx as nx

    with open(path, "rb") as f:
        nxg = pickle.load(f)
    print(f"reference sample: {nxg.number_of_nodes()} nodes, "
          f"{nxg.number_of_edges()} edges", flush=True)

    from csd363_sin_spark.pipeline import PipelineConfig, run_pipeline
    from csd363_sin_spark.plans.induce import Graph
    from csd363_sin_spark.session import get_spark

    spark = get_spark(app_name="reference-parity",
                      master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
    spark.sparkContext.setLogLevel("ERROR")

    edges = spark.createDataFrame(
        [(int(u), int(v), 1.0) if u < v else (int(v), int(u), 1.0)
         for u, v in nxg.edges() if u != v],
        "src long, dst long, weight double",
    ).distinct()
    vertices = spark.createDataFrame(
        [(int(v), str(v), "v") for v in nxg.nodes()],
        "vertex_id long, actor string, kind string",
    )
    graph = Graph(vertices=vertices, edges=edges)

    if len(sys.argv) > 2 and sys.argv[2] == "leiden":
        return _leiden_mode(spark, graph, nxg, size)

    t0 = time.time()
    out = run_pipeline(
        graph,
        config=PipelineConfig(
            size_threshold=5000,
            modularity_threshold=0.3,
            fast_mode=True,
            weighted=False,
            gn_betweenness_sources=256,
        ),
    )
    wall = time.time() - t0

    nx_t0 = time.time()
    nx_comms = nx.community.louvain_communities(nxg, seed=42)
    nx_q = nx.community.modularity(nxg, nx_comms)
    nx_t = time.time() - nx_t0

    report = {
        "sample": size,
        "nodes": out["graph_analysis"]["num_nodes"],
        "edges": out["graph_analysis"]["num_edges"],
        "components": out["graph_analysis"].get("num_components"),
        "stages": {
            s: {
                "communities": out[s]["num_communities"],
                "modularity": round(out[s]["modularity"], 4),
                "conductance": round(out[s]["avg_conductance"], 4),
                **(
                    {"description_length": round(out[s]["description_length"], 4)}
                    if "description_length" in out[s]
                    else {}
                ),
                "runtime_sec": round(out[s].get("runtime", 0.0), 1),
            }
            for s in ("louvain", "girvan_newman", "infomap")
        },
        "networkx_louvain_anchor": {
            "communities": len(nx_comms),
            "modularity": round(nx_q, 4),
            "runtime_sec": round(nx_t, 1),
        },
        "pipeline_wall_sec": round(wall, 1),
    }
    print(json.dumps(report, indent=2))
    return 0


def _leiden_mode(spark, graph, nxg, size: str) -> int:
    """Louvain vs Leiden, stage level, on the reference sample
    (VERDICT r5 item 5): quality + community-connectivity evidence."""
    import time

    import networkx as nx
    from pyspark.sql import functions as F

    from csd363_sin_spark.functions.metrics import modularity
    from csd363_sin_spark.operators.leiden import _connected_parts, leiden
    from csd363_sin_spark.operators.louvain import louvain

    graph.edges.persist().count()
    graph.vertices.persist().count()

    def _connectivity(assign):
        parts = _connected_parts(
            graph.edges.select("src", "dst", F.lit(1.0).alias("weight")),
            graph.vertices.select("vertex_id"),
            assign,
            100_000,
        )
        joined = assign.join(parts, "vertex_id")
        n_comm = joined.select("comm").distinct().count()
        n_parts = joined.select("comm", "part").distinct().count()
        return n_comm, n_parts

    report = {"sample": size, "mode": "leiden_vs_louvain"}
    for name, fn in (("louvain", louvain), ("leiden", leiden)):
        t0 = time.time()
        res = fn(graph, weighted=False)
        assign = res.assign.persist()
        q = modularity(graph, assign, weighted=False)
        n_comm, n_parts = _connectivity(assign)
        report[name] = {
            "communities": n_comm,
            "modularity": round(q, 4),
            "connected_parts": n_parts,
            "all_communities_connected": n_comm == n_parts,
            "levels": res.levels,
            "runtime_sec": round(time.time() - t0, 1),
        }
    nx_t0 = time.time()
    nx_comms = nx.community.louvain_communities(nxg, seed=42)
    report["networkx_louvain_anchor"] = {
        "communities": len(nx_comms),
        "modularity": round(nx.community.modularity(nxg, nx_comms), 4),
        "runtime_sec": round(time.time() - nx_t0, 1),
    }
    print(json.dumps(report, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
