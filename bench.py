"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Also reports edges/sec for the iterative operators (the BASELINE.json
throughput metric) under "extra".  Two-parallelism scaling evidence is
produced by bench/scaling.py (separate process per parallelism level) and
recorded in BENCH.md.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(sf_dir.rstrip("/").split("sf")[-1]) if "sf" in sf_dir else -1.0

    from csd363_sin_spark.session import get_spark

    spark = get_spark(
        app_name="csd363-sin-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    # session warm-up (NOT timed): run the induce plan once at sf0.001 so
    # the first timed row doesn't pay one-time session costs (codegen/JIT
    # of the induction plan shapes) — the same fix that removed the ANN
    # first-run anomaly; BENCH.md documents the variance this removes.
    entrymod._graph(spark, "/root/testdata/sf0.001").edges.count()

    timings: dict[str, float] = {}
    t_all = time.time()

    def timed(name, fn):
        t0 = time.time()
        out = fn()
        timings[name] = round(time.time() - t0, 3)
        return out

    # graph build (shared, cached by the entry module)
    g = timed("induce_graph", lambda: entrymod._graph(spark, sf_dir))
    n_edges = g.edges.count()

    from csd363_sin_spark.functions.metrics import evaluate_all
    from csd363_sin_spark.operators.components import connected_components
    from csd363_sin_spark.operators.pagerank import pagerank
    from csd363_sin_spark.operators.triangles import triangle_count

    timed("degree_stats", lambda: entrymod.q_degree_stats(spark, sf_dir).collect())
    comp = timed("connected_components", lambda: connected_components(g).persist())
    timed("components_count", lambda: comp.groupBy("comp_id").count().count())
    timed("triangle_count", lambda: triangle_count(g))
    pr = timed("pagerank", lambda: pagerank(g, weighted=True))
    timed("pagerank_collect_top", lambda: pr.orderBy("rank", ascending=False).limit(10).collect())

    from csd363_sin_spark.operators.lpa import label_propagation

    timed(
        "label_propagation",
        lambda: label_propagation(g, max_iterations=10)
        .groupBy("label").count().count(),
    )

    # fixed-partition metric bundle (one shared aggregation pattern)
    from pyspark.sql import functions as F

    assign = g.vertices.select(
        "vertex_id",
        F.pmod(F.length("actor"), F.lit(8)).cast("long").alias("comm"),
    )
    timed("evaluate_all", lambda: evaluate_all(g, assign))

    from csd363_sin_spark.operators.infomap import enhance_infomap
    from csd363_sin_spark.operators.louvain import louvain

    res = timed("louvain", lambda: louvain(g))
    louvain_assign = res.assign.persist()
    louvain_assign.count()
    from csd363_sin_spark.operators.leiden import leiden

    timed("leiden", lambda: leiden(g).assign.count())
    timed(
        "infomap_enhance",
        lambda: enhance_infomap(
            g, louvain_assign, modularity_threshold=0.3, min_size=10
        ).count(),
    )

    # training-data pipeline ops over documents/embeddings
    from csd363_sin_spark.functions.dedup import minhash_lsh_pairs, simhash_near_pairs
    from csd363_sin_spark.functions.similarity import cosine_topk
    from csd363_sin_spark.functions.text import language_id, quality_score

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").persist()
    docs.count()
    timed("doc_language_id", lambda: language_id(docs).count())
    timed("doc_quality", lambda: quality_score(docs).count())
    timed("minhash_lsh_dups", lambda: minhash_lsh_pairs(docs, n=3, threshold=0.5).count())
    timed("simhash_dups", lambda: simhash_near_pairs(docs, max_hamming=3).count())
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").persist()
    emb.count()
    probes = emb.limit(8).selectExpr("vec_id as probe_id", "embedding as probe_vec")
    timed("embedding_topk", lambda: cosine_topk(emb, probes, k=10).count())

    total = round(time.time() - t_all, 3)

    # ---- round-3 additions (NOT in the headline total, which stays
    # apples-to-apples with earlier rounds): new graph + pipeline ops.
    from csd363_sin_spark.functions.sampling import hash_bucket, stratified_sample
    from csd363_sin_spark.functions.dedup import contamination_check
    from csd363_sin_spark.functions.text import tfidf_top_terms, unigram_lm_score
    from csd363_sin_spark.operators.bfs import diameter_double_sweep, landmark_distances
    from csd363_sin_spark.operators.eigenvector import eigenvector_centrality
    from csd363_sin_spark.operators.ktruss import truss_number

    timed("tfidf_top_terms", lambda: tfidf_top_terms(docs, k=3).count())
    timed("doc_unigram_lm", lambda: unigram_lm_score(docs).count())
    timed(
        "stratified_sample",
        lambda: stratified_sample(docs, {}, default_permille=500).count(),
    )
    bench_docs = docs.filter(hash_bucket(F.col("doc_id"), "bench", 20) == 0)
    timed(
        "contamination_check",
        lambda: contamination_check(docs, bench_docs, n=3).count(),
    )
    timed("bfs_landmarks", lambda: landmark_distances(g, 4, 8).count())
    timed("diameter_double_sweep", lambda: diameter_double_sweep(g).collect())
    timed(
        "eigencentrality",
        lambda: eigenvector_centrality(g, max_iter=8, tol=0.0).count(),
    )
    timed("truss_number", lambda: truss_number(g).groupBy("truss").count().count())

    # ---- late-round-3 additions (also NOT in the headline total):
    # directed layer, sketches, embedding prep, composed quality filter.
    from csd363_sin_spark.functions.text import quality_filter
    from csd363_sin_spark.operators.directed_rank import hits, pagerank_directed
    from csd363_sin_spark.operators.neighborhood import neighborhood_function
    from csd363_sin_spark.operators.scc import strongly_connected_components
    from csd363_sin_spark.operators.triangles import square_total
    from csd363_sin_spark.operators.walks import node2vec_walks

    dg = timed("handoff_digraph", lambda: entrymod._digraph(spark, sf_dir))
    timed(
        "scc",
        lambda: strongly_connected_components(dg)
        .groupBy("scc_id").count().count(),
    )
    timed("pagerank_directed", lambda: pagerank_directed(dg).count())
    timed("hits", lambda: hits(dg, iterations=8).count())
    from csd363_sin_spark.operators.triads import triad_census

    timed("triad_census", lambda: triad_census(dg).collect())
    timed("hyperanf_t2", lambda: neighborhood_function(g, max_t=2).count())
    timed("square_total", lambda: square_total(g).collect())
    # the degree-oriented scale path (order-invariant count; BENCH.md
    # r5 A/B) measured alongside the oracle-verbatim default
    timed(
        "square_total_degree",
        lambda: square_total(g, order="degree").collect(),
    )
    timed(
        "node2vec_walks",
        # production hash family: one hash per (walk, neighbor) candidate
        # is the step's hot cost; md5 is the oracle-portable gate mode
        lambda: node2vec_walks(
            entrymod._named_edges(spark, sf_dir), walk_length=4,
            hash_mode="xxhash64",
        ).count(),
    )
    timed("quality_filter", lambda: quality_filter(docs).count())
    from csd363_sin_spark.functions.dedup import repeated_spans
    from csd363_sin_spark.functions.sampling import pack_sequences

    timed(
        "repeated_spans",
        # production hash family; the md5 family is the oracle gate mode
        lambda: repeated_spans(docs, k=6, hash_mode="xxhash64").count(),
    )
    timed(
        "pack_sequences",
        lambda: pack_sequences(docs, seq_tokens=512, shuffle_salt="s").count(),
    )
    timed(
        "hll_tool_reach",
        lambda: entrymod.q_hll_tool_reach(spark, sf_dir).count(),
    )
    from csd363_sin_spark.operators.bridges import bridge_decomposition

    timed("bridges", lambda: bridge_decomposition(g).bridges.count())
    from csd363_sin_spark.operators.biconnectivity import bcc_decomposition

    timed(
        "biconnected",
        lambda: bcc_decomposition(g).blocks.groupBy("bcc_src", "bcc_dst")
        .count().count(),
    )
    from csd363_sin_spark.operators.nibble import pagerank_nibble
    from csd363_sin_spark.operators.percolation import clique_percolation
    from csd363_sin_spark.operators.lpa import label_spreading
    from csd363_sin_spark.functions.dedup import winnow_near_pairs
    from csd363_sin_spark.functions.similarity import pq_topk

    seeds1 = g.vertices.orderBy("vertex_id").limit(1).select("vertex_id")
    timed(
        "pagerank_nibble",
        lambda: pagerank_nibble(g, seeds1, top_m=64).community.count(),
    )
    timed(
        "clique_percolation",
        lambda: clique_percolation(g).groupBy("com_a", "com_b", "com_c")
        .count().count(),
    )
    seed_lbl = g.vertices.filter(F.col("kind") == "tool").select(
        "vertex_id",
        F.pmod(F.ascii(F.substring(F.col("actor"), -1, 1)), F.lit(3))
        .cast("long").alias("label"),
    )
    timed(
        "label_spreading",
        lambda: label_spreading(g, seed_lbl, max_iterations=8).count(),
    )
    timed(
        "winnow_near_dups",
        # production hash family; md5 is the oracle-portable gate mode
        lambda: winnow_near_pairs(
            docs, k=5, w=8, threshold=0.3, hash_mode="xxhash64"
        ).count(),
    )
    timed(
        "pq_topk",
        # wall here is dominated by one-time codegen of the m x n_codes
        # literal-distance expressions — a per-PLAN cost that amortizes
        # at scale (per-row work is m code lookups)
        lambda: pq_topk(emb, probes, dim=64, k=10, m=8, n_codes=16, iters=2).count(),
    )

    # ---- forced-distributed section (NOT in the headline total, which
    # stays apples-to-apples with earlier rounds): the same iterative
    # operators with the driver-side adaptive dispatch disabled, so each
    # round's BENCH json measures the distributed kernels a 100x-scale
    # run would use.  Timings appear in "queries" with a dist_ prefix and
    # throughputs under extra.dist.
    comp.unpersist()
    dist: dict[str, float] = {}

    def timed_dist(name, fn):
        t0 = time.time()
        out = fn()
        dist[name] = round(time.time() - t0, 3)
        return out

    from csd363_sin_spark.operators.betweenness import edge_betweenness

    timed_dist(
        "dist_connected_components",
        lambda: connected_components(g, local_edges_threshold=0)
        .groupBy("comp_id").count().count(),
    )
    timed_dist(
        "dist_pagerank",
        lambda: pagerank(g, weighted=True, local_edges_threshold=0).count(),
    )
    timed_dist(
        "dist_label_propagation",
        lambda: label_propagation(g, max_iterations=10, local_edges_threshold=0)
        .groupBy("label").count().count(),
    )
    res_d = timed_dist("dist_louvain", lambda: louvain(g, local_phase_edges=0))
    from csd363_sin_spark.operators.infomap import infomap_distributed

    timed_dist(
        "dist_infomap_full",
        lambda: infomap_distributed(g, max_levels=3)[0].count(),
    )
    timed_dist(
        "dist_betweenness_topk",
        lambda: edge_betweenness(g, k_sources=64, local_edges_threshold=0)
        .orderBy(F.desc("betweenness")).limit(20).collect(),
    )
    timed_dist(
        "dist_bfs_landmarks",
        lambda: landmark_distances(g, 4, 8, local_edges_threshold=0).count(),
    )
    timed_dist(
        "dist_eigencentrality",
        lambda: eigenvector_centrality(
            g, max_iter=8, tol=0.0, local_edges_threshold=0
        ).count(),
    )
    timed_dist(
        "dist_bridges",
        lambda: bridge_decomposition(g, local_edges_threshold=0).bridges.count(),
    )
    timed_dist(
        "dist_biconnected",
        lambda: bcc_decomposition(g, local_edges_threshold=0)
        .blocks.groupBy("bcc_src", "bcc_dst").count().count(),
    )
    timings.update(dist)
    dist_louvain_eps = (
        n_edges * 2 * max(1, res_d.supersteps) / dist["dist_louvain"]
        if dist.get("dist_louvain")
        else 0
    )

    pr_eps = n_edges * 2 / timings["pagerank"] if timings.get("pagerank") else 0
    louvain_eps = (
        n_edges * 2 * max(1, res.supersteps) / timings["louvain"]
        if timings.get("louvain")
        else 0
    )
    print(
        json.dumps(
            {
                "metric": "graph_pipeline_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "extra": {
                    "edges": n_edges,
                    "pagerank_edges_per_sec": round(pr_eps),
                    "louvain_superstep_edges_per_sec": round(louvain_eps),
                    "louvain_modularity": round(res.modularity, 4),
                    "louvain_supersteps": res.supersteps,
                    "cpus": int(cpus),
                    "dist": {
                        "wall": round(sum(dist.values()), 3),
                        "louvain_superstep_edges_per_sec": round(dist_louvain_eps),
                        "louvain_supersteps": res_d.supersteps,
                        "louvain_modularity": round(res_d.modularity, 4),
                    },
                },
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
