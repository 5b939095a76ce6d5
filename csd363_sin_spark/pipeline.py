"""Hybrid pipeline: Louvain -> GN refinement -> Infomap enhancement.

Replaces the reference's ``main()`` orchestration (__main__.py:559-878):
graph analysis, baseline evaluation, three detection stages with the
reference's skip heuristics and stage-delta bookkeeping, metric bundles
per stage.  Every stage boundary (and each Louvain level) is checkpointed
via :class:`csd363_sin_spark.checkpoint.CheckpointStore`, so a killed run
resumes where it stopped.

Heuristics mirrored from the reference:
* skip GN when (fast_mode and n > 50000) or #components > 5000, if
  Louvain modularity > 0.9 (__main__.py:698-716);
* adaptive GN max_iterations 20/50/100 by graph size (__main__.py:720-727);
* Infomap low-modularity screen with threshold (detection.py:171-191).
"""

from __future__ import annotations

import time
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from csd363_sin_spark.checkpoint import CheckpointStore
from csd363_sin_spark.functions.metrics import evaluate_all
from csd363_sin_spark.operators.components import connected_components
from csd363_sin_spark.operators.degree import analyze_graph
from csd363_sin_spark.operators.gn import refine_girvan_newman
from csd363_sin_spark.operators.infomap import enhance_infomap
from csd363_sin_spark.operators.louvain import louvain
from csd363_sin_spark.plans.induce import Graph


@dataclass
class PipelineConfig:
    """Mirrors the reference config surface (config.yaml:1-23 +
    __main__.py argparse defaults)."""

    size_threshold: int = 5000
    target_subcommunities: int = 5
    modularity_threshold: float = 0.3
    max_iterations: int | None = None
    fast_mode: bool = True
    infomap_min_size: int = 10
    infomap_trials: int = 1
    weighted: bool = True
    gn_betweenness_sources: int | None = None
    # adaptive-dispatch knobs (engine additions): graphs at or below
    # local_edges_threshold edges run refine/enhance driver-side with
    # identical output; communities above dispatch_threshold members
    # route through the distributed GN/Infomap kernels
    dispatch_threshold: int = 10_000
    local_edges_threshold: int = 100_000
    # base detector for stage 1 (engine addition): "louvain" mirrors the
    # reference exactly; "leiden" swaps in the connectivity-guaranteed
    # variant (operators/leiden.py) with the same store/resume contract
    base_algorithm: str = "louvain"
    # reliable checkpointing: when set (and no explicit store is passed to
    # run_pipeline), a CheckpointStore is created over this directory and
    # threaded through Louvain levels AND each huge-community GN/Infomap
    # kernel run.  Store snapshots are parquet round-trips, so they are
    # reliable by construction — a run killed mid-algorithm (even by
    # losing the whole session/executors) resumes from the newest snapshot
    # in a FRESH session: tests/test_pipeline_resume_fresh_session.py.
    checkpoint_dir: str | None = None


def _stage_assign(store, spark, stage):
    key = f"{stage}_assign"
    if store is not None and store.has_df(key) and store.has_meta(f"{stage}_done"):
        return store.load_df(spark, key)
    return None


def _finish_stage(store, stage, assign, metrics):
    if store is not None:
        store.save_df(f"{stage}_assign", assign)
        store.save_meta(f"{stage}_done", {"done": True})
        store.metrics(stage, metrics)
        store.lineage(stage, -1, assign)


def run_pipeline(
    graph: Graph,
    ground_truth: DataFrame | None = None,
    config: PipelineConfig | None = None,
    store: CheckpointStore | None = None,
) -> dict:
    """Run the full hybrid pipeline; returns the metrics dict (the final
    assignment is under ``"final_assign"`` as a DataFrame)."""
    cfg = config or PipelineConfig()
    spark = graph.edges.sparkSession
    if store is None and cfg.checkpoint_dir is not None:
        store = CheckpointStore(cfg.checkpoint_dir)
    t0 = time.time()
    out: dict = {}

    graph.edges.persist().count()
    graph.vertices.persist().count()

    comp = connected_components(graph).persist()
    analysis = analyze_graph(graph, comp)
    out["graph_analysis"] = analysis

    # baseline: everything in one community (reference __main__.py:668-676)
    baseline_assign = graph.vertices.select(
        "vertex_id", F.lit(0).cast("long").alias("comm")
    )
    out["baseline"] = evaluate_all(
        graph, baseline_assign, ground_truth, weighted=cfg.weighted
    )

    # --- stage 1: Louvain (or Leiden, per config) ----------------------------
    t = time.time()
    cached = _stage_assign(store, spark, "louvain")
    if cached is not None:
        louvain_assign = cached
        out["louvain"] = store.load_meta("louvain_metrics")
    else:
        if cfg.base_algorithm == "leiden":
            from csd363_sin_spark.operators.leiden import leiden

            res = leiden(graph, weighted=cfg.weighted, store=store)
        else:
            res = louvain(graph, weighted=cfg.weighted, store=store)
        louvain_assign = res.assign.persist()
        m = evaluate_all(graph, louvain_assign, ground_truth, weighted=cfg.weighted)
        m["runtime"] = time.time() - t
        m["levels"] = res.levels
        m["supersteps"] = res.supersteps
        out["louvain"] = m
        _finish_stage(store, "louvain", louvain_assign, m)
        if store is not None:
            store.save_meta("louvain_metrics", m)

    # --- stage 2: Girvan-Newman refinement -----------------------------------
    t = time.time()
    skip_gn = False
    if (cfg.fast_mode and analysis["num_nodes"] > 50000) or analysis.get(
        "num_components", 0
    ) > 5000:
        if out["louvain"]["modularity"] > 0.9:
            skip_gn = True

    cached = _stage_assign(store, spark, "gn")
    if cached is not None:
        gn_assign = cached
        out["girvan_newman"] = store.load_meta("gn_metrics")
    elif skip_gn:
        gn_assign = louvain_assign
        m = dict(out["louvain"])
        m["skipped"] = True
        m["runtime"] = 0.0
        out["girvan_newman"] = m
        _finish_stage(store, "gn", gn_assign, m)
        if store is not None:
            store.save_meta("gn_metrics", m)
    else:
        max_iter = cfg.max_iterations
        if max_iter is None:
            n = analysis["num_nodes"]
            max_iter = 20 if n > 50000 else (50 if n > 10000 else 100)
        gn_assign = refine_girvan_newman(
            graph,
            louvain_assign,
            size_threshold=cfg.size_threshold,
            target_subcommunities=cfg.target_subcommunities,
            max_iterations=max_iter,
            betweenness_sources=cfg.gn_betweenness_sources,
            dispatch_threshold=cfg.dispatch_threshold,
            local_edges_threshold=cfg.local_edges_threshold,
            store=store,
        ).persist()
        m = evaluate_all(
            graph, gn_assign, ground_truth, algorithm_type="girvan_newman",
            weighted=cfg.weighted,
        )
        m["runtime"] = time.time() - t
        m["improvement_from_louvain"] = {
            "modularity": m["modularity"] - out["louvain"]["modularity"],
            "conductance": out["louvain"]["avg_conductance"] - m["avg_conductance"],
        }
        out["girvan_newman"] = m
        _finish_stage(store, "gn", gn_assign, m)
        if store is not None:
            store.save_meta("gn_metrics", m)

    # --- stage 3: Infomap enhancement ----------------------------------------
    t = time.time()
    cached = _stage_assign(store, spark, "infomap")
    if cached is not None:
        final_assign = cached
        out["infomap"] = store.load_meta("infomap_metrics")
    else:
        final_assign = enhance_infomap(
            graph,
            gn_assign,
            modularity_threshold=cfg.modularity_threshold,
            min_size=cfg.infomap_min_size,
            num_trials=cfg.infomap_trials,
            dispatch_threshold=cfg.dispatch_threshold,
            local_edges_threshold=cfg.local_edges_threshold,
            store=store,
        ).persist()
        m = evaluate_all(
            graph, final_assign, ground_truth, algorithm_type="infomap",
            weighted=cfg.weighted,
        )
        m["runtime"] = time.time() - t
        m["improvement_from_gn"] = {
            "modularity": m["modularity"] - out["girvan_newman"]["modularity"],
            "conductance": out["girvan_newman"]["avg_conductance"] - m["avg_conductance"],
        }
        out["infomap"] = m
        _finish_stage(store, "infomap", final_assign, m)
        if store is not None:
            store.save_meta("infomap_metrics", m)

    out["summary"] = {
        "total_runtime": time.time() - t0,
        "nodes": analysis["num_nodes"],
        "edges": analysis["num_edges"],
        "final_communities": out["infomap"]["num_communities"],
        "total_improvement": {
            "modularity": out["infomap"]["modularity"] - out["baseline"]["modularity"],
            "conductance": out["baseline"]["avg_conductance"]
            - out["infomap"]["avg_conductance"],
        },
    }
    out["final_assign"] = final_assign
    if store is not None:
        store.metrics("summary", out["summary"])
    comp.unpersist()
    return out
