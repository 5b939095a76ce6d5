"""Per-step tracking and algorithm comparison (SURVEY M7, M9, M11).

Mirrors the reference's ``track_algorithm_metrics`` (evaluation.py:291-366)
and ``compare_algorithms`` / ``calculate_improvement``
(evaluation.py:561-687): small driver-side loops over distributed metric
aggregations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from csd363_sin_spark.functions.metrics import evaluate_all
from csd363_sin_spark.plans.induce import Graph


def track_algorithm_metrics(
    graph: Graph,
    step_assigns: list[DataFrame],
    ground_truth: DataFrame | None = None,
    algorithm_type: str | None = None,
    weighted: bool = False,
) -> dict:
    """Metrics for each intermediate partition of an iterative run
    (reference evaluation.py:291-366): per step — community count,
    modularity, conductance, coverage; plus description length for
    infomap and NMI when ground truth exists."""
    steps = []
    for assign in step_assigns:
        m = evaluate_all(
            graph, assign, ground_truth, algorithm_type=algorithm_type,
            weighted=weighted,
        )
        steps.append(
            {
                "num_communities": m["num_communities"],
                "modularity": m["modularity"],
                "avg_conductance": m["avg_conductance"],
                "coverage": m["coverage"],
                **(
                    {"description_length": m["description_length"]}
                    if "description_length" in m
                    else {}
                ),
                **({"nmi": m["nmi"]} if m.get("nmi") is not None else {}),
            }
        )
    return {"algorithm": algorithm_type, "steps": steps, "num_steps": len(steps)}


def calculate_improvement(before: dict, after: dict) -> dict:
    """Stage-delta bookkeeping (reference evaluation.py:671-687,
    __main__.py:742-745): modularity up is good, conductance down is
    good."""
    out = {
        "modularity": after["modularity"] - before["modularity"],
        "conductance": before["avg_conductance"] - after["avg_conductance"],
    }
    if before.get("nmi") is not None and after.get("nmi") is not None:
        out["nmi"] = after["nmi"] - before["nmi"]
    return out


def compare_algorithms(
    graph: Graph,
    assigns: dict[str, DataFrame],
    ground_truth: DataFrame | None = None,
    weighted: bool = False,
) -> dict:
    """Evaluate several partitions and pick the best per metric
    (reference evaluation.py:561-669)."""
    table = {
        name: evaluate_all(graph, assign, ground_truth, weighted=weighted)
        for name, assign in assigns.items()
    }
    best = {}
    if table:
        best["modularity"] = max(table, key=lambda n: table[n]["modularity"])
        best["avg_conductance"] = min(table, key=lambda n: table[n]["avg_conductance"])
        best["coverage"] = max(table, key=lambda n: table[n]["coverage"])
        if all(v.get("nmi") is not None for v in table.values()):
            best["nmi"] = max(table, key=lambda n: table[n]["nmi"])
    return {"metrics": table, "best": best}
