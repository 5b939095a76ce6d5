"""Streaming community maintenance over the incremental edge store.

Extends the kappa-style ingest (streaming/ingest.py: streaming maintains
the sighting store, batch supersteps run on snapshots) with the
community-side surface a continuously-fed deployment needs:

* :func:`refresh_communities` — EXACT periodic refresh: snapshot the
  edge store, run the full deterministic Louvain on it, write a
  versioned assignment ``(actor, comm)`` under
  ``out_dir/version=<n>``.  Because the snapshot reader reproduces
  batch induction exactly (ingest module docstring), each refresh is
  bit-identical to running the batch pipeline on all data seen so far —
  there is no streaming-approximation gap at refresh points.
* :func:`attach_new_actors` — cheap incremental step BETWEEN refreshes:
  actors that appeared after the last refresh are attached without
  touching existing assignments, under an explicit deterministic spec:

    - a new actor with >= 1 edge to an assigned actor joins the
      community with the LARGEST total edge weight to it (the standard
      Louvain "best neighbor community" first move with the frozen
      partition); ties break toward the smallest community id;
    - a new actor with no assigned neighbor gets a fresh singleton
      community: ``max_existing_comm + dense_rank(actor)``
      (deterministic, collision-free);
    - existing actors are NEVER moved — drift between refreshes is
      bounded to the new actors, and the next refresh erases it.

  This is an *explicitly documented approximation* of a full re-run
  (the attach spec itself is exact and oracle-tested; equality with a
  full Louvain re-run is NOT claimed — that is what refresh is for).

Both steps are pure DataFrame plans (one aggregation + one window-free
top-1 via groupBy/struct-max for the attach; no per-row Python, no
driver loops), so they scale with the same shuffle profile as the
batch operators.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from csd363_sin_spark.plans.induce import graph_from_named_edges
from csd363_sin_spark.streaming.ingest import read_edge_store

ASSIGN_SCHEMA = "actor string, comm long"


def refresh_communities(
    spark: SparkSession,
    store_dir: str,
    out_dir: str,
    version: int,
    algorithm: str = "louvain",
    **louvain_kwargs,
) -> DataFrame:
    """Exact refresh: edge-store snapshot -> Louvain/Leiden -> versioned
    sink.

    Returns the written ``(actor, comm)`` assignment.  Identical to the
    batch pipeline on the same data (the snapshot reader IS the batch
    induction plan).  ``algorithm='leiden'`` swaps in the connectivity-
    guaranteed detector; ``louvain_kwargs`` pass through (weighted,
    max_levels, dispatch thresholds, ...).
    """
    if algorithm == "leiden":
        from csd363_sin_spark.operators.leiden import leiden as louvain
    else:
        from csd363_sin_spark.operators.louvain import louvain

    g = graph_from_named_edges(read_edge_store(spark, store_dir))
    res = louvain(g, **louvain_kwargs)
    named = res.assign.join(g.vertices, "vertex_id").select("actor", "comm")
    path = os.path.join(out_dir, f"version={version}")
    named.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def read_communities(spark: SparkSession, out_dir: str, version: int) -> DataFrame:
    return spark.read.parquet(os.path.join(out_dir, f"version={version}"))


def attach_new_actors(
    spark: SparkSession,
    store_dir: str,
    assign: DataFrame,
) -> DataFrame:
    """Attach actors that appeared since ``assign`` was computed.

    Returns the extended ``(actor, comm)`` assignment per the spec in
    the module docstring.  Existing rows pass through unchanged.
    """
    edges = read_edge_store(spark, store_dir)
    known = assign.select("actor")
    all_actors = (
        edges.select(F.col("src_actor").alias("actor"))
        .unionByName(edges.select(F.col("dst_actor").alias("actor")))
        .distinct()
    )
    new_actors = all_actors.join(known, "actor", "left_anti")

    # half-edges from a NEW actor to an ASSIGNED neighbor, tagged with the
    # neighbor's community
    half = edges.select(
        F.col("src_actor").alias("actor"),
        F.col("dst_actor").alias("nbr"),
        "weight",
    ).unionByName(
        edges.select(
            F.col("dst_actor").alias("actor"),
            F.col("src_actor").alias("nbr"),
            "weight",
        )
    )
    to_assigned = (
        half.join(new_actors, "actor", "left_semi")
        .join(
            assign.select(F.col("actor").alias("nbr"), F.col("comm")),
            "nbr",
        )
        .groupBy("actor", "comm")
        .agg(F.sum("weight").alias("w_to"))
    )
    # top-1 per actor without a global window: max of (w_to, -comm) struct
    # keeps the aggregation map-side-combinable (hub actors safe)
    best = (
        to_assigned.groupBy("actor")
        .agg(F.max(F.struct(F.col("w_to"), (-F.col("comm")).alias("negc"))).alias("b"))
        .select("actor", (-F.col("b.negc")).alias("comm"))
    )

    # leftovers: new actors with no assigned neighbor -> fresh singletons
    # above the current max community id, ordered by actor name via the
    # range-partitioned dense rank (no global window)
    from csd363_sin_spark.plans.ids import dense_ids

    leftover = new_actors.join(best.select("actor"), "actor", "left_anti")
    max_comm_row = assign.agg(F.max("comm")).collect()[0][0]
    base = int(max_comm_row) if max_comm_row is not None else -1
    singles = dense_ids(leftover, "actor", id_col="_r").select(
        "actor", (F.lit(base + 1) + F.col("_r")).alias("comm")
    )
    return assign.unionByName(best).unionByName(singles)


def refresh_graph_stats(spark: SparkSession, store_dir: str) -> DataFrame:
    """Exact periodic graph-health refresh over the edge-store snapshot:
    one row of degree stats + the exact triangle count — the monitoring
    surface a continuously-fed deployment polls between community
    refreshes.  Like :func:`refresh_communities`, the snapshot reader
    reproduces batch induction exactly, so each refresh equals running
    the batch analyzers on all data seen so far (split-invariant across
    micro-batch boundaries)."""
    from csd363_sin_spark.operators.degree import degree_stats
    from csd363_sin_spark.operators.triangles import triangle_count

    g = graph_from_named_edges(read_edge_store(spark, store_dir))
    tri = triangle_count(g)
    return degree_stats(g).withColumn("triangles", F.lit(int(tri)).cast("long"))
