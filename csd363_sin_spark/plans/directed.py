"""Directed handoff graph induced from transcripts.

The undirected co-occurrence graph (plans/induce.py) deliberately drops
turn ORDER; this module keeps it.  Per conversation, each turn acts as
an actor — ``tool:<tool>`` when the turn invoked a tool, else the
conversation itself (``conv:<conv_id>``) — and a directed edge records
every handoff between consecutive turns: ``src -> dst`` with weight =
number of times that handoff occurs across the corpus (self-handoffs
dropped).  The result is the directed layer the link-analysis operators
(directed PageRank, HITS, strongly connected components) run on.

The induction is a single ``lag()`` window per conversation followed by
one hash aggregation — both steps partition on ``conv_id``, so the plan
is one shuffle of the transcripts plus a map-side-combined count; no
joins, no per-row Python.  At 10^12 turns the window state per task is
one conversation's turns — bounded — and hub handoffs (two popular
tools that follow each other everywhere) collapse map-side to one
partial row per (src, dst) pair per task.

Reference scope note: the reference engine (data_io.py:71-132) is
undirected-only; this layer is a beyond-reference capability, verified
the same way (DuckDB oracle mirrors the window + aggregation exactly).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from csd363_sin_spark.plans.ids import dense_ids


@dataclass
class DiGraph:
    """Directed graph handle: plain DataFrames, no mutable state.

    ``edges`` is directed (one row per (src, dst) ordered pair, no
    self-loops); ``vertices`` maps dense long ids to actor strings.
    """

    vertices: DataFrame  # (vertex_id long, actor string)
    edges: DataFrame  # (src long, dst long, weight double)

    def reversed_edges(self) -> DataFrame:
        """The transpose view — backward traversals join against this."""
        return self.edges.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"
        )

    def out_degrees(self, weighted: bool = False) -> DataFrame:
        """(vertex_id, out_degree) for all vertices incl. sinks (0)."""
        agg = F.sum("weight") if weighted else F.count(F.lit(1)).cast("double")
        d = self.edges.groupBy(F.col("src").alias("vertex_id")).agg(
            agg.alias("out_degree")
        )
        return (
            self.vertices.select("vertex_id")
            .join(d, "vertex_id", "left")
            .fillna({"out_degree": 0.0})
        )


def handoff_actor_expr():
    """The per-turn actor: the tool if one was invoked, else the conv."""
    return F.when(
        F.col("tool").isNotNull(), F.concat(F.lit("tool:"), F.col("tool"))
    ).otherwise(F.concat(F.lit("conv:"), F.col("conv_id")))


def handoff_edges(transcripts: DataFrame) -> DataFrame:
    """Directed handoff edges keyed by actor *names*.

    Returns ``(src_actor, dst_actor, weight)`` — weight = count of
    consecutive-turn handoffs src -> dst across all conversations,
    self-handoffs excluded.  Name-keyed so it is directly comparable to
    an ANSI-SQL oracle; :func:`digraph_from_named_edges` adds dense ids.
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    seq = transcripts.select(
        "conv_id", "turn_idx", handoff_actor_expr().alias("actor")
    ).withColumn("prev_actor", F.lag("actor").over(w))
    return (
        seq.filter(
            F.col("prev_actor").isNotNull()
            & (F.col("prev_actor") != F.col("actor"))
        )
        .groupBy(
            F.col("prev_actor").alias("src_actor"),
            F.col("actor").alias("dst_actor"),
        )
        .agg(F.count(F.lit(1)).cast("double").alias("weight"))
    )


# DuckDB mirror of handoff_edges, as a CTE body over the transcripts
# adapter view ``t`` (see __spark_entry__._ORACLE_PRELUDE).
HANDOFF_EDGES_SQL = """
seq AS (
  SELECT conv_id, turn_idx,
         CASE WHEN tool IS NOT NULL THEN 'tool:' || tool
              ELSE 'conv:' || conv_id END AS actor,
         lag(CASE WHEN tool IS NOT NULL THEN 'tool:' || tool
                  ELSE 'conv:' || conv_id END)
           OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev_actor
  FROM t
),
dedges AS (
  SELECT prev_actor AS src_actor, actor AS dst_actor,
         CAST(count(*) AS DOUBLE) AS weight
  FROM seq
  WHERE prev_actor IS NOT NULL AND prev_actor <> actor
  GROUP BY 1, 2
),
dverts AS (
  SELECT DISTINCT src_actor AS actor FROM dedges
  UNION
  SELECT DISTINCT dst_actor FROM dedges
)
"""


def digraph_from_named_edges(named_edges: DataFrame) -> DiGraph:
    """(src_actor, dst_actor, weight) -> DiGraph with dense ids.

    Vertex set = every actor appearing as an endpoint (no isolates by
    construction).  Ids are key-order dense (plans/ids.py), so the
    smallest id is the lexicographically smallest actor — canonical
    labels derived from min-id match min-actor-name oracles.
    """
    actors = (
        named_edges.select(F.col("src_actor").alias("actor"))
        .unionByName(named_edges.select(F.col("dst_actor").alias("actor")))
        .distinct()
    )
    vertices = dense_ids(actors, "actor").select("vertex_id", "actor")
    v_src = vertices.select(
        F.col("actor").alias("src_actor"), F.col("vertex_id").alias("src")
    )
    v_dst = vertices.select(
        F.col("actor").alias("dst_actor"), F.col("vertex_id").alias("dst")
    )
    edges = (
        named_edges.join(v_src, "src_actor")
        .join(v_dst, "dst_actor")
        .select("src", "dst", "weight")
    )
    return DiGraph(vertices=vertices, edges=edges)


def digraph_from_edges(spark, edge_rows, weights=None) -> DiGraph:
    """Build a DiGraph from explicit (u, v) pairs — test fixture helper."""
    rows = []
    seen = set()
    for i, (u, v) in enumerate(edge_rows):
        if u == v or (u, v) in seen:
            continue
        seen.add((u, v))
        w = 1.0 if weights is None else float(weights[i])
        rows.append((int(u), int(v), w))
    edges = spark.createDataFrame(rows, "src long, dst long, weight double")
    verts = sorted({u for u, v, _ in rows} | {v for u, v, _ in rows})
    vertices = spark.createDataFrame(
        [(int(x), f"v:{x}") for x in verts], "vertex_id long, actor string"
    )
    return DiGraph(vertices=vertices, edges=edges)


def directed_degree_stats(dg: DiGraph) -> DataFrame:
    """One-row profile of a directed graph: vertex/edge counts,
    reciprocity (fraction of directed edges whose reverse also exists),
    max in/out degree, and the source (in-degree 0) / sink (out-degree
    0) counts.  Three hash aggregations plus one self-join probe for
    reciprocity — all exact integer/ratio math, SQL-mirrorable."""
    e = dg.edges.select("src", "dst").distinct()
    m = e.count()
    n = dg.vertices.count()
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    recip = e.join(rev, ["src", "dst"], "left_semi").count()
    outs = e.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    ins = e.groupBy("dst").agg(F.count(F.lit(1)).alias("d"))
    max_out = outs.agg(F.max("d")).collect()[0][0] or 0
    max_in = ins.agg(F.max("d")).collect()[0][0] or 0
    sinks = n - outs.count()
    sources = n - ins.count()
    spark = dg.edges.sparkSession
    return spark.createDataFrame(
        [
            (
                int(n),
                int(m),
                float(recip) / m if m else 0.0,
                int(max_in),
                int(max_out),
                int(sources),
                int(sinks),
            )
        ],
        "num_vertices long, num_edges long, reciprocity double, "
        "max_in_degree long, max_out_degree long, sources long, sinks long",
    )


def actor_type_mixing(edges_named: DataFrame) -> DataFrame:
    """Edge mixing matrix by actor type (the ``conv:``/``tool:`` prefix):
    ``(type_a, type_b, edges, weight)`` with the type pair canonicalized
    (type_a <= type_b) plus each cell's fraction of all edges — the
    attribute-assortativity summary for the bipartite-leaning
    co-occurrence graph.  One map-side-combined aggregation."""
    ty = lambda c: F.split(F.col(c), ":").getItem(0)  # noqa: E731
    typed = edges_named.select(
        F.least(ty("src_actor"), ty("dst_actor")).alias("type_a"),
        F.greatest(ty("src_actor"), ty("dst_actor")).alias("type_b"),
        "weight",
    )
    agg = typed.groupBy("type_a", "type_b").agg(
        F.count(F.lit(1)).alias("edges"), F.sum("weight").alias("weight")
    )
    total = agg.agg(F.sum("edges").alias("total"))
    return agg.crossJoin(total).select(
        "type_a",
        "type_b",
        "edges",
        "weight",
        F.round(F.col("edges") / F.col("total"), 6).alias("edge_frac"),
    )
