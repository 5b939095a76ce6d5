"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes the engine's operators over the driver-provided
parquet tables; ``oracle_sql()`` gives DuckDB-equivalent ANSI SQL for the
SQL-expressible ones (the driver compares row counts + schema + value
hashes at sf=0.01).  Graph queries run over a deterministic transcripts
table derived from the ``events`` parquet (see
csd363_sin_spark/sources/transcripts.py — the SQL adapter mirrors the
Spark adapter 1:1), then induce the actor co-occurrence graph.

Floating-point columns are rounded to 6 decimals on BOTH sides so the
order-insensitive value hash is stable across engines.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from csd363_sin_spark.plans.induce import Graph, induce_graph
from csd363_sin_spark.sources.transcripts import (
    TRANSCRIPTS_FROM_EVENTS_SQL,
    transcripts_from_events,
)

# ---------------------------------------------------------------------------
# shared plumbing
# ---------------------------------------------------------------------------

_GRAPH_CACHE: dict[str, Graph] = {}


def _graph(spark: SparkSession, sf_dir: str) -> Graph:
    """Induced co-occurrence graph for a testdata dir (cached + persisted)."""
    if sf_dir not in _GRAPH_CACHE:
        events = spark.read.parquet(f"{sf_dir}/events.parquet")
        g = induce_graph(transcripts_from_events(events))
        g.vertices.persist().count()
        g.edges.persist().count()
        _GRAPH_CACHE[sf_dir] = g
    return _GRAPH_CACHE[sf_dir]


def _named_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edges keyed by actor names (comparable to the SQL oracle)."""
    g = _graph(spark, sf_dir)
    va = g.vertices.select(F.col("vertex_id").alias("src"), F.col("actor").alias("src_actor"))
    vb = g.vertices.select(F.col("vertex_id").alias("dst"), F.col("actor").alias("dst_actor"))
    return (
        g.edges.join(va, "src")
        .join(vb, "dst")
        .select(
            F.least("src_actor", "dst_actor").alias("src_actor"),
            F.greatest("src_actor", "dst_actor").alias("dst_actor"),
            "weight",
        )
    )


# The oracle prelude: transcripts adapter -> actor edges, shared by every
# graph oracle.  Mirrors induce_actor_edges() exactly.
_ORACLE_PRELUDE = f"""
WITH t AS ({TRANSCRIPTS_FROM_EVENTS_SQL}),
conv_actors AS (
  SELECT DISTINCT conv_id, 'conv:' || conv_id AS actor FROM t
  UNION
  SELECT DISTINCT conv_id, 'tool:' || tool AS actor FROM t WHERE tool IS NOT NULL
),
edges AS (
  SELECT a.actor AS src_actor, b.actor AS dst_actor,
         CAST(count(*) AS DOUBLE) AS weight
  FROM conv_actors a
  JOIN conv_actors b ON a.conv_id = b.conv_id AND a.actor < b.actor
  GROUP BY 1, 2
),
verts AS (SELECT DISTINCT actor FROM conv_actors),
sym AS (
  SELECT src_actor AS u, dst_actor AS v, weight FROM edges
  UNION ALL
  SELECT dst_actor AS u, src_actor AS v, weight FROM edges
),
deg AS (
  SELECT verts.actor, CAST(COALESCE(d.cnt, 0) AS DOUBLE) AS degree
  FROM verts LEFT JOIN (
    SELECT u AS actor, count(*) AS cnt FROM sym GROUP BY 1
  ) d USING (actor)
)
"""

# deterministic SQL-expressible partition used to exercise the metric
# operators against the oracle: community = actor kind bucket crossed with
# a length bucket => a handful of communities, computable identically in
# Spark and DuckDB.
def _part_spark():
    # lazy: building Column objects requires an active SparkContext, and the
    # driver imports this module before creating its session
    return (
        F.when(F.col("actor").startswith("tool:"), F.lit(0))
        .otherwise(1 + F.pmod(F.ascii(F.substring(F.col("actor"), -1, 1)), F.lit(5)))
        .cast("long")
    )


_PART_SQL = (
    "CASE WHEN actor LIKE 'tool:%' THEN 0 "
    "ELSE 1 + ascii(substr(actor, length(actor), 1)) % 5 END"
)


def _part2_spark():
    # second deterministic partition (for NMI): bucket by last char of actor
    return F.pmod(F.ascii(F.substring(F.col("actor"), -1, 1)), F.lit(4)).cast("long")


_PART2_SQL = "ascii(substr(actor, length(actor), 1)) % 4"


def _assign(spark: SparkSession, sf_dir: str, expr) -> DataFrame:
    g = _graph(spark, sf_dir)
    return g.vertices.select("vertex_id", expr.alias("comm"))


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------


def q_induce_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _named_edges(spark, sf_dir)


def q_vertex_degrees(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = _graph(spark, sf_dir)
    return g.degrees().join(g.vertices, "vertex_id").select("actor", "degree")


def q_degree_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from csd363_sin_spark.operators.degree import degree_stats

    s = degree_stats(_graph(spark, sf_dir))
    return s.select(
        "num_nodes",
        "num_edges",
        F.round("avg_degree", 6).alias("avg_degree"),
        "max_degree",
        "min_degree",
        "isolated_nodes",
        F.round("density", 6).alias("density"),
    )


def q_triangle_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    from csd363_sin_spark.operators.triangles import triangle_count

    n = triangle_count(_graph(spark, sf_dir))
    return spark.createDataFrame([(n,)], "triangles long")


def q_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    from csd363_sin_spark.operators.components import connected_components

    g = _graph(spark, sf_dir)
    comp = connected_components(g)
    named = comp.join(g.vertices, "vertex_id").select("actor", "comp_id")
    # canonical label: min actor name in the component (id-scheme independent)
    roots = named.groupBy("comp_id").agg(F.min("actor").alias("comp_actor"))
    return named.join(roots, "comp_id").select("actor", "comp_actor")


def q_modularity_fixed_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    from csd363_sin_spark.functions.metrics import modularity

    q = modularity(_graph(spark, sf_dir), _assign(spark, sf_dir, _part_spark()))
    return spark.createDataFrame([(round(q, 6),)], "modularity double")


def q_conductance_fixed_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    from csd363_sin_spark.functions.metrics import conductance

    per, _avg = conductance(_graph(spark, sf_dir), _assign(spark, sf_dir, _part_spark()))
    return per.select("comm", F.round("conductance", 6).alias("conductance"))


def q_coverage_fixed_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    from csd363_sin_spark.functions.metrics import coverage

    c = coverage(_graph(spark, sf_dir), _assign(spark, sf_dir, _part_spark()))
    return spark.createDataFrame([(round(c, 6),)], "coverage double")


def q_description_length_fixed_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    from csd363_sin_spark.functions.metrics import description_length

    h, _ = description_length(_graph(spark, sf_dir), _assign(spark, sf_dir, _part_spark()))
    return spark.createDataFrame([(round(h, 6),)], "description_length double")


def q_nmi_fixed_partitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from csd363_sin_spark.functions.metrics import nmi

    v = nmi(
        _assign(spark, sf_dir, _part_spark()), _assign(spark, sf_dir, _part2_spark())
    )
    return spark.createDataFrame([(round(v, 6),)], "nmi double")


def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only check (iterative fixpoint; not ANSI-SQL-expressible).

    Exactness vs the networkx-semantics oracle is covered by
    tests/test_pagerank_triangles.py (allclose 1e-6).
    """
    from csd363_sin_spark.operators.pagerank import pagerank

    g = _graph(spark, sf_dir)
    pr = pagerank(g, weighted=True)
    return pr.join(g.vertices, "vertex_id").select(
        "actor", F.round("rank", 8).alias("rank")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "induce_edges": q_induce_edges,
        "vertex_degrees": q_vertex_degrees,
        "degree_stats": q_degree_stats,
        "triangle_total": q_triangle_total,
        "connected_components": q_connected_components,
        "modularity_fixed_partition": q_modularity_fixed_partition,
        "conductance_fixed_partition": q_conductance_fixed_partition,
        "coverage_fixed_partition": q_coverage_fixed_partition,
        "description_length_fixed_partition": q_description_length_fixed_partition,
        "nmi_fixed_partitions": q_nmi_fixed_partitions,
        "pagerank": q_pagerank,
    }


# ---------------------------------------------------------------------------
# oracle SQL (DuckDB)
# ---------------------------------------------------------------------------

_STATS_CTE = """
, labeled AS (
  SELECT s.u, s.v, {part_u} AS c1, {part_v} AS c2
  FROM sym s
),
comm_stats AS (
  SELECT c1 AS comm,
         CAST(count(*) AS DOUBLE) AS vol,
         CAST(sum(CASE WHEN c1 <> c2 THEN 1 ELSE 0 END) AS DOUBLE) AS cut,
         CAST(sum(CASE WHEN c1 = c2 THEN 1 ELSE 0 END) AS DOUBLE) AS internal
  FROM labeled GROUP BY 1
),
allcomms AS (SELECT DISTINCT {part} AS comm FROM verts),
stats AS (
  SELECT a.comm,
         COALESCE(cs.vol, 0) AS vol,
         COALESCE(cs.cut, 0) AS cut,
         COALESCE(cs.internal, 0) AS internal
  FROM allcomms a LEFT JOIN comm_stats cs USING (comm)
),
m AS (SELECT CAST(count(*) AS DOUBLE) AS m FROM edges)
"""


def _stats_cte(part_sql: str) -> str:
    # the partition expression is written over a column named `actor`;
    # textually rebind it to each endpoint of the symmetric edge view
    return _STATS_CTE.format(
        part_u=part_sql.replace("actor", "s.u"),
        part_v=part_sql.replace("actor", "s.v"),
        part=part_sql,
    )


def oracle_sql() -> dict[str, str]:
    p = _ORACLE_PRELUDE
    part = _PART_SQL
    s = _stats_cte(part)
    return {
        "induce_edges": p + "SELECT src_actor, dst_actor, weight FROM edges",
        "vertex_degrees": p + "SELECT actor, degree FROM deg",
        "degree_stats": p
        + """
SELECT
  count(*) AS num_nodes,
  CAST(sum(degree)/2 AS BIGINT) AS num_edges,
  round(avg(degree), 6) AS avg_degree,
  max(degree) AS max_degree,
  min(degree) AS min_degree,
  sum(CASE WHEN degree = 0 THEN 1 ELSE 0 END) AS isolated_nodes,
  round(CASE WHEN count(*) > 1
        THEN sum(degree) / (count(*) * (count(*) - 1.0))
        ELSE 0 END, 6) AS density
FROM deg
""",
        "triangle_total": p
        + """
SELECT count(*) AS triangles
FROM edges e1
JOIN edges e2 ON e1.dst_actor = e2.src_actor
JOIN edges e3 ON e3.src_actor = e1.src_actor AND e3.dst_actor = e2.dst_actor
""",
        "connected_components": p.replace("WITH t AS", "WITH RECURSIVE t AS", 1)
        + """
, reach AS (
  SELECT actor AS a, actor AS b FROM verts
  UNION
  SELECT r.a, s.v AS b FROM reach r JOIN sym s ON r.b = s.u
)
SELECT a AS actor, min(b) AS comp_actor FROM reach GROUP BY a
""",
        "modularity_fixed_partition": p
        + s
        + """
SELECT round(sum(internal / 2.0) / (SELECT m FROM m)
       - sum(vol * vol) / (4.0 * (SELECT m FROM m) * (SELECT m FROM m)), 6)
       AS modularity
FROM stats
""",
        "conductance_fixed_partition": p
        + s
        + """
SELECT comm,
  round(LEAST(1.0, GREATEST(0.0,
    CASE WHEN LEAST(vol, 2.0 * (SELECT m FROM m) - vol) > 0
         THEN cut / LEAST(vol, 2.0 * (SELECT m FROM m) - vol)
         WHEN cut = 0 THEN 0.0 ELSE 1.0 END)), 6) AS conductance
FROM stats
""",
        "coverage_fixed_partition": p
        + s
        + "SELECT round(sum(internal / 2.0) / (SELECT m FROM m), 6) AS coverage FROM stats",
        "description_length_fixed_partition": p
        + s
        + """
SELECT round(COALESCE(sum(
  CASE WHEN cut > 0 AND cut < cut + internal AND vol > 0 THEN
    -(vol / (2.0 * (SELECT m FROM m))) * (
      (cut / (cut + internal)) * log2(cut / (cut + internal))
      + (1.0 - cut / (cut + internal)) * log2(1.0 - cut / (cut + internal))
    )
  END), 0.0), 6) AS description_length
FROM stats
""",
        "nmi_fixed_partitions": p
        + f"""
, lab AS (
  SELECT {part} AS pred, {_PART2_SQL} AS "true" FROM verts
),
cont AS (SELECT pred, "true", CAST(count(*) AS DOUBLE) AS n_ij FROM lab GROUP BY 1, 2),
tot AS (SELECT CAST(sum(n_ij) AS DOUBLE) AS n FROM cont),
ma AS (SELECT pred, sum(n_ij) AS a_i FROM cont GROUP BY 1),
mb AS (SELECT "true", sum(n_ij) AS b_j FROM cont GROUP BY 1),
mi AS (
  SELECT GREATEST(0.0, sum((n_ij / (SELECT n FROM tot))
         * ln((SELECT n FROM tot) * n_ij / (a_i * b_j)))) AS mi
  FROM cont JOIN ma USING (pred) JOIN mb USING ("true")
),
hu AS (SELECT COALESCE(sum(-(a_i / (SELECT n FROM tot)) * ln(a_i / (SELECT n FROM tot))), 0) AS h FROM ma),
hv AS (SELECT COALESCE(sum(-(b_j / (SELECT n FROM tot)) * ln(b_j / (SELECT n FROM tot))), 0) AS h FROM mb)
SELECT round(CASE
  WHEN (SELECT h FROM hu) = 0 AND (SELECT h FROM hv) = 0 THEN 1.0
  WHEN ((SELECT h FROM hu) + (SELECT h FROM hv)) / 2.0 = 0 OR (SELECT mi FROM mi) = 0 THEN 0.0
  ELSE LEAST(1.0, (SELECT mi FROM mi) / (((SELECT h FROM hu) + (SELECT h FROM hv)) / 2.0))
END, 6) AS nmi
""",
        # pagerank: intentionally omitted -> rows-only check (iterative
        # fixpoint; exactness covered by pytest oracle at 1e-6)
    }


# ---------------------------------------------------------------------------
# smoke entry
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: induce the graph at sf0.001 and report per-vertex degree +
    PageRank + component — one DataFrame, exercises scan->induce->iterate."""
    sf_dir = "/root/testdata/sf0.001"
    from csd363_sin_spark.operators.components import connected_components
    from csd363_sin_spark.operators.pagerank import pagerank

    g = _graph(spark, sf_dir)
    pr = pagerank(g, weighted=True, max_iter=30)
    comp = connected_components(g)
    return (
        g.vertices.join(pr, "vertex_id")
        .join(comp, "vertex_id")
        .select("actor", "kind", F.round("rank", 8).alias("rank"), "comp_id")
    )
