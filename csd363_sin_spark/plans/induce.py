"""Transcripts -> graph induction (the engine's scan stage).

Replaces the reference's edge-list parse + ``nx.Graph`` build (reference
data_io.py:71-132) with a declarative plan:

* **actors** per conversation = the conversation actor ``conv:<conv_id>``
  plus one ``tool:<t>`` actor per distinct non-null tool used in it;
* **edges** = unordered actor pairs co-occurring in a conversation,
  ``weight`` = number of conversations in which the pair co-occurs;
* **vertices** = dictionary-encoded actors (dense long ids, see plans/ids).

Scale notes: the per-conversation pair expansion is a self-join on
``conv_id`` over *distinct* (conv, actor) rows — actor sets per
conversation are tiny (#tools used + 1), so the expansion is bounded by
``sum_c |A_c|^2`` which is linear-ish in turns.  The final
``groupBy(src,dst)`` is a partial-aggregated hash shuffle; hub-pair skew
(two popular tools co-occur everywhere) is absorbed by map-side combine —
each map task emits one partial row per pair.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from csd363_sin_spark.plans.ids import dense_ids


@dataclass
class Graph:
    """The engine's graph handle: plain DataFrames, no mutable state.

    ``edges`` is canonical (src < dst, one row per undirected edge);
    ``vertices`` maps dense long ids to actor strings.
    """

    vertices: DataFrame  # (vertex_id long, actor string, kind string)
    edges: DataFrame  # (src long, dst long, weight double)

    def edges_sym(self) -> DataFrame:
        """Both directions of every edge — the traversal-side view."""
        e = self.edges
        return e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
        )

    def degrees(self, weighted: bool = False) -> DataFrame:
        """(vertex_id, degree) for all vertices incl. isolates (degree 0)."""
        agg = F.sum("weight") if weighted else F.count(F.lit(1)).cast("double")
        d = self.edges_sym().groupBy(F.col("src").alias("vertex_id")).agg(agg.alias("degree"))
        return (
            self.vertices.select("vertex_id")
            .join(d, "vertex_id", "left")
            .fillna({"degree": 0.0})
        )


def conv_actor_pairs(transcripts: DataFrame) -> DataFrame:
    """(conv_id, actor) distinct pairs — the co-occurrence scope relation."""
    conv_actors = transcripts.select(
        "conv_id", F.concat(F.lit("conv:"), F.col("conv_id")).alias("actor")
    ).distinct()
    tool_actors = (
        transcripts.filter(F.col("tool").isNotNull())
        .select("conv_id", F.concat(F.lit("tool:"), F.col("tool")).alias("actor"))
        .distinct()
    )
    return conv_actors.unionByName(tool_actors)


def induce_actor_edges(transcripts: DataFrame) -> DataFrame:
    """Weighted undirected co-occurrence edges keyed by actor *names*.

    Returns ``(src_actor, dst_actor, weight)`` with ``src_actor <
    dst_actor`` lexicographically.  Kept name-keyed so it is directly
    comparable to an ANSI-SQL oracle; ``induce_graph`` adds dense ids.
    """
    a = conv_actor_pairs(transcripts)
    b = a.select(F.col("conv_id"), F.col("actor").alias("actor_b"))
    pairs = a.join(b, "conv_id").filter(F.col("actor") < F.col("actor_b"))
    return pairs.groupBy(
        F.col("actor").alias("src_actor"), F.col("actor_b").alias("dst_actor")
    ).agg(F.count(F.lit(1)).cast("double").alias("weight"))


def induce_graph(transcripts: DataFrame, binarize: bool = False) -> Graph:
    """Full induction: transcripts -> Graph(vertices, edges).

    ``binarize=True`` sets every weight to 1.0 — the reference graph is
    unweighted (reference data_io.py:105 ``G.add_edge`` with no weight), so
    parity tests binarize.
    """
    actor_edges = induce_actor_edges(transcripts)
    actors = conv_actor_pairs(transcripts).select("actor").distinct()
    vertices = dense_ids(actors, "actor").withColumn(
        "kind", F.split(F.col("actor"), ":")[0]
    ).select("vertex_id", "actor", "kind")

    v_src = vertices.select(F.col("actor").alias("src_actor"), F.col("vertex_id").alias("id_a"))
    v_dst = vertices.select(F.col("actor").alias("dst_actor"), F.col("vertex_id").alias("id_b"))
    w = F.lit(1.0) if binarize else F.col("weight")
    edges = (
        actor_edges.join(v_src, "src_actor")
        .join(v_dst, "dst_actor")
        .select(
            F.least("id_a", "id_b").alias("src"),
            F.greatest("id_a", "id_b").alias("dst"),
            w.alias("weight"),
        )
    )
    return Graph(vertices=vertices, edges=edges)


def graph_from_named_edges(actor_edges: DataFrame) -> Graph:
    """(src_actor, dst_actor, weight) -> Graph with dense ids.

    The second half of :func:`induce_graph`, exposed for callers that
    already hold a name-keyed edge table (e.g. the streaming edge-store
    snapshot, streaming/ingest.read_edge_store) — the resulting Graph is
    identical to the batch induction on the same underlying transcripts.
    """
    actors = (
        actor_edges.select(F.col("src_actor").alias("actor"))
        .unionByName(actor_edges.select(F.col("dst_actor").alias("actor")))
        .distinct()
    )
    vertices = dense_ids(actors, "actor").withColumn(
        "kind", F.split(F.col("actor"), ":")[0]
    ).select("vertex_id", "actor", "kind")
    v_src = vertices.select(F.col("actor").alias("src_actor"), F.col("vertex_id").alias("id_a"))
    v_dst = vertices.select(F.col("actor").alias("dst_actor"), F.col("vertex_id").alias("id_b"))
    edges = (
        actor_edges.join(v_src, "src_actor")
        .join(v_dst, "dst_actor")
        .select(
            F.least("id_a", "id_b").alias("src"),
            F.greatest("id_a", "id_b").alias("dst"),
            F.col("weight"),
        )
    )
    return Graph(vertices=vertices, edges=edges)


def symmetrize(edges: DataFrame) -> DataFrame:
    """Canonical edge table -> both-directions view (standalone helper)."""
    return edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
    )


def graph_from_edges(spark, edge_rows, weights=None) -> Graph:
    """Build a Graph from explicit (u, v) pairs — test fixture helper.

    Vertex ids are the given ints; vertices table is derived.  Mirrors
    building an ``nx.Graph`` from an edge list in the reference tests'
    role (the reference has no tests; SURVEY.md §5).
    """
    rows = []
    seen = set()
    for i, (u, v) in enumerate(edge_rows):
        if u == v:
            continue
        a, b = (u, v) if u < v else (v, u)
        if (a, b) in seen:
            continue
        seen.add((a, b))
        w = 1.0 if weights is None else float(weights[i])
        rows.append((int(a), int(b), w))
    edges = spark.createDataFrame(rows, "src long, dst long, weight double")
    verts = sorted({u for u, v, _ in rows} | {v for u, v, _ in rows})
    vertices = spark.createDataFrame(
        [(int(x), f"v:{x}", "v") for x in verts], "vertex_id long, actor string, kind string"
    )
    return Graph(vertices=vertices, edges=edges)
