"""Plan audit: dump formatted physical plans for the headline operators.

Writes PLANS.md — the evidence that filters/projections reach the
parquet scans (PushedFilters / ReadSchema), expressions stay inside
WholeStageCodegen, and the iterative supersteps shuffle only what they
must.  Re-run after plan-affecting changes: `python tools/explain_audit.py`.
"""

from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def formatted(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    form = buf.getvalue()
    # execute THIS DataFrame so its QueryExecution holds AQE's FINAL plan
    # (runtime join strategies + whole-stage-codegen *(n) markers)
    df.collect()
    final = df._jdf.queryExecution().executedPlan().toString()
    return form + "\n--- final executed plan ---\n" + final


def summarize(plan: str) -> str:
    final = plan.split("--- final executed plan ---")[-1]
    n_ex = len(re.findall(r"\bExchange\b", final))
    n_bc = len(re.findall(r"BroadcastExchange", final))
    codegen_ids = set(re.findall(r"\*\((\d+)\)", final))
    pushed = re.findall(r"PushedFilters: \[[^\]]*\]", plan)
    read = re.findall(r"ReadSchema: [^\n]*", plan)
    out = [f"shuffle exchanges: {n_ex - n_bc}, broadcast exchanges: {n_bc}, "
           f"whole-stage-codegen spans: {len(codegen_ids)}"]
    out += [f"  {p}" for p in sorted(set(pushed))[:4]]
    out += [f"  {r[:160]}" for r in sorted(set(read))[:4]]
    return "\n".join(out)


def main() -> int:
    from pyspark.sql import functions as F

    from csd363_sin_spark.session import get_spark

    spark = get_spark(master="local[4]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    sections: list[tuple[str, str, str]] = []  # (title, note, plan)

    # 1. filter + projection pushdown on the documents scan
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    q = docs.filter(F.col("doc_id") < 100).select("doc_id", "lang")
    sections.append((
        "Documents scan: filter + column pruning",
        "The predicate and the 2-column projection must reach the parquet "
        "reader (PushedFilters + narrow ReadSchema).",
        formatted(q),
    ))

    # 2. co-occurrence induction (pair expansion + partial agg)
    from csd363_sin_spark.plans.induce import induce_actor_edges
    from csd363_sin_spark.sources.transcripts import transcripts_from_events

    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    edges = induce_actor_edges(transcripts_from_events(events))
    sections.append((
        "Graph induction: transcripts -> weighted actor edges",
        "Distinct + bounded per-conversation self-join + hash aggregate "
        "with map-side combine (partial_count before the exchange).",
        formatted(edges),
    ))

    # 3. one distributed Louvain superstep gather (the O(E) shuffle)
    from csd363_sin_spark.plans.induce import graph_from_edges
    from csd363_sin_spark.plans.lineage import materialize

    g = graph_from_edges(spark, [(i, (i * 7 + 1) % 50) for i in range(120)])
    sym = materialize(g.edges_sym()).repartition(8, "dst")
    assign = materialize(
        g.vertices.select("vertex_id", F.col("vertex_id").alias("comm"))
    )
    a_dst = assign.select(F.col("vertex_id").alias("dst"), F.col("comm").alias("c_nbr"))
    k_in = (
        sym.join(a_dst, "dst")
        .groupBy(F.col("src").alias("vertex_id"), "c_nbr")
        .agg(F.sum("weight").alias("k_in"))
    )
    sections.append((
        "Louvain superstep gather (k_in)",
        "With the symmetric edge view pre-partitioned by dst, the join "
        "exchanges only the assignment side; the groupBy is the single "
        "map-side-combined O(E) shuffle of the superstep.",
        formatted(k_in),
    ))

    # 4. MinHash signatures (one explode + one wide aggregate)
    from csd363_sin_spark.functions.dedup import minhash_signatures

    sections.append((
        "MinHash signatures",
        "Shingle explode feeds ONE hash aggregate computing all 32 mins "
        "(partial_min map-side); no joins, no Python.",
        formatted(minhash_signatures(docs, 3, 32)),
    ))

    # 5. exact cosine top-k (broadcast probes, two-phase top-k)
    from csd363_sin_spark.functions.similarity import cosine_topk

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    probes = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("probe_vec")
    )
    sections.append((
        "Cosine top-k (exact baseline)",
        "Probes broadcast (corpus side streams, no shuffle before scoring); "
        "two-phase top-k avoids the single-partition global window.",
        formatted(cosine_topk(emb, probes, k=5)),
    ))

    # 6. BFS superstep: frontier expansion + anti-join dedup
    from csd363_sin_spark.operators.bfs import landmark_distances  # noqa: F401

    state = materialize(
        spark.createDataFrame([(0, 0, 0)], "landmark long, vertex_id long, dist long")
    )
    frontier = state
    sym_d = materialize(g.edges_sym().select("src", "dst"))
    nxt = (
        frontier.join(sym_d, frontier["vertex_id"] == sym_d["src"])
        .select("landmark", F.col("dst").alias("vertex_id"))
        .distinct()
        .join(state, ["landmark", "vertex_id"], "left_anti")
        .withColumn("dist", F.lit(1).cast("long"))
    )
    sections.append((
        "BFS superstep (frontier expansion)",
        "One join with the symmetric edge view, distinct() dedup with "
        "map-side partial aggregation (multi-parent fan-in collapses "
        "before the exchange), one anti-join against the visited state.",
        formatted(nxt),
    ))

    # 7. k-truss support recount (the per-round triangle join)
    from csd363_sin_spark.operators.ktruss import _edge_support

    cur = materialize(
        g.edges.select(
            F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
        ).distinct()
    )
    sections.append((
        "k-truss support recount",
        "Degree-ordered canonical closed-wedge join (a < b < c) — the "
        "same hub-safe shape as G9 triangle counting — with the three "
        "corner edges exploded and hash-aggregated map-side.",
        formatted(_edge_support(cur)),
    ))

    # 8. contamination check (broadcast benchmark shingles)
    from csd363_sin_spark.functions.dedup import contamination_check
    from csd363_sin_spark.functions.sampling import hash_bucket

    bench = docs.filter(hash_bucket(F.col("doc_id"), "bench", 20) == 0)
    sections.append((
        "Benchmark contamination scan",
        "The benchmark shingle set is BROADCAST (tiny vs the corpus); the "
        "corpus side streams through a map-side semi-join — no shuffle of "
        "the 100 TB side beyond its per-doc aggregation.",
        formatted(contamination_check(docs, bench, n=3)),
    ))

    # 9. TF-IDF top terms (two aggregates + term join + per-doc window)
    from csd363_sin_spark.functions.text import tfidf_top_terms

    sections.append((
        "TF-IDF top terms",
        "Explode -> (doc, term) hash agg (map-side combined) -> term-keyed "
        "df agg joined back (hub terms have idf -> 0; AQE splits the skew) "
        "-> per-doc window over distinct terms only.",
        formatted(tfidf_top_terms(docs, k=3)),
    ))

    # 10. document chunking (pure map-side: the zero-exchange plan)
    from csd363_sin_spark.functions.text import chunk_documents

    sections.append((
        "Document chunking (fixed token windows)",
        "Tokenize + sequence explode + slice, all inside one codegen span "
        "over the parquet scan — ZERO exchanges; the training-sequence "
        "prep step costs exactly one pass at any scale.",
        formatted(chunk_documents(docs, chunk_tokens=12, overlap=4)),
    ))

    # 11. SemDeDup within-cluster pairs (equi-join on cluster id)
    from csd363_sin_spark.functions.similarity import semantic_dedup

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    sections.append((
        "SemDeDup semantic dedup",
        "Candidate pairs come from an equi-join on the k-means cluster id "
        "(bounded per cluster), never a cross join; the drop rule is one "
        "filter + distinct + left join back to the corpus.",
        formatted(semantic_dedup(emb, dim=64, n_clusters=8)),
    ))

    # 12. one WL refinement round (sym join + sorted-list agg)
    from csd363_sin_spark.operators.coloring import wl_refinement
    from csd363_sin_spark.plans.induce import induce_actor_edges

    actor_edges = induce_actor_edges(transcripts_from_events(events))
    verts_named = (
        actor_edges.selectExpr("src_actor AS actor")
        .union(actor_edges.selectExpr("dst_actor AS actor"))
        .distinct()
    )
    sections.append((
        "WL color refinement (3 rounds)",
        "Per round one sym-edge join + one collect_list/sort_array "
        "aggregation per vertex (map-side combinable); rounds are "
        "materialize()d so lineage stays flat across iterations.",
        formatted(wl_refinement(verts_named, actor_edges, rounds=3)),
    ))

    # 13. production mutual k-NN: LSH-bucketed candidates (no all-pairs)
    from csd363_sin_spark.functions.similarity import knn_graph

    sections.append((
        "Mutual k-NN graph, LSH candidate generator (production mode)",
        "Candidate pairs come from an equi-join on shared (table, bucket) "
        "keys — no CartesianProduct/BroadcastNestedLoopJoin anywhere in "
        "the plan; the rank/mutual tail is the exact mode's.  The same "
        "holds for candidates='ivf' (equi-join on multi-probe cell ids).",
        formatted(knn_graph(emb, k=5, candidates="lsh", dim=64)),
    ))

    # 14. PQ encode via the Arrow kernel (codebook in the UDF closure)
    from csd363_sin_spark.functions.similarity import pq_encode, pq_train

    books = pq_train(emb, dim=64, m=4, n_codes=8, iters=1)
    sections.append((
        "PQ encode (Arrow kernel, production mode)",
        "One ArrowEvalPython stage over the corpus — the codebook ships "
        "in the UDF closure, so plan size and codegen are flat in "
        "m x n_codes (plan literals would scale with the codebook).",
        formatted(pq_encode(emb, books)),
    ))

    # 15. Leiden refinement unit (forced distributed)
    from csd363_sin_spark.operators.leiden import leiden_refine_phase

    sections.append((
        "Leiden refine phase (local move + connectivity split, distributed)",
        "The seeded local-move supersteps reuse the Louvain dataflow "
        "(pre-partitioned persisted sym view, |V|-row assignment "
        "exchange); the refinement adds ONE intra-community edge filter "
        "(two hash joins) feeding the large-star/small-star CC kernel — "
        "no per-community loop, so the level cost is O(E) regardless of "
        "how many communities the phase produced.",
        formatted(leiden_refine_phase(g, max_supersteps=2, local_phase_edges=0)),
    ))

    # walk step candidate join (salted) — the r5 headline fix; this
    # mirrors one loop body of operators/walks.py node2vec_walks so the
    # pre-materialize plan is visible (materialize() truncates lineage,
    # so auditing the operator's return frame would show only LogicalRDDs)
    from csd363_sin_spark.functions.dedup import _hash64
    from csd363_sin_spark.operators.walks import (
        N2V_HASH_MOD,
        _explode_buckets,
        _salted_sym,
    )
    from csd363_sin_spark.plans.induce import induce_actor_edges as _iae

    enamed = materialize(_iae(transcripts_from_events(events)))
    wsym = _salted_sym(enamed, 64)
    wsym.count()  # materialize the cache so the plan shows InMemoryTableScan
    wcanon = F.broadcast(
        enamed.select(
            F.least("src_actor", "dst_actor").alias("ca"),
            F.greatest("src_actor", "dst_actor").alias("cb"),
        ).distinct()
    )
    wstate = materialize(
        wsym.select(F.col("u").alias("start_actor")).distinct().select(
            "start_actor",
            F.lit(0).cast("long").alias("walk_id"),
            F.col("start_actor").alias("actor"),
            F.lit(None).cast("string").alias("prev_actor"),
        )
    )
    wprobes = _explode_buckets(wstate, 64)
    wcand = wprobes.join(
        wsym, (wprobes["actor"] == wsym["u"]) & (wprobes["b"] == wsym["b"])
    ).select(
        "start_actor", "walk_id", F.col("actor").alias("cur"), "prev_actor",
        F.col("v").alias("cand"),
        F.pmod(
            _hash64(
                F.concat_ws(
                    ":", F.lit("n2v"), F.col("start_actor"),
                    F.col("walk_id").cast("string"), F.lit("1"), F.col("v"),
                ),
                None, "xxhash64",
            ),
            F.lit(N2V_HASH_MOD),
        ).alias("h"),
    )
    wflag = wcand.join(
        wcanon,
        (F.least("prev_actor", "cand") == F.col("ca"))
        & (F.greatest("prev_actor", "cand") == F.col("cb")),
        "left",
    )
    wstep = wflag.select(
        "start_actor", "walk_id", "cur", "cand",
        (
            F.col("h")
            * F.when(F.col("prev_actor").isNull(), F.lit(1))
            .when(F.col("cand") == F.col("prev_actor"), F.lit(2))
            .when(F.col("ca").isNotNull(), F.lit(1))
            .otherwise(F.lit(2))
            .cast("long")
        ).alias("score"),
    ).groupBy("start_actor", "walk_id", "cur").agg(
        F.min_by("cand", F.struct("score", "cand")).alias("actor")
    )
    sections.append((
        "node2vec walk step (salted candidate join + min_by argmin)",
        "Both sides of the candidate join carry EXPLICIT numPartitions "
        "(REPARTITION_BY_NUM exchanges) so AQE — which coalesces on "
        "map-output bytes and is blind to the hub join fan-out — cannot "
        "fold the Σdeg(frontier) candidate expansion into one task; the "
        "canonical-edge neighbor probe is an explicit BroadcastExchange; "
        "the per-walk argmin is a map-side-combined min_by "
        "(partial_min_by before the exchange), never a windowed sort of "
        "the candidate rows.",
        formatted(wstep),
    ))

    lines = [
        "# PLANS — physical-plan audit of the headline operators",
        "",
        f"Generated by tools/explain_audit.py at sf dir `{SF_DIR}`; re-run after",
        "plan-affecting changes.  Summary per section, full formatted plan below it.",
        "",
    ]
    for title, note, plan in sections:
        lines += [f"## {title}", "", note, "", "```",
                  summarize(plan), "```", "",
                  "<details><summary>full plan</summary>", "", "```",
                  plan.strip(), "```", "", "</details>", ""]
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "PLANS.md"), "w") as f:
        f.write("\n".join(lines))
    print("PLANS.md written")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
