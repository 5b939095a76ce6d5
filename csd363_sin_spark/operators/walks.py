"""Deterministic random walks — graph-embedding corpus prep (DeepWalk).

Embedding pipelines (DeepWalk / node2vec / LINE) start by materializing
a corpus of random walks; at 100 TB that corpus generation must be a
distributed dataflow, reproducible across runs and task retries.  RNG
state breaks both, so each step's neighbor choice is derandomized the
same way the engine's samplers are: the successor of walk ``(start,
walk_id)`` at ``step`` is the neighbor minimizing the engine-portable
``portable_hash64(salt:start:walk_id:step:neighbor)`` — an integer
argmin, bit-identical in Spark, DuckDB (the gate oracle mirrors every
step) and across retries, yet uniformly distributed over neighbors.

Scale: walk state is one row per active walk; each step is one join of
the state against the symmetric edge view (the only O(frontier-degree)
exchange) followed by a per-walk argmin (map-side-combinable ``min_by``).
The adjacency is SALTED into ``n_buckets`` by a hash of the neighbor id
and the state side is exploded across buckets, so one hub vertex's
candidate rows land in ``n_buckets`` tasks instead of one — argmin
distributes over bucket minima, so results are bit-identical to the
unsalted plan.  Without the salt, walks concentrating on a hub (the
stationary distribution is degree-biased) put that hub's entire
Σ(walks-on-hub × degree) candidate expansion into a single task: on the
sf0.1 co-occurrence graph (~30 tool hubs, Σdeg² ≈ 31M) that was a
measured ~50 s single-task step (steps 1 and 3 of the same walk ran in
~2 s — the frontier oscillates on and off the hubs); salted across 64
buckets x pinned partitions the same step is 6-8 s of evenly-spread
hash CPU.  Walks that
reach an isolated/dead-end vertex terminate early, matching DeepWalk
semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from csd363_sin_spark.functions.dedup import _hash64
from csd363_sin_spark.plans.lineage import materialize


def _salted_sym(edges_named: DataFrame, n_buckets: int) -> DataFrame:
    """Symmetric adjacency view with a deterministic neighbor-hash
    bucket column ``b`` — the skew salt for the per-step candidate join.
    The bucket is a pure partitioning device (xxhash64 of the neighbor
    id, independent of the walk's scoring ``hash_mode``); every neighbor
    of a vertex lands in exactly one bucket, so a per-walk argmin over
    the salted join output equals the argmin over the full neighbor
    set.

    The repartition count is EXPLICIT (shuffle-partitions conf): the
    input bytes of this view are tiny next to the Σdeg(frontier)
    candidate rows each step's join EMITS, so AQE — which coalesces on
    map-output bytes, blind to join fan-out — would fold the cached view
    (and with it every step's candidate expansion) back into one task,
    exactly the skew the salt exists to break.  Pinning numPartitions
    marks the shuffle user-specified, which AQE never coalesces."""
    spark = edges_named.sparkSession
    n_parts = max(
        int(spark.conf.get("spark.sql.shuffle.partitions", "32")), n_buckets
    )
    sym = edges_named.select(
        F.col("src_actor").alias("u"), F.col("dst_actor").alias("v")
    ).unionByName(
        edges_named.select(
            F.col("dst_actor").alias("u"), F.col("src_actor").alias("v")
        )
    )
    return (
        sym.withColumn(
            "b", F.pmod(F.xxhash64("v"), F.lit(n_buckets)).cast("int")
        )
        .repartition(n_parts, "u", "b")
        .persist()
    )


def _explode_buckets(state: DataFrame, n_buckets: int) -> DataFrame:
    """Explode walk state across the ``n_buckets`` salt buckets so the
    candidate join key becomes ``(actor, b)`` — one hub's expansion is
    spread over ``n_buckets`` tasks.  O(|state| * n_buckets) probe rows:
    walk state is one row per walk, so the blow-up is bounded and tiny
    next to the Σdeg(frontier) candidate rows it parallelizes.

    The probe side's partition count is pinned for the same AQE-blind-
    to-fan-out reason as :func:`_salted_sym` — when AQE broadcasts the
    (byte-small) adjacency, the candidate stage inherits THIS side's
    partitioning, and a coalesced-to-one probe shuffle re-serializes the
    whole hub expansion into a single task (measured: the 2 s salted
    step becomes 50 s)."""
    spark = state.sparkSession
    n_parts = max(
        int(spark.conf.get("spark.sql.shuffle.partitions", "32")), n_buckets
    )
    return (
        state.withColumn(
            "b", F.explode(F.sequence(F.lit(0), F.lit(n_buckets - 1)))
        )
        .withColumn("b", F.col("b").cast("int"))
        .repartition(n_parts, "actor", "b")
    )


def random_walks(
    edges_named: DataFrame,
    walk_length: int = 4,
    walks_per_vertex: int = 2,
    salt: str = "walk",
    hash_mode: str = "md5",
    n_buckets: int = 64,
) -> DataFrame:
    """Uniform random walks over actor-named edges
    ``(src_actor, dst_actor, ...)``: returns ``(start_actor, walk_id,
    step, actor)`` — one row per visited position, step 0 = the start
    vertex itself.  Deterministic: a pure function of the edge set and
    the salt (``n_buckets`` only re-partitions work; any value gives
    bit-identical output).

    ``hash_mode``: "md5" (the oracle-portable family the gate and python
    mirrors replay) or "xxhash64" (production — JVM-fused, several times
    cheaper per candidate row; the hot cost of a walk step is ONE hash
    per (walk, neighbor) candidate).  Same algorithm either way, exactly
    like the dedup family's hash_mode."""
    sym = _salted_sym(edges_named, n_buckets)
    sym.count()
    verts = sym.select(F.col("u").alias("start_actor")).distinct()
    state = materialize(
        verts.select(
            "start_actor",
            F.explode(
                F.sequence(F.lit(0), F.lit(walks_per_vertex - 1))
            ).alias("walk_id"),
        ).select(
            "start_actor",
            F.col("walk_id").cast("long").alias("walk_id"),
            F.col("start_actor").alias("actor"),
        )
    )
    out = state.withColumn("step", F.lit(0).cast("long"))
    frames = [out]
    for step in range(1, walk_length + 1):
        probes = _explode_buckets(state, n_buckets)
        cand = probes.join(
            sym, (probes["actor"] == sym["u"]) & (probes["b"] == sym["b"])
        ).select(
            "start_actor",
            "walk_id",
            F.col("v").alias("cand"),
            _hash64(
                F.concat_ws(
                    ":",
                    F.lit(salt),
                    F.col("start_actor"),
                    F.col("walk_id").cast("string"),
                    F.lit(str(step)),
                    F.col("v"),
                ),
                None,
                hash_mode,
            ).alias("h"),
        )
        # argmin as a map-side-combinable min_by aggregation (a row_number
        # window here would full-sort-shuffle every candidate row per
        # step; min_by reduces each input partition to one row per walk
        # before the exchange).  (h, cand) is duplicate-free per walk, so
        # the struct ordering is a total order — same winner as the spec.
        # NOTE: earlier states are NOT released — every step's state is a
        # slice of the returned corpus (frames below reference them)
        state = materialize(
            cand.groupBy("start_actor", "walk_id")
            .agg(
                F.min_by("cand", F.struct("h", "cand")).alias("actor")
            )
        )
        frames.append(state.withColumn("step", F.lit(step).cast("long")))
        if state.isEmpty():
            break
    result = frames[0]
    for f in frames[1:]:
        result = result.unionByName(f)
    sym.unpersist()
    return result.select("start_actor", "walk_id", "step", "actor")


# score-hash modulus for biased walks: 57 bits so hash * cost stays far
# below 2^63 for any sane cost multiplier (documented bound: cost <= 32)
N2V_HASH_MOD = 1 << 57


def node2vec_walks(
    edges_named: DataFrame,
    walk_length: int = 4,
    walks_per_vertex: int = 2,
    p_cost: int = 2,
    q_cost: int = 2,
    salt: str = "n2v",
    hash_mode: str = "md5",
    n_buckets: int = 64,
    broadcast_edge_limit: int = 4_000_000,
) -> DataFrame:
    """Second-order (node2vec-style) biased walks, derandomized.

    node2vec (Grover & Leskovec, KDD 2016) biases each step by where the
    walk CAME from: returning to the previous vertex is weighted 1/p,
    staying in the previous vertex's neighborhood (triadic closure) 1,
    and exploring outward 1/q.  The derandomized analogue keeps the
    engine's integer-argmin successor rule and folds the bias into a
    cost multiplier: successor = argmin over neighbors of
    ``(hash % 2^57) * cost`` where cost = ``p_cost`` for the back-step,
    1 for a neighbor of the previous vertex, ``q_cost`` otherwise
    (step 1 is uniform — no previous vertex).  Larger cost = less
    likely, so p_cost/q_cost play the roles of node2vec's 1/p and 1/q;
    pure integer math, bit-identical in Spark, DuckDB and Python.

    Scale: same dataflow as :func:`random_walks` plus one left join per
    step against the canonical edge set to test "candidate is a
    neighbor of prev".  The canonical set is explicitly broadcast while
    it fits (``broadcast_edge_limit`` rows — the cached frame has no
    stats, so AQE can't make that call itself); past the limit the probe
    falls back to a shuffle join keyed on the (prev, cand) PAIR, which
    has no hub skew because pair keys are distinct per candidate row.
    """
    if not (1 <= p_cost <= 32 and 1 <= q_cost <= 32):
        raise ValueError("cost multipliers must be in [1, 32]")
    sym = _salted_sym(edges_named, n_buckets)
    sym.count()
    canon = (
        edges_named.select(
            F.least("src_actor", "dst_actor").alias("ca"),
            F.greatest("src_actor", "dst_actor").alias("cb"),
        )
        .distinct()
        .persist()
    )
    canon_probe = (
        F.broadcast(canon) if canon.count() <= broadcast_edge_limit else canon
    )
    verts = sym.select(F.col("u").alias("start_actor")).distinct()
    state = materialize(
        verts.select(
            "start_actor",
            F.explode(
                F.sequence(F.lit(0), F.lit(walks_per_vertex - 1))
            ).alias("walk_id"),
        ).select(
            "start_actor",
            F.col("walk_id").cast("long").alias("walk_id"),
            F.col("start_actor").alias("actor"),
            F.lit(None).cast("string").alias("prev_actor"),
        )
    )
    frames = [
        state.select(
            "start_actor", "walk_id", F.lit(0).cast("long").alias("step"), "actor"
        )
    ]
    for step in range(1, walk_length + 1):
        probes = _explode_buckets(state, n_buckets)
        cand = probes.join(
            sym, (probes["actor"] == sym["u"]) & (probes["b"] == sym["b"])
        ).select(
            "start_actor",
            "walk_id",
            F.col("actor").alias("cur"),
            "prev_actor",
            F.col("v").alias("cand"),
            F.pmod(
                _hash64(
                    F.concat_ws(
                        ":",
                        F.lit(salt),
                        F.col("start_actor"),
                        F.col("walk_id").cast("string"),
                        F.lit(str(step)),
                        F.col("v"),
                    ),
                    None,
                    hash_mode,
                ),
                F.lit(N2V_HASH_MOD),
            ).alias("h"),
        )
        flagged = cand.join(
            canon_probe,
            (F.least("prev_actor", "cand") == F.col("ca"))
            & (F.greatest("prev_actor", "cand") == F.col("cb")),
            "left",
        )
        cost = (
            F.when(F.col("prev_actor").isNull(), F.lit(1))
            .when(F.col("cand") == F.col("prev_actor"), F.lit(p_cost))
            .when(F.col("ca").isNotNull(), F.lit(1))
            .otherwise(F.lit(q_cost))
            .cast("long")
        )
        scored = flagged.select(
            "start_actor",
            "walk_id",
            "cur",
            "cand",
            (F.col("h") * cost).alias("score"),
        )
        # argmin via map-side-combinable min_by (see random_walks); cur is
        # functionally dependent on the walk so it joins the group key
        # NOTE: earlier states are NOT released — every step's state is a
        # slice of the returned corpus (frames below reference them)
        state = materialize(
            scored.groupBy("start_actor", "walk_id", "cur")
            .agg(
                F.min_by("cand", F.struct("score", "cand")).alias("actor")
            )
            .select(
                "start_actor",
                "walk_id",
                "actor",
                F.col("cur").alias("prev_actor"),
            )
        )
        frames.append(
            state.select(
                "start_actor",
                "walk_id",
                F.lit(step).cast("long").alias("step"),
                "actor",
            )
        )
        if state.isEmpty():
            break
    result = frames[0]
    for f in frames[1:]:
        result = result.unionByName(f)
    sym.unpersist()
    canon.unpersist()
    return result.select("start_actor", "walk_id", "step", "actor")


def skipgram_pairs(walks: DataFrame, window: int = 2) -> DataFrame:
    """Skip-gram training pairs from a walk corpus: ``(center, context,
    n)`` for every ordered pair of distinct vertices co-occurring within
    ``window`` steps on the same walk, with n = co-occurrence count —
    the exact input word2vec-style embedding training consumes.

    One self-join per walk keyed on (start_actor, walk_id) with a step-
    distance band predicate, then a hash aggregation; walk length is a
    small constant, so the join fan-out per walk is O(L * window)."""
    a = walks.select(
        "start_actor", "walk_id", F.col("step").alias("s1"), F.col("actor").alias("center")
    )
    b = walks.select(
        "start_actor", "walk_id", F.col("step").alias("s2"), F.col("actor").alias("context")
    )
    return (
        a.join(b, ["start_actor", "walk_id"])
        .filter(
            (F.col("s1") != F.col("s2"))
            & (F.abs(F.col("s1") - F.col("s2")) <= window)
            & (F.col("center") != F.col("context"))
        )
        .groupBy("center", "context")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def ppmi_scores(pairs: DataFrame) -> DataFrame:
    """Positive pointwise mutual information over skip-gram pair counts
    ``(center, context, n)`` — the association matrix GloVe/LINE-style
    embedding factorizations consume: ppmi = max(0, ln(n * N / (n_c *
    n_x))) with N = total pairs, n_c / n_x the center / context
    marginals.  Two marginal aggregations + two joins; the only
    floating-point steps are one division of exact integer products and
    one ln — engine-portable to 6 dp."""
    total = pairs.agg(F.sum("n")).collect()[0][0] or 0
    nc = pairs.groupBy("center").agg(F.sum("n").alias("n_c"))
    nx = pairs.groupBy("context").agg(F.sum("n").alias("n_x"))
    return (
        pairs.join(nc, "center")
        .join(nx, "context")
        .select(
            "center",
            "context",
            "n",
            F.greatest(
                F.lit(0.0),
                F.log(
                    (F.col("n") * F.lit(int(total)))
                    / (F.col("n_c") * F.col("n_x"))
                ),
            ).alias("ppmi"),
        )
    )
