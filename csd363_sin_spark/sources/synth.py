"""Deterministic synthetic transcripts generator (no external data).

The authoritative input shape (BASELINE.json ``input_hint``) is an Iceberg/
parquet table of multi-turn conversation transcripts::

    conv_id: string, turn_idx: int32, role: string, text: string,
    tool: string, ts: timestamp

This module synthesizes such a table entirely with Spark expressions —
``spark.range`` + ``xxhash64``-mixed deterministic draws — so the same
(seed, n_convs) always yields byte-identical rows regardless of
parallelism, and generation scales linearly with cores (no driver-side
data).  Mirrors the role of the reference's dataset download + edge-list
parse (reference data_io.py:30-132) but honours the no-external-data rule.

Planted structure (so community detection has ground truth, FIXTURES.md F1):
conversations are grouped into ``n_clusters`` clusters; each cluster owns a
contiguous slice of the tool pool and picks ~95% of its tool calls from its
own slice (Zipf-skewed within the slice so hub tools exist), ~5% from the
global pool.  The induced co-occurrence graph therefore has known
communities = the clusters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: modulus for hash->uniform draws; prime so low bits are well mixed
_PRIME = 1_000_003


def _u(seed_label: str, *cols):
    """Deterministic uniform [0,1) from xxhash64 of the given columns."""
    h = F.xxhash64(F.lit(seed_label), *cols)
    return F.pmod(h, F.lit(_PRIME)).cast("double") / F.lit(float(_PRIME))


def synth_transcripts(
    spark: SparkSession,
    n_convs: int = 1000,
    n_tools: int = 24,
    n_clusters: int = 4,
    min_turns: int = 4,
    max_turns: int = 12,
    cross_cluster_p: float = 0.05,
    seed: int = 42,
) -> DataFrame:
    """Return a deterministic transcripts DataFrame with planted clusters."""
    tools_per_cluster = max(1, n_tools // n_clusters)
    sd = f"synth:{seed}"

    convs = (
        spark.range(n_convs)
        .withColumnRenamed("id", "conv")
        .withColumn("cluster", (F.col("conv") % n_clusters).cast("long"))
        .withColumn(
            "n_turns",
            (
                F.lit(min_turns)
                + F.pmod(F.xxhash64(F.lit(sd + ":nt"), F.col("conv")), F.lit(max_turns - min_turns + 1))
            ).cast("int"),
        )
    )

    turns = convs.select(
        "conv",
        "cluster",
        F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1)).alias("turn_idx"),
    )

    u_tool = _u(sd + ":tool", F.col("conv"), F.col("turn_idx"))
    u_cross = _u(sd + ":cross", F.col("conv"), F.col("turn_idx"))
    # Zipf-ish skew inside a slice: squaring the uniform biases toward index 0,
    # giving every cluster a hub tool (exercises skew handling downstream).
    local_idx = F.floor(F.pow(u_tool, F.lit(2.0)) * tools_per_cluster).cast("long")
    global_idx = F.floor(F.pow(u_tool, F.lit(2.0)) * n_tools).cast("long")
    tool_idx = F.when(
        u_cross < F.lit(cross_cluster_p), global_idx
    ).otherwise(F.col("cluster") * tools_per_cluster + local_idx)

    role = (
        F.when(F.col("turn_idx") % 3 == 2, F.lit("tool"))
        .when(F.col("turn_idx") % 2 == 0, F.lit("user"))
        .otherwise(F.lit("assistant"))
    )

    out = (
        turns.withColumn("role", role)
        .withColumn(
            "tool",
            F.when(
                F.col("role") == "tool",
                F.format_string("tool_%03d", tool_idx.cast("int")),
            ).otherwise(F.lit(None).cast("string")),
        )
        .withColumn("conv_id", F.format_string("conv_%08d", F.col("conv").cast("int")))
        .withColumn(
            "text",
            F.format_string(
                "c%d t%d %s w%d w%d w%d",
                F.col("conv").cast("int"),
                F.col("turn_idx"),
                F.col("role"),
                F.pmod(F.xxhash64(F.lit(sd + ":w1"), "conv", "turn_idx"), F.lit(997)).cast("int"),
                F.pmod(F.xxhash64(F.lit(sd + ":w2"), "conv", "turn_idx"), F.lit(997)).cast("int"),
                F.pmod(F.xxhash64(F.lit(sd + ":w3"), "conv", "turn_idx"), F.lit(997)).cast("int"),
            ),
        )
        .withColumn(
            "ts",
            F.timestamp_seconds(
                F.lit(1704067200) + F.col("conv") * 3600 + F.col("turn_idx") * 7
            ),
        )
        .select(
            "conv_id",
            F.col("turn_idx").cast("int").alias("turn_idx"),
            "role",
            "text",
            "tool",
            "ts",
        )
    )
    return out


def synth_ground_truth(
    spark: SparkSession,
    n_convs: int = 1000,
    n_tools: int = 24,
    n_clusters: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Planted community labels ``(actor string, comm long)``.

    Conversation actors belong to ``conv % n_clusters``; tool actors belong
    to the cluster that owns their slice of the pool.  Mirrors the
    reference's ground-truth tables (reference __main__.py:246-366) but
    synthesized, per the no-external-data rule.
    """
    tools_per_cluster = max(1, n_tools // n_clusters)
    convs = spark.range(n_convs).select(
        F.format_string("conv:conv_%08d", F.col("id").cast("int")).alias("actor"),
        (F.col("id") % n_clusters).cast("long").alias("comm"),
    )
    tools = spark.range(n_tools).select(
        F.format_string("tool:tool_%03d", F.col("id").cast("int")).alias("actor"),
        F.least(
            F.floor(F.col("id") / tools_per_cluster).cast("long"),
            F.lit(n_clusters - 1).cast("long"),
        ).alias("comm"),
    )
    return convs.unionByName(tools)
