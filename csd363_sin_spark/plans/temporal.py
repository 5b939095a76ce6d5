"""Temporal graph views — per-period co-occurrence snapshots.

The transcripts table carries event time (``ts``), so the engine can
slice the co-occurrence graph by period and track its evolution — the
standard "graph over time" analysis (activity growth, density drift,
when did two communities first touch) that a static induction throws
away.

A conversation is atomic: it belongs wholly to the period of its FIRST
event (deterministic min-ts assignment), so each period's edge table is
exactly the batch induction restricted to that period's conversations —
no edge is split across periods and the per-period tables sum to the
full graph's weights.

Scale: one min-ts aggregate per conversation (map-side combined), the
same bounded per-conversation pair expansion as the batch induction,
and per-(period, edge) hash aggregation.  Partition-prunable on period
if the output is written partitioned by day — the layout a 100 TB
deployment would use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from csd363_sin_spark.plans.induce import conv_actor_pairs

_FMT = {"day": "yyyy-MM-dd", "month": "yyyy-MM"}


def conv_periods(transcripts: DataFrame, granularity: str = "day") -> DataFrame:
    """(conv_id, period string) — the period of the conversation's first
    event."""
    return transcripts.groupBy("conv_id").agg(
        F.date_format(F.min("ts"), _FMT[granularity]).alias("period")
    )


def temporal_edges(transcripts: DataFrame, granularity: str = "day") -> DataFrame:
    """Per-period weighted co-occurrence edges:
    ``(period, src_actor, dst_actor, weight)`` with src < dst — the batch
    induction keyed by conversation period."""
    pairs = conv_actor_pairs(transcripts).join(
        conv_periods(transcripts, granularity), "conv_id"
    )
    a = pairs.select("conv_id", "period", F.col("actor").alias("src_actor"))
    b = pairs.select("conv_id", "period", F.col("actor").alias("dst_actor"))
    return (
        a.join(b, ["conv_id", "period"])
        .filter(F.col("src_actor") < F.col("dst_actor"))
        .groupBy("period", "src_actor", "dst_actor")
        .agg(F.count(F.lit(1)).cast("double").alias("weight"))
    )


def conversation_stats(transcripts: DataFrame) -> DataFrame:
    """Per-conversation profile: ``(conv_id, n_turns, n_tools, n_chars,
    duration_sec)`` — turn count, distinct tools invoked, total text
    volume, and wall-clock span.  One grouped aggregation."""
    return transcripts.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.count_distinct("tool").alias("n_tools"),
        F.sum(F.length("text")).alias("n_chars"),
        (
            F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))
        ).alias("duration_sec"),
    )


def tool_usage_stats(transcripts: DataFrame) -> DataFrame:
    """Per-tool adoption profile: ``(tool, n_calls, n_convs, first_day,
    last_day)`` — call volume, conversation reach, and the activity
    span.  One grouped aggregation over tool turns."""
    return (
        transcripts.filter(F.col("tool").isNotNull())
        .groupBy("tool")
        .agg(
            F.count(F.lit(1)).alias("n_calls"),
            F.count_distinct("conv_id").alias("n_convs"),
            F.date_format(F.min("ts"), "yyyy-MM-dd").alias("first_day"),
            F.date_format(F.max("ts"), "yyyy-MM-dd").alias("last_day"),
        )
    )


def temporal_graph_stats(
    transcripts: DataFrame, granularity: str = "day"
) -> DataFrame:
    """Per-period graph evolution report: ``(period, n_convs, n_actors,
    n_edges, total_weight)`` — conversation volume, active-actor count,
    distinct edge count, and total co-occurrence mass per period."""
    periods = conv_periods(transcripts, granularity)
    pairs = conv_actor_pairs(transcripts).join(periods, "conv_id")
    convs = periods.groupBy("period").agg(F.count(F.lit(1)).alias("n_convs"))
    actors = (
        pairs.select("period", "actor")
        .distinct()
        .groupBy("period")
        .agg(F.count(F.lit(1)).alias("n_actors"))
    )
    edges = temporal_edges(transcripts, granularity).groupBy("period").agg(
        F.count(F.lit(1)).alias("n_edges"),
        F.sum("weight").alias("total_weight"),
    )
    return convs.join(actors, "period").join(edges, "period")


def tool_activity_bursts(
    transcripts: DataFrame, granularity: str = "day", z_threshold: float = 2.0
) -> DataFrame:
    """Per-(tool, period) activity with burst flags: a period is a burst
    when its call count exceeds the tool's own mean by ``z_threshold``
    population standard deviations (z-score over the tool's OBSERVED
    periods; tools seen in a single period have sd 0 and never burst —
    the conservative convention).

    Returns ``(tool, period, calls, z_score, is_burst)`` rounded to 6 dp.
    Plan: one (tool, period) hash aggregation + one per-tool window over
    the tiny per-period rollup — the heavy O(rows) work is the first
    map-side-combined agg; the window runs on |tools| x |periods| rows."""
    from pyspark.sql import Window

    per = (
        transcripts.filter(F.col("tool").isNotNull())
        .groupBy("tool", F.date_format("ts", _FMT[granularity]).alias("period"))
        .agg(F.count(F.lit(1)).alias("calls"))
    )
    w = Window.partitionBy("tool")
    stats = per.select(
        "tool",
        "period",
        "calls",
        F.avg("calls").over(w).alias("mu"),
        F.stddev_pop("calls").over(w).alias("sd"),
    )
    z = F.when(
        F.col("sd") > 0, (F.col("calls") - F.col("mu")) / F.col("sd")
    ).otherwise(F.lit(0.0))
    return stats.select(
        "tool",
        "period",
        "calls",
        F.round(z, 6).alias("z_score"),
        (F.round(z, 6) >= z_threshold).alias("is_burst"),
    )


def role_transition_matrix(transcripts: DataFrame) -> DataFrame:
    """Turn-taking profile: ``(role_from, role_to, transitions, frac)``
    over consecutive turns within each conversation (one lag window per
    conversation — the same shape as the handoff-graph induction — plus
    one map-side-combined aggregation)."""
    from pyspark.sql import Window

    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    pairs = (
        transcripts.select(
            "conv_id",
            F.col("role").alias("role_from"),
            F.lead("role").over(w).alias("role_to"),
        )
        .filter(F.col("role_to").isNotNull())
        .groupBy("role_from", "role_to")
        .agg(F.count(F.lit(1)).alias("transitions"))
    )
    total = pairs.agg(F.sum("transitions").alias("total"))
    return pairs.crossJoin(total).select(
        "role_from",
        "role_to",
        "transitions",
        F.round(F.col("transitions") / F.col("total"), 6).alias("frac"),
    )


def tool_sequence_ngrams(
    transcripts: DataFrame, n: int = 2, min_support: int = 1
) -> DataFrame:
    """Frequent consecutive tool-call sequences — the workflow-mining
    view of agent transcripts (which tool chains actually occur, and in
    how many conversations).

    The sequence is each conversation's TOOL turns in turn order (non-tool
    turns are transparent: ``search -> [assistant text] -> fetch`` still
    counts the ``search>fetch`` bigram, matching how process-mining
    treats activity logs).  Returns ``(ngram, occurrences,
    conversations)`` for every length-``n`` window with at least
    ``min_support`` total occurrences, ``>``-joined tool names.

    Plan: one filter, one per-conversation lead() window over the tool
    subsequence, one hash aggregation — identical shuffle shape to the
    handoff induction (state per task = one conversation's tool turns,
    bounded), so the 100 TB story is the same.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    seq = transcripts.filter(F.col("tool").isNotNull()).select(
        "conv_id", "turn_idx", "tool"
    )
    leads = seq.select(
        "conv_id",
        F.col("tool").alias("t0"),
        *[F.lead("tool", i).over(w).alias(f"t{i}") for i in range(1, n)],
    )
    grams = leads.filter(F.col(f"t{n - 1}").isNotNull()).select(
        "conv_id",
        F.concat_ws(">", *[F.col(f"t{i}") for i in range(n)]).alias("ngram"),
    )
    return (
        grams.groupBy("ngram")
        .agg(
            F.count(F.lit(1)).alias("occurrences"),
            F.count_distinct("conv_id").alias("conversations"),
        )
        .filter(F.col("occurrences") >= int(min_support))
    )


def sessionize(transcripts: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Split each conversation into sessions at inactivity gaps — the
    classic web-log sessionization applied to agent transcripts: a new
    session starts whenever the gap to the previous turn exceeds
    ``gap_minutes``.

    Returns the transcript columns plus ``session_idx`` (0-based within
    the conversation) and ``session_id`` (``conv_id#idx``).  Plan: one
    lag window + one running-sum window, both partitioned by ``conv_id``
    (state per task = one conversation — bounded at any corpus size),
    no joins.  Gap arithmetic is integer microseconds under the
    session's pinned UTC, so the SQL oracle matches exactly.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap_us = int(gap_minutes) * 60_000_000
    brk = (
        (us - F.lag(us).over(w)) > F.lit(gap_us)
    ).cast("int")
    with_idx = transcripts.select(
        "*",
        F.sum(F.coalesce(brk, F.lit(0)))
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("session_idx"),
    )
    return with_idx.select(
        "*",
        F.concat_ws("#", "conv_id", F.col("session_idx").cast("string")).alias(
            "session_id"
        ),
    )


def response_latency_stats(transcripts: DataFrame) -> DataFrame:
    """Per-role response-latency profile: for every turn with a
    predecessor in its conversation, latency = its ``ts`` minus the
    previous turn's ``ts``; grouped by the RESPONDING turn's role.

    Returns ``(role, n_responses, avg_latency_s, min_latency_s,
    max_latency_s)`` — seconds as microsecond-exact doubles (the diff is
    computed in integer microseconds, so Spark and the SQL oracle agree
    bit-for-bit after the 6 dp round).  One lag window per conversation
    plus one map-side-combined aggregation.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    # ts arrives TIMESTAMP_NTZ from parquet; the session pins UTC
    # (session.py), so the cast is the exact epoch and matches the SQL
    # oracle's epoch_us over naive timestamps
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    lat = (
        transcripts.select(
            "conv_id",
            "turn_idx",
            "role",
            (us - F.lag(us).over(w)).alias("lat_us"),
        )
        .filter(F.col("lat_us").isNotNull())
    )
    return lat.groupBy("role").agg(
        F.count(F.lit(1)).alias("n_responses"),
        F.round(F.avg(F.col("lat_us")) / 1e6, 6).alias("avg_latency_s"),
        F.round(F.min("lat_us") / 1e6, 6).alias("min_latency_s"),
        F.round(F.max("lat_us") / 1e6, 6).alias("max_latency_s"),
    )
