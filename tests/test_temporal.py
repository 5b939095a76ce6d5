"""Temporal co-occurrence snapshots: hand-computed + batch-consistency."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from csd363_sin_spark.plans.temporal import (
    conv_periods,
    temporal_edges,
    temporal_graph_stats,
)

_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, "
    "ts timestamp"
)


def _fixture(spark):
    rows = [
        ("A", 0, "user", "t", None, datetime(2024, 1, 1, 5)),
        ("A", 1, "tool", "t", "x", datetime(2024, 1, 1, 6)),
        ("B", 0, "tool", "t", "x", datetime(2024, 1, 1, 9)),
        ("B", 1, "tool", "t", "y", datetime(2024, 1, 2, 1)),  # still day-1 conv
        ("C", 0, "tool", "t", "x", datetime(2024, 1, 2, 3)),
    ]
    return spark.createDataFrame(rows, _SCHEMA)


def test_temporal_edges_hand_computed(spark):
    t = _fixture(spark)
    assert {r["conv_id"]: r["period"] for r in conv_periods(t).collect()} == {
        "A": "2024-01-01", "B": "2024-01-01", "C": "2024-01-02",
    }
    got = {
        (r["period"], r["src_actor"], r["dst_actor"]): r["weight"]
        for r in temporal_edges(t).collect()
    }
    assert got == {
        ("2024-01-01", "conv:A", "tool:x"): 1.0,
        ("2024-01-01", "conv:B", "tool:x"): 1.0,
        ("2024-01-01", "conv:B", "tool:y"): 1.0,
        ("2024-01-01", "tool:x", "tool:y"): 1.0,
        ("2024-01-02", "conv:C", "tool:x"): 1.0,
    }
    stats = {
        r["period"]: (r["n_convs"], r["n_actors"], r["n_edges"], r["total_weight"])
        for r in temporal_graph_stats(t).collect()
    }
    assert stats == {
        "2024-01-01": (2, 4, 4, 4.0),
        "2024-01-02": (1, 2, 1, 1.0),
    }


def test_conversation_and_tool_stats(spark):
    from csd363_sin_spark.plans.temporal import conversation_stats, tool_usage_stats

    t = _fixture(spark)
    cs = {
        r["conv_id"]: (r["n_turns"], r["n_tools"], r["n_chars"], r["duration_sec"])
        for r in conversation_stats(t).collect()
    }
    assert cs == {
        "A": (2, 1, 2, 3600),
        "B": (2, 2, 2, 16 * 3600),
        "C": (1, 1, 1, 0),
    }
    tus = {
        r["tool"]: (r["n_calls"], r["n_convs"], r["first_day"], r["last_day"])
        for r in tool_usage_stats(t).collect()
    }
    assert tus == {
        "x": (3, 3, "2024-01-01", "2024-01-02"),
        "y": (1, 1, "2024-01-02", "2024-01-02"),
    }


def test_temporal_edges_sum_to_batch_induction(spark):
    # conversations are atomic, so per-period weights sum to the batch graph
    from csd363_sin_spark.plans.induce import induce_actor_edges
    from csd363_sin_spark.sources.synth import synth_transcripts

    t = synth_transcripts(spark, n_convs=60, n_tools=12, n_clusters=3, seed=7)
    summed = {
        (r["src_actor"], r["dst_actor"]): r["w"]
        for r in temporal_edges(t, "day")
        .groupBy("src_actor", "dst_actor")
        .agg(F.sum("weight").alias("w"))
        .collect()
    }
    batch = {
        (r["src_actor"], r["dst_actor"]): r["weight"]
        for r in induce_actor_edges(t).collect()
    }
    assert summed == batch


def test_tool_activity_bursts_hand_computed(spark):
    """Planted series: tool A has 4 quiet days + one spike (burst); tool B
    is flat (z = 0 everywhere); tool C appears once (sd 0, never bursts)."""
    import datetime as dt

    from csd363_sin_spark.plans.temporal import tool_activity_bursts

    rows = []

    def day(d):
        return dt.datetime(2026, 1, d)

    cid = 0
    for d, n in [(1, 2), (2, 2), (3, 2), (4, 2), (5, 12)]:  # tool A
        for i in range(n):
            cid += 1
            rows.append((f"c{cid}", 0, "assistant", "x", "A", day(d)))
    for d in (1, 2, 3):  # tool B flat
        cid += 1
        rows.append((f"c{cid}", 0, "assistant", "x", "B", day(d)))
    cid += 1
    rows.append((f"c{cid}", 0, "assistant", "x", "C", day(1)))  # singleton
    t = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    got = {
        (r["tool"], r["period"]): (r["calls"], r["z_score"], r["is_burst"])
        for r in tool_activity_bursts(t).collect()
    }
    # A: mean 4, sd_pop 4 -> spike z = (12-4)/4 = 2.0 (burst at threshold)
    assert got[("A", "2026-01-05")] == (12, 2.0, True)
    assert got[("A", "2026-01-01")] == (2, -0.5, False)
    for d in ("2026-01-01", "2026-01-02", "2026-01-03"):
        assert got[("B", d)] == (1, 0.0, False)
    assert got[("C", "2026-01-01")] == (1, 0.0, False)


def test_role_transition_matrix_hand_computed(spark):
    import datetime as dt

    from csd363_sin_spark.plans.temporal import role_transition_matrix

    rows = [
        ("c1", 0, "user", "q", None, dt.datetime(2026, 1, 1)),
        ("c1", 1, "assistant", "a", "search", dt.datetime(2026, 1, 1)),
        ("c1", 2, "user", "q2", None, dt.datetime(2026, 1, 1)),
        ("c2", 0, "user", "q", None, dt.datetime(2026, 1, 2)),
        ("c2", 1, "assistant", "a", None, dt.datetime(2026, 1, 2)),
    ]
    t = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    got = {
        (r["role_from"], r["role_to"]): (r["transitions"], r["frac"])
        for r in role_transition_matrix(t).collect()
    }
    assert got == {
        ("user", "assistant"): (2, round(2 / 3, 6)),
        ("assistant", "user"): (1, round(1 / 3, 6)),
    }


def test_tool_sequence_ngrams_hand_computed(spark):
    from datetime import datetime

    from csd363_sin_spark.plans.temporal import tool_sequence_ngrams

    rows = [
        # c1 tool subsequence: x, y, x  -> bigrams x>y, y>x; trigram x>y>x
        ("c1", 0, "tool", "t", "x", datetime(2026, 1, 1, 0)),
        ("c1", 1, "user", "t", None, datetime(2026, 1, 1, 1)),
        ("c1", 2, "tool", "t", "y", datetime(2026, 1, 1, 2)),
        ("c1", 3, "tool", "t", "x", datetime(2026, 1, 1, 3)),
        # c2 tool subsequence: x, y  -> bigram x>y (2nd conv for support)
        ("c2", 0, "tool", "t", "x", datetime(2026, 1, 2, 0)),
        ("c2", 1, "tool", "t", "y", datetime(2026, 1, 2, 1)),
        # c3: single tool turn -> no bigram
        ("c3", 0, "tool", "t", "z", datetime(2026, 1, 3, 0)),
    ]
    t = spark.createDataFrame(rows, _SCHEMA)
    got = {
        r["ngram"]: (r["occurrences"], r["conversations"])
        for r in tool_sequence_ngrams(t, n=2).collect()
    }
    assert got == {"x>y": (2, 2), "y>x": (1, 1)}
    tri = {
        r["ngram"]: (r["occurrences"], r["conversations"])
        for r in tool_sequence_ngrams(t, n=3).collect()
    }
    assert tri == {"x>y>x": (1, 1)}
    # min_support filters the singleton
    sup = {r["ngram"] for r in tool_sequence_ngrams(t, n=2, min_support=2).collect()}
    assert sup == {"x>y"}


def test_response_latency_stats_hand_computed(spark):
    from datetime import datetime

    from csd363_sin_spark.plans.temporal import response_latency_stats

    rows = [
        ("c1", 0, "user", "t", None, datetime(2026, 1, 1, 0, 0, 0)),
        ("c1", 1, "assistant", "t", None, datetime(2026, 1, 1, 0, 0, 2)),
        ("c1", 2, "user", "t", None, datetime(2026, 1, 1, 0, 0, 5)),
        ("c2", 0, "user", "t", None, datetime(2026, 1, 2, 0, 0, 0)),
        ("c2", 1, "assistant", "t", None, datetime(2026, 1, 2, 0, 0, 4)),
    ]
    t = spark.createDataFrame(rows, _SCHEMA)
    got = {
        r["role"]: (
            r["n_responses"],
            r["avg_latency_s"],
            r["min_latency_s"],
            r["max_latency_s"],
        )
        for r in response_latency_stats(t).collect()
    }
    # assistant responds after 2 s and 4 s; user's turn 2 comes 3 s later
    assert got == {
        "assistant": (2, 3.0, 2.0, 4.0),
        "user": (1, 3.0, 3.0, 3.0),
    }


def test_sessionize_hand_computed(spark):
    from datetime import datetime

    from csd363_sin_spark.plans.temporal import sessionize

    rows = [
        ("c1", 0, "user", "t", None, datetime(2026, 1, 1, 9, 0)),
        ("c1", 1, "assistant", "t", None, datetime(2026, 1, 1, 9, 10)),
        # 50-min gap -> new session
        ("c1", 2, "user", "t", None, datetime(2026, 1, 1, 10, 0)),
        ("c1", 3, "assistant", "t", None, datetime(2026, 1, 1, 10, 5)),
        # exactly 30 min is NOT a break (strict >)
        ("c1", 4, "user", "t", None, datetime(2026, 1, 1, 10, 35)),
        ("c2", 0, "user", "t", None, datetime(2026, 1, 2, 0, 0)),
    ]
    t = spark.createDataFrame(rows, _SCHEMA)
    got = {
        (r["conv_id"], r["turn_idx"]): (r["session_idx"], r["session_id"])
        for r in sessionize(t, gap_minutes=30).collect()
    }
    assert got == {
        ("c1", 0): (0, "c1#0"),
        ("c1", 1): (0, "c1#0"),
        ("c1", 2): (1, "c1#1"),
        ("c1", 3): (1, "c1#1"),
        ("c1", 4): (1, "c1#1"),
        ("c2", 0): (0, "c2#0"),
    }
