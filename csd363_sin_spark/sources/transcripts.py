"""Transcript readers / adapters (engine sources, SURVEY.md §2.1 S1-S10).

The engine's canonical input is a transcripts table with the exact shape
from BASELINE.json ``input_hint``::

    conv_id string, turn_idx int32, role string, text string,
    tool string, ts timestamp

Two ways to get one in the sandbox:
* :func:`csd363_sin_spark.sources.synth.synth_transcripts` — deterministic
  generator (planted communities) used by unit tests and the bench;
* :func:`transcripts_from_events` — a pure-SQL-expressible deterministic
  adapter over the driver-provided ``events`` parquet table, used by the
  DuckDB-oracle correctness gate (the same arithmetic is reproduced in
  ANSI SQL inside ``__spark_entry__.oracle_sql``).

Also provides the reference's text-format readers for parity:
edge-list scan (reference data_io.py:71-132), SNAP ground-truth scan
(reference __main__.py:246-272) and pair-format ground-truth scan
(reference __main__.py:274-293).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("tool", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)

#: turns per synthetic conversation in the events adapter
EVENTS_TURNS_PER_CONV = 8


def transcripts_from_events(events: DataFrame) -> DataFrame:
    """Derive a deterministic transcripts table from the ``events`` table.

    Pure column arithmetic (no hashing, no RNG) so DuckDB can reproduce it
    exactly for the oracle comparison:

    * conversation = block of 8 consecutive ``event_id``s;
    * every third turn within a row-quadruple is a tool turn; the tool name
      combines ``event_type`` with a user bucket, giving a pool of a few
      dozen tool actors with realistic popularity skew.
    """
    eid = F.col("event_id")
    return events.select(
        F.format_string(
            "conv_%08d", F.floor(eid / EVENTS_TURNS_PER_CONV).cast("int")
        ).alias("conv_id"),
        F.pmod(eid, F.lit(EVENTS_TURNS_PER_CONV)).cast("int").alias("turn_idx"),
        F.when(F.pmod(eid, F.lit(4)) == 2, F.lit("tool"))
        .when(F.pmod(eid, F.lit(4)) == 0, F.lit("user"))
        .otherwise(F.lit("assistant"))
        .alias("role"),
        F.concat_ws("#", F.col("event_type"), eid.cast("string")).alias("text"),
        F.when(
            F.pmod(eid, F.lit(4)) == 2,
            F.concat_ws(
                "_", F.col("event_type"), F.pmod(F.col("user_id"), F.lit(4)).cast("string")
            ),
        )
        .otherwise(F.lit(None).cast("string"))
        .alias("tool"),
        F.col("ts"),
    )


# SQL fragment mirroring transcripts_from_events, runnable by DuckDB on the
# pre-registered `events` view.  Kept adjacent to the Spark code so the two
# stay in sync.
TRANSCRIPTS_FROM_EVENTS_SQL = """
SELECT
  printf('conv_%08d', CAST(FLOOR(event_id / 8) AS INT))            AS conv_id,
  CAST(event_id % 8 AS INT)                                        AS turn_idx,
  CASE WHEN event_id % 4 = 2 THEN 'tool'
       WHEN event_id % 4 = 0 THEN 'user'
       ELSE 'assistant' END                                        AS role,
  event_type || '#' || CAST(event_id AS VARCHAR)                   AS text,
  CASE WHEN event_id % 4 = 2
       THEN event_type || '_' || CAST(user_id % 4 AS VARCHAR)
       ELSE NULL END                                               AS tool,
  ts
FROM events
"""


def read_edge_list(spark: SparkSession, path: str, sample_size: int | None = None) -> DataFrame:
    """Parse a whitespace-separated ``u v`` edge-list text file.

    Skips ``#`` comment lines and malformed lines, like the reference
    loader (reference data_io.py:94-111).  ``sample_size`` reproduces the
    reference's *prefix* sample semantics (first N valid edges in file
    order, reference data_io.py:88-111) deterministically via an
    order-by-line-number limit.
    """
    lines = (
        spark.read.text(path)
        .withColumn("line_no", F.monotonically_increasing_id())
        .filter(~F.col("value").startswith("#"))
        .withColumn("parts", F.split(F.trim("value"), r"\s+"))
        .filter(F.size("parts") >= 2)
        .select(
            "line_no",
            F.col("parts")[0].try_cast("long").alias("src"),
            F.col("parts")[1].try_cast("long").alias("dst"),
        )
        .dropna(subset=["src", "dst"])
    )
    if sample_size is not None:
        lines = lines.orderBy("line_no").limit(int(sample_size))
    return lines.select("src", "dst", F.lit(1.0).alias("weight"))


def write_edge_list(edges: DataFrame, path: str) -> None:
    """Write ``u v`` text lines (reference data_io.py:134-162)."""
    edges.select(
        F.concat_ws(" ", F.col("src").cast("string"), F.col("dst").cast("string")).alias("value")
    ).write.mode("overwrite").text(path)


def read_ground_truth_snap(spark: SparkSession, path: str) -> DataFrame:
    """SNAP format: line *i* lists the members of community *i*
    (reference __main__.py:246-272).  Returns ``(vertex long, comm long)``.
    """
    return (
        spark.read.text(path)
        .withColumn("comm", F.monotonically_increasing_id())
        .filter(~F.col("value").startswith("#"))
        .select(
            F.posexplode(F.split(F.trim("value"), r"\s+")).alias("pos", "tok"),
            "comm",
        )
        .select(F.col("tok").try_cast("long").alias("vertex"), F.col("comm").cast("long"))
        .dropna(subset=["vertex"])
    )


def read_ground_truth_pairs(spark: SparkSession, path: str) -> DataFrame:
    """``node community`` pair format (reference __main__.py:274-293)."""
    return (
        spark.read.text(path)
        .filter(~F.col("value").startswith("#"))
        .withColumn("parts", F.split(F.trim("value"), r"\s+"))
        .filter(F.size("parts") >= 2)
        .select(
            F.col("parts")[0].try_cast("long").alias("vertex"),
            F.col("parts")[1].try_cast("long").alias("comm"),
        )
        .dropna()
    )
