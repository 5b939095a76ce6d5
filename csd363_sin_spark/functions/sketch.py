"""Engine-portable HyperLogLog sketch (approximate distinct counting).

The scale path for COUNT(DISTINCT) over 100 TB is a mergeable sketch:
registers aggregate map-side (one ``max`` per register), merge across
partitions/days/streams for free, and never shuffle raw values.  Spark's
built-in ``approx_count_distinct`` is exactly this — but its HLL++ is
not reproducible outside the JVM, so it cannot be oracle-checked.  This
module implements classic HyperLogLog (Flajolet et al. 2007) over the
engine-portable md5 hash family (functions/dedup.portable_hash64), with
every arithmetic step chosen to be bit-identical in Spark, DuckDB and
Python:

* ``h`` is a 60-bit non-negative hash; register index = low ``P`` bits,
  the remaining ``60-P`` bits feed the rank;
* rank ``rho`` = trailing-zero count + 1 (a geometric variable, same
  distribution as the classic leading-zero rank), computed by a
  generated modulus CASE ladder — no engine-specific bit intrinsics;
* the harmonic denominator ``sum 2^-reg`` is scaled by ``2^RMAX`` into
  an exact BIGINT sum (every term is an integer; the total fits in 62
  bits), so the only floating-point steps are one literal-by-integer
  division and (in the small-range regime) one ``ln`` — deterministic
  across engines to well below the 6-dp gate rounding.

Accuracy: m = 64 registers -> standard error 1.04/sqrt(64) ~ 13%; the
small-range linear-counting correction (est <= 2.5m with empty
registers) keeps low cardinalities near-exact.  ``P`` is a module
constant rather than a parameter because the integer-exact denominator
bound (m * 2^RMAX < 2^63) ties the two together; a production deployment
wanting m = 2^14 would drop RMAX accordingly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from csd363_sin_spark.functions.dedup import portable_hash64

P = 6  # register-index bits
M = 1 << P  # 64 registers
RMAX = 55  # max rank: 60-P = 54 payload bits -> rho in [1, 55]
ALPHA_NUMER = 0.709 * (M * M) * float(1 << RMAX)  # alpha_64 * m^2 * 2^RMAX
_LC_THRESHOLD = 2.5 * M  # linear-counting cutoff (classic HLL)


def hll_rho_expr(rest_col):
    """Trailing-zero rank of the payload bits: rho = tz(rest) + 1,
    rho = RMAX when rest == 0.  Generated WHEN ladder — the SQL mirror
    (:func:`hll_rho_sql`) is generated from the same loop."""
    expr = None
    for k in range(60 - P):
        cond = F.pmod(rest_col, F.lit(1 << (k + 1))) == F.lit(1 << k)
        expr = F.when(cond, F.lit(k + 1)) if expr is None else expr.when(
            cond, F.lit(k + 1)
        )
    return expr.otherwise(F.lit(RMAX)).cast("int")


def hll_rho_sql(rest: str) -> str:
    """DuckDB mirror of :func:`hll_rho_expr` over the expression ``rest``."""
    whens = "".join(
        f" WHEN ({rest}) % {1 << (k + 1)} = {1 << k} THEN {k + 1}"
        for k in range(60 - P)
    )
    return f"(CASE{whens} ELSE {RMAX} END)"


def hll_registers(df: DataFrame, keys: list[str], value_col: str) -> DataFrame:
    """Sparse HLL registers per key group: ``(keys..., idx int, reg int)``
    — one row per non-empty register (reg >= 1 always; absent = 0).
    One map-side-combined aggregation; mergeable by re-aggregating max."""
    h = portable_hash64(F.col(value_col))
    rest = F.shiftright(h, P)
    rows = df.select(
        *keys,
        F.pmod(h, F.lit(M)).cast("int").alias("idx"),
        hll_rho_expr(rest).alias("rho"),
    )
    return rows.groupBy(*keys, "idx").agg(F.max("rho").alias("reg"))


def hll_estimate_expr():
    """Aggregate expressions + final estimate over a register group.

    Returns (agg_exprs, est_builder): apply ``agg_exprs`` in a
    ``groupBy(keys)``, then ``est_builder`` as a select expression."""
    agg = [
        F.count(F.lit(1)).alias("_present"),
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {RMAX} - reg)")).alias(
            "_dsum"
        ),
    ]

    def est():
        zeros = F.lit(M) - F.col("_present")
        denom = F.col("_dsum") + zeros.cast("long") * F.lit(1 << RMAX).cast(
            "long"
        )
        raw = F.lit(ALPHA_NUMER) / denom.cast("double")
        lc = F.lit(float(M)) * F.log(F.lit(float(M)) / zeros.cast("double"))
        return F.when(
            (raw <= F.lit(_LC_THRESHOLD)) & (zeros > 0), lc
        ).otherwise(raw)

    return agg, est


def hll_estimate(registers: DataFrame, keys: list[str]) -> DataFrame:
    """Collapse sparse registers into ``(keys..., approx_distinct double)``."""
    agg, est = hll_estimate_expr()
    return (
        registers.groupBy(*keys)
        .agg(*agg)
        .select(*keys, est().alias("approx_distinct"))
    )


def hll_distinct(df: DataFrame, keys: list[str], value_col: str) -> DataFrame:
    """One-shot approximate COUNT(DISTINCT value) per key group."""
    return hll_estimate(hll_registers(df, keys, value_col), keys)


def hll_estimate_sql(present: str = "present", dsum: str = "dsum") -> str:
    """DuckDB mirror of :func:`hll_estimate_expr`'s final expression,
    over columns ``present`` (non-empty registers) and ``dsum``
    (BIGINT sum of 1 << (RMAX - reg))."""
    zeros = f"({M} - {present})"
    denom = f"({dsum} + CAST({zeros} AS BIGINT) * (CAST(1 AS BIGINT) << {RMAX}))"
    raw = f"({ALPHA_NUMER!r} / CAST({denom} AS DOUBLE))"
    lc = f"({float(M)!r} * ln({float(M)!r} / CAST({zeros} AS DOUBLE)))"
    return (
        f"(CASE WHEN {raw} <= {_LC_THRESHOLD!r} AND {zeros} > 0 "
        f"THEN {lc} ELSE {raw} END)"
    )


# DuckDB fragment computing (idx, rho) from a string expression VAL —
# mirrors hll_registers' per-row step (same md5 hash family).
def hll_row_sql(val: str) -> str:
    h = f"CAST('0x' || substr(md5({val}), 1, 15) AS BIGINT)"
    return (
        f"({h}) % {M} AS idx, "
        + hll_rho_sql(f"({h}) // {M}")
        + " AS rho"
    )


# --------------------------------------------------------------------------
# Portable Bloom filter: the scale path for set-membership screens when the
# reference set is too big to broadcast exactly.  32 usable bits per BIGINT
# word (no sign games), k independent md5-salted positions per value —
# every step bit-identical in Spark, DuckDB and Python.
# --------------------------------------------------------------------------

BLOOM_BITS = 1 << 14  # default m: 16384 bits = 512 words
BLOOM_K = 4  # hash functions
_WORD_BITS = 32


def _bloom_positions(value_col, k: int, m_bits: int):
    """k salted bit positions for a value — one (pos) Column each."""
    return [
        F.pmod(
            portable_hash64(F.concat(F.lit(f"bloom{i}:"), value_col)),
            F.lit(m_bits),
        )
        for i in range(k)
    ]


def bloom_build(
    df: DataFrame, value_col: str, m_bits: int = BLOOM_BITS, k: int = BLOOM_K
) -> DataFrame:
    """Build a Bloom filter over ``df[value_col]``: ``(word int, bits
    long)`` — one row per non-zero 32-bit word.  One explode + one
    map-side-combined ``bit_or``; mergeable across shards by re-OR-ing."""
    pos = F.explode(F.array(*_bloom_positions(F.col(value_col), k, m_bits)))
    rows = df.select(pos.alias("pos")).select(
        (F.col("pos") / _WORD_BITS).cast("int").alias("word"),
        F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(pos % {_WORD_BITS} AS INT))").alias(
            "mask"
        ),
    )
    return rows.groupBy("word").agg(F.expr("bit_or(mask)").alias("bits"))


def bloom_probe(
    df: DataFrame,
    value_col: str,
    bloom: DataFrame,
    m_bits: int = BLOOM_BITS,
    k: int = BLOOM_K,
) -> DataFrame:
    """Membership screen: input rows + ``maybe_member boolean`` (true =
    all k bits set — possibly present, one-sided error; false = DEFINITELY
    absent).  The filter table is broadcast (it is at most m/32 rows);
    per value the probe is k map-side hash-join lookups + one bool_and."""
    probes = df.select(value_col).distinct()
    exploded = probes.select(
        value_col,
        F.posexplode(
            F.array(*_bloom_positions(F.col(value_col), k, m_bits))
        ).alias("i", "pos"),
    ).select(
        value_col,
        (F.col("pos") / _WORD_BITS).cast("int").alias("word"),
        F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(pos % {_WORD_BITS} AS INT))").alias(
            "mask"
        ),
    )
    joined = exploded.join(F.broadcast(bloom), "word", "left").select(
        value_col,
        (
            F.col("bits").isNotNull()
            & (F.col("bits").bitwiseAND(F.col("mask")) == F.col("mask"))
        ).alias("hit"),
    )
    flags = joined.groupBy(value_col).agg(
        F.min(F.col("hit").cast("int")).cast("boolean").alias("maybe_member")
    )
    return df.join(flags, value_col, "left")
