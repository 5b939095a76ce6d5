"""Directed triad census (Holland-Leinhardt 16 classes) + dyad census.

Beyond-reference capability on the directed handoff layer: the classic
social-network-analysis structural signature the reference's course
domain (CSD363 Social & Information Networks) teaches alongside the
community pipeline.  Not in the reference repo (its engine is
undirected-only, data_io.py:71-132); verified against
``networkx.triadic_census`` in tests and a 1:1 DuckDB SQL mirror in the
gate.

Algorithm — Batagelj-Mrvar (Social Networks 23(3), 2001), re-expressed
as DataFrame joins:

1. ``pairs``: unordered linked dyads {a<b} with direction flags
   (one hash aggregation over the distinct edge table).
2. ``wedges``: the two-sided half-edge view self-joined on the shared
   center, ``other1 < other2`` — every triple with >=2 non-null dyads
   appears once per linked center, so open-connected triads (021*/111*/
   201) are enumerated exactly once and closed triads (030*/120*/210/
   300) exactly three times (divide by 3).
3. The third dyad's flags come from ONE left join back to ``pairs``;
   the 6-bit adjacency code indexes a 64-entry literal lookup (all 6
   vertex orderings of each type collapse to one name, so whichever
   center enumerates a triple yields the same class).
4. Dyad-only and null classes never touch the wedge join — closed form:
   ``012 = A*(n-2) - sum_asym``, ``102 = M*(n-2) - sum_mutual``,
   ``003 = C(n,3) - rest`` where the sums weight each enumerated class
   by its fixed per-class dyad composition.

Scale: the only super-linear step is the wedge self-join —
sum_c deg(c)^2 rows, the exact cost profile of ``square_total``
(operators/triangles.py) including its hub caveat; everything else is
bounded single-row aggregates over broadcast-sized frames.  Counts are
exact BIGINT; the 003/012/102 closed-form rows are computed in
DECIMAL(38,0) (their n*(n-1)*(n-2)-scale intermediates would overflow
int64 past ~2.1M vertices), so the only bound left is the BIGINT output
column itself — the 003 COUNT exceeds int64 past ~3.81M vertices, at
which point a runtime guard raises instead of wrapping/ANSI-throwing —
and the 13 connected-class rows are exact at any scale the wedge join
survives.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from csd363_sin_spark.plans.directed import DiGraph

# 64-entry lookup: 6-bit adjacency code -> triad class, for the ordered
# triple (c, x, y) with bit0 c->x, bit1 x->c, bit2 c->y, bit3 y->c,
# bit4 x->y, bit5 y->x.  Generated offline from the Holland-Leinhardt
# definitions (cross-checked against networkx.triadic_census over all 64
# codes in tests/test_triads.py).
TRIAD_TABLE = [
    "003", "012", "012", "102", "012", "021D", "021C", "111U",
    "012", "021C", "021U", "111D", "102", "111U", "111D", "201",
    "012", "021C", "021D", "111U", "021U", "030T", "030T", "120U",
    "021C", "030C", "030T", "120C", "111D", "120C", "120D", "210",
    "012", "021U", "021C", "111D", "021C", "030T", "030C", "120C",
    "021D", "030T", "030T", "120D", "111U", "120U", "120C", "210",
    "102", "111D", "111U", "201", "111D", "120D", "120C", "210",
    "111U", "120C", "120U", "210", "201", "210", "210", "300",
]

# (class, n_mutual_dyads, n_asym_dyads, wedge-enumeration multiplicity).
# mult=0: never enumerated (<=1 non-null dyad); mult=1: exactly 2
# non-null dyads, one linked center; mult=3: all dyads non-null.
TRIAD_META = [
    ("003", 0, 0, 0), ("012", 0, 1, 0), ("102", 1, 0, 0),
    ("021D", 0, 2, 1), ("021U", 0, 2, 1), ("021C", 0, 2, 1),
    ("111D", 1, 1, 1), ("111U", 1, 1, 1), ("201", 2, 0, 1),
    ("030T", 0, 3, 3), ("030C", 0, 3, 3),
    ("120D", 1, 2, 3), ("120U", 1, 2, 3), ("120C", 1, 2, 3),
    ("210", 2, 1, 3), ("300", 3, 0, 3),
]


def _linked_pairs(dg: DiGraph) -> DataFrame:
    """Unordered linked dyads: (a < b, ab: a->b exists, ba: b->a)."""
    e = dg.edges.select("src", "dst").where(F.col("src") != F.col("dst"))
    return (
        e.groupBy(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .agg(
            F.max(F.col("src") < F.col("dst")).alias("ab"),
            F.max(F.col("src") > F.col("dst")).alias("ba"),
        )
    )


def dyad_census(dg: DiGraph) -> DataFrame:
    """One row: (mutual, asymmetric, null_dyads, num_vertices) — the
    Holland-Leinhardt dyad census; null = C(n,2) - linked."""
    pairs = _linked_pairs(dg)
    linked = pairs.agg(
        F.coalesce(
            F.sum((F.col("ab") & F.col("ba")).cast("long")), F.lit(0)
        ).alias("mutual"),
        F.coalesce(
            F.sum((~(F.col("ab") & F.col("ba"))).cast("long")), F.lit(0)
        ).alias("asymmetric"),
    )
    nverts = dg.vertices.agg(F.count(F.lit(1)).alias("num_vertices"))
    return linked.crossJoin(nverts).select(
        "mutual",
        "asymmetric",
        (
            F.expr("num_vertices * (num_vertices - 1) div 2")
            - F.col("mutual")
            - F.col("asymmetric")
        ).alias("null_dyads"),
        "num_vertices",
    )


def triad_census(dg: DiGraph) -> DataFrame:
    """16 rows (triad_type string, count long) — matches
    ``networkx.triadic_census`` on the same simple digraph."""
    spark = dg.edges.sparkSession
    pairs = _linked_pairs(dg)

    # two-sided half-edge view: one row per (linked center, neighbor)
    half = pairs.select(
        F.col("a").alias("c"), F.col("b").alias("o"),
        F.col("ab").alias("out"), F.col("ba").alias("inn"),
    ).unionByName(
        pairs.select(
            F.col("b").alias("c"), F.col("a").alias("o"),
            F.col("ba").alias("out"), F.col("ab").alias("inn"),
        )
    )
    h1, h2 = half.alias("h1"), half.alias("h2")
    wedges = (
        h1.join(h2, "c")
        .where(F.col("h1.o") < F.col("h2.o"))
        .select(
            F.col("h1.o").alias("x"), F.col("h2.o").alias("y"),
            F.col("h1.out").alias("cx"), F.col("h1.inn").alias("xc"),
            F.col("h2.out").alias("cy"), F.col("h2.inn").alias("yc"),
        )
    )
    third = pairs.select(
        F.col("a").alias("x"), F.col("b").alias("y"),
        F.col("ab").alias("xy"), F.col("ba").alias("yx"),
    )
    triples = wedges.join(third, ["x", "y"], "left").select(
        "cx", "xc", "cy", "yc",
        F.coalesce("xy", F.lit(False)).alias("xy"),
        F.coalesce("yx", F.lit(False)).alias("yx"),
    )
    code = (
        F.col("cx").cast("int")
        + F.col("xc").cast("int") * 2
        + F.col("cy").cast("int") * 4
        + F.col("yc").cast("int") * 8
        + F.col("xy").cast("int") * 16
        + F.col("yx").cast("int") * 32
    )
    lookup = F.array(*[F.lit(s) for s in TRIAD_TABLE])
    enum = triples.groupBy(
        F.element_at(lookup, code + F.lit(1)).alias("triad_type")
    ).agg(F.count(F.lit(1)).alias("raw"))

    meta = spark.createDataFrame(
        TRIAD_META, "triad_type string, n_m int, n_a int, mult int"
    )
    # per-class counts for the 13 enumerated classes (closed ones /3)
    known = (
        F.broadcast(meta.where(F.col("mult") > 0))
        .join(enum, "triad_type", "left")
        .select(
            "triad_type", "n_m", "n_a",
            F.expr("coalesce(raw, 0) div mult").alias("count"),
        )
    )
    # scalars: n, mutual, asym + the per-dyad consumption sums
    scal = (
        dg.vertices.agg(F.count(F.lit(1)).alias("n"))
        .crossJoin(
            _linked_pairs(dg).agg(
                F.coalesce(
                    F.sum((F.col("ab") & F.col("ba")).cast("long")),
                    F.lit(0),
                ).alias("mm"),
                F.coalesce(
                    F.sum((~(F.col("ab") & F.col("ba"))).cast("long")),
                    F.lit(0),
                ).alias("aa"),
            )
        )
        .crossJoin(
            known.agg(
                F.sum(F.col("count") * F.col("n_a")).alias("sum_a"),
                F.sum(F.col("count") * F.col("n_m")).alias("sum_m"),
                F.sum("count").alias("sum_conn"),
            )
        )
    )
    # closed-form rows in DECIMAL(38,0): the intermediates (n*(n-1)*(n-2),
    # A*(n-2)) overflow int64 past ~2.1M vertices even where the COUNTS
    # still fit a long, so compute wide and cast down; past the point
    # where the 003 count itself no longer fits the BIGINT output column
    # (~3.81M vertices) the guard raises a clear error instead of a
    # silent wrap (non-ANSI) / bare ArithmeticException (ANSI).
    def _dec(name: str):
        return F.col(name).cast("decimal(38,0)")

    _max_long = F.lit((1 << 63) - 1).cast("decimal(38,0)")

    def _guarded_long(c):
        return F.when(c <= _max_long, c.cast("long")).otherwise(
            F.raise_error(
                F.lit(
                    "triad_census: 003/012/102 closed-form count exceeds "
                    "BIGINT (num_vertices > ~3.81M); re-derive these three "
                    "rows externally from the 13 enumerated classes in "
                    "DECIMAL if you need them at this scale"
                )
            ).cast("long")
        )

    c012 = _dec("aa") * (_dec("n") - 2) - _dec("sum_a")
    c102 = _dec("mm") * (_dec("n") - 2) - _dec("sum_m")
    c003 = (
        F.floor(_dec("n") * (_dec("n") - 1) * (_dec("n") - 2) / 6).cast(
            "decimal(38,0)"
        )
        - _dec("sum_conn")
        - (_dec("aa") + _dec("mm")) * (_dec("n") - 2)
        + _dec("sum_a")
        + _dec("sum_m")
    )
    derived = scal.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("012").alias("triad_type"),
                    _guarded_long(c012).alias("count"),
                ),
                F.struct(
                    F.lit("102").alias("triad_type"),
                    _guarded_long(c102).alias("count"),
                ),
                F.struct(
                    F.lit("003").alias("triad_type"),
                    _guarded_long(c003).alias("count"),
                ),
            )
        ).alias("t")
    ).select("t.triad_type", "t.count")

    allrows = known.select("triad_type", "count").unionByName(derived)
    return (
        F.broadcast(meta.select("triad_type"))
        .join(allrows, "triad_type", "left")
        .select(
            "triad_type",
            F.coalesce("count", F.lit(0)).cast("long").alias("count"),
        )
        .orderBy("triad_type")
    )
