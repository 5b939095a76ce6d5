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


def _half_view(pairs: DataFrame) -> DataFrame:
    """Two-sided half-edge view: one row per (linked center, neighbor)."""
    return pairs.select(
        F.col("a").alias("c"), F.col("b").alias("o"),
        F.col("ab").alias("out"), F.col("ba").alias("inn"),
    ).unionByName(
        pairs.select(
            F.col("b").alias("c"), F.col("a").alias("o"),
            F.col("ba").alias("out"), F.col("ab").alias("inn"),
        )
    )


def _combo_class(t1: str, t2: str) -> str:
    """Class of an OPEN triple whose center holds dyad types ``t1``/``t2``
    ('o' = center-out only, 'i' = center-in only, 'm' = mutual) and whose
    third dyad is null — a plan-build-time TRIAD_TABLE lookup (the table
    is closed under role permutation, so the combo order is free)."""
    bits = {"o": (1, 0), "i": (0, 1), "m": (1, 1)}
    cx, xc = bits[t1]
    cy, yc = bits[t2]
    return TRIAD_TABLE[cx + xc * 2 + cy * 4 + yc * 8]


def _enum_degree(pairs: DataFrame) -> DataFrame:
    """Exact per-class connected-triple counts WITHOUT the sum-deg^2
    wedge self-join (the ``order="degree"`` path of :func:`triad_census`).

    Two pieces, both bounded far below the wedge expansion:

    1. Per-center closed forms.  Every connected triple has >=1 center
       linked to both others; counting each center's dyad types (O out-
       only, I in-only, M mutual) gives the number of neighbor PAIRS per
       type combo in closed form — C(O,2), C(I,2), C(M,2), O*I, O*M,
       I*M — and a combo with a NULL third dyad is exactly one of the
       six open classes (021D/021U/021C/111D/111U/201).  One linear
       aggregation; no pair expansion at all.
    2. Closed-triple correction.  Pairs whose endpoints are themselves
       linked were over-counted into those open classes (once per
       center, 3 per closed triple), so enumerate closed triples ONCE
       each via a DEGREE-ORIENTED triangle listing on the linked-pair
       graph — relabel vertices by the (degree, id) composite key and
       list ordered triangles, the same degeneracy-style orientation as
       ``four_clique_total(order="degree")``, bounding the join fan-out
       per vertex by O(core number) instead of max degree — and for each
       closed triple emit (+1 its true class, -1 the combo class each of
       its three centers mis-counted it into).

    Returns ``(triad_type, raw)`` with raw = the EXACT number of triples
    per connected class (multiplicity already resolved)."""
    half = _half_view(pairs)
    ctr = half.groupBy("c").agg(
        F.sum((F.col("out") & ~F.col("inn")).cast("long")).alias("n_o"),
        F.sum((~F.col("out") & F.col("inn")).cast("long")).alias("n_i"),
        F.sum((F.col("out") & F.col("inn")).cast("long")).alias("n_mu"),
    )
    combo_cols = [
        (_combo_class("o", "o"), F.expr("div(n_o * (n_o - 1), 2)")),
        (_combo_class("i", "i"), F.expr("div(n_i * (n_i - 1), 2)")),
        (_combo_class("m", "m"), F.expr("div(n_mu * (n_mu - 1), 2)")),
        (_combo_class("o", "i"), F.col("n_o") * F.col("n_i")),
        (_combo_class("o", "m"), F.col("n_o") * F.col("n_mu")),
        (_combo_class("i", "m"), F.col("n_i") * F.col("n_mu")),
    ]
    open_rows = (
        ctr.agg(
            *[
                F.coalesce(F.sum(expr), F.lit(0)).alias(f"cmb{i}")
                for i, (_, expr) in enumerate(combo_cols)
            ]
        )
        .select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(cls).alias("triad_type"),
                            F.col(f"cmb{i}").cast("long").alias("delta"),
                        )
                        for i, (cls, _) in enumerate(combo_cols)
                    ]
                )
            ).alias("t")
        )
        .select("t.triad_type", "t.delta")
    )

    # degree-oriented closed-triple listing on the linked-pair graph
    und = pairs.select("a", "b")
    sym = und.unionAll(
        und.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    deg = sym.groupBy(F.col("a").alias("v")).agg(
        F.count(F.lit(1)).alias("dv")
    )
    c_lit = int(
        und.agg(F.greatest(F.max("a"), F.max("b"))).collect()[0][0] or 0
    ) + 1
    keyed = deg.select("v", (F.col("dv") * F.lit(c_lit) + F.col("v")).alias("k"))
    ek = (
        und.join(keyed.withColumnRenamed("v", "a").withColumnRenamed("k", "ka"), "a")
        .join(keyed.withColumnRenamed("v", "b").withColumnRenamed("k", "kb"), "b")
        .select(
            F.when(F.col("ka") < F.col("kb"), F.col("a"))
            .otherwise(F.col("b"))
            .alias("lo"),
            F.when(F.col("ka") < F.col("kb"), F.col("b"))
            .otherwise(F.col("a"))
            .alias("hi"),
        )
    )
    e1 = ek.select(F.col("lo").alias("ta"), F.col("hi").alias("tb"))
    e2 = ek.select(F.col("lo").alias("tb"), F.col("hi").alias("tc"))
    e3 = ek.select(F.col("lo").alias("ta"), F.col("hi").alias("tc"))
    tri = e1.join(e2, "tb").join(e3, ["ta", "tc"])

    def _pj(s: str) -> DataFrame:
        return pairs.select(
            F.col("a").alias(f"pa_{s}"), F.col("b").alias(f"pb_{s}"),
            F.col("ab").alias(f"fw_{s}"), F.col("ba").alias(f"rv_{s}"),
        )

    flagged = (
        tri.join(
            _pj("ab"),
            (F.least("ta", "tb") == F.col("pa_ab"))
            & (F.greatest("ta", "tb") == F.col("pb_ab")),
        )
        .join(
            _pj("bc"),
            (F.least("tb", "tc") == F.col("pa_bc"))
            & (F.greatest("tb", "tc") == F.col("pb_bc")),
        )
        .join(
            _pj("ac"),
            (F.least("ta", "tc") == F.col("pa_ac"))
            & (F.greatest("ta", "tc") == F.col("pb_ac")),
        )
    )

    def _bit(u: str, v: str, s: str):
        """Direction bit u -> v from the (min_id, max_id)-keyed pair
        flags of dyad ``s``, as int."""
        return (
            F.when(F.col(u) < F.col(v), F.col(f"fw_{s}"))
            .otherwise(F.col(f"rv_{s}"))
            .cast("int")
        )

    lookup = F.array(*[F.lit(s) for s in TRIAD_TABLE])

    def _cls(code):
        return F.element_at(lookup, code + F.lit(1))

    full_code = (
        _bit("ta", "tb", "ab")
        + _bit("tb", "ta", "ab") * 2
        + _bit("ta", "tc", "ac") * 4
        + _bit("tc", "ta", "ac") * 8
        + _bit("tb", "tc", "bc") * 16
        + _bit("tc", "tb", "bc") * 32
    )
    # combo code at each center: the center's two dyads, third zeroed
    dec_a = _bit("ta", "tb", "ab") + _bit("tb", "ta", "ab") * 2 \
        + _bit("ta", "tc", "ac") * 4 + _bit("tc", "ta", "ac") * 8
    dec_b = _bit("tb", "ta", "ab") + _bit("ta", "tb", "ab") * 2 \
        + _bit("tb", "tc", "bc") * 4 + _bit("tc", "tb", "bc") * 8
    dec_c = _bit("tc", "ta", "ac") + _bit("ta", "tc", "ac") * 2 \
        + _bit("tc", "tb", "bc") * 4 + _bit("tb", "tc", "bc") * 8
    tri_rows = flagged.select(
        F.explode(
            F.array(
                F.struct(
                    _cls(full_code).alias("triad_type"),
                    F.lit(1).cast("long").alias("delta"),
                ),
                F.struct(
                    _cls(dec_a).alias("triad_type"),
                    F.lit(-1).cast("long").alias("delta"),
                ),
                F.struct(
                    _cls(dec_b).alias("triad_type"),
                    F.lit(-1).cast("long").alias("delta"),
                ),
                F.struct(
                    _cls(dec_c).alias("triad_type"),
                    F.lit(-1).cast("long").alias("delta"),
                ),
            )
        ).alias("t")
    ).select("t.triad_type", "t.delta")

    return (
        open_rows.unionByName(tri_rows)
        .groupBy("triad_type")
        .agg(F.sum("delta").alias("raw"))
    )


def triad_census(dg: DiGraph, order: str = "id") -> DataFrame:
    """16 rows (triad_type string, count long) — matches
    ``networkx.triadic_census`` on the same simple digraph.

    ``order``: ``"id"`` (default) enumerates connected triples through
    the wedge self-join (sum deg^2 — keeps the SQL oracle verbatim);
    ``"degree"`` replaces that expansion with per-center closed forms +
    a degree-oriented triangle listing (see :func:`_enum_degree`) whose
    fan-out is bounded by core number instead of max degree — the same
    count, pinned by the order-invariance test, at hub-proof cost."""
    spark = dg.edges.sparkSession
    pairs = _linked_pairs(dg)

    if order == "degree":
        enum = _enum_degree(pairs)
        count_expr = "coalesce(raw, 0)"
    elif order == "id":
        half = _half_view(pairs)
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
        # closed triads are enumerated once per linked center (/3)
        count_expr = "coalesce(raw, 0) div mult"
    else:
        raise ValueError(f"unknown order: {order!r}")

    meta = spark.createDataFrame(
        TRIAD_META, "triad_type string, n_m int, n_a int, mult int"
    )
    known = (
        F.broadcast(meta.where(F.col("mult") > 0))
        .join(enum, "triad_type", "left")
        .select(
            "triad_type", "n_m", "n_a",
            F.expr(count_expr).alias("count"),
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
