"""Deduplication operators for training-data pipelines.

Exact dedup, n-gram Jaccard near-dup, MinHash+LSH, SimHash, and
embedding-cosine near-dup over ``documents`` / ``embeddings`` tables.

Scale design:
* exact dedup is one hash aggregation (map-side combined);
* n-gram Jaccard goes through a shingle-inverted-index join — the
  classic quadratic-blowup risk is capped by dropping ultra-frequent
  shingles (``max_shingle_freq``), the standard trick since they carry
  no discriminative signal;
* MinHash banding turns candidate generation into an equi-join on
  (band_id, band_hash) — linear shuffle, no all-pairs compare; survivors
  are verified with the exact Jaccard;
* SimHash reduces a document to 64 bits; near-dups are found by banding
  the bits (pigeonhole: hamming distance <= 3 with 4 bands guarantees an
  exact band match) and verifying hamming distance;
* embedding near-dup = cosine >= threshold via the similarity module.

Everything is built-in expressions + joins; no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from csd363_sin_spark.functions.text import _tokens
from csd363_sin_spark.plans.lineage import materialize


def portable_hash64(col):
    """Engine-portable 60-bit hash: first 15 hex chars of md5 as a long.

    Identical in Spark (`conv(substr(md5(x),1,15),16,10)`), DuckDB
    (`CAST('0x'||substr(md5(x),1,15) AS BIGINT)`), and Python
    (`int(hashlib.md5(x).hexdigest()[:15], 16)`) — the hash family the
    oracle-checkable variants of MinHash/SimHash/LSH use.  ``xxhash64``
    stays the default production family (JVM-fused, ~an order of
    magnitude cheaper than md5); the algorithms are hash-agnostic, so the
    oracle greenness of the portable mode covers the banding/verification
    logic shared by both."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def _hash64(col, seed: int | None, hash_mode: str):
    if hash_mode == "xxhash64":
        return F.xxhash64(col, F.lit(seed)) if seed is not None else F.xxhash64(col)
    if hash_mode == "md5":
        pre = F.concat(F.lit(f"{seed}:"), col) if seed is not None else col
        return portable_hash64(pre)
    raise ValueError(f"unknown hash_mode: {hash_mode}")


def exact_duplicates(docs: DataFrame) -> DataFrame:
    """Groups of byte-identical (normalized) documents:
    ``(fingerprint, canonical_doc_id, dup_doc_id)`` for every duplicate
    beyond the keeper (lowest doc_id)."""
    keyed = docs.select(
        "doc_id", F.md5(F.concat_ws(" ", _tokens(F.col("text")))).alias("fp")
    )
    keeper = keyed.groupBy("fp").agg(F.min("doc_id").alias("canonical_doc_id"))
    return (
        keyed.join(keeper, "fp")
        .filter(F.col("doc_id") != F.col("canonical_doc_id"))
        .select(F.col("fp").alias("fingerprint"), "canonical_doc_id", F.col("doc_id").alias("dup_doc_id"))
    )


def dedup_exact(docs: DataFrame) -> DataFrame:
    """Keep one representative (lowest doc_id) per normalized content."""
    keyed = docs.select(
        "doc_id", F.md5(F.concat_ws(" ", _tokens(F.col("text")))).alias("fp")
    )
    keep = keyed.groupBy("fp").agg(F.min("doc_id").alias("doc_id")).select("doc_id")
    return docs.join(keep, "doc_id", "left_semi")


def _shingles(docs: DataFrame, n: int) -> DataFrame:
    """(doc_id, shingle) distinct word n-grams of the normalized tokens.

    Repartitions the input first: a small parquet often arrives as ONE
    partition, which would single-thread the explode + wide signature
    aggregations downstream.

    The token array is materialized as its own projection BEFORE the
    shingle expression: referencing the tokenizer expression inside the
    higher-order ``transform`` lambda defeats Catalyst's subexpression
    elimination and re-runs the regex tokenizer once PER SHINGLE
    (measured 6x slower at sf0.1)."""
    par = docs.sparkSession.sparkContext.defaultParallelism
    base = docs.repartition(par, "doc_id").select(
        "doc_id", _tokens(F.col("text")).alias("toks")
    )
    toks = F.col("toks")
    sh = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        ),
    ).otherwise(F.array(F.concat_ws(" ", toks)))
    return base.select("doc_id", F.explode(F.array_distinct(sh)).alias("shingle"))


def ngram_jaccard_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.8,
    max_shingle_freq: int | None = 1000,
) -> DataFrame:
    """Exact n-gram Jaccard near-duplicate pairs:
    ``(doc_a, doc_b, jaccard)`` with doc_a < doc_b and jaccard >= t.

    Inverted-index join; ``max_shingle_freq`` drops shingles occurring in
    more than that many docs (hub-shingle blowup guard — set None for the
    fully exact small-scale/oracle mode).
    """
    sh = _shingles(docs, n)
    if max_shingle_freq is not None:
        rare = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") <= max_shingle_freq)
            .select("shingle")
        )
        sh = sh.join(rare, "shingle", "left_semi")
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "sz_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "sz_b"), "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 6
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def contamination_check(
    docs: DataFrame, bench: DataFrame, n: int = 3, broadcast_bench: bool = True
) -> DataFrame:
    """Benchmark-contamination scan: for every candidate training document
    NOT in the benchmark set, the fraction of its distinct word n-grams
    that appear anywhere in the benchmark corpus.

    Returns ``(doc_id, n_shingles, n_hit, contamination)`` where
    ``contamination = round(n_hit / n_shingles, 6)`` — 1.0 means every
    n-gram of the doc occurs in some benchmark document (a verbatim or
    near-verbatim leak); filter at a policy threshold downstream.

    Scale: benchmark suites are tiny relative to a 100 TB corpus (MBs of
    eval text), so the distinct benchmark-shingle set is broadcast and
    the scan is one map-side semi-join + per-doc aggregation — no
    all-pairs work, no shuffle of the corpus side beyond the count agg.
    Set ``broadcast_bench=False`` if the benchmark set is genuinely
    large; the plan degrades to a shuffled semi-join and still scales.
    """
    candidates = docs.join(bench.select("doc_id"), "doc_id", "left_anti")
    doc_sh = _shingles(candidates, n)
    bench_sh = _shingles(bench, n).select("shingle").distinct()
    if broadcast_bench:
        bench_sh = F.broadcast(bench_sh)
    sizes = doc_sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    hits = (
        doc_sh.join(bench_sh, "shingle", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    return (
        sizes.join(hits, "doc_id", "left")
        .fillna(0, subset=["n_hit"])
        .select(
            "doc_id",
            "n_shingles",
            "n_hit",
            F.round(F.col("n_hit") / F.col("n_shingles"), 6).alias("contamination"),
        )
    )


def minhash_signatures(
    docs: DataFrame, n: int = 3, num_hashes: int = 32, hash_mode: str = "xxhash64"
) -> DataFrame:
    """(doc_id, sig array<long>) — MinHash signature over word shingles.

    Hash family: hash(shingle, seed=i), i = 0..num_hashes-1; the min
    over a document's shingles per seed.  One explode + one aggregation.
    ``hash_mode``: "xxhash64" (production) or "md5" (oracle-portable,
    see :func:`portable_hash64`).
    """
    sh = _shingles(docs, n)
    mins = [
        F.min(_hash64(F.col("shingle"), i, hash_mode)).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    agg = sh.groupBy("doc_id").agg(*mins)
    return agg.select(
        "doc_id", F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("sig")
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """MinHash + LSH near-duplicate pairs, exact-verified.

    Signatures are cut into ``bands`` bands; docs sharing any full band
    become candidates (equi-join on band hash — the scale path); exact
    n-gram Jaccard then filters to >= threshold, so the output has no
    false positives (only possible false negatives, tuned by bands/rows).
    """
    banded = minhash_band_rows(docs, n, num_hashes, bands, hash_mode)
    cands = (
        banded.alias("x")
        .join(banded.alias("y"), ["band", "bh"])
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"))
        .distinct()
    )
    return verify_candidate_pairs(cands, docs, n, threshold)


def minhash_band_rows(
    docs: DataFrame,
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """``(doc_id, band, bh)`` LSH band rows — a pure function of each
    document's text (split/batch-invariant), the minimal relation the
    streaming near-dup store persists (streaming/dedup.py)."""
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(docs, n, num_hashes, hash_mode=hash_mode)
    banded = sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        _hash64(
                            F.concat_ws(
                                ",",
                                *[
                                    F.col("sig")[b * rows_per_band + r].cast("string")
                                    for r in range(rows_per_band)
                                ],
                            ),
                            None,
                            hash_mode,
                        ).alias("bh"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh"))
    # materialize: self-joins over the band rows would otherwise evaluate
    # the whole signature pipeline once per alias
    return materialize(banded)


def verify_candidate_pairs(
    cands: DataFrame, docs: DataFrame, n: int, threshold: float
) -> DataFrame:
    """Exact-Jaccard verification on CANDIDATES ONLY (shingle sets joined
    onto the candidate pairs — cost proportional to |candidates|, not all
    pairs); shingles only the docs appearing in some candidate pair."""
    cand_ids = (
        cands.select(F.col("doc_a").alias("doc_id"))
        .unionByName(cands.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    sets = (
        _shingles(docs.join(cand_ids, "doc_id", "left_semi"), n)
        .groupBy("doc_id")
        .agg(F.collect_set("shingle").alias("sh"))
    )
    verified = (
        cands.join(
            sets.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a")),
            "doc_a",
        )
        .join(
            sets.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b")),
            "doc_b",
        )
        .withColumn("inter", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter")
                / (F.size("sh_a") + F.size("sh_b") - F.col("inter")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return verified.select("doc_a", "doc_b", "jaccard")


def simhash(
    docs: DataFrame, n: int = 1, hash_mode: str = "xxhash64", bits: int = 64
) -> DataFrame:
    """(doc_id, simhash long) — ``bits``-bit SimHash over token
    (n-)shingles (64 for xxhash64; 60 for the md5-portable family, whose
    values carry 60 bits).

    Bit b of the hash is 1 iff the majority of the document's shingle
    hashes have bit b set.  Pure expressions: per-bit vote via
    ``shiftright & 1`` aggregation.
    """
    sh = _shingles(docs, n).withColumn("h", _hash64(F.col("shingle"), None, hash_mode))
    votes = sh.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("cnt"),
        *[
            F.sum(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1))).alias(f"b{b}")
            for b in range(bits)
        ],
    )
    bit_terms = None
    for b in range(bits):
        term = F.when(
            F.col(f"b{b}") * 2 > F.col("cnt"), F.shiftleft(F.lit(1).cast("long"), b)
        ).otherwise(F.lit(0).cast("long"))
        bit_terms = term if bit_terms is None else bit_terms.bitwiseOR(term)
    return votes.select("doc_id", bit_terms.alias("simhash"))


def simhash_near_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    n: int = 1,
    bands: int = 4,
    hash_mode: str = "xxhash64",
    bits: int = 64,
) -> DataFrame:
    """(doc_a, doc_b, hamming) pairs with hamming(simhash) <= max_hamming.

    Pigeonhole banding: with ``bands`` (bits/bands)-bit bands, any pair
    within hamming <= bands-1 shares at least one exact band — candidates
    come from an equi-join on (band, chunk), then exact hamming filters.
    """
    sh = simhash(docs, n, hash_mode=hash_mode, bits=bits)
    width = bits // bands
    banded = sh.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned(F.col("simhash"), b * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("chunk"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "simhash", F.col("bb.band").alias("band"), F.col("bb.chunk").alias("chunk"))
    banded = materialize(banded)  # avoid double evaluation in the self-join
    cands = (
        banded.alias("x")
        .join(banded.alias("y"), ["band", "chunk"])
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
            F.col("x.simhash").alias("sa"),
            F.col("y.simhash").alias("sb"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sa").bitwiseXOR(F.col("sb")))
    return (
        cands.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def dedup_clusters(
    docs: DataFrame,
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Near-duplicate CLUSTERS: connected components over the MinHash+LSH
    dup-pair graph — the keep-one-per-cluster view a training-data
    pipeline actually applies (pairs alone over-delete: A~B and B~C must
    collapse to ONE kept doc even when A~C was never emitted as a pair).

    Returns ``(doc_id, canonical_doc_id, cluster_size)`` for EVERY input
    doc; singletons map to themselves with cluster_size 1; the canonical
    doc is the minimum doc_id of the cluster (deterministic).  Keep rows
    where ``doc_id = canonical_doc_id`` to dedup the corpus.

    Scale: pair generation is the banded equi-join (no all-pairs), and
    the transitive closure reuses the engine's large-star/small-star
    connected-components kernel (O(log n) rounds, driver union-find
    dispatch below 100k pairs) — both already 100 TB-shaped.
    """
    from csd363_sin_spark.operators.components import connected_components
    from csd363_sin_spark.plans.induce import Graph

    pairs = minhash_lsh_pairs(
        docs, n=n, num_hashes=num_hashes, bands=bands,
        threshold=threshold, hash_mode=hash_mode,
    )
    verts = docs.select(
        F.col("doc_id").cast("long").alias("vertex_id"),
        F.col("doc_id").cast("string").alias("actor"),
        F.lit("doc").alias("kind"),
    )
    edges = pairs.select(
        F.col("doc_a").cast("long").alias("src"),
        F.col("doc_b").cast("long").alias("dst"),
        F.lit(1.0).alias("weight"),
    )
    comp = connected_components(Graph(vertices=verts, edges=edges))
    canon = comp.select(
        F.col("vertex_id").alias("doc_id"),
        F.col("comp_id").alias("canonical_doc_id"),
    )
    sizes = canon.groupBy("canonical_doc_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return canon.join(sizes, "canonical_doc_id").select(
        "doc_id", "canonical_doc_id", "cluster_size"
    )


def dedup_keep_best(
    docs: DataFrame,
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Quality-aware keep-one-per-cluster dedup: within each near-dup
    cluster (see :func:`dedup_clusters`) keep the doc with the HIGHEST
    quality score (functions/text.py quality_score), ties broken by
    lowest doc_id — the selection a real training-data pipeline applies
    (min-doc_id keeps an arbitrary copy; this keeps the best one).

    Returns ``(doc_id, best_doc_id, best_quality, cluster_size)`` for
    EVERY input doc; filter ``doc_id = best_doc_id`` for the kept corpus.

    Scale: adds one cluster-partitioned window (row_number over
    (quality DESC, doc_id ASC)) and one join to what dedup_clusters
    already pays — the window is partitioned by cluster id, never global.
    """
    from pyspark.sql import Window

    from csd363_sin_spark.functions.text import quality_score

    clusters = dedup_clusters(
        docs, n=n, num_hashes=num_hashes, bands=bands,
        threshold=threshold, hash_mode=hash_mode,
    )
    scored = clusters.join(quality_score(docs), "doc_id")
    w = Window.partitionBy("canonical_doc_id").orderBy(
        F.desc("quality"), F.asc("doc_id")
    )
    best = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "canonical_doc_id",
            F.col("doc_id").alias("best_doc_id"),
            F.round("quality", 6).alias("best_quality"),
        )
    )
    return clusters.join(best, "canonical_doc_id").select(
        "doc_id", "best_doc_id", "best_quality", "cluster_size"
    )


def bloom_contamination(
    docs: DataFrame,
    bench: DataFrame,
    n: int = 3,
    m_bits: int | None = None,
    k: int | None = None,
) -> DataFrame:
    """Benchmark-contamination scan through a portable Bloom filter —
    the scale path of :func:`contamination_check` for benchmark suites
    too large to broadcast as an exact shingle set.  The filter is at
    most ``m_bits/32`` BIGINT rows regardless of benchmark size, and the
    answer is a deterministic UPPER BOUND on the exact contamination
    fraction (Bloom errors are one-sided: a flagged shingle may be
    clean, a clean verdict is certain).

    Returns ``(doc_id, n_shingles, n_flagged, flagged_frac)``; same
    candidate semantics as the exact scan (benchmark docs excluded).
    Fully engine-portable (functions/sketch.py hash/bit spec), so the
    gate mirrors every step in SQL.
    """
    from csd363_sin_spark.functions import sketch as _sk

    m_bits = _sk.BLOOM_BITS if m_bits is None else m_bits
    k = _sk.BLOOM_K if k is None else k
    candidates = docs.join(bench.select("doc_id"), "doc_id", "left_anti")
    doc_sh = _shingles(candidates, n)
    bloom = _sk.bloom_build(
        _shingles(bench, n).select("shingle").distinct(),
        "shingle",
        m_bits=m_bits,
        k=k,
    )
    probed = _sk.bloom_probe(doc_sh, "shingle", bloom, m_bits=m_bits, k=k)
    return probed.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.sum(F.col("maybe_member").cast("long")).alias("n_flagged"),
    ).select(
        "doc_id",
        "n_shingles",
        "n_flagged",
        F.round(F.col("n_flagged") / F.col("n_shingles"), 6).alias(
            "flagged_frac"
        ),
    )


def repeated_spans(
    docs: DataFrame,
    k: int = 6,
    min_count: int = 2,
    hash_mode: str = "md5",
) -> DataFrame:
    """Cross-document repeated-span detection — the fixed-window
    approximation of ExactSubstr deduplication (Lee et al. 2021,
    "Deduplicating Training Data Makes Language Models Better",
    arXiv:2107.06499), which the suffix-array original cannot do
    distributed; every production Spark pipeline uses this k-token
    rolling-window form instead.

    A k-token window (shared tokenizer) is *duplicated* when the exact
    same token sequence occurs >= ``min_count`` times anywhere in the
    corpus (across documents OR repeated within one document — the
    paper's semantics count occurrences, not documents).  Overlapping or
    adjacent duplicated windows within a document merge into maximal
    spans.

    Returns ``(doc_id, span_start, span_end, span_tokens, n_windows)``
    with 1-based inclusive token positions and ``n_windows`` the number
    of duplicated k-windows the span absorbed.

    Scale shape: one tokenize + window explode (O(total tokens) rows,
    map-side), one map-side-combined count by 64-bit window hash — never
    by the string, so the shuffle carries 8-byte keys — one semi-join
    back (no pair explosion anywhere: duplicated windows are *counted*,
    not paired), then a per-document gaps-and-islands window function
    (partitioned by doc_id, bounded by tokens/doc).  ``hash_mode="md5"``
    is the engine-portable gate family; ``"xxhash64"`` the production
    family (identical plan shape, cheaper hash).
    """
    from pyspark.sql import Window

    par = docs.sparkSession.sparkContext.defaultParallelism
    base = docs.repartition(par, "doc_id").select(
        "doc_id", _tokens(F.col("text")).alias("toks")
    )
    toks = F.col("toks")
    wins = (
        base.filter(F.size(toks) >= k)
        .select(
            "doc_id",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), F.size(toks) - k),
                    lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)),
                )
            ).alias("pos0", "win"),
        )
        .select(
            "doc_id",
            (F.col("pos0") + 1).cast("long").alias("start"),
            _hash64(F.col("win"), None, hash_mode).alias("win_hash"),
        )
    )
    dup_hashes = (
        wins.groupBy("win_hash")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= min_count)
        .select("win_hash")
    )
    dup_wins = wins.join(dup_hashes, "win_hash", "left_semi").select(
        "doc_id", "start", (F.col("start") + k - 1).alias("end")
    )
    w_ord = Window.partitionBy("doc_id").orderBy("start")
    w_prev = w_ord.rowsBetween(Window.unboundedPreceding, -1)
    flagged = dup_wins.withColumn(
        "new_span",
        F.when(
            F.col("start") > F.coalesce(F.max("end").over(w_prev), F.lit(-1)) + 1,
            F.lit(1),
        ).otherwise(F.lit(0)),
    ).withColumn("span_id", F.sum("new_span").over(w_ord))
    return (
        flagged.groupBy("doc_id", "span_id")
        .agg(
            F.min("start").alias("span_start"),
            F.max("end").alias("span_end"),
            F.count(F.lit(1)).alias("n_windows"),
        )
        .select(
            "doc_id",
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start") + 1).alias("span_tokens"),
            "n_windows",
        )
    )


def strip_repeated_spans(
    docs: DataFrame,
    k: int = 6,
    min_count: int = 2,
    hash_mode: str = "md5",
) -> DataFrame:
    """Remove every token covered by a duplicated span (repeated_spans
    semantics): the ExactSubstr cleaning step, dropping ALL occurrences
    of >= min_count-repeated k-token sequences, exactly as Lee et al.
    2021 do ("we remove all but one" is their alternate mode; the
    drop-all mode is bias-free and deterministic without a global
    occurrence order, so it is the one distributed pipelines ship).

    Returns ``(doc_id, n_tokens, n_removed, clean_text)`` where
    ``clean_text`` joins the surviving shared-tokenizer tokens (so the
    output is engine-portable, like chunk_documents) and documents with
    no duplicated spans pass through with ``n_removed = 0``.

    Scale shape: repeated_spans + one collect_list of the (few) spans
    per document joined back to the token arrays, then a pure map-side
    indexed-filter over each array — no second shuffle over tokens.
    """
    spans = (
        repeated_spans(docs, k=k, min_count=min_count, hash_mode=hash_mode)
        .groupBy("doc_id")
        .agg(
            F.collect_list(F.struct("span_start", "span_end")).alias("spans")
        )
    )
    base = docs.select(
        "doc_id",
        F.when(
            F.length(F.trim(F.col("text"))) == 0,
            F.array().cast("array<string>"),
        )
        .otherwise(_tokens(F.col("text")))
        .alias("toks"),
    )
    joined = base.join(spans, "doc_id", "left").select(
        "doc_id",
        "toks",
        F.coalesce(
            "spans",
            F.array().cast("array<struct<span_start:long,span_end:long>>"),
        ).alias("spans"),
    )
    kept = F.filter(
        F.col("toks"),
        lambda tok, i: ~F.exists(
            F.col("spans"),
            lambda s: (i + 1 >= s["span_start"]) & (i + 1 <= s["span_end"]),
        ),
    )
    n_toks = F.size("toks")
    return joined.select(
        "doc_id",
        n_toks.cast("long").alias("n_tokens"),
        (n_toks - F.size(kept)).cast("long").alias("n_removed"),
        F.array_join(kept, " ").alias("clean_text"),
    )


def winnow_fingerprints(
    docs: DataFrame,
    k: int = 5,
    w: int = 4,
    hash_mode: str = "md5",
) -> DataFrame:
    """MOSS winnowing document fingerprints (Schleimer-Wilkerson-Aiken
    SIGMOD'03, "Winnowing: Local Algorithms for Document Fingerprinting").

    Hash every k-token gram (shared tokenizer); slide a window of ``w``
    consecutive gram hashes; in each window select the minimum hash,
    RIGHTMOST position on ties (the paper's robust-winnowing rule);
    fingerprints = distinct selected (position, hash).  Guarantees: any
    shared run of k+w-1 tokens between two documents yields at least one
    shared fingerprint, with density 2/(w+1) — the matched-coverage
    property the independent-sampling sketches (MinHash/SimHash) cannot
    give.

    Returns ``(doc_id, pos, fp)`` with ``pos`` the 1-based token
    position of the selected gram.  Documents shorter than k tokens
    yield no fingerprints; documents with fewer than ``w`` grams are one
    whole window (their global min is selected).

    Scale shape: one tokenize + gram explode (O(total tokens) rows,
    map-side), one per-document window min over frames of ``w`` rows
    (partitioned by doc_id, bounded by tokens/doc), one distinct.  The
    window tie-break rides Spark's lexicographic struct ordering —
    min(struct(hash, -pos)) — mirrored verbatim by DuckDB's
    struct_pack window min in the oracle.  ``hash_mode="md5"`` is the
    engine-portable gate family, ``"xxhash64"`` the production family.
    """
    from pyspark.sql import Window

    par = docs.sparkSession.sparkContext.defaultParallelism
    base = docs.repartition(par, "doc_id").select(
        "doc_id", _tokens(F.col("text")).alias("toks")
    )
    toks = F.col("toks")
    grams = (
        base.filter(F.size(toks) >= k)
        .select(
            "doc_id",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), F.size(toks) - k),
                    lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)),
                )
            ).alias("pos0", "gram"),
        )
        .select(
            "doc_id",
            (F.col("pos0") + 1).cast("long").alias("pos"),
            _hash64(F.col("gram"), None, hash_mode).alias("gh"),
        )
    )
    w_doc = Window.partitionBy("doc_id")
    w_frame = (
        Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, w - 1)
    )
    sel = (
        grams.withColumn("n_grams", F.count(F.lit(1)).over(w_doc))
        .withColumn(
            "sel", F.min(F.struct(F.col("gh"), (-F.col("pos")).alias("np"))).over(w_frame)
        )
        # valid window starts only (last w-1 frames are partial); a doc
        # with < w grams is a single whole window at pos 1
        .filter(F.col("pos") <= F.greatest(F.lit(1), F.col("n_grams") - (w - 1)))
        .select(
            "doc_id",
            (-F.col("sel.np")).alias("pos"),
            F.col("sel.gh").alias("fp"),
        )
        .distinct()
    )
    return sel


def winnow_near_pairs(
    docs: DataFrame,
    k: int = 5,
    w: int = 4,
    threshold: float = 0.5,
    max_fp_freq: int | None = 1000,
    hash_mode: str = "md5",
) -> DataFrame:
    """Near-duplicate pairs by shared winnowing fingerprints:
    ``(doc_a, doc_b, shared, overlap)`` with doc_a < doc_b and
    ``overlap`` = shared distinct fingerprint hashes / min(|fp_a|,
    |fp_b|) >= threshold (the MOSS report metric).

    Same inverted-index + hub-guard shape as :func:`ngram_jaccard_pairs`
    — fingerprints occurring in more than ``max_fp_freq`` docs are
    dropped before the pair join (None = fully exact oracle mode)."""
    fps = (
        winnow_fingerprints(docs, k=k, w=w, hash_mode=hash_mode)
        .select("doc_id", "fp")
        .distinct()
    )
    if max_fp_freq is not None:
        rare = (
            fps.groupBy("fp")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") <= max_fp_freq)
            .select("fp")
        )
        fps = fps.join(rare, "fp", "left_semi")
    sizes = fps.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a = fps.select(F.col("doc_id").alias("doc_a"), "fp")
    b = fps.select(F.col("doc_id").alias("doc_b"), "fp")
    inter = (
        a.join(b, "fp")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    return (
        inter.join(
            sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "sz_a"),
            "doc_a",
        )
        .join(
            sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "sz_b"),
            "doc_b",
        )
        .withColumn(
            "overlap",
            F.round(F.col("shared") / F.least("sz_a", "sz_b"), 6),
        )
        .filter(F.col("overlap") >= threshold)
        .select("doc_a", "doc_b", "shared", "overlap")
    )
