"""Text-analysis operators for large-scale training-data pipelines.

Not part of the reference repo (which is graph-only), but first-class
components of this engine per the build brief: language identification,
quality scoring, token counting, and document fingerprinting over a
``documents(doc_id, text, lang, source, n_chars)`` table.

All operators are pure built-in-expression plans (JVM-side, whole-stage
codegen) — no Python in the hot path — and each has an ANSI-SQL oracle in
``__spark_entry__``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword marker sets (heuristic language-ID; the
# classic n-gram approach reduced to its highest-signal unigrams so the
# DuckDB oracle can reproduce it exactly)
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "with"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit"],
    "fr": ["le", "la", "les", "et", "est", "une", "dans", "pour"],
    "es": ["el", "los", "las", "es", "una", "por", "con", "para"],
}

_EN_STOPWORDS = LANG_MARKERS["en"] + ["a", "for", "on", "it", "as", "at", "by"]


def _tokens(col):
    """Lowercased whitespace tokens with punctuation stripped — the shared
    tokenizer (mirrored 1:1 in the SQL oracles)."""
    return F.split(
        F.trim(F.regexp_replace(F.lower(col), r"[^a-z0-9\s]", " ")), r"\s+"
    )


def token_stats(docs: DataFrame) -> DataFrame:
    """Per-document counting stats: chars, whitespace tokens, BPE-ish
    word-piece count (regex word + digit runs), punctuation ratio."""
    text = F.col("text")
    toks = _tokens(text)
    n_chars = F.length(text)
    return docs.select(
        "doc_id",
        n_chars.alias("n_chars"),
        F.when(F.length(F.trim(text)) == 0, F.lit(0))
        .otherwise(F.size(toks))
        .alias("n_tokens"),
        # word-piece proxy: alpha runs + digit runs counted separately
        (
            F.size(F.split(text, r"[A-Za-z]+")) - 1
            + F.size(F.split(text, r"[0-9]+"))
            - 1
        ).alias("n_pieces"),
        F.when(
            n_chars > 0,
            F.round(
                (n_chars - F.length(F.regexp_replace(text, r"[^\w\s]", ""))) / n_chars,
                6,
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("punct_ratio"),
    )


def language_id(docs: DataFrame) -> DataFrame:
    """Heuristic language ID: count per-language marker-word hits in the
    token set; argmax wins, ties -> lexicographically first language,
    no hits -> 'und' (undetermined)."""
    toks = F.array_distinct(_tokens(F.col("text")))
    scores = [
        F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words]))).alias(
            f"score_{lang}"
        )
        for lang, words in sorted(LANG_MARKERS.items())
    ]
    scored = docs.select("doc_id", *scores)
    langs = sorted(LANG_MARKERS)
    best = F.greatest(*[F.col(f"score_{lang}") for lang in langs])
    pred = F.lit("und")
    for lang in reversed(langs):  # earlier langs win ties: apply last
        pred = F.when(
            (F.col(f"score_{lang}") == best) & (best > 0), F.lit(lang)
        ).otherwise(pred)
    return scored.select(
        "doc_id", pred.alias("pred_lang"), *[F.col(f"score_{lang}") for lang in langs]
    )


def quality_score(docs: DataFrame, min_chars: int = 50, max_punct: float = 0.3) -> DataFrame:
    """Composite quality heuristic in [0,1]: length band + punctuation
    ratio + English-stopword density (the classic Gopher/C4-style filters
    reduced to deterministic expressions)."""
    stats = token_stats(docs)
    toks = _tokens(F.col("text"))
    sw = F.array(*[F.lit(w) for w in _EN_STOPWORDS])
    sw_hits = F.size(F.array_intersect(F.array_distinct(toks), sw))
    joined = docs.select("doc_id", "text").join(stats, "doc_id")
    length_ok = (F.col("n_chars") >= min_chars).cast("double")
    punct_ok = (F.col("punct_ratio") <= max_punct).cast("double")
    sw_score = F.least(F.lit(1.0), sw_hits / F.lit(4.0))
    return joined.select(
        "doc_id",
        F.round((length_ok + punct_ok + sw_score) / 3.0, 6).alias("quality"),
    )


def quality_filter(
    docs: DataFrame,
    min_tokens: int = 5,
    max_tokens: int = 100_000,
    max_punct: float = 0.3,
    max_top_token_ratio: float = 0.3,
    max_dup_bigram_frac: float = 0.5,
    min_mean_word_len: float = 2.0,
    max_mean_word_len: float = 12.0,
) -> DataFrame:
    """The composed keep/drop decision pass of a training-data pipeline
    (Gopher Rae et al. 2021 §A1.1 / C4 Raffel et al. 2020 style): each
    document gets ``keep`` plus the FIRST failing rule as
    ``reject_reason`` (NULL for keepers), with a fixed rule precedence
    so the decision is deterministic and auditable:

    too_short -> too_long -> punct -> word_len_low -> word_len_high ->
    top_token -> dup_bigram

    Built on :func:`token_stats` + :func:`repetition_stats` (their 6-dp
    rounded outputs, identical in the SQL mirror), so the decision is
    engine-portable; one join of two already-aggregated per-doc tables —
    no new shuffles beyond the underlying stats.
    """
    stats = token_stats(docs).join(repetition_stats(docs), "doc_id", "left")
    reason = (
        F.when(F.col("n_tokens") < min_tokens, F.lit("too_short"))
        .when(F.col("n_tokens") > max_tokens, F.lit("too_long"))
        .when(F.col("punct_ratio") > max_punct, F.lit("punct"))
        .when(F.col("mean_word_len") < min_mean_word_len, F.lit("word_len_low"))
        .when(
            F.col("mean_word_len") > max_mean_word_len, F.lit("word_len_high")
        )
        .when(
            F.col("top_token_ratio") > max_top_token_ratio, F.lit("top_token")
        )
        .when(
            F.col("dup_bigram_frac") > max_dup_bigram_frac,
            F.lit("dup_bigram"),
        )
        .otherwise(F.lit(None).cast("string"))
    )
    return stats.select(
        "doc_id",
        reason.isNull().alias("keep"),
        reason.alias("reject_reason"),
    )


def repetition_stats(docs: DataFrame) -> DataFrame:
    """Gopher-style repetition signals (Rae et al. 2021 §A1.1) — the
    filters a training-data pipeline applies to drop degenerate /
    boilerplate documents:

    * ``top_token_ratio``   count of the most frequent token / all tokens
    * ``mean_word_len``     mean token length over all token instances
    * ``top_bigram_ratio``  count of the most frequent 2-gram / all 2-grams
    * ``dup_bigram_frac``   fraction of 2-gram instances whose 2-gram
      occurs more than once

    Docs with fewer than two tokens get 0.0 for the bigram columns.

    Scale design: two explode → two-level hash aggregations, both keyed
    by (doc_id, gram) then doc_id — shuffle volume O(total tokens) with
    map-side combine, no per-doc quadratic work and no Python.  The
    within-doc alternative (higher-order-function frequency scan) is
    O(len²) per document, which a 100 TB corpus with long docs cannot
    afford.
    """
    base = docs.select("doc_id", _tokens(F.col("text")).alias("toks"))
    tok = base.select("doc_id", F.explode("toks").alias("tok"))
    tokc = tok.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("c"))
    toka = tokc.groupBy("doc_id").agg(
        F.round(F.max("c") / F.sum("c"), 6).alias("top_token_ratio"),
        F.round(F.sum(F.col("c") * F.length("tok")) / F.sum("c"), 6).alias(
            "mean_word_len"
        ),
    )
    bgs = F.expr(
        """CASE WHEN size(toks) >= 2
           THEN transform(sequence(0, size(toks) - 2),
                          i -> concat(toks[i], ' ', toks[i + 1]))
           ELSE CAST(array() AS array<string>) END"""
    )
    bgc = (
        base.select("doc_id", F.explode(bgs).alias("bg"))
        .groupBy("doc_id", "bg")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    bga = bgc.groupBy("doc_id").agg(
        F.round(F.max("c") / F.sum("c"), 6).alias("top_bigram_ratio"),
        F.round(
            F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(F.lit(0)))
            / F.sum("c"),
            6,
        ).alias("dup_bigram_frac"),
    )
    return (
        toka.join(bga, "doc_id", "left")
        .fillna({"top_bigram_ratio": 0.0, "dup_bigram_frac": 0.0})
        .select(
            "doc_id",
            "top_token_ratio",
            "mean_word_len",
            "top_bigram_ratio",
            "dup_bigram_frac",
        )
    )


def tfidf_top_terms(docs: DataFrame, k: int = 3) -> DataFrame:
    """Top-k characteristic terms per document by TF-IDF — the keyword /
    domain-signal extraction step of a corpus pipeline.

    Exact formula (deterministic, oracle-portable): ``tf`` = term count
    in the doc, ``idf = ln(N / df)`` with N = total docs and df = number
    of docs containing the term; ``score = round(tf * idf, 6)``; rank by
    (score DESC, term ASC) within each doc, keep rank <= k.  Returns
    ``(doc_id, term, tf, score, rank)``.

    Scale: one explode → (doc, term) hash agg (map-side combined), a
    term-keyed df agg joined back on term (hub terms are exactly the
    high-df ones, whose idf → 0 — skew on the join key is absorbed by
    AQE), and a per-doc window over <= distinct-terms rows.  N is one
    scalar aggregate, folded in as a literal.
    """
    n_docs = docs.count()
    terms = docs.select(
        "doc_id", F.explode(_tokens(F.col("text"))).alias("term")
    )
    tf = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(df_, "term").select(
        "doc_id",
        "term",
        "tf",
        F.round(F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6).alias(
            "score"
        ),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("doc_id", "term", "tf", "score", "rank")
    )


def bpe_train(
    docs: DataFrame,
    num_merges: int = 8,
    marker: str = "#",
    sep: str = "|",
) -> DataFrame:
    """Byte-pair-encoding merge training (Sennrich et al. 2016) — the
    tokenizer-prep step of an LLM data pipeline, run on the word-
    frequency table exactly like subword-nmt.

    Deterministic, oracle-portable spec: words = the shared tokenizer's
    tokens with corpus frequencies; each word starts as its characters
    plus a terminal ``marker`` symbol; per round the globally most
    frequent adjacent symbol pair (ties by (left ASC, right ASC)) merges
    everywhere, greedy leftmost non-overlapping within each word.

    The merge rewrite is a LITERAL string replace over the sentinel-
    wrapped symbol string ``|s1||s2||...|``: matches can only start at
    symbol boundaries (symbols never contain the sentinel — the
    tokenizer's alphabet is [a-z0-9] plus the marker), and built-in
    ``replace`` scans left to right continuing AFTER each match, which
    IS BPE's non-overlapping greedy semantics (``aaaa`` under the a+a
    merge becomes ``aa aa``).  Identical in Spark and DuckDB, so every
    round mirrors exactly in SQL.

    Returns the merge table ``(merge_rank int, left string, right
    string, merged string, pair_count long)``.

    Scale: the state is the WORD-frequency table (vocabulary-sized, not
    corpus-sized — the standard BPE trick); per round one
    zip-explode + map-side-combined pair count, a 1-row TakeOrdered
    argmax folded back as plan literals, and a map-only string rewrite.
    """
    from csd363_sin_spark.plans.lineage import materialize, release

    spark = docs.sparkSession
    words = (
        docs.select(F.explode(_tokens(F.col("text"))).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    ws = materialize(
        words.select(
            "cnt",
            F.concat(
                F.regexp_replace(F.col("word"), "(.)", f"{sep}$1{sep}"),
                F.lit(f"{sep}{marker}{sep}"),
            ).alias("ws"),
        )
    )
    merges: list[tuple] = []
    esc_sep = "\\" + sep
    for rank in range(num_merges):
        toks = F.split(
            F.expr(f"trim(BOTH '{sep}' FROM ws)"), esc_sep + esc_sep
        )
        pairs = F.arrays_zip(
            F.slice(toks, 1, F.size(toks) - 1).alias("l"),
            F.slice(toks, 2, F.size(toks) - 1).alias("r"),
        )
        pc = (
            ws.select("cnt", F.explode(pairs).alias("p"))
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("cnt").alias("pc"))
        )
        top = pc.orderBy(F.desc("pc"), F.asc("l"), F.asc("r")).limit(1).collect()
        if not top:
            break
        left, right, pair_count = top[0]["l"], top[0]["r"], int(top[0]["pc"])
        merges.append((rank, left, right, left + right, pair_count))
        prev = ws
        ws = materialize(
            prev.select(
                "cnt",
                F.replace(
                    F.col("ws"),
                    F.lit(f"{sep}{left}{sep}{sep}{right}{sep}"),
                    F.lit(f"{sep}{left}{right}{sep}"),
                ).alias("ws"),
            )
        )
        release(prev)
    release(ws)
    return spark.createDataFrame(
        merges,
        "merge_rank int, left string, right string, merged string, pair_count long",
    )


def bpe_encode(
    docs: DataFrame,
    num_merges: int = 8,
    preview: int = 10,
    marker: str = "#",
    sep: str = "|",
) -> DataFrame:
    """Apply BPE merges to the corpus — train (``bpe_train``) then
    encode every document by replaying the merge table in rank order.

    Encoding is map-only: each document becomes the concatenation of its
    sentinel-wrapped words and the k learned merges apply as k chained
    literal replaces (plan literals).  Cross-word false matches are
    impossible: a merge's LEFT symbol never contains the terminal
    ``marker`` (nothing follows the marker inside a word during
    training), so no learned pattern can span a word boundary.

    Returns ``(doc_id, n_bpe_tokens, bpe_preview)`` — the post-merge
    token count and the first ``preview`` tokens CSV (the portable
    fingerprint of the encoding).  Empty docs encode to 0 tokens.
    """
    merges = [
        (r["left"], r["right"], r["merged"])
        for r in bpe_train(docs, num_merges=num_merges)
        .orderBy("merge_rank")
        .collect()
    ]
    # build the sentinel-wrapped doc string entirely map-side (word order
    # is the document's order by construction — no collect_list ordering
    # hazard, no shuffle)
    wrapped = F.transform(
        F.filter(_tokens(F.col("text")), lambda t: t != ""),
        lambda t: F.concat(
            F.regexp_replace(t, "(.)", f"{sep}$1{sep}"),
            F.lit(f"{sep}{marker}{sep}"),
        ),
    )
    doc_str = docs.select("doc_id", F.array_join(wrapped, "").alias("ws"))
    enc = F.col("ws")
    for left, right, merged in merges:
        enc = F.replace(
            enc,
            F.lit(f"{sep}{left}{sep}{sep}{right}{sep}"),
            F.lit(f"{sep}{merged}{sep}"),
        )
    toks = F.split(F.expr(f"trim(BOTH '{sep}' FROM enc)"), "\\" + sep + "\\" + sep)
    return (
        doc_str.select("doc_id", enc.alias("enc"))
        .select(
            "doc_id",
            F.when(F.col("enc") == "", F.lit(0))
            .otherwise(F.size(toks))
            .cast("long")
            .alias("n_bpe_tokens"),
            F.when(F.col("enc") == "", F.lit(""))
            .otherwise(F.array_join(F.slice(toks, 1, preview), ","))
            .alias("bpe_preview"),
        )
    )


def bm25_topk(
    docs: DataFrame,
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    n_query_terms: int = 3,
) -> DataFrame:
    """BM25 retrieval top-k (Robertson/Sparck Jones Okapi weighting) —
    the ranking step of a retrieval / contamination-audit pipeline.

    Deterministic, oracle-portable spec: the probe query is the
    ``n_query_terms`` highest-document-frequency tokens (ties by term
    ASC); per (doc, query term)

        idf  = ln(1 + (N - df + 0.5) / (df + 0.5))
        norm = tf * (k1+1) / (tf + k1 * (1 - b + b * dl/avgdl))
        contrib_ppm = floor(idf * norm * 1e6 + 0.5)    -- integer micro-units

    with dl = the doc's non-empty token count and avgdl = total tokens /
    N over ALL documents.  The per-term quantization makes the final
    per-doc sum an INTEGER sum — associative, so engine- and
    partitioning-independent (the same trick densest_subgraph uses for
    its density snapshots).  Returns the top ``k`` rows
    ``(doc_id, score_ppm)`` by (score DESC, doc_id ASC).

    Scale: explode → (doc, term) and (term) hash aggs (map-side
    combined); the probe join broadcasts ``n_query_terms`` rows; the
    top-k is a TakeOrdered (per-partition heads + driver merge), never a
    global sort.  N and avgdl are single-row aggregates folded in as
    literals.
    """
    n_docs = docs.count()
    tok = docs.select(
        "doc_id", F.explode(_tokens(F.col("text"))).alias("term")
    ).filter(F.col("term") != "")
    tf = tok.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("double").alias("tf")
    )
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).cast("double").alias("dl"))
    avgdl = (
        dl.agg(F.sum("dl")).collect()[0][0] or 0.0
    ) / float(n_docs)
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).cast("double").alias("df"))
    probe = dfreq.orderBy(F.desc("df"), F.asc("term")).limit(n_query_terms)
    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    norm = (
        F.col("tf")
        * F.lit(k1 + 1.0)
        / (
            F.col("tf")
            + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.lit(avgdl))
        )
    )
    contrib = (
        tf.join(F.broadcast(probe), "term")
        .join(dl, "doc_id")
        .select(
            "doc_id",
            F.floor(idf * norm * F.lit(1e6) + F.lit(0.5)).alias("contrib_ppm"),
        )
    )
    return (
        contrib.groupBy("doc_id")
        .agg(F.sum("contrib_ppm").cast("long").alias("score_ppm"))
        .orderBy(F.desc("score_ppm"), F.asc("doc_id"))
        .limit(k)
    )


def unigram_lm_score(docs: DataFrame) -> DataFrame:
    """Corpus-unigram language-model score per document — the cheap
    KenLM-style quality signal: fit an add-one-smoothed unigram model on
    the whole corpus, then score each document by its mean token negative
    log-likelihood (lower = more typical of the corpus; very high = noise
    / junk, very low = boilerplate).

    Exact formula (oracle-portable): ``p(t) = (c(t) + 1) / (T + V)`` with
    c = corpus token count, T = total tokens, V = distinct tokens;
    ``avg_nll = round(avg over doc tokens of -ln p(t), 6)``.  Empty-text
    docs are excluded.  Returns ``(doc_id, n_tokens, avg_nll)``.

    Scale: one explode, one term-count agg (map-side combined), T and V
    folded in as literals from a single scalar aggregate, one term join
    back (high-frequency terms are the skew keys and exactly the ones
    AQE splits), one per-doc agg.  No Python in the hot path.
    """
    base = docs.filter(F.length(F.trim(F.col("text"))) > 0)
    tok = base.select("doc_id", F.explode(_tokens(F.col("text"))).alias("term"))
    cnt = tok.groupBy("term").agg(F.count(F.lit(1)).alias("c"))
    totals = cnt.agg(
        F.sum("c").alias("t"), F.count(F.lit(1)).alias("v")
    ).collect()[0]
    denom = float(totals["t"] + totals["v"])
    return (
        tok.join(cnt, "term")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(
                F.avg(-F.log((F.col("c") + 1) / F.lit(denom))), 6
            ).alias("avg_nll"),
        )
    )


def corpus_mix(docs: DataFrame) -> DataFrame:
    """Per-(source, lang) corpus composition report: document count,
    total whitespace tokens, and mean quality score — the data-mixing
    summary a training run is planned against.  One join of two
    per-doc relations plus one grouped aggregation; trivially scales."""
    per_doc = token_stats(docs).select("doc_id", "n_tokens").join(
        quality_score(docs), "doc_id"
    )
    return (
        docs.select("doc_id", "source", "lang")
        .join(per_doc, "doc_id")
        .groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.round(F.avg("quality"), 6).alias("mean_quality"),
        )
    )


# PII patterns — deliberately restricted to syntax shared by Java regex
# (Spark) and RE2 (DuckDB): no backrefs, no lookaround.  Order matters and
# is fixed: emails first (their local part may contain digits), then IPv4
# (dots break the phone pattern, so no overlap), then phone-like runs.
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b(\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d[\d\- ]{7,}\d", "<PHONE>"),
]


def redact_pii(docs: DataFrame) -> DataFrame:
    """PII scrubbing: replace emails / IPv4 addresses / phone-like digit
    runs with typed placeholders and count each kind — the redaction pass
    a training-data pipeline runs before anything else ships.

    Returns ``(doc_id, redacted, n_email, n_ip, n_phone)``.  Counts are
    measured on the ORIGINAL text (the three patterns cannot overlap, see
    ``PII_PATTERNS``); the replacement is applied sequentially in the
    fixed pattern order.  Pure JVM expressions (regexp_count /
    regexp_replace) — one narrow map stage, no shuffle, trivially
    100 TB-shaped.
    """
    text = F.col("text")
    redacted = text
    counts = []
    for name, pat, tag in PII_PATTERNS:
        counts.append(
            F.regexp_count(text, F.lit(pat)).cast("long").alias(f"n_{name}")
        )
        redacted = F.regexp_replace(redacted, pat, tag)
    return docs.select("doc_id", redacted.alias("redacted"), *counts)


def fingerprint(docs: DataFrame) -> DataFrame:
    """Deterministic content fingerprint: md5 of the normalized token
    stream (whitespace-canonicalized, lowercased, punctuation-stripped) —
    identical wording => identical fingerprint regardless of spacing or
    case.  md5 is available in both Spark and DuckDB, so the oracle is
    exact."""
    norm = F.concat_ws(" ", _tokens(F.col("text")))
    return docs.select(
        "doc_id", F.md5(norm).alias("fingerprint"), F.length(norm).alias("norm_len")
    )


def bigram_lm_score(docs: DataFrame) -> DataFrame:
    """Corpus-bigram language-model score per document — one order up
    from :func:`unigram_lm_score`: fit an add-one-smoothed conditional
    bigram model on the whole corpus and score each document by the mean
    negative log-likelihood of its bigram instances.  Bigram surprise
    separates shuffled/garbled text from fluent text even when the
    unigram distributions are identical — the signal the unigram scorer
    is blind to.

    Exact formula (oracle-portable): ``p(w2 | w1) = (c(w1 w2) + 1) /
    (c1(w1) + V)`` with c = corpus bigram count, c1 = corpus count of w1
    as a bigram HEAD, V = distinct corpus tokens (the smoothing
    vocabulary); ``avg_nll = round(avg over doc bigrams of -ln p, 6)``.
    Docs with fewer than two tokens are excluded.  Returns
    ``(doc_id, n_bigrams, avg_nll)``.

    Scale: one explode of per-doc bigram arrays, one bigram-count agg
    and one head-count agg (both map-side combined), V folded in as a
    literal from one scalar aggregate, two joins back, one per-doc agg.
    """
    base = docs.select("doc_id", _tokens(F.col("text")).alias("toks")).filter(
        F.size("toks") >= 2
    )
    bgs = F.expr(
        """transform(sequence(0, size(toks) - 2),
                     i -> struct(toks[i] AS w1, toks[i + 1] AS w2))"""
    )
    inst = base.select("doc_id", F.explode(bgs).alias("bg")).select(
        "doc_id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2")
    )
    bcnt = inst.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c"))
    hcnt = bcnt.groupBy("w1").agg(F.sum("c").alias("c1"))
    tok = docs.filter(F.length(F.trim(F.col("text"))) > 0).select(
        F.explode(_tokens(F.col("text"))).alias("term")
    )
    v = int(tok.select("term").distinct().count())
    return (
        inst.join(bcnt, ["w1", "w2"])
        .join(hcnt, "w1")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(
                F.avg(
                    -F.log(
                        (F.col("c") + 1)
                        / (F.col("c1") + F.lit(v)).cast("double")
                    )
                ),
                6,
            ).alias("avg_nll"),
        )
    )


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Fixed-size token-window chunking with overlap — the standard
    training-sequence preparation step (split each document into windows
    of ``chunk_tokens`` tokens advancing by ``chunk_tokens - overlap``;
    the final window may be short; every non-empty document yields at
    least one chunk).

    Returns ``(doc_id, chunk_idx, n_tokens, chunk_text)`` where
    ``chunk_idx`` is 0-based, ``n_tokens`` the window's actual token
    count, and ``chunk_text`` the space-joined tokens of the shared
    tokenizer (so chunk boundaries are engine-portable).  Window starts
    run 1, 1+stride, ... while start <= max(n_tokens - overlap, 1), so a
    trailing window always contains at least one token beyond the
    previous window's overlap (no fully-redundant chunks).

    Pure map-side: one tokenize + one ``sequence`` explode per document —
    no shuffle at all, the ideal 100 TB shape (output size ~
    input x chunk/stride)."""
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be < chunk_tokens")
    stride = chunk_tokens - overlap
    toks = F.when(
        F.length(F.trim(F.col("text"))) == 0, F.array().cast("array<string>")
    ).otherwise(_tokens(F.col("text")))
    t = docs.select("doc_id", toks.alias("toks")).filter(F.size("toks") > 0)
    starts = F.sequence(
        F.lit(1),
        F.greatest(F.size("toks") - overlap, F.lit(1)),
        F.lit(stride),
    )
    exploded = t.select(
        "doc_id", "toks", F.posexplode(starts).alias("chunk_idx", "start")
    )
    window = F.slice(F.col("toks"), F.col("start"), chunk_tokens)
    return exploded.select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.size(window).cast("int").alias("n_tokens"),
        F.array_join(window, " ").alias("chunk_text"),
    )


def build_vocab(
    docs: DataFrame,
    max_size: int = 30000,
    min_count: int = 1,
) -> DataFrame:
    """Corpus vocabulary: the ``max_size`` most frequent tokens (shared
    tokenizer) with count >= ``min_count``, assigned DENSE 0-based ids in
    (count DESC, term ASC) order — the deterministic ordering every
    tokenizer-training pipeline needs for reproducible vocab files.

    Returns ``(term_id, term, count, doc_freq)``.  Plan: one explode +
    map-side-combined (term) count, one distinct-per-doc count for
    doc_freq, then a row_number window whose ``< max_size`` filter Spark
    rewrites into a partial+final WindowGroupLimit (top-k per partition
    first), so the single-partition sort sees at most
    partitions x max_size candidate rows, never the full term table."""
    from pyspark.sql import Window

    toks = docs.select(
        "doc_id", F.explode(_tokens(F.lower(F.col("text")))).alias("term")
    ).filter(F.col("term") != "")
    tf = toks.groupBy("term").agg(F.count(F.lit(1)).alias("count"))
    df_ = (
        toks.distinct()
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
    )
    cand = tf.filter(F.col("count") >= min_count).join(df_, "term")
    w = Window.orderBy(F.desc("count"), F.asc("term"))
    return (
        cand.withColumn("term_id", (F.row_number().over(w) - 1).cast("long"))
        .filter(F.col("term_id") < max_size)
        .select("term_id", "term", "count", "doc_freq")
    )


def zipf_fit(
    docs: DataFrame,
    max_size: int = 30000,
    min_count: int = 1,
) -> DataFrame:
    """Zipf's-law fit over the corpus vocabulary: OLS slope of ln(count)
    vs ln(rank) (natural text sits near -1; heavily deduplicated or
    templated corpora drift away — a cheap corpus-health diagnostic).

    Returns one row ``(n_terms, slope, r2)``.  One regression aggregation
    (covar_pop / var_pop / corr) over the :func:`build_vocab` output —
    the vocab table is already bounded by ``max_size``."""
    vocab = build_vocab(docs, max_size=max_size, min_count=min_count)
    xy = vocab.select(
        F.log(F.col("term_id") + 1.0).alias("x"),
        F.log(F.col("count").cast("double")).alias("y"),
    )
    agg = xy.agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.covar_pop("x", "y").alias("cxy"),
        F.var_pop("x").alias("vx"),
        F.var_pop("y").alias("vy"),
    )
    # r2 from cov^2/(vx*vy) with explicit guards: F.corr raises
    # DIVIDE_BY_ZERO under ANSI mode when either variance is 0
    r2 = F.when(
        (F.col("vx") > 0) & (F.col("vy") > 0),
        (F.col("cxy") * F.col("cxy")) / (F.col("vx") * F.col("vy")),
    ).otherwise(F.lit(0.0))
    return agg.select(
        "n_terms",
        F.round(
            F.when(F.col("vx") > 0, F.col("cxy") / F.col("vx")).otherwise(
                F.lit(0.0)
            ),
            6,
        ).alias("slope"),
        F.round(r2, 6).alias("r2"),
    )
