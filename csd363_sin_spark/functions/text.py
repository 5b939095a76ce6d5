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
