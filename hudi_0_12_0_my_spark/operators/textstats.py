"""Text analysis operators: tokens, quality, language-ID, fingerprints.

All pure column expressions (whole-stage codegen, no Python in the hot path).
At 100 TB these run as a single narrow map stage over the scan — no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# BPE-ish token proxy: letter runs, digit runs, or single other non-space chars
TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
PUNCT_CLASS = r"[.,!?;:'\"()\[\]{}-]"

_STOPWORDS = ("the a an and or of to in is are was be for on with as at by "
              "it this that from").split()

# tiny per-language discriminative lexicons for the n-gram/common-word vote
_LANG_LEXICON = {
    "en": ["the", "and", "of", "to", "is", "that", "for", "with"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "mit", "ein"],
    "fr": ["le", "la", "les", "et", "est", "pas", "pour", "une"],
    "es": ["el", "la", "los", "que", "es", "por", "una", "con"],
}


def _ws_tokens(col: Column) -> Column:
    """Whitespace tokenization; empty/blank text -> empty array."""
    return F.when(F.length(F.trim(col)) == 0, F.array().cast("array<string>")) \
            .otherwise(F.split(F.trim(col), r"\s+"))


def with_token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """n_tokens (whitespace), n_bpe_tokens (regex proxy), n_chars_actual."""
    c = F.col(text_col)
    return (df
            .withColumn("n_tokens", F.size(_ws_tokens(c)))
            .withColumn("n_bpe_tokens",
                        F.size(F.regexp_extract_all(c, F.lit(TOKEN_REGEX), F.lit(0))))
            .withColumn("n_chars_actual", F.length(c)))


def with_quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword-ratio heuristics -> quality in [0,1].

    Mirrors the usual pretraining-corpus filters (C4-style): penalize very
    short docs, high punctuation density, and low stopword incidence.
    """
    c = F.col(text_col)
    toks = _ws_tokens(c)
    n_tok = F.size(toks)
    n_punct = F.length(c) - F.length(F.regexp_replace(c, PUNCT_CLASS, ""))
    stop_arr = F.array(*[F.lit(s) for s in _STOPWORDS])
    n_stop = F.size(F.array_intersect(toks, stop_arr))
    # distinct-stopword presence ratio: cheap, order-independent
    stop_ratio = F.when(n_tok > 0, n_stop / F.lit(float(len(_STOPWORDS)))).otherwise(F.lit(0.0))
    punct_ratio = F.when(F.length(c) > 0, n_punct / F.length(c)).otherwise(F.lit(1.0))
    len_score = F.least(n_tok / F.lit(50.0), F.lit(1.0))
    score = (F.lit(0.4) * len_score
             + F.lit(0.3) * (F.lit(1.0) - F.least(punct_ratio * 5, F.lit(1.0)))
             + F.lit(0.3) * F.least(stop_ratio * 4, F.lit(1.0)))
    return (df.withColumn("n_punct", n_punct)
              .withColumn("quality_score", F.round(score, 4)))


def with_language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Common-word vote over tiny per-language lexicons (heuristic lang-ID).

    Pure expressions: per language, count lexicon hits among the first 200
    tokens; argmax wins, 'und' (undetermined) when no hits. At scale this is
    a map-only stage — the lexicons are literals, nothing is shuffled.
    """
    toks = F.slice(_ws_tokens(F.lower(F.col(text_col))), 1, 200)
    hit_cols = []
    for lang, words in _LANG_LEXICON.items():
        arr = F.array(*[F.lit(w) for w in words])
        hits = F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
        hit_cols.append(F.struct(hits.alias("hits"), F.lit(lang).alias("lang")))
    best = F.array_max(F.array(*hit_cols))
    return df.withColumn(
        "lang_pred",
        F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und")))


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic 64-bit document fingerprint over normalized text.

    Normalization: lowercase, collapse whitespace, strip punctuation — then a
    single xxhash64 (stands in for a rolling hash; identical normalization =>
    identical fingerprint, which is what exact-dedup keys on).
    """
    c = F.col(text_col)
    norm = F.trim(F.regexp_replace(
        F.regexp_replace(F.lower(c), PUNCT_CLASS, ""), r"\s+", " "))
    return df.withColumn("fingerprint", F.xxhash64(norm))
