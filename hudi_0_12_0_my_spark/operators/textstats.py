"""Text analysis operators: tokens, quality, language-ID, fingerprints.

All pure column expressions (whole-stage codegen, no Python in the hot path).
At 100 TB these run as a single narrow map stage over the scan — no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from ._arrlit import str_lit

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
    stop_arr = str_lit(_STOPWORDS)   # one array literal, not N lits
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
        arr = str_lit(words)
        hits = F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
        hit_cols.append(F.struct(hits.alias("hits"), F.lit(lang).alias("lang")))
    best = F.array_max(F.array(*hit_cols))
    return df.withColumn(
        "lang_pred",
        F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und")))


def with_repetition_stats(df: DataFrame, text_col: str = "text",
                          max_lines: int = 500,
                          max_tokens: int = 500) -> DataFrame:
    """Gopher-style repetition/format quality signals (Rae et al. 2021,
    "Scaling Language Models", Table A1) as pure column expressions:

      dup_line_frac         fraction of (trimmed, non-empty) lines that are
                            repeats of an earlier line
      dup_line_char_frac    fraction of line characters inside duplicated lines
      top_bigram_char_frac  fraction of token characters covered by the most
                            frequent word bigram (ties: longest bigram)
      bullet_line_frac      lines starting with a bullet ("-", "*", "•")
      ellipsis_line_frac    lines ending with "..." or "…"
      alpha_word_frac       words containing at least one alphabetic char
      mean_word_len         mean whitespace-token length

    Everything folds per-row with higher-order functions — a map-only stage,
    no shuffle at any scale. The per-line/per-gram frequency counts are
    O(k^2) in the first `max_lines`/`max_tokens` items (capped so a
    pathological document cannot quadratically blow a task); the caps are
    part of the operator contract and the oracle replays them.
    """
    c = F.col(text_col)

    # PERF NOTE: every intermediate array is STAGED as a named column and
    # referenced via F.col(...). Composing these as Python expression
    # variables instead duplicates the whole subtree per reference, and
    # HOFs are interpreted (CodegenFallback) with no common-subexpression
    # elimination — the inlined version measured 150s for 500 small docs
    # (~0.3s/doc); staged it's milliseconds. CollapseProject keeps a
    # multi-referenced non-cheap alias in its own projection, so the
    # staging survives optimization.
    def occ(arr_col, item):
        return F.size(F.filter(arr_col, lambda x: x == item))

    staged = (df
              .withColumn("_lines", F.slice(
                  F.filter(F.transform(F.split(c, r"\n"),
                                       lambda l: F.trim(l)),
                           lambda l: F.length(l) > 0), 1, max_lines))
              # trim() strips spaces only — a trailing newline leaves an
              # empty token after the whitespace split; drop empties
              .withColumn("_toks", F.slice(
                  F.filter(_ws_tokens(F.lower(c)),
                           lambda t: F.length(t) > 0), 1, max_tokens)))
    staged = (staged
              .withColumn("_dlines", F.array_distinct(F.col("_lines")))
              .withColumn("_grams", F.when(
                  F.size("_toks") >= 2, F.transform(
                      F.sequence(F.lit(1), F.greatest(F.size("_toks") - 1,
                                                      F.lit(1))),
                      lambda i: F.concat_ws(
                          " ", F.element_at(F.col("_toks"), i),
                          F.element_at(F.col("_toks"), i + 1))))
                  .otherwise(F.array().cast("array<string>"))))
    staged = (staged
              .withColumn("_line_chars", F.aggregate(
                  "_lines", F.lit(0).cast("long"),
                  lambda acc, l: acc + F.length(l)))
              .withColumn("_tok_chars", F.aggregate(
                  "_toks", F.lit(0).cast("long"),
                  lambda acc, t: acc + F.length(t)))
              .withColumn("_dup_chars", F.aggregate(
                  F.transform(
                      "_dlines",
                      lambda d: F.when(occ(F.col("_lines"), d) > 1,
                                       occ(F.col("_lines"), d) * F.length(d))
                                .otherwise(F.lit(0)).cast("long")),
                  F.lit(0).cast("long"), lambda acc, x: acc + x))
              # single-pass argmax via struct ordering (field-order
              # lexicographic in both Spark and DuckDB): max count, ties to
              # the longest bigram — a two-pass "filter to max count, then
              # max length" would re-inline the max-count subtree per element
              .withColumn("_best", F.array_max(F.transform(
                  F.array_distinct(F.col("_grams")),
                  lambda g: F.struct(occ(F.col("_grams"), g).alias("cnt"),
                                     F.length(g).alias("ln"))))))

    n_lines = F.size("_lines")
    n_tok = F.size("_toks")
    frac = lambda num, den: F.when(den > 0, num / den.cast("double")) \
        .otherwise(F.lit(0.0))  # noqa: E731
    dup_line_frac = frac(n_lines - F.size("_dlines"), n_lines)
    dup_line_char_frac = frac(F.col("_dup_chars"), F.col("_line_chars"))
    # the bigram string contains one separator space: chars covered are
    # (len-1) per occurrence, measured against total token chars
    top_bigram_char_frac = F.when(
        (F.size("_grams") > 0) & (F.col("_tok_chars") > 0),
        (F.col("_best.cnt") * (F.col("_best.ln") - 1))
        / F.col("_tok_chars").cast("double")).otherwise(F.lit(0.0))
    bullet = F.size(F.filter("_lines", lambda l: l.rlike(r"^(-|\*|•)")))
    ellipsis = F.size(F.filter("_lines",
                               lambda l: l.rlike(r"(\.\.\.|…)$")))
    alpha = F.size(F.filter("_toks", lambda t: t.rlike("[a-z]")))

    return (staged
            .withColumn("n_lines", n_lines)
            .withColumn("dup_line_frac", F.round(dup_line_frac, 6))
            .withColumn("dup_line_char_frac", F.round(dup_line_char_frac, 6))
            .withColumn("top_bigram_char_frac",
                        F.round(top_bigram_char_frac, 6))
            .withColumn("bullet_line_frac", F.round(frac(bullet, n_lines), 6))
            .withColumn("ellipsis_line_frac",
                        F.round(frac(ellipsis, n_lines), 6))
            .withColumn("alpha_word_frac", F.round(frac(alpha, n_tok), 6))
            .withColumn("mean_word_len",
                        F.round(frac(F.col("_tok_chars"), n_tok), 6))
            .drop("_lines", "_toks", "_dlines", "_grams", "_line_chars",
                  "_tok_chars", "_dup_chars", "_best"))


def top_ngrams(df: DataFrame, n: int = 2, k: int = 20,
               text_col: str = "text",
               min_count: int | None = None) -> DataFrame:
    """Corpus-wide most frequent word n-grams: (ngram, occurrences), top k
    by count (ties: lexicographically smallest ngram — deterministic).

    Shape: grams generated map-side (one projection), ONE shuffle on the
    gram for the count (map-side partial aggregation folds the heavy
    hitters before the exchange, so stop-gram skew compresses instead of
    hot-spotting), then a k-row total ordering. `min_count` pre-filters
    the tail before the final sort at 100 TB (trillions of singleton grams
    otherwise flow into the ordering exchange).
    """
    toks = F.filter(F.split(F.trim(F.lower(F.col(text_col))), r"\s+"),
                    lambda t: F.length(t) > 0)
    staged = df.select(toks.alias("_toks")) \
               .withColumn("_m", F.size("_toks") - (n - 1))
    grams = staged.filter(F.col("_m") >= 1).select(
        F.explode(F.transform(
            F.sequence(F.lit(1), F.col("_m")),
            lambda i: F.concat_ws(" ", F.slice("_toks", i, n))))
        .alias("ngram"))
    counts = grams.groupBy("ngram").agg(
        F.count(F.lit(1)).cast("bigint").alias("occurrences"))
    if min_count is not None:
        counts = counts.filter(F.col("occurrences") >= min_count)
    # orderBy+limit compiles to TakeOrderedAndProject: per-partition top-k
    # then a k-row merge — no global sort exchange of the full gram counts
    top = counts.orderBy(F.desc("occurrences"), F.asc("ngram")).limit(k)
    w = Window.orderBy(F.desc("occurrences"), F.asc("ngram"))
    return (top.withColumn("rank", F.row_number().over(w))   # k rows only
            .select(F.col("rank").cast("int").alias("rank"),
                    "ngram", "occurrences"))


def bm25_topk(df: DataFrame, query: str, k: int = 10,
              id_col: str = "doc_id", text_col: str = "text",
              k1: float = 1.2, b: float = 0.75) -> DataFrame:
    """BM25 keyword retrieval: top-k documents for a whitespace query.

    (id, bm25) with Robertson idf = ln(1 + (N - df + 0.5)/(df + 0.5)),
    score rounded to 6 decimals, ties broken by id — deterministic top-k.

    Shape for 100 TB: pass 1 is ONE corpus aggregate producing q+2 scalars
    (N, Σdl, per-term document frequencies) — broadcast back as a 1-row
    cross join; pass 2 is a map-only scoring projection feeding
    TakeOrderedAndProject (per-partition top-k, then a k-row merge — the
    full score column never shuffles). Term frequencies are per-row
    higher-order-function folds over the token array; the query is a
    literal, so nothing query-sized is ever shuffled or joined.
    """
    terms = list(dict.fromkeys(t for t in query.lower().split() if t))
    if not terms:
        raise ValueError("bm25_topk: empty query")
    toks = _ws_tokens(F.lower(F.col(text_col)))
    staged = (df.select(F.col(id_col).alias("id"), toks.alias("_toks"))
              .withColumn("_dl", F.size("_toks")))
    def _tf(word):
        # NB: the lambda must be unary — F.filter treats a 2-arg lambda as
        # (element, index) and would bind the captured word to the index
        return F.size(F.filter("_toks", lambda t: t == F.lit(word)))

    tf_cols = [_tf(w).cast("long").alias(f"_tf_{i}")
               for i, w in enumerate(terms)]
    scored0 = staged.select("id", "_dl", *tf_cols)
    stats = scored0.agg(
        F.count(F.lit(1)).cast("bigint").alias("_n"),
        F.sum("_dl").cast("bigint").alias("_sumdl"),
        *[F.sum((F.col(f"_tf_{i}") > 0).cast("long")).cast("bigint")
          .alias(f"_df_{i}") for i in range(len(terms))])
    j = scored0.crossJoin(F.broadcast(stats))
    avgdl = F.col("_sumdl").cast("double") / F.col("_n").cast("double")
    parts = []
    for i in range(len(terms)):
        dfreq = F.col(f"_df_{i}")
        tf = F.col(f"_tf_{i}")
        idf = F.log(F.lit(1.0)
                    + (F.col("_n") - dfreq + F.lit(0.5)) / (dfreq + F.lit(0.5)))
        norm = tf + F.lit(k1) * (F.lit(1.0 - b)
                                 + F.lit(b) * (F.col("_dl") / avgdl))
        parts.append(idf * (tf * F.lit(k1 + 1.0)) / norm)
    total = parts[0]
    for p in parts[1:]:
        total = total + p
    return (j.select(F.col("id").alias(id_col),
                     F.round(total, 6).alias("bm25"))
            .filter(F.col("bm25") > 0)
            .orderBy(F.desc("bm25"), F.asc(id_col)).limit(k))


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


def with_char_entropy(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Shannon entropy of the character unigram distribution (a standard
    gibberish/boilerplate signal: low entropy = repeated filler, high =
    random bytes; used alongside compression-ratio filters in
    Gopher/RefinedWeb-style cleaning). Adds `char_entropy` (rounded 6dp;
    empty text -> 0.0).

    Shape for 100 TB: entirely MAP-ONLY — per row, distinct chars are
    counted against the char array with higher-order functions (JVM,
    O(distinct_chars x len) per row), so no explode and no shuffle exists
    in the plan; the alternative explode+groupBy shape costs two corpus
    shuffles for the same number.
    """
    # the char array materializes first: the per-distinct-char filter
    # lambda re-evaluates its children (interpreted HOF), so an inline
    # split would re-split the text once per distinct character
    chars = F.col("_chars")
    n = F.size(chars)
    probs = F.transform(
        F.array_distinct(chars),
        lambda ch: F.size(F.filter(chars, lambda c: c == ch)) / n)
    ent = F.aggregate(probs, F.lit(0.0),
                      lambda acc, p: acc - p * F.log(p))
    return (df.withColumn("_chars", F.split(F.col(text_col), ""))
            .withColumn(
                "char_entropy",
                F.when(F.coalesce(n, F.lit(0)) > 0, F.round(ent, 6))
                .otherwise(F.lit(0.0)))
            .drop("_chars"))


def bpe_pair_counts(df: DataFrame, k: int = 20,
                    text_col: str = "text") -> DataFrame:
    """Tokenizer induction, step one of BPE (Sennrich'16): corpus-weighted
    counts of adjacent character pairs WITHIN words — the statistic whose
    argmax becomes the first merge rule. Returns the top-k pairs
    (rank, pair, occurrences), ties to the lexicographically smallest pair.

    Shape for 100 TB: the corpus compresses to its word VOCABULARY first
    (one partially-aggregated shuffle on the word — Zipf makes the
    combiner collapse almost everything map-side), then pair generation
    runs over vocab-sized data with the word count as weight: the
    quadratic-ish char work never touches corpus-sized rows. Same
    TakeOrdered ending as top_ngrams (no global sort).
    """
    words = (df.select(F.explode(
        F.filter(F.split(F.trim(F.lower(F.col(text_col))), r"\s+"),
                 lambda t: F.length(t) >= 2)).alias("w"))
        .groupBy("w").agg(F.count(F.lit(1)).cast("bigint").alias("_n")))
    # chars materialized before the pair lambda references it (interpreted
    # HOFs re-evaluate children per element — see _gram_occurrences)
    staged = words.select("_n", F.split(F.col("w"), "").alias("_ch")) \
                  .withColumn("_m", F.size("_ch") - 1)
    pairs = staged.select(
        "_n", F.explode(F.transform(
            F.sequence(F.lit(1), F.col("_m")),
            lambda i: F.concat(F.element_at("_ch", i),
                               F.element_at("_ch", i + 1)))).alias("pair"))
    counts = pairs.groupBy("pair").agg(
        F.sum("_n").cast("bigint").alias("occurrences"))
    top = counts.orderBy(F.desc("occurrences"), F.asc("pair")).limit(k)
    w = Window.orderBy(F.desc("occurrences"), F.asc("pair"))
    return (top.withColumn("rank", F.row_number().over(w))
            .select(F.col("rank").cast("int"), "pair", "occurrences"))


def pmi_top_pairs(df: DataFrame, window: int = 3, k: int = 20,
                  min_count: int = 5,
                  text_col: str = "text") -> DataFrame:
    """Top-k token pairs by pointwise mutual information within a sliding
    co-occurrence window (word2vec/GloVe-style association statistics):
    (rank, tok_a, tok_b, c_ab, c_a, c_b, score).

    PMI = log( P(a,b) / (P(a) P(b)) ) is MONOTONE in c_ab / (c_a * c_b) for
    a fixed corpus, so the ranking key `score = c_ab / (c_a * c_b)` skips
    the transcendental entirely: counts are integers and the one division
    is IEEE-exact on identical operands, which keeps the output bit-portable
    across engines (callers wanting nats apply log(score * N_pairs_norm)
    themselves). Pairs are unordered (tok_a < tok_b, self-pairs dropped).

    Shape for 100 TB: token arrays materialize in their own projection
    (interpreted-HOF rule), pair generation is map-side (per-position
    windows, fan-out <= window per token), ONE shuffle on the pair for
    c_ab with map-side combine, `min_count` prunes the singleton tail
    BEFORE the two unigram joins (vocab-sized, uniformly keyed), and the
    ending is TakeOrdered — never a global sort.
    """
    toks = F.filter(F.split(F.trim(F.lower(F.col(text_col))), r"\s+"),
                    lambda t: F.length(t) > 0)
    staged = df.select(toks.alias("_toks")) \
               .withColumn("_n", F.size("_toks"))
    t = F.col("_toks")
    pair_arrays = F.flatten(F.transform(
        F.sequence(F.lit(1), F.col("_n") - 1),
        lambda i: F.transform(
            F.sequence(i + 1, F.least(i + window, F.col("_n"))),
            lambda j: F.struct(
                F.least(F.element_at(t, i), F.element_at(t, j)).alias("a"),
                F.greatest(F.element_at(t, i), F.element_at(t, j)).alias("b")))))
    pairs = (staged.filter(F.col("_n") >= 2)
             .select(F.explode(pair_arrays).alias("p"))
             .select(F.col("p.a").alias("tok_a"), F.col("p.b").alias("tok_b"))
             .filter(F.col("tok_a") != F.col("tok_b")))
    c_ab = pairs.groupBy("tok_a", "tok_b").agg(
        F.count(F.lit(1)).cast("bigint").alias("c_ab"))
    c_ab = c_ab.filter(F.col("c_ab") >= min_count)
    uni = (staged.select(F.explode("_toks").alias("tok"))
           .groupBy("tok").agg(F.count(F.lit(1)).cast("bigint").alias("c")))
    scored = (c_ab
              .join(uni.select(F.col("tok").alias("tok_a"),
                               F.col("c").alias("c_a")), "tok_a")
              .join(uni.select(F.col("tok").alias("tok_b"),
                               F.col("c").alias("c_b")), "tok_b")
              .withColumn("score",
                          F.col("c_ab").cast("double")
                          / (F.col("c_a") * F.col("c_b")).cast("double")))
    order = [F.desc("score"), F.desc("c_ab"), F.asc("tok_a"), F.asc("tok_b")]
    top = scored.orderBy(*order).limit(k)
    w = Window.orderBy(*order)
    return (top.withColumn("rank", F.row_number().over(w))  # k rows only
            .select(F.col("rank").cast("int").alias("rank"),
                    "tok_a", "tok_b", "c_ab", "c_a", "c_b", "score"))

# Gopher (Rae'21 App. A1.1) required stop words: a doc must contain >= 2
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def with_gopher_quality(df: DataFrame, text_col: str = "text",
                        min_words: int = 50, max_words: int = 100_000,
                        min_mean_word_len: float = 3.0,
                        max_mean_word_len: float = 10.0,
                        max_symbol_ratio: float = 0.1,
                        min_alpha_word_frac: float = 0.8,
                        min_stop_hits: int = 2,
                        max_bullet_line_frac: float = 0.9,
                        max_ellipsis_line_frac: float = 0.3) -> DataFrame:
    """Gopher quality rules (Rae'21 Appendix A1.1) as one map-only pass:
    word-count bounds, mean word length bounds, symbol-to-word ratio
    (# and ...), fraction of words containing an alphabetic character,
    required-stop-word hits, and bullet-/ellipsis-line fractions. Adds the
    measured metrics plus a `pass_gopher` verdict so callers can either
    filter or audit rule-by-rule.

    All metrics are integer counts until one final IEEE division each
    (bit-portable across engines). Shape for 100 TB: pure column
    expressions — a single narrow map stage at scan speed, no shuffle.
    """
    c = F.col(text_col)
    toks = _ws_tokens(c)
    n_words = F.size(toks)
    nw = F.greatest(n_words, F.lit(1))
    # total non-whitespace chars == sum of word lengths, without a HOF fold
    n_chars = F.length(F.regexp_replace(c, r"\s", ""))
    n_hash = F.length(c) - F.length(F.replace(c, F.lit("#"), F.lit("")))
    n_ellipsis = ((F.length(c) - F.length(F.replace(c, F.lit("..."),
                                                    F.lit("")))) / 3
                  ).cast("bigint")
    n_alpha_words = F.size(F.filter(toks, lambda w: w.rlike("[A-Za-z]")))
    stop_arr = str_lit(GOPHER_STOPWORDS)
    stop_hits = F.size(F.array_intersect(toks, stop_arr))
    lines = F.filter(F.split(c, r"\n"),
                     lambda s: F.length(F.trim(s)) > 0)
    n_lines = F.greatest(F.size(lines), F.lit(1))
    n_bullet = F.size(F.filter(lines, lambda s: F.trim(s).rlike(r"^[-*•]")))
    n_ell_end = F.size(F.filter(lines, lambda s: F.trim(s).endswith("...")))
    mean_wl = n_chars / nw
    sym_ratio = (n_hash + n_ellipsis) / nw
    alpha_frac = n_alpha_words / nw
    bullet_frac = n_bullet / n_lines
    ell_frac = n_ell_end / n_lines
    passes = ((n_words >= min_words) & (n_words <= max_words)
              & (mean_wl >= min_mean_word_len)
              & (mean_wl <= max_mean_word_len)
              & (sym_ratio <= max_symbol_ratio)
              & (alpha_frac >= min_alpha_word_frac)
              & (stop_hits >= min_stop_hits)
              & (bullet_frac <= max_bullet_line_frac)
              & (ell_frac <= max_ellipsis_line_frac))
    return (df
            .withColumn("n_words", n_words.cast("bigint"))
            .withColumn("mean_word_len", F.round(mean_wl, 6))
            .withColumn("symbol_ratio", F.round(sym_ratio, 6))
            .withColumn("alpha_word_frac", F.round(alpha_frac, 6))
            .withColumn("stop_hits", stop_hits.cast("bigint"))
            .withColumn("bullet_line_frac", F.round(bullet_frac, 6))
            .withColumn("ellipsis_line_frac", F.round(ell_frac, 6))
            .withColumn("pass_gopher", passes))


def with_readability(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Flesch reading-ease readability signal (the classic quality-stack
    heuristic): 206.835 - 1.015 * words/sentences - 84.6 * syllables/words,
    with sentences = terminal-punctuation runs (min 1) and syllables
    approximated as vowel groups per word (min 1 per word — the standard
    heuristic floor).

    All three inputs are integer counts; the score is one fixed float
    expression over them, so any engine replays it exactly. Adds n_words,
    n_sentences, n_syllables, flesch. Map-only: runs at scan speed with no
    shuffle.
    """
    c = F.col(text_col)
    toks = _ws_tokens(c)
    n_words = F.size(toks)
    nw = F.greatest(n_words, F.lit(1))
    n_sent = F.greatest(
        F.size(F.regexp_extract_all(c, F.lit(r"[.!?]+"), F.lit(0))),
        F.lit(1))
    # vowel groups corpus-wide, floored at one syllable per word:
    # count(vowel runs) + count(words with NO vowel at all)
    n_vgroups = F.size(F.regexp_extract_all(F.lower(c),
                                            F.lit(r"[aeiouy]+"), F.lit(0)))
    n_novowel = F.size(F.filter(toks,
                                lambda w: ~F.lower(w).rlike("[aeiouy]")))
    n_syll = F.greatest(n_vgroups + n_novowel, F.lit(1))
    flesch = (F.lit(206.835)
              - F.lit(1.015) * (n_words / n_sent)
              - F.lit(84.6) * (n_syll / nw))
    return (df.withColumn("n_words", n_words.cast("bigint"))
              .withColumn("n_sentences", n_sent.cast("bigint"))
              .withColumn("n_syllables", n_syll.cast("bigint"))
              .withColumn("flesch", F.round(flesch, 6)))
