"""Training-data pipeline operators: decontamination, PII scrubbing,
deterministic sampling.

These are the curation steps a large-scale LLM-data pipeline runs between
ingestion and training, expressed Spark-first:

- decontamination is the standard "drop training docs that share an n-gram
  with the eval/benchmark set" step (the GPT-3/PaLM 13-gram rule). Shape for
  100 TB: the benchmark side is tiny (eval sets are thousands of docs), so
  its distinct gram set broadcasts; the 100 TB training side is scanned once,
  grams generated map-side, and the contamination probe is a broadcast
  semi-join — the big side never shuffles.
- PII scrubbing is pure `regexp_replace` column expressions (JVM, codegen,
  map-only). Patterns are RE2-compatible (no backrefs/lookaheads) so the
  same rule set runs on any engine.
- deterministic sampling hashes the id (not `rand()`), so a sample is
  reproducible across retries/engines and never needs a shuffle.

All operators are map-only or broadcast-join-only on the large side: nothing
here shuffles the corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _word_grams(text: Column, n: int, *, pre_tokenized: bool = False) -> Column:
    """Distinct lowercase word n-grams of `text` as array<string> (map-only).

    PERF: the gram lambda slices its token-array child per gram position,
    and interpreted HOFs re-evaluate children — pass a MATERIALIZED
    token-array column (pre_tokenized=True) when the input is
    document-sized, or the regex split re-runs O(tokens) times per row
    (see _gram_occurrences; same pathology class as minhash's
    _min_hash_sig note)."""
    toks = text if pre_tokenized else F.split(F.trim(F.lower(text)), r"\s+")
    m = F.size(toks) - (n - 1)
    return F.when(m >= 1, F.array_distinct(F.transform(
        F.sequence(F.lit(1), m),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n))))) \
        .otherwise(F.array().cast("array<string>"))


def _doc_grams(df: DataFrame, text_col: str, id_col: str | None, n: int,
               outer: bool = False) -> DataFrame:
    """(id, _g) exploded DISTINCT-gram rows with the token array
    materialized in its own projection (the cheap-attribute shape).
    outer=True keeps gram-less (short) docs as a null-gram row.
    id_col=None yields gram rows only — benchmark sides need no id
    column (and must not be required to carry one)."""
    ids = [F.col(id_col)] if id_col is not None else []
    tokd = df.select(*ids,
                     F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
                     .alias("_toks"))
    g = _word_grams(F.col("_toks"), n, pre_tokenized=True)
    ex = F.explode_outer(g) if outer else F.explode(g)
    return tokd.select(*ids, ex.alias("_g"))


def contaminated_ids(docs: DataFrame, benchmark: DataFrame,
                     text_col: str = "text", id_col: str = "doc_id",
                     n: int = 8, hash_grams: bool = True) -> DataFrame:
    """Ids of `docs` rows sharing at least one word n-gram with `benchmark`.

    The benchmark gram set is distinct-ed and BROADCAST; the docs side
    explodes its grams map-side and probes with a broadcast LEFT SEMI join,
    so the (huge) docs relation is scanned once and never shuffled — the only
    exchange is the final distinct over contaminated ids, which is bounded by
    the contamination rate, not the corpus size.

    hash_grams=True joins on xxhash64(gram) instead of the string — smaller
    broadcast table and cheaper equality at the same result (64-bit
    collisions only ever ADD a contaminated id, at ~1e-9 odds per pair).
    """
    key = (lambda c: F.xxhash64(c)) if hash_grams else (lambda c: c)
    bench = (_doc_grams(benchmark, text_col, None, n)
             .select(key(F.col("_g")).alias("_g")).distinct())
    probe = _doc_grams(docs, text_col, id_col, n) \
        .select(id_col, key(F.col("_g")).alias("_g"))
    return (probe.join(F.broadcast(bench), "_g", "left_semi")
            .select(id_col).distinct())


def contamination_score(docs: DataFrame, benchmark: DataFrame,
                        text_col: str = "text", id_col: str = "doc_id",
                        n: int = 8, hash_grams: bool = True) -> DataFrame:
    """Continuous contamination scoring: for every doc, the fraction of its
    DISTINCT word n-grams that appear in the benchmark set — the graded
    variant of :func:`contaminated_ids` (PaLM reports this overlap fraction
    before choosing a drop threshold; a doc quoting one benchmark line
    scores low, a verbatim copy scores ~1.0).

    Returns (id, n_grams, n_contaminated, contamination) for ALL docs —
    docs shorter than n tokens have n_grams = 0 and contamination = 0.0.

    Shape for 100 TB: identical to contaminated_ids — benchmark grams
    broadcast, corpus grams generated map-side; the only corpus-keyed
    exchange is the per-doc count aggregation (partial-agg, uniform key).
    """
    key = (lambda c: F.xxhash64(c)) if hash_grams else (lambda c: c)
    bench = (_doc_grams(benchmark, text_col, None, n)
             .select(key(F.col("_g")).alias("_g")).distinct()
             .withColumn("_hit", F.lit(1)))
    # explode_outer keeps gram-less (short) docs as a null row; the key
    # transform must preserve that null (xxhash64(NULL) is the seed, not
    # NULL) so count("_g") and the join both ignore it
    probe = (_doc_grams(docs, text_col, id_col, n, outer=True)
             .select(id_col,
                     F.when(F.col("_g").isNotNull(),
                            key(F.col("_g"))).alias("_g")))
    return (probe.join(F.broadcast(bench), "_g", "left")
            .groupBy(id_col)
            .agg(F.count("_g").cast("bigint").alias("n_grams"),
                 F.coalesce(F.sum("_hit"), F.lit(0)).cast("bigint")
                 .alias("n_contaminated"))
            .withColumn("contamination",
                        F.when(F.col("n_grams") > 0,
                               F.round(F.col("n_contaminated")
                                       / F.col("n_grams"), 6))
                        .otherwise(F.lit(0.0))))


def decontaminate(docs: DataFrame, benchmark: DataFrame,
                  text_col: str = "text", id_col: str = "doc_id",
                  n: int = 8, mark_only: bool = False) -> DataFrame:
    """Drop (or flag, with mark_only=True) benchmark-contaminated documents.

    mark_only adds a boolean `contaminated` column instead of filtering —
    the audit-friendly variant (count before you delete).
    """
    bad = contaminated_ids(docs, benchmark, text_col, id_col, n)
    if mark_only:
        flagged = bad.withColumn("contaminated", F.lit(True))
        return (docs.join(flagged, on=id_col, how="left")
                .withColumn("contaminated",
                            F.coalesce("contaminated", F.lit(False))))
    return docs.join(bad, on=id_col, how="left_anti")


# PII rules: RE2-safe (no lookarounds/backrefs) so the exact same rule set
# runs under Java regex (Spark) and RE2 (DuckDB/Go tooling) with identical
# results. Order matters: emails first (their local part would otherwise be
# chewed up by digit rules), SSN before the phone rule's 3-3-4 shape.
PII_RULES: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    (r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
    (r"\b\d(?:[ -]?\d){12,15}\b", "<CARD>"),
]


def scrub_pii(df: DataFrame, text_col: str = "text",
              out_col: str | None = None,
              rules: list[tuple[str, str]] = PII_RULES) -> DataFrame:
    """Replace PII spans with typed placeholder tokens.

    Pure chained `regexp_replace` — map-only, whole-stage codegen, no Python.
    At 100 TB this runs at scan speed; there is no cheaper shape.
    """
    c: Column = F.col(text_col)
    for pat, token in rules:
        c = F.regexp_replace(c, pat, token)
    return df.withColumn(out_col or text_col, c)


def normalize_text(df: DataFrame, text_col: str = "text",
                   out_col: str | None = None) -> DataFrame:
    """Canonicalize whitespace + case (the normalization dedup assumes).

    lower -> collapse all whitespace runs to single spaces -> trim. Map-only.
    """
    c = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    return df.withColumn(out_col or text_col, c)


def chunk_documents(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", max_tokens: int = 128,
                    overlap: int = 16) -> DataFrame:
    """Split documents into overlapping token-window chunks (the standard
    pretraining/RAG chunking step): chunk k starts at token k*(max_tokens-
    overlap)+1 and spans up to max_tokens tokens. A start position opens a
    new chunk only if it contributes tokens beyond the previous chunk's
    overlap (s == 1 or s + overlap <= n), so short tails are not emitted
    twice. Empty documents produce no chunks.

    Map-only (tokens -> filtered start sequence -> posexplode); at scale
    this is a scan-speed projection, no shuffle.

    Output: (id, chunk_idx 0-based, n_chunk_tokens, chunk_text).
    """
    if overlap >= max_tokens:
        raise ValueError("overlap must be smaller than max_tokens")
    step = max_tokens - overlap
    c = F.col(text_col)
    toks = F.filter(F.split(F.trim(c), r"\s+"), lambda t: F.length(t) > 0)
    staged = df.select(F.col(id_col), toks.alias("_toks")) \
               .withColumn("_n", F.size("_toks")).filter(F.col("_n") > 0)
    starts = F.filter(
        F.sequence(F.lit(1), F.col("_n"), F.lit(step)),
        lambda s: (s == 1) | ((s + overlap) <= F.col("_n")))
    chunk = staged.select(
        id_col, "_n",
        F.posexplode(F.transform(
            starts, lambda s: F.slice("_toks", s, max_tokens)))
        .alias("chunk_idx", "_ctoks"))
    return chunk.select(
        id_col, F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.size("_ctoks").cast("int").alias("n_chunk_tokens"),
        F.concat_ws(" ", "_ctoks").alias("chunk_text"))


def pack_sequences(df: DataFrame, token_budget: int = 2048,
                   id_col: str = "doc_id", text_col: str = "text",
                   tokens_col: str | None = None) -> DataFrame:
    """Sequence packing for pretraining batches: documents are concatenated
    in id order into one token stream that is cut every `token_budget`
    tokens; each document is labeled with the sequence (bin) where it
    STARTS and its offset inside it — exactly the "concat and chunk"
    packing LLM training uses (documents may straddle cut points).

    The global ordered cumulative sum is computed as a DISTRIBUTED prefix
    sum, never a single-partition window: range-repartition by id (ranges
    are disjoint and ordered, so (partition, id) is the global order),
    per-partition exclusive cumsum via a partition-local window, and the
    per-partition totals — one tiny row each — prefix-summed and broadcast
    back as offsets. Scales to any corpus; the only single-partition step
    touches #partitions rows.

    Output: (id, n_tokens, seq_id, start_offset).
    """
    from pyspark.sql import Window
    if tokens_col is None:
        toks = F.filter(F.split(F.trim(F.col(text_col)), r"\s+"),
                        lambda t: F.length(t) > 0)
        base = df.select(F.col(id_col), F.size(toks).alias("n_tokens"))
    else:
        base = df.select(F.col(id_col),
                         F.col(tokens_col).cast("long").alias("n_tokens"))
    part = base.repartitionByRange(id_col) \
               .withColumn("_pid", F.spark_partition_id())
    totals = part.groupBy("_pid").agg(F.sum("n_tokens").alias("_ptotal"))
    w_off = Window.orderBy("_pid") \
                  .rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.withColumn(
        "_poff", F.coalesce(F.sum("_ptotal").over(w_off), F.lit(0)))
    w_local = Window.partitionBy("_pid").orderBy(id_col) \
                    .rowsBetween(Window.unboundedPreceding, -1)
    excl = (F.coalesce(F.sum("n_tokens").over(w_local), F.lit(0))
            + F.col("_poff"))
    return (part.join(F.broadcast(offsets.select("_pid", "_poff")), "_pid")
            .withColumn("_excl", excl)
            .select(id_col, F.col("n_tokens").cast("int").alias("n_tokens"),
                    F.floor(F.col("_excl") / token_budget).cast("bigint")
                     .alias("seq_id"),
                    F.pmod(F.col("_excl"), F.lit(token_budget))
                     .cast("bigint").alias("start_offset")))


def curate(docs: DataFrame, benchmark: DataFrame | None = None, *,
           text_col: str = "text", id_col: str = "doc_id",
           scrub: bool = True, normalize: bool = True,
           min_quality: float | None = None,
           dedup: str | None = "exact",
           sample_fraction: float | None = None,
           strata: tuple[str, dict] | None = None,
           seed: int = 42, **dedup_kw) -> DataFrame:
    """End-to-end curation pipeline: decontaminate -> scrub PII ->
    normalize -> quality filter -> dedup -> deterministic sample, in the
    order a production corpus build runs them (cheap map-only filters
    first, the dedup shuffle over the already-shrunk survivor set last).

    The whole pipeline composes into ONE DataFrame plan: Catalyst fuses the
    map-only stages into a single scan projection, so the corpus is read
    once regardless of how many steps are enabled. dedup: "exact",
    "minhash" (one-hop), "minhash_cc" (transitive), or None; strata:
    (column, {value: fraction}) overrides sample_fraction.
    """
    out = docs
    if benchmark is not None:
        out = decontaminate(out, benchmark, text_col, id_col)
    if scrub:
        out = scrub_pii(out, text_col)
    if normalize:
        out = normalize_text(out, text_col)
    if min_quality is not None:
        from .textstats import with_quality_score
        out = with_quality_score(out, text_col) \
            .filter(F.col("quality_score") >= min_quality)
    if dedup == "exact":
        from .dedup import exact_dedup
        out = exact_dedup(out, text_col, id_col, normalize=not normalize) \
            .drop("content_hash", "dup_count")
    elif dedup in ("minhash", "minhash_cc"):
        from .dedup import minhash_lsh_dedup
        out = minhash_lsh_dedup(
            out, text_col, id_col,
            method="cc" if dedup == "minhash_cc" else "one_hop", **dedup_kw)
    elif dedup is not None:
        raise ValueError(f"unknown dedup {dedup!r}")
    if strata is not None:
        out = stratified_sample(out, strata[0], strata[1], id_col, seed)
    elif sample_fraction is not None:
        out = deterministic_sample(out, sample_fraction, id_col, seed)
    return out


def _sample_bucket(id_col: str, seed: int, buckets: int) -> Column:
    """Deterministic, ENGINE-PORTABLE bucket in [0, buckets).

    Knuth multiplicative hash in plain 64-bit arithmetic: every SQL engine
    reproduces it exactly (unlike xxhash64, which only Spark exposes), so a
    sample drawn here can be re-derived by any downstream system. The id is
    first reduced mod a prime so the multiply cannot overflow ANSI bigint
    (Spark 4 runs ANSI mode: silent wraparound is an error, not mixing).
    """
    h = (F.pmod(F.col(id_col).cast("long"), F.lit(1_000_000_007))
         * F.lit(2654435761) + F.lit(seed))
    return F.pmod(h, F.lit(buckets))


def deterministic_sample(df: DataFrame, fraction: float,
                         id_col: str = "doc_id", seed: int = 42,
                         buckets: int = 1_000_000) -> DataFrame:
    """Reproducible fraction-sample by id hash (NOT rand()).

    bucket(id) < fraction*buckets keeps the same rows on every run, every
    retry, and every engine — the property `rand()` sampling loses under
    task retries. Map-only filter, pushed to the scan.
    """
    keep = int(round(fraction * buckets))
    return df.filter(_sample_bucket(id_col, seed, buckets) < keep)


def split_dataset(df: DataFrame, weights: dict[str, float],
                  id_col: str = "doc_id", seed: int = 42,
                  buckets: int = 1_000_000) -> DataFrame:
    """Deterministic train/validation/test splitting: adds a `split` column
    assigning each row to one of `weights`' keys with the given
    proportions, by the engine-portable id bucket hash — reproducible
    across runs, retries and engines (`randomSplit` is none of those), and
    a row can never land in two splits. The hash is independent of every
    other column, so the proportions also hold within any stratum
    (per-language splits need no extra machinery).

    Map-only: one projection, no shuffle, no sampling pass.
    """
    total = float(sum(weights.values()))
    if total <= 0:
        raise ValueError("split_dataset: weights must sum > 0")
    bucket = _sample_bucket(id_col, seed, buckets)
    expr, acc = None, 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name] / total
        cond = bucket < int(round(acc * buckets))
        expr = F.when(cond, F.lit(name)) if expr is None \
            else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn("split", expr)


def percentile_filter(df: DataFrame, keep_frac: float, score_col: str,
                      group_col: str | None = None, id_col: str = "doc_id",
                      exact: bool = True,
                      approx_error: float = 0.001) -> DataFrame:
    """Keep the top `keep_frac` of rows by `score_col` (per group if given).

    Quality-threshold selection ("keep the best 30% per language") without a
    hand-tuned absolute cutoff. Two shapes:

    - exact=True: row_number over (group, score desc, id) vs the group count
      — one window shuffle keyed by the group. Deterministic (id tiebreak),
      oracle-replayable. Right for bounded groups; at 100 TB a single group
      is a single sort partition range, which Spark's range-partitioned
      window handles, but the whole corpus shuffles once.
    - exact=False: per-group `percentile_approx` threshold (tiny agg result)
      broadcast back, then a map-only `score >= threshold` filter — the
      corpus itself never shuffles, the only wide op is a partial-agg
      sketch merge. The kept fraction is approximate within the sketch
      error; this is the 100 TB default shape.
    """
    from pyspark.sql import Window as W
    group = [group_col] if group_col else []
    if exact:
        w = W.partitionBy(*group).orderBy(F.col(score_col).desc(),
                                          F.col(id_col))
        cw = W.partitionBy(*group)
        return (df.withColumn("_rn", F.row_number().over(w))
                  .withColumn("_cnt", F.count(F.lit(1)).over(cw))
                  .filter(F.col("_rn") <=
                          F.ceil(F.lit(float(keep_frac)) * F.col("_cnt")))
                  .drop("_rn", "_cnt"))
    agg = (df.groupBy(*group)
             .agg(F.percentile_approx(score_col, 1.0 - keep_frac,
                                      int(1.0 / approx_error))
                  .alias("_thr")))
    if group_col:
        return (df.join(F.broadcast(agg), group_col)
                  .filter(F.col(score_col) >= F.col("_thr")).drop("_thr"))
    return (df.crossJoin(F.broadcast(agg))
              .filter(F.col(score_col) >= F.col("_thr")).drop("_thr"))


def mixture_sample(df: DataFrame, group_col: str,
                   target_shares: dict[str, float], id_col: str = "doc_id",
                   seed: int = 42, buckets: int = 1_000_000) -> DataFrame:
    """Rebalance the corpus to a target group mixture by downsampling.

    Training mixtures are specified as shares ("40% en, 20% de, ..."), not
    per-group fractions; the achievable corpus size is limited by the
    scarcest group: N' = min_g(count_g / share_g), and each group keeps
    fraction share_g * N' / count_g (exactly 1.0 for the binding group).
    Groups absent from `target_shares` are dropped.

    Shape for 100 TB: one partial-agg count per group (tiny result), driver
    computes the keep fractions, and the corpus is filtered map-only with
    the same engine-portable bucket hash as deterministic_sample — the big
    side never shuffles and the sample is reproducible across engines.
    """
    counts = {r[0]: r[1] for r in
              df.filter(F.col(group_col).isin(*target_shares.keys()))
                .groupBy(group_col).count().collect()}
    nprime = min(counts[g] / s for g, s in target_shares.items()
                 if g in counts and s > 0)
    fractions = {g: min(1.0, s * nprime / counts[g])
                 for g, s in target_shares.items() if g in counts}
    return stratified_sample(df, group_col, fractions, id_col=id_col,
                             seed=seed, buckets=buckets)


def decontaminate_spans(docs: DataFrame, benchmark: DataFrame,
                        text_col: str = "text", id_col: str = "doc_id",
                        n: int = 4, window: int = 20,
                        hash_grams: bool = True) -> DataFrame:
    """Span-level decontamination (the GPT-3/PaLM appendix recipe): instead
    of dropping every document that overlaps the eval set, cut only the
    contaminated SPANS and keep the rest. Documents split into fixed
    non-overlapping `window`-token segments (the segment_dedup window
    segmentation); a segment is removed when it shares at least one word
    n-gram with the benchmark. Grams are matched within a segment, so an
    overlap straddling a segment boundary keeps both halves — the standard
    windowed approximation. Output: (id, text_clean, n_segments,
    n_removed); fully-contaminated docs come back with empty text_clean.

    Shape for 100 TB: segment explode and gram explode are map-only; the
    probe is a BROADCAST left-semi join against the distinct-ed benchmark
    grams (the corpus never shuffles to match); the only corpus-keyed
    exchange is the per-doc reassembly groupBy. hash_grams probes on
    xxhash64(gram) — collisions only ever remove an extra span.
    """
    # token and segment arrays materialize in their own projections so the
    # interpreted slice lambda references cheap attributes (the reinlining
    # pathology — see _gram_occurrences)
    toks = F.col("_toks")
    nseg = F.ceil(F.size(toks) / F.lit(window)).cast("int")
    segd = (docs.filter(F.length(F.trim(F.col(text_col))) > 0)
            .select(F.col(id_col).alias("id"),
                    F.split(F.trim(F.col(text_col)), r"\s+").alias("_toks"))
            .select("id", F.transform(
                F.sequence(F.lit(0), nseg - 1),
                lambda i: F.concat_ws(" ", F.slice(
                    toks, i * window + 1, window))).alias("_segs")))
    ex = segd.select("id", F.posexplode("_segs").alias("seg_idx", "seg"))
    key = (lambda c: F.xxhash64(c)) if hash_grams else (lambda c: c)
    bench = (_doc_grams(benchmark, text_col, None, n)
             .select(key(F.col("_g")).alias("_g")).distinct())
    seg_grams = (ex.select("id", "seg_idx",
                           F.split(F.trim(F.lower(F.col("seg"))), r"\s+")
                           .alias("_stoks"))
                 .select("id", "seg_idx",
                         F.explode(_word_grams(F.col("_stoks"), n,
                                               pre_tokenized=True))
                         .alias("_gs"))
                 .select("id", "seg_idx", key(F.col("_gs")).alias("_g")))
    bad = (seg_grams.join(F.broadcast(bench), "_g", "left_semi")
           .select("id", "seg_idx").distinct())
    kept = ex.join(bad, ["id", "seg_idx"], "left_anti")
    totals = segd.select("id",
                         F.size("_segs").cast("bigint").alias("n_segments"))
    return (totals
            .join(kept.groupBy("id").agg(
                F.count(F.lit(1)).cast("bigint").alias("n_kept"),
                F.concat_ws(" ", F.transform(
                    F.array_sort(F.collect_list(F.struct("seg_idx", "seg"))),
                    lambda s: s.seg)).alias("text_clean")), "id", "left")
            .select(F.col("id").alias(id_col),
                    F.coalesce("text_clean", F.lit("")).alias("text_clean"),
                    "n_segments",
                    (F.col("n_segments")
                     - F.coalesce("n_kept", F.lit(0).cast("bigint")))
                    .cast("bigint").alias("n_removed")))


def quota_cap(df: DataFrame, group_col: str, cap: int,
              score_col: str | None = None,
              id_col: str = "doc_id") -> DataFrame:
    """Cap the rows kept per group at ``cap`` (per-domain quotas — the
    web-corpus rule "no single domain may contribute more than N docs").
    Keeps the top-``cap`` rows per group by (score desc, id asc), or the
    lowest ids when ``score_col`` is None — deterministic, replayable.

    Shape for 100 TB: a tiny per-group count agg finds the OVER-quota groups
    first. Rows of under-quota groups — the overwhelming majority of a
    web corpus, since quota violations live in the skewed head — pass
    through a broadcast anti-join (map-only, never shuffled); only the
    over-quota slice pays the row_number window shuffle. A naive global
    window would shuffle the whole corpus by domain AND sort every document
    of the biggest domain in one partition.
    """
    if cap < 1:
        raise ValueError(f"quota_cap: cap must be >= 1, got {cap}")
    order = ([F.col(score_col).desc()] if score_col else []) \
        + [F.col(id_col).asc()]
    over = (df.groupBy(group_col).agg(F.count(F.lit(1)).alias("_gn"))
              .filter(F.col("_gn") > cap).select(group_col))
    under_rows = df.join(F.broadcast(over), group_col, "left_anti")
    from pyspark.sql import Window as W
    w = W.partitionBy(group_col).orderBy(*order)
    capped = (df.join(F.broadcast(over), group_col, "left_semi")
                .withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") <= cap).drop("_rn"))
    return under_rows.unionByName(capped)


def stratified_sample(df: DataFrame, strata_col: str,
                      fractions: dict[str, float], id_col: str = "doc_id",
                      seed: int = 42, buckets: int = 1_000_000) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. per-language quotas).

    The per-stratum fraction is resolved via a small CASE expression (strata
    counts are tiny: languages, sources) — still map-only, no shuffle, unlike
    `sampleBy` which is also map-side but non-reproducible across retries.
    Strata absent from `fractions` are dropped (fraction 0).
    """
    frac = F.lit(0.0)
    for k, v in fractions.items():
        frac = F.when(F.col(strata_col) == k, F.lit(float(v))).otherwise(frac)
    bucket = _sample_bucket(id_col, seed, buckets)
    return (df.withColumn("_frac", frac)
              .filter(bucket < F.round(F.col("_frac") * buckets))
              .drop("_frac"))


# ------------------------------------------------- DSIR importance sampling
def _gram_occurrences(df: DataFrame, text_col: str, id_col: str,
                      orders: tuple[int, ...]) -> DataFrame:
    """(id, gram) rows WITH multiplicity (unlike _word_grams' distinct set):
    DSIR's feature vector is the hashed n-gram COUNT vector. Map-only.

    The token array MUST be materialized in its own projection before the
    gram lambdas reference it: higher-order functions are interpreted (no
    codegen), so an inline split() child is re-run PER SEQUENCE ELEMENT —
    the regex then costs O(tokens) per doc instead of O(1) (measured 17s ->
    1.6s on the sf0.1 DSIR bench step; the same pathology class as the
    minhash generator-inlining fix in dedup._min_hash_sig). CollapseProject
    keeps the materialization because the non-cheap split has multiple
    consumer references."""
    from .dedup import _spread_cpu_heavy
    df = _spread_cpu_heavy(df, id_col)
    base = (df.filter(F.length(F.trim(F.col(text_col))) > 0)
              .select(F.col(id_col).alias("_id"),
                      F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
                      .alias("_toks")))
    toks = F.col("_toks")

    # NB: the lambda must take exactly ONE arg — F.transform calls a two-arg
    # lambda with (element, index), so a `n=n` default would be silently
    # rebound to the array index
    def gram_at(n):
        return lambda i: F.concat_ws(" ", F.slice(toks, i, n))

    arrays = []
    for n in orders:
        m = F.size(toks) - (n - 1)
        arrays.append(F.when(m >= 1, F.transform(
            F.sequence(F.lit(1), m), gram_at(n)))
            .otherwise(F.array().cast("array<string>")))
    grams = arrays[0] if len(arrays) == 1 else F.concat(*arrays)
    return base.select("_id", F.explode(grams).alias("_g"))


def dsir_logweights(raw: DataFrame, target: DataFrame,
                    text_col: str = "text", id_col: str = "doc_id",
                    orders: tuple[int, ...] = (1, 2),
                    num_buckets: int = 4096, alpha: float = 1.0,
                    seed: int = 42,
                    hash_fn: str = "xxhash64") -> DataFrame:
    """DSIR importance log-weights (Xie et al., NeurIPS'23 "Data Selection
    for Language Models via Importance Resampling"): score every `raw` doc
    by how much its hashed n-gram distribution looks like `target`'s.

        logw(d) = sum over gram occurrences g in d of
                  ln p_target(bucket(g)) - ln p_raw(bucket(g))

    with add-`alpha` smoothed bucket unigram models over `num_buckets`
    hashed features (the paper's hashed n-gram variant, orders 1+2).
    Returns every `raw` id with `dsir_logw` (docs with empty text weigh 0).

    Shape for 100 TB: gram explode is map-only; both bucket-count aggs
    collapse to <= num_buckets rows via partial aggregation (the corpus
    shuffles only `num_buckets` partial rows per task, not its grams); the
    log-ratio table is `num_buckets` rows, BROADCAST to a map-side join;
    the only corpus-keyed exchange is the per-doc partial-agg sum. The two
    driver collects are 1-row totals. hash_fn="portable_md5" makes every
    stage replayable by any SQL engine (the correctness-gate convention).
    """
    from .dedup import _seeded_hash
    h = _seeded_hash(hash_fn)
    bucket = lambda c: F.pmod(h(seed, c), F.lit(num_buckets))  # noqa: E731
    B = float(num_buckets)

    def counts(df_):
        g = _gram_occurrences(df_, text_col, id_col, orders)
        return g.select(bucket(F.col("_g")).alias("_b")) \
                .groupBy("_b").agg(F.count(F.lit(1)).alias("_c"))

    tc, rc = counts(target).persist(), counts(raw).persist()
    t_tot = (tc.agg(F.sum("_c")).collect()[0][0] or 0) + alpha * B
    r_tot = (rc.agg(F.sum("_c")).collect()[0][0] or 0) + alpha * B
    # the log-ratio table is model-sized (<= num_buckets rows): collect it
    # to a literal DataFrame so the bucket caches release immediately and a
    # caller consuming the result twice (dsir_sample: threshold + filter)
    # re-runs only the map-only raw-gram scan, never the model build
    lam_rows = (tc.join(rc, "_b", "full_outer")
                .select("_b",
                        (F.log((F.coalesce(tc["_c"], F.lit(0)) + alpha)
                               / F.lit(t_tot))
                         - F.log((F.coalesce(rc["_c"], F.lit(0)) + alpha)
                                 / F.lit(r_tot))).alias("_lam"))).collect()
    tc.unpersist()
    rc.unpersist()
    lam = raw.sparkSession.createDataFrame(lam_rows, "_b long, _lam double")
    scored = (_gram_occurrences(raw, text_col, id_col, orders)
              .select("_id", bucket(F.col("_g")).alias("_b"))
              .join(F.broadcast(lam), "_b")
              .groupBy("_id").agg(F.sum("_lam").alias("dsir_logw")))
    ids = raw.select(F.col(id_col).alias("_id")).distinct()
    return (ids.join(scored, "_id", "left")
               .select(F.col("_id").alias(id_col),
                       F.coalesce("dsir_logw", F.lit(0.0)).alias("dsir_logw")))


def dsir_sample(raw: DataFrame, target: DataFrame, fraction: float,
                text_col: str = "text", id_col: str = "doc_id",
                approx_error: float = 0.001, **kw) -> DataFrame:
    """Select ~`fraction` of `raw` with the highest DSIR importance weights.

    The production shape: the logw threshold comes from a percentile_approx
    sketch (tiny agg, broadcast scalar), then a map-only filter — the corpus
    never shuffles to rank. For the paper's Gumbel-resampling flavor, add
    deterministic noise to dsir_logw upstream; top-fraction selection is the
    deterministic variant used by most production recipes.

    The per-doc weight table `w` is persisted (MEMORY_AND_DISK) between the
    threshold pass and the selection semi-join: both consume the full `w`,
    and without the cache the second consumer re-runs the corpus gram
    explode + broadcast score join end to end (the third full corpus scan
    of this operator — measured 16% of its wall). `w` is narrow (id +
    double, ~tens of bytes/doc), so at 100 TB the cache is ~GBs per billion
    docs and spills gracefully; like the basket-set persist in profile.py
    it lives until the session drops it (the returned plan references it).
    """
    from pyspark.storagelevel import StorageLevel
    w = dsir_logweights(raw, target, text_col=text_col, id_col=id_col, **kw) \
        .persist(StorageLevel.MEMORY_AND_DISK)
    # materializes w into the cache; the semi-join below reuses it
    thr = w.agg(F.percentile_approx(
        "dsir_logw", 1.0 - fraction, int(1.0 / approx_error))).collect()[0][0]
    return raw.join(w.filter(F.col("dsir_logw") >= thr).select(id_col),
                    id_col, "left_semi")


# ------------------------------------------------ CCNet perplexity buckets
def perplexity_buckets(df: DataFrame, score_col: str,
                       group_col: str | None = None,
                       head_frac: float = 1 / 3, middle_frac: float = 1 / 3,
                       id_col: str = "doc_id",
                       ascending: bool = True) -> DataFrame:
    """CCNet-style head/middle/tail bucketing (Wenzek et al., LREC'20): rank
    rows per group by LM score (ascending=True: LOW perplexity ranks first,
    the CCNet convention) and label the first `head_frac` "head", the next
    `middle_frac` "middle", the rest "tail". Deterministic (id tiebreak).

    Shape for 100 TB: ONE window shuffle keyed by the group (language) —
    the same shape as exact percentile_filter; groups are languages, so the
    per-group range-sort parallelizes across partition ranges. For a
    shuffle-free approximation, derive thresholds via percentile_approx and
    a broadcast CASE instead (the percentile_filter exact=False shape)."""
    from pyspark.sql import Window as W
    group = [group_col] if group_col else []
    order = F.col(score_col).asc() if ascending else F.col(score_col).desc()
    w = W.partitionBy(*group).orderBy(order, F.col(id_col))
    cw = W.partitionBy(*group)
    rn, cnt = F.row_number().over(w), F.count(F.lit(1)).over(cw)
    return (df.withColumn("ppl_bucket", F.when(
        rn <= F.ceil(F.lit(float(head_frac)) * cnt), F.lit("head")).when(
        rn <= F.ceil(F.lit(float(head_frac + middle_frac)) * cnt),
        F.lit("middle")).otherwise(F.lit("tail"))))


# --------------------------------------------------- URL curation (RefinedWeb)
def curate_urls(df: DataFrame, url_col: str = "url", id_col: str = "doc_id",
                blocklist: list[str] | DataFrame | None = None,
                dedup: bool = True) -> DataFrame:
    """RefinedWeb-style URL curation (Penedo et al.'23 §3.1): normalize the
    URL, extract the registered domain, drop blocklisted domains, and keep
    one row per normalized URL (lowest id wins — first-crawled).

    Normalization: lowercase, strip scheme / leading www. / query string /
    fragment / trailing slashes / host port (url_norm = portless host +
    path, so http://x.com:80/a and https://x.com/a dedup together).
    Registered domain = last two host labels (the no-PSL approximation;
    pass a DataFrame blocklist with exact hosts where that matters). Adds
    `url_norm` + `domain`. Every regex avoids replacement backrefs, so the
    identical RE2 pipeline replays on any engine (the oracle convention).

    Shape for 100 TB: normalization is pure regexp column expressions
    (map-only, codegen). A list blocklist compiles to a literal isin filter;
    a DataFrame blocklist is a BROADCAST anti-join on domain — the corpus
    never shuffles to be filtered. URL dedup is one shuffle keyed by
    url_norm (first-occurrence-wins window), the same shape as exact_dedup.
    """
    u = F.lower(F.trim(F.col(url_col)))
    u = F.regexp_replace(u, r"^[a-z][a-z0-9+.-]*://", "")
    u = F.regexp_replace(u, r"^www\.", "")
    u = F.regexp_replace(u, r"[?#].*$", "")
    u = F.regexp_replace(u, r"/+$", "")
    host = F.regexp_replace(F.regexp_extract(u, r"^([^/]+)", 1),
                            r":[0-9]+$", "")
    path = F.regexp_replace(u, r"^[^/]*", "")
    out = (df.withColumn("url_norm", F.concat(host, path))
             .withColumn("domain", F.regexp_extract(
                 host, r"([^.]+\.[^.]+)$", 1)))
    if isinstance(blocklist, DataFrame):
        bcol = blocklist.columns[0]
        out = out.join(
            F.broadcast(blocklist.select(F.col(bcol).alias("domain"))),
            "domain", "left_anti")
    elif blocklist:
        out = out.filter(~F.col("domain").isin([b.lower() for b in blocklist]))
    if dedup:
        from pyspark.sql import Window as W
        w = W.partitionBy("url_norm").orderBy(F.col(id_col))
        out = (out.withColumn("_rn", F.row_number().over(w))
                  .filter(F.col("_rn") == 1).drop("_rn"))
    return out


def weighted_sample(df: DataFrame, k: int, weight_col: str,
                    id_col: str = "doc_id", seed: int = 42,
                    buckets: int = 1_000_000) -> DataFrame:
    """Efraimidis-Spirakis weighted sampling WITHOUT replacement (A-ES,
    IPL'06): each row gets key = ln(u)/w with u derived DETERMINISTICALLY
    from the engine-portable id bucket hash (never rand()); the k largest
    keys are the sample. Inclusion probability is proportional to `weight_col`
    (w must be > 0; rows with w <= 0 or NULL are excluded).

    Shape for 100 TB: the key is a map-only expression and top-k compiles
    to TakeOrderedAndProject — per-partition heaps + a k-row driver merge,
    no global sort, no shuffle. Deterministic, retry-stable, and replayable
    by any engine (the portable-hash convention)."""
    u = (_sample_bucket(id_col, seed, buckets) + F.lit(0.5)) / F.lit(float(buckets))
    key = F.log(u) / F.col(weight_col)
    return (df.filter(F.col(weight_col) > 0)
              .withColumn("_k", key)
              .orderBy(F.col("_k").desc(), F.col(id_col)).limit(k)
              .drop("_k"))


def temperature_sample(df: DataFrame, group_col: str, tau: float = 0.7,
                       id_col: str = "doc_id", seed: int = 42,
                       buckets: int = 1_000_000) -> DataFrame:
    """Temperature-based group rebalancing (the XLM-R / mT5 multilingual
    recipe, Conneau'20 §3.1): target share of group g is
    p_g ∝ (count_g / N)^tau — tau < 1 flattens the distribution so
    low-resource groups are upsampled RELATIVELY (here: head groups are
    downsampled to the flattened shares; no duplication). tau=1 keeps the
    natural mixture, tau=0 equalizes all groups.

    Implemented as the tiny count agg + mixture_sample's scarcest-group
    feasibility rule, so the corpus filter stays map-only + deterministic
    (engine-portable hash, replayable by the oracle)."""
    if not 0.0 <= tau <= 1.0:
        raise ValueError(f"temperature_sample: tau must be in [0,1], got {tau}")
    counts = {r[0]: r[1] for r in df.groupBy(group_col).count().collect()
              if r[0] is not None}
    if not counts:
        return df
    total = float(sum(counts.values()))
    raised = {g: (c / total) ** tau for g, c in counts.items()}
    z = sum(raised.values())
    return mixture_sample(df, group_col,
                          {g: v / z for g, v in raised.items()},
                          id_col=id_col, seed=seed, buckets=buckets)


def shard_plan(df: DataFrame, n_shards: int, id_col: str = "doc_id",
               text_col: str | None = None, seed: int = 42) -> DataFrame:
    """Deterministic training-export sharding: assign every row a
    `shard_id` and a within-shard `shard_pos` so N writer tasks (or a
    downstream loader) materialize identically-ordered shards on every
    retry and on every engine — the reproducible global shuffle a training
    run needs (randomSplit/rand() ordering is none of that).

    shard_id = engine-portable id hash mod n_shards; shard_pos orders the
    shard by (hash, id), i.e. a pseudorandom but deterministic training
    order. With `text_col` set, adds per-row `n_tokens` (whitespace) so the
    plan doubles as token accounting per shard.

    Shape for 100 TB: ONE exchange on shard_id with an in-partition sort —
    exactly the repartition(n)+sortWithinPartitions a shard writer performs
    anyway, so the plan adds nothing over the write itself. Hash sharding
    is uniform, so per-shard volume = corpus/n_shards: pick n_shards so a
    shard is a few GB (1000-executor clusters want >= tens of thousands of
    shards, which also kills the window-partition skew concern).
    """
    from pyspark.sql import Window
    if n_shards < 1:
        raise ValueError("shard_plan: n_shards must be >= 1")
    bucket = _sample_bucket(id_col, seed, 1 << 31)
    out = (df.withColumn("_b", bucket)
           .withColumn("shard_id",
                       F.pmod(F.col("_b"), F.lit(n_shards)).cast("int")))
    w = Window.partitionBy("shard_id").orderBy(F.col("_b").asc(),
                                               F.col(id_col).asc())
    out = (out.withColumn("shard_pos",
                          (F.row_number().over(w) - 1).cast("bigint"))
           .drop("_b"))
    if text_col is not None:
        out = out.withColumn(
            "n_tokens",
            F.size(F.split(F.trim(F.col(text_col)), r"\s+")).cast("bigint"))
    return out


def segment_filter(df: DataFrame, window: int = 20, sep: str | None = None,
                   min_tokens: int = 3, max_digit_frac: float = 0.5,
                   max_punct_frac: float = 0.3,
                   dedup_within_doc: bool = True,
                   text_col: str = "text", id_col: str = "doc_id",
                   joiner: str | None = None) -> DataFrame:
    """RefinedWeb §3.1.3-style line-wise corrections, segment-granular:
    drop low-quality segments (too few tokens, digit- or punctuation-
    dominated, within-doc repeats) and reassemble the survivors — removing
    boilerplate/navigation junk WITHOUT dropping whole documents.

    Segments split on `sep` (real line/paragraph filtering) or, for
    corpora without structure, fixed `window`-token spans. A segment
    survives if: token count >= min_tokens, digit-char fraction <=
    max_digit_frac, punctuation fraction <= max_punct_frac, and (with
    dedup_within_doc) it is the FIRST occurrence of its content inside the
    document (array_position == own index; corpus-wide dedup is
    segment_dedup's job). Rules are RE2-safe so any engine replays them.

    Returns (id, text_filtered, n_segments, n_kept).

    Shape for 100 TB: entirely MAP-ONLY — segments, rules and reassembly
    are array HOFs per row; the plan has NO exchange at all (cheapest
    possible curation step; runs at scan speed).
    """
    toks_of = lambda s: F.split(F.trim(s), r"\s+")           # noqa: E731
    digit_frac = lambda s: (F.length(F.regexp_replace(s, r"[^0-9]", ""))
                            / F.greatest(F.length(s), F.lit(1)))  # noqa: E731
    punct_frac = lambda s: (F.length(F.regexp_replace(
        s, r"[^!-/:-@\[-`{-~]", "")) / F.greatest(F.length(s),
                                                  F.lit(1)))  # noqa: E731
    nonempty = df.filter(F.length(F.trim(F.col(text_col))) > 0)
    if sep is not None:
        segd = nonempty.select(
            F.col(id_col),
            F.filter(F.split(F.col(text_col), sep),
                     lambda s: F.length(F.trim(s)) > 0).alias("_segs"))
    else:
        tokd = nonempty.select(F.col(id_col),
                               F.split(F.trim(F.col(text_col)), r"\s+")
                               .alias("_toks"))
        t = F.col("_toks")
        nseg = F.ceil(F.size(t) / F.lit(window)).cast("int")
        segd = tokd.select(F.col(id_col), F.transform(
            F.sequence(F.lit(0), nseg - 1),
            lambda i: F.concat_ws(" ", F.slice(
                t, i * window + 1, window))).alias("_segs"))

    def ok(s):
        cond = ((F.size(toks_of(s)) >= min_tokens)
                & (digit_frac(s) <= max_digit_frac)
                & (punct_frac(s) <= max_punct_frac))
        return cond

    segs = F.col("_segs")
    if dedup_within_doc:
        # keep index i only if _segs[i] first occurs at i (1-based search)
        kept = F.filter(
            F.transform(segs, lambda s, i: F.struct(
                s.alias("s"), (F.array_position(segs, s) == i + 1)
                .alias("first"))),
            lambda x: x.first & ok(x.s))
        kept = F.transform(kept, lambda x: x.s)
    else:
        kept = F.filter(segs, ok)
    out_joiner = joiner if joiner is not None \
        else (" " if sep is None else "\n\n")
    return segd.select(
        F.col(id_col),
        F.concat_ws(out_joiner, kept).alias("text_filtered"),
        F.size("_segs").cast("bigint").alias("n_segments"),
        F.size(kept).cast("bigint").alias("n_kept"))


def mixture_plan(df: DataFrame, group_col: str,
                 weights: dict[str, float], target_tokens: int,
                 text_col: str = "text") -> DataFrame:
    """Training-mixture token budgeting (the planning half of mixture
    sampling, DoReMi/Pile-style): given per-group target weights and a
    total token budget, report for each group its available tokens, the
    tokens the budget assigns it, and the EPOCHS over its data that
    implies (epochs > 1 = the group repeats; the scarcity signal mixture
    design iterates on).

    Returns (group, available_tokens, share, assigned_tokens, epochs) for
    EVERY group in `weights` — a weighted group with no rows surfaces with
    available_tokens = 0 and NULL epochs (infinite repetition: the loudest
    scarcity signal, not a silently dropped row). The budget math uses the
    EXACT share; the reported `share` column is rounded for display only.
    One partially-aggregated shuffle on the group key; token counting is a
    map-side projection.
    """
    total = float(sum(weights.values()))
    if total <= 0:
        raise ValueError("mixture_plan: weights must sum > 0")
    n_tok = F.size(F.split(F.trim(F.col(text_col)), r"\s+")).cast("bigint")
    avail = (df.filter(F.col(group_col).isin(*weights))
             .select(F.col(group_col).alias("group"), n_tok.alias("_n"))
             .groupBy("group")
             .agg(F.sum("_n").alias("available_tokens")))
    wdf = df.sparkSession.createDataFrame(
        [(k, v / total) for k, v in weights.items()],
        "group string, _share double")
    return (wdf.join(avail, "group", "left")
            .withColumn("available_tokens",
                        F.coalesce("available_tokens", F.lit(0))
                        .cast("bigint"))
            .withColumn("assigned_tokens",
                        F.floor(F.col("_share")
                                * F.lit(float(target_tokens)))
                        .cast("bigint"))
            .withColumn("epochs",
                        F.when(F.col("available_tokens") > 0,
                               F.round(F.col("assigned_tokens")
                                       / F.col("available_tokens"), 6)))
            .select("group", "available_tokens",
                    F.round("_share", 6).alias("share"),
                    "assigned_tokens", "epochs"))

def boilerplate_filter(df: DataFrame, min_docs: int = 2, window: int = 20,
                       sep: str | None = None, text_col: str = "text",
                       id_col: str = "doc_id",
                       joiner: str | None = None) -> DataFrame:
    """CCNet/Dolma-style boilerplate removal: drop EVERY occurrence of any
    segment that appears in >= `min_docs` DISTINCT documents, then
    reassemble the survivors. The complement of `segment_dedup` (dedup.py):
    dedup keeps one copy of repeated content; this removes repeated content
    entirely — the right semantics for navigation bars, cookie banners and
    license headers, where the repeated segment is junk in ALL its hosts.

    Segments split on `sep` (real line/paragraph filtering) or fixed
    `window`-token spans for corpora without structure. Returns EVERY
    input document, exactly once: a document made entirely of boilerplate
    comes back with empty text and n_kept = 0, and a document with no
    segments at all (empty/whitespace/NULL text, or sep-mode text whose
    segments all trim empty) comes back with n_segments = 0, n_kept = 0
    and empty text — callers re-joining on the id never lose rows.

    Shape for 100 TB: segment explode (map-only) -> ONE shuffle counting
    distinct host docs per segment hash (partial agg; 128-bit md5 keys are
    uniform, no skew) -> the frequent-segment set is Zipf-SMALL (content
    repeated across >= min_docs docs is by definition the head of the
    distribution), so it BROADCASTS into a left-anti probe -> ONE shuffle
    on id to reassemble. The corpus itself shuffles once.
    """
    if min_docs < 2:
        raise ValueError("boilerplate_filter: min_docs must be >= 2 "
                         "(1 would drop every segment)")
    # segment ALL docs (empty/NULL text -> empty segment array) so the
    # output keeps one row per input document; the guards below stop
    # split("") from minting a phantom [""] token
    if sep is not None:
        segs_expr = F.filter(F.split(F.coalesce(F.col(text_col),
                                                F.lit("")), sep),
                             lambda s: F.length(F.trim(s)) > 0)
        segd = df.select(F.col(id_col).alias("id"),
                         segs_expr.alias("_segs"))
    else:
        toks_expr = F.when(
            F.length(F.trim(F.col(text_col))) > 0,
            F.split(F.trim(F.col(text_col)), r"\s+")) \
            .otherwise(F.array().cast("array<string>"))
        tokd = df.select(F.col(id_col).alias("id"),
                         toks_expr.alias("_toks"))
        toks = F.col("_toks")
        nseg = F.ceil(F.size(toks) / F.lit(window)).cast("int")
        segd = tokd.select("id", F.when(nseg > 0, F.transform(
            F.sequence(F.lit(0), nseg - 1),
            lambda i: F.concat_ws(" ", F.slice(
                toks, i * window + 1, window))))
            .otherwise(F.array().cast("array<string>")).alias("_segs"))
    # one materialization of the tokenize+segment pass: segd feeds the
    # frequency count, the anti-join probe AND the per-doc totals — without
    # the persist Spark re-scans and re-splits the corpus three times
    # (same fix as dedup.py's per-doc gram index)
    segd = segd.persist()
    ex = (segd.select("id", F.posexplode("_segs").alias("seg_idx", "seg"))
          .withColumn("_h", F.md5(F.col("seg").cast("binary"))))
    boiler = (ex.groupBy("_h")
              .agg(F.count_distinct("id").alias("_nd"))
              .filter(F.col("_nd") >= min_docs)
              .select("_h"))
    kept = ex.join(F.broadcast(boiler), "_h", "left_anti")
    if joiner is None:
        joiner = " " if sep is None else "\n\n"
    totals = segd.select(
        "id", F.size("_segs").cast("bigint").alias("n_segments"))
    return (totals
            .join(kept.groupBy("id").agg(
                F.count(F.lit(1)).cast("bigint").alias("n_kept"),
                F.concat_ws(joiner, F.transform(
                    F.array_sort(F.collect_list(F.struct("seg_idx", "seg"))),
                    lambda s: s.seg)).alias("text_filtered")), "id", "left")
            .select(F.col("id").alias(id_col),
                    F.coalesce("text_filtered", F.lit(""))
                    .alias("text_filtered"),
                    "n_segments",
                    F.coalesce("n_kept", F.lit(0).cast("bigint"))
                    .alias("n_kept")))
