"""Sessionization: gaps-and-islands over event streams.

Batch shape for 100 TB: ONE shuffle on the session key (user), then two
window passes over the locally-sorted partition (lag to flag gaps, running
sum to number islands) and a partial-aggregated groupBy that reuses the same
partitioning — Catalyst collapses the windows and the final aggregate into a
single exchange, which is the information-theoretic minimum for this
computation (events of one user must meet). Skewed users (bots at 10^8
events) are the one hazard at scale; `max_events_per_user` caps them
deterministically before the window sort.

The streaming analogue (applyInPandasWithState with a session timeout) lives
in streaming/sessions.py; this module is the batch / backfill path and the
oracle-checkable semantics definition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def sessionize(df: DataFrame, user_col: str = "user_id",
               ts_col: str = "ts", id_col: str = "event_id",
               gap_seconds: int = 1800) -> DataFrame:
    """Assign a per-user `session_id` (1-based, in time order) to every event.

    A new session starts when the gap to the previous event of the same user
    exceeds `gap_seconds`. Ordering ties on ts break by `id_col`, keeping the
    numbering total and deterministic.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    # gap arithmetic is offset-invariant, so the NTZ->TIMESTAMP cast (session
    # tz) is safe; unix_micros itself rejects timestamp_ntz input
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    gap = us - F.lag(us).over(w)
    new_sess = F.when(gap.isNull() | (gap > gap_seconds * 1_000_000),
                      F.lit(1)).otherwise(F.lit(0))
    return df.withColumn(
        "session_id",
        F.sum(new_sess).over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("bigint"))


def session_stats(df: DataFrame, user_col: str = "user_id",
                  ts_col: str = "ts", id_col: str = "event_id",
                  gap_seconds: int = 1800,
                  value_col: str | None = None) -> DataFrame:
    """One row per (user, session): event count, start/end, optional value sum.

    The groupBy key extends the window's partition key, so AQE/EnsureRequirements
    reuses the sessionize exchange — one shuffle total for the whole pipeline.
    """
    sess = sessionize(df, user_col, ts_col, id_col, gap_seconds)
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end")]
    if value_col is not None:
        aggs.append(F.sum(F.col(value_col).cast("decimal(18,4)"))
                    .cast("double").alias("sum_value"))
    return sess.groupBy(user_col, "session_id").agg(*aggs)


def funnel_stats(df: DataFrame, steps: list[str],
                 user_col: str = "user_id", type_col: str = "event_type",
                 ts_col: str = "ts", id_col: str = "event_id",
                 max_events_per_type: int = 1000) -> DataFrame:
    """Ordered-funnel analysis: how many users completed step 1, then step 2
    strictly after their earliest step-1 time, and so on.

    Semantics match the standard cascade definition (t_k = the user's
    earliest step-k event with ts > t_{k-1}), but the plan is ONE shuffle:
    events filtered to funnel types, collected per user as a sorted array,
    and the step progression folded per-row with `aggregate` — versus the
    textbook k-way cascade of self-joins, which shuffles the event table k
    times. Ties on ts break by event id in the sort but a next step still
    requires strictly increasing ts (same as the cascade).

    Skew hardening (the top_paths `row_number <= n` treatment): per-user
    aggregation state is capped BEFORE the collect — only each user's
    earliest `max_events_per_type` events OF EACH STEP TYPE enter the
    array, via running per-type counts over the SAME user-keyed sorted
    window the groupBy reuses (one exchange total, no extra shuffle). A
    bot that fires funnel-type events therefore materializes at most
    k*cap structs instead of its whole history. Correctness contract:
    reach is MONOTONE in the event set (dropping candidates can only
    stall the cascade earlier, adding them only helps), so the result is
    exact whenever every (user, step-type) has <= cap events, and a
    deterministic LOWER BOUND (never an overcount) for pathological users
    beyond it — the conservative direction for funnel metrics.

    Output: (step int, event_type, users) — users whose progression reached
    at least that step.
    """
    k = len(steps)
    step_arr = F.array(*[F.lit(s) for s in steps])
    ev = df.filter(F.col(type_col).isin(*steps))
    # earliest-N-per-type cap: running per-type occurrence counts over the
    # user-keyed window; partitioning matches the groupBy below, so Catalyst
    # reuses the exchange and the window sort feeds the collect presorted
    wcap = (Window.partitionBy(user_col).orderBy(ts_col, id_col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    occ = F.lit(None).cast("long")
    for s in set(steps):
        occ = F.when(F.col(type_col) == s,
                     F.sum(F.when(F.col(type_col) == s, 1).otherwise(0))
                     .over(wcap)).otherwise(occ)
    ev = (ev.withColumn("_occ", occ)
          .filter(F.col("_occ") <= max_events_per_type).drop("_occ"))
    arr = ev.groupBy(user_col).agg(F.sort_array(F.collect_list(F.struct(
        F.col(ts_col).alias("ts"), F.col(id_col).alias("eid"),
        F.col(type_col).alias("et")))).alias("evs"))
    acc0 = F.struct(F.lit(0).alias("step"),
                    F.lit(None).cast("timestamp").alias("last"))

    def advance(acc, e):
        hit = (acc["step"] < k) \
            & (e["et"] == F.element_at(step_arr, acc["step"] + 1)) \
            & (acc["last"].isNull() | (e["ts"] > acc["last"]))
        return F.when(hit, F.struct((acc["step"] + 1).alias("step"),
                                    e["ts"].alias("last"))).otherwise(acc)

    reached = arr.select(F.aggregate("evs", acc0, advance)["step"]
                         .alias("reached"))
    return (reached
            .select(F.explode(F.sequence(F.lit(1), F.lit(k))).alias("step"),
                    "reached")
            .filter(F.col("reached") >= F.col("step"))
            .groupBy("step")
            .agg(F.count(F.lit(1)).cast("bigint").alias("users"))
            .withColumn("event_type",
                        F.element_at(step_arr, F.col("step")))
            .select("step", "event_type", "users"))


def cohort_retention(df: DataFrame, user_col: str = "user_id",
                     ts_col: str = "ts", period: str = "week") -> DataFrame:
    """Cohort retention matrix: users grouped by first-activity period, then
    distinct active users per (cohort_period, period_offset).

    (cohort, offset, n_users, retention) with retention = n_users /
    cohort size rounded to 6 — offset 0 is the cohort size itself.

    Shape for 100 TB: first-activity via ONE min-shuffle on user (map-side
    partial min), broadcast-or-shuffle join back on user, then distinct
    (cohort, offset, user) folds into the count-distinct's own aggregation —
    two shuffles total, none keyed on anything skewed (user ids are uniform;
    the matrix itself is tiny).
    """
    if period == "week":
        trunc = lambda c: F.date_trunc("week", c)
        diff = lambda a, b: (F.datediff(F.to_date(a), F.to_date(b)) / 7)
    elif period == "day":
        trunc = lambda c: F.date_trunc("day", c)
        diff = lambda a, b: F.datediff(F.to_date(a), F.to_date(b))
    elif period == "month":
        trunc = lambda c: F.date_trunc("month", c)
        diff = lambda a, b: F.months_between(F.to_date(a), F.to_date(b))
    else:
        raise ValueError("cohort_retention: period must be day|week|month")
    ev = df.select(F.col(user_col).alias("u"),
                   trunc(F.col(ts_col)).alias("_p"))
    first = ev.groupBy("u").agg(F.min("_p").alias("_cohort"))
    joined = (ev.join(first, "u")
              .select("u", F.to_date("_cohort").alias("cohort"),
                      F.floor(diff(F.col("_p"), F.col("_cohort")))
                      .cast("int").alias("period_offset")))
    counts = joined.groupBy("cohort", "period_offset").agg(
        F.count_distinct("u").cast("bigint").alias("n_users"))
    sizes = (counts.filter(F.col("period_offset") == 0)
             .select("cohort", F.col("n_users").alias("_size")))
    return (counts.join(sizes, "cohort")
            .select("cohort", "period_offset", "n_users",
                    F.round(F.col("n_users") / F.col("_size"), 6)
                    .alias("retention")))


def top_paths(df: DataFrame, n_steps: int = 5, k: int = 20,
              user_col: str = "user_id", type_col: str = "event_type",
              ts_col: str = "ts", id_col: str = "event_id",
              sep: str = " > ") -> DataFrame:
    """Top-k user journey paths: each user's first `n_steps` event types in
    time order (ties on ts break by `id_col` — total, deterministic) join
    into a path string; paths rank by frequency (count desc, path asc).

    Returns (path, n_users, path_len). Users with fewer than `n_steps`
    events contribute their full (shorter) path — standard behavior-flow
    semantics, so the counts partition the user base.

    Shape for 100 TB: ONE shuffle on user — the row_number window and the
    groupBy share the user key, so Catalyst reuses the exchange; the
    `rn <= n_steps` filter runs BETWEEN them, capping per-user aggregation
    state at n_steps structs (a 10^8-event bot user sorts in its window
    partition but never materializes more than n_steps rows into the
    collect) — then the path count is a partial-aggregated groupBy on the
    path string and the top-k folds into TakeOrdered, no global sort.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    per_user = (df.select(F.col(user_col).alias("u"),
                          F.struct(F.col(ts_col).alias("t"),
                                   F.col(id_col).alias("i"),
                                   F.col(type_col).alias("e")).alias("s"),
                          F.row_number().over(w).alias("_rn"))
                .filter(F.col("_rn") <= n_steps)
                .groupBy("u")
                .agg(F.array_sort(F.collect_list("s")).alias("head")))
    paths = per_user.select(
        F.concat_ws(sep, F.transform("head", lambda s: s.e)).alias("path"),
        F.size("head").alias("path_len"))
    return (paths.groupBy("path", "path_len")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
            .select("path", "n_users", F.col("path_len").cast("int"))
            .orderBy(F.col("n_users").desc(), F.col("path").asc())
            .limit(k))


def event_transitions(df: DataFrame, user_col: str = "user_id",
                      type_col: str = "event_type", ts_col: str = "ts",
                      id_col: str = "event_id") -> DataFrame:
    """First-order Markov transition matrix over per-user event sequences:
    for every consecutive pair (src -> dst) in a user's time-ordered events
    (ties break by `id_col`), the corpus-wide count and the row-normalized
    transition probability p = n / sum(n over src), rounded to 6.

    Returns (src, dst, n, p). Shape for 100 TB: ONE shuffle on user for the
    lead() window, then a partial-aggregated groupBy on (src, dst) — the
    matrix is |types|^2, so the normalizing per-src sum is a broadcast-sized
    window over the tiny aggregate, not over events.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    pairs = (df.withColumn("_dst", F.lead(type_col).over(w))
             .filter(F.col("_dst").isNotNull())
             .select(F.col(type_col).alias("src"), F.col("_dst").alias("dst")))
    counts = pairs.groupBy("src", "dst").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"))
    tot = Window.partitionBy("src")
    return counts.select(
        "src", "dst", "n",
        F.round(F.col("n") / F.sum("n").over(tot), 6).alias("p"))


def _histogram_tile_edges(base: DataFrame, col: str, lo: float, hi: float,
                          bins: int, qs: list[float]) -> list[float]:
    """Tile boundaries for one metric from the fixed-width histogram sketch
    (the engine-portable quantile member of the sketch trio — see
    operators/sketches.py histogram_quantiles): ONE map-side-combined
    shuffle of <= `bins` integer cells, collected (model-sized) and
    interpolated driver-side.

    The interpolation op ORDER deliberately mirrors the SQL oracle's
    expression tree — width = (hi-lo)/bins, target = q*n,
    est = lo + (bin + (target-cum_before)/cnt) * width — every step a
    single correctly-rounded IEEE double op, so any SQL engine replays the
    boundaries bit-for-bit from the same integer cells.
    """
    from .sketches import histogram_cells
    if not hi > lo:          # degenerate (constant metric): one fat bin
        hi = lo + 1.0
    width = (hi - lo) / bins
    cells = sorted((r["bin"], r["cnt"]) for r in
                   histogram_cells(base, col, lo, hi, bins).collect())
    n = sum(c for _, c in cells)
    edges = []
    for q in qs:
        target = q * float(n)
        cum = 0
        for b, cnt in cells:
            cum += cnt
            if float(cum) >= target:
                edges.append(lo + (float(b) + (target - float(cum - cnt))
                                   / float(cnt)) * width)
                break
    return edges


def rfm_segments(df: DataFrame, n_tiles: int = 5,
                 user_col: str = "user_id", ts_col: str = "ts",
                 value_col: str = "value", mode: str = "auto",
                 approx_bins: int = 4096,
                 exact_max_users: int = 50_000_000) -> DataFrame:
    """RFM (recency / frequency / monetary) user segmentation: per-user
    days-since-last-event (vs the corpus max date), event count, and exact
    decimal value sum, each cut into `n_tiles` equal-population tiles
    (tile 1 = best: most recent / most frequent / highest value).

    Returns (user, recency_days, frequency, monetary, r_tile, f_tile,
    m_tile, segment) with segment = concatenated tile digits ("111" =
    champions). Monetary sums as DECIMAL(18,2) so the fold is
    order-insensitive.

    Two tile engines, selected by `mode`:

    - "exact": ntile windows over the per-user aggregate, ties broken on
      the user id (total, deterministic). The global ntile sort serializes
      all users through ONE task — correct and fine to ~10^7-10^8 users,
      the textbook bottleneck beyond.
    - "approx": tile boundaries from the fixed-width HISTOGRAM sketch
      (ONE map-side-combined shuffle of <= `approx_bins` integer cells per
      metric over the persisted aggregate; boundaries interpolated
      driver-side from the model-sized cells, error <= one bin width),
      then a MAP-ONLY assignment against the literal boundary arrays — no
      global sort anywhere, flat at any user count. Semantics shift:
      users are cut by VALUE boundaries, so ties share a tile instead of
      being split to even populations.
    - "auto" (default): exact when the aggregate has <= `exact_max_users`
      rows (one count on the already-persisted aggregate), else approx.

    Shape for 100 TB: ONE partial-aggregated shuffle of events down to the
    per-user table, a broadcast of the 1-row corpus max date, then either
    tile engine over the AGGREGATE (orders of magnitude smaller than
    events); in approx mode nothing after the per-user aggregate shuffles
    more than `approx_bins` rows.
    """
    if n_tiles < 1:
        raise ValueError("rfm_segments: n_tiles must be >= 1")
    if mode not in ("auto", "exact", "approx"):
        raise ValueError(f"rfm_segments: unknown mode {mode!r} "
                         "(auto | exact | approx)")
    per_user = (df.groupBy(F.col(user_col).alias("user"))
                .agg(F.max(F.to_date(ts_col)).alias("_last"),
                     F.count(F.lit(1)).cast("bigint").alias("frequency"),
                     F.sum(F.col(value_col).cast("decimal(18,2)"))
                     .alias("_mon"))
                .persist())   # feeds both the corpus-max date and the rows
    # corpus max date = max of the per-user maxes: derived from the
    # aggregate, so events scan ONCE for the whole readout
    ref = per_user.agg(F.max("_last").alias("_ref"))
    base = (per_user.crossJoin(F.broadcast(ref))
            .select("user",
                    F.datediff("_ref", "_last").cast("bigint")
                    .alias("recency_days"),
                    "frequency",
                    F.col("_mon").cast("double").alias("monetary")))
    if mode == "auto":
        mode = "exact" if per_user.count() <= exact_max_users else "approx"
    if mode == "exact":
        r_w = Window.orderBy(F.col("recency_days"), F.col("user"))
        f_w = Window.orderBy(F.col("frequency").desc(), F.col("user"))
        m_w = Window.orderBy(F.col("monetary").desc(), F.col("user"))
        return (base
                .withColumn("r_tile", F.ntile(n_tiles).over(r_w))
                .withColumn("f_tile", F.ntile(n_tiles).over(f_w))
                .withColumn("m_tile", F.ntile(n_tiles).over(m_w))
                .withColumn("segment", F.concat_ws("", "r_tile", "f_tile",
                                                   "m_tile")))
    # approx: histogram-sketch boundaries + map-only assignment. base is
    # NOT persisted: it is a cheap projection over the already-persisted
    # per_user aggregate, so the eager bounds/sketch jobs and the returned
    # plan all re-derive it from that one cache — no second cache pinned
    # for the session lifetime
    qs = [k / n_tiles for k in range(1, n_tiles)]
    bounds = base.agg(*[f(c).cast("double").alias(f"{a}_{c}")
                        for c in ("recency_days", "frequency", "monetary")
                        for a, f in (("lo", F.min), ("hi", F.max))]) \
                 .collect()[0]
    def tile(col: str, ascending: bool):
        lo, hi = bounds[f"lo_{col}"], bounds[f"hi_{col}"]
        if lo is None:
            # empty input or all-NULL metric: no boundaries exist, so
            # mirror the assignment formula at above=0 (1 ascending,
            # n_tiles descending) — also what the SQL oracle's correlated
            # count yields with zero edge rows
            return F.lit(1 if ascending else n_tiles).cast("int")
        edges = _histogram_tile_edges(base, col, lo, hi, approx_bins, qs)
        above = F.size(F.filter(
            F.array(*[F.lit(float(e)) for e in edges]),
            lambda b: F.col(col).cast("double") > b))
        t = (F.lit(1) + above) if ascending else (F.lit(n_tiles) - above)
        return t.cast("int")
    return (base
            .withColumn("r_tile", tile("recency_days", True))
            .withColumn("f_tile", tile("frequency", False))
            .withColumn("m_tile", tile("monetary", False))
            .withColumn("segment", F.concat_ws("", "r_tile", "f_tile",
                                               "m_tile")))


def count_anomalies(df: DataFrame, z: float = 3.0, min_days: int = 3,
                    user_col: str = "user_id",
                    ts_col: str = "ts") -> DataFrame:
    """Per-user daily-volume anomaly detection: flag (user, day) cells
    whose event count exceeds that user's own mean by more than `z`
    population standard deviations — the bot-burst / incident detector a
    100 TB event pipeline runs before training on behavioral data.

    The test carries NO float accumulation: with per-user integer sums
    S1 = sum(c), S2 = sum(c^2) over n days, `c > mean + z*sigma`
    rearranges to (n*c - S1)^2 > z^2 * (n*S2 - S1^2) with c above the
    mean. The squared terms are evaluated in DOUBLE (a fixed expression
    tree both engines replay identically) because the cross-multiplied
    products overflow int64 at large per-user volumes, where Spark longs
    would wrap silently; the integer sums themselves need S1^2 and n*S2
    inside int64 — sound to ~3e9 events per user. The reported zscore is
    then two IEEE ops (one sqrt, one divide), rounded for display.

    Returns anomalous (user, day, c, n_days, zscore) rows only. Shape for
    100 TB: ONE shuffle to (user, day) counts (partial agg), then
    user-partitioned windows on the per-user-DAY table (bounded: <= days
    per user rows each) — no global sort, no second data shuffle (the
    window reuses the groupBy partitioning on the user prefix).
    """
    if min_days < 2:
        raise ValueError("count_anomalies: min_days must be >= 2 "
                         "(variance needs at least 2 observations)")
    daily = (df.groupBy(F.col(user_col).alias("user"),
                        F.to_date(ts_col).alias("day"))
             .agg(F.count(F.lit(1)).cast("bigint").alias("c")))
    w = Window.partitionBy("user")
    n = F.count(F.lit(1)).over(w)
    s1 = F.sum("c").over(w)
    s2 = F.sum(F.col("c") * F.col("c")).over(w)
    dev = n * F.col("c") - s1                   # n*(c - mean), integer
    var_n2 = n * s2 - s1 * s1                   # n^2 * variance, integer
    flagged = (daily
               .withColumn("n_days", n.cast("bigint"))
               .withColumn("_dev", dev)
               .withColumn("_var_n2", var_n2)
               .filter((F.col("n_days") >= min_days)
                       & (F.col("_dev") > 0)
                       & (F.col("_var_n2") > 0)
                       & (F.col("_dev").cast("double")
                          * F.col("_dev").cast("double")
                          > F.lit(float(z * z))
                          * F.col("_var_n2").cast("double"))))
    return (flagged
            .withColumn("zscore",
                        F.round(F.col("_dev")
                                / F.sqrt(F.col("_var_n2")), 6))
            .select("user", "day", "c", "n_days", "zscore"))


def ab_test_stats(df: DataFrame, metric_path: str = "$.k",
                  conversion_type: str = "purchase",
                  user_col: str = "user_id", type_col: str = "event_type",
                  props_col: str = "props", variants: int = 2,
                  t_threshold: float = 1.96) -> DataFrame:
    """A/B experiment readout over an event stream with a JSON props
    column: users split into `variants` arms by the engine-portable id
    hash (deterministic, engine-replayable — the same Knuth-multiply hash
    the sampling operators use), the per-event metric extracted from
    `props_col` with a JSON path, and the two-arm comparison scored with a
    pooled two-sample t statistic.

    The significance VERDICT carries no float ACCUMULATION: t^2 > thr^2
    cross-multiplies into products of the integer sums (n, S = sum metric,
    Q = sum metric^2 per arm), evaluated in double with a fixed expression
    tree — deterministic across engines (identical IEEE ops on identical
    integers; beyond 2^53 the products round, identically on both sides).
    Only defined for variants=2 (A/B); the per-arm stats rows generalize
    to A/B/n but the t column needs exactly two arms.

    Returns one row per arm: (variant, n_users, n_events, n_conversions,
    metric_sum, metric_mean, t_stat, significant). Shape for 100 TB:
    metric extraction is map-only; ONE partial-aggregated shuffle down to
    the per-arm triple; the t math runs on a 2-row aggregate.
    """
    if variants != 2:
        raise ValueError("ab_test_stats: t-test requires exactly 2 "
                         "variants")
    uid = F.col(user_col)
    # pmod at BOTH reduction steps (mirrors _sample_bucket in pipeline.py):
    # signed % would map negative user ids (hashed ids are routinely
    # negative) to variant -1 — a third arm silently excluded from the
    # t statistic. pmod keeps every id in [0, variants).
    variant = F.pmod(F.pmod(uid.cast("long"), F.lit(1_000_000_007))
                     * F.lit(2654435761) + F.lit(42), F.lit(variants))
    metric = F.get_json_object(F.col(props_col), metric_path).cast("bigint")
    ev = df.select(variant.alias("variant"), uid.alias("_u"),
                   metric.alias("_m"),
                   (F.col(type_col) == conversion_type).cast("int")
                   .alias("_conv"))
    arms = (ev.groupBy("variant")
            .agg(F.count_distinct("_u").cast("bigint").alias("n_users"),
                 F.count(F.lit(1)).cast("bigint").alias("n_events"),
                 F.sum("_conv").cast("bigint").alias("n_conversions"),
                 # zero-conversion arms: sums over an empty WHEN are NULL,
                 # which would NULL-poison every downstream stat — pin to 0
                 # so ssw = 0 fires the defined zero-variance fallback
                 F.coalesce(F.sum(F.when(F.col("_conv") == 1,
                                         F.col("_m"))), F.lit(0))
                 .cast("bigint").alias("metric_sum"),
                 F.coalesce(F.sum(F.when(F.col("_conv") == 1,
                                         F.col("_m") * F.col("_m"))),
                            F.lit(0))
                 .cast("bigint").alias("_q")))
    # the 2-row arm aggregate feeds three consumers (arm a, arm b, the
    # final per-arm output) — persist it or the event scan runs 3x
    arms = arms.persist()
    a = arms.filter(F.col("variant") == 0).alias("a")
    b = arms.filter(F.col("variant") == 1).alias("b")
    n1, s1, q1 = (F.col("a.n_conversions"), F.col("a.metric_sum"),
                  F.col("a._q"))
    n2, s2, q2 = (F.col("b.n_conversions"), F.col("b.metric_sum"),
                  F.col("b._q"))
    # pooled variance * (n1+n2-2) * n1 * n2, all integer:
    #   ssw = (n1*Q1 - S1^2)/n1 + (n2*Q2 - S2^2)/n2  (within-group SS)
    # keep everything over the common denominator n1*n2 to stay integral:
    ssw_num = (n1 * q1 - s1 * s1) * n2 + (n2 * q2 - s2 * s2) * n1
    dmean_num = s1 * n2 - s2 * n1          # (m1 - m2) * n1 * n2, integer
    dof = n1 + n2 - F.lit(2)
    # t^2 = dmean_num^2 * dof / (ssw_num * (n1 + n2))  -- exact rational.
    # zero within-arm variance (ssw_num = 0) leaves t undefined: NULL t,
    # and the difference is significant iff the means differ at all
    # (guarding also avoids ANSI-mode divide-by-zero, which Spark raises
    # even for doubles)
    t_stat = F.when(
        ssw_num > 0,
        dmean_num.cast("double")
        / F.sqrt(ssw_num.cast("double") * (n1 + n2) / dof))
    thr2 = F.lit(float(t_threshold * t_threshold))
    # doubles, not longs: the cross-multiplied products overflow int64 at
    # modest arm sizes, and Spark longs wrap silently where DuckDB's
    # 128-bit sums would not — double keeps both engines on the same path
    dmean_d = dmean_num.cast("double")
    significant = F.when(ssw_num > 0,
                         dmean_d * dmean_d * dof
                         > thr2 * ssw_num.cast("double") * (n1 + n2)) \
                   .otherwise(dmean_num != 0)
    stats = (a.crossJoin(F.broadcast(b))
             .select(F.round(t_stat, 6).alias("t_stat"),
                     significant.alias("significant")))
    return (arms.crossJoin(F.broadcast(stats))
            .select("variant", "n_users", "n_events", "n_conversions",
                    "metric_sum",
                    F.when(F.col("n_conversions") > 0,
                           F.round(F.col("metric_sum")
                                   / F.col("n_conversions"), 6))
                    .alias("metric_mean"),
                    "t_stat", "significant"))


def stickiness(df: DataFrame, user_col: str = "user_id",
               ts_col: str = "ts") -> DataFrame:
    """DAU/MAU engagement stickiness per calendar month: monthly active
    users, the average daily active users over the month's ACTIVE days,
    and their ratio (1.0 = every monthly user shows up every day).

    stickiness = sum-of-daily-DAU / (n_days * MAU): integer counts and ONE
    IEEE division, so the value replays bit-for-bit in any engine.

    Returns (month, n_days, dau_sum, mau, stickiness). Shape for 100 TB:
    two partial-aggregated distinct-count shuffles (per-day and per-month
    user sets) whose results are month-sized, then a broadcast-sized join
    on month — events never shuffle twice at full width because both
    aggregates reduce map-side.
    """
    month = F.date_format(F.col(ts_col), "yyyy-MM")
    day = F.to_date(F.col(ts_col))
    dau = (df.groupBy(month.alias("month"), day.alias("_d"))
           .agg(F.count_distinct(user_col).alias("_dau")))
    daily = (dau.groupBy("month")
             .agg(F.count(F.lit(1)).cast("bigint").alias("n_days"),
                  F.sum("_dau").cast("bigint").alias("dau_sum")))
    mau = (df.groupBy(month.alias("month"))
           .agg(F.count_distinct(user_col).cast("bigint").alias("mau")))
    return (daily.join(mau, "month")
            .select("month", "n_days", "dau_sum", "mau",
                    F.round(F.col("dau_sum")
                            / (F.col("n_days") * F.col("mau")), 6)
                    .alias("stickiness")))


def forecast_baseline(df: DataFrame, season_days: int = 7,
                      type_col: str = "event_type",
                      ts_col: str = "ts") -> DataFrame:
    """Seasonal-naive forecast backtest: predict each (type, day)'s event
    count with the count from `season_days` earlier and score the
    prediction — the baseline every volume-forecast monitor must beat
    before a model earns its keep, and the drift alarm when error jumps.

    Errors fold from integer counts: |c - c_lag| sums exactly, so MAE is
    one division over two integers. Classic MAPE would sum per-day float
    ratios — an order-dependent float accumulation no engine replays
    bit-for-bit — so the percentage error is reported as WAPE
    (sum|err| / sum(actual)): one division over two integer sums,
    bit-portable. Returns (event_type, n_days, mae, wape) per type.

    Shape for 100 TB: ONE shuffle to (type, day) counts, a self-join on
    the lagged day that reuses the same keying, and a type-sized final
    aggregate.
    """
    if season_days < 1:
        raise ValueError("forecast_baseline: season_days must be >= 1")
    daily = (df.groupBy(F.col(type_col).alias("event_type"),
                        F.to_date(ts_col).alias("_d"))
             .agg(F.count(F.lit(1)).cast("bigint").alias("_c"))
             .persist())   # both sides of the lag self-join
    lag = daily.select(F.col("event_type"),
                       F.date_add("_d", season_days).alias("_d"),
                       F.col("_c").alias("_pred"))
    scored = (daily.join(lag, ["event_type", "_d"])
              .select("event_type",
                      F.abs(F.col("_c") - F.col("_pred")).alias("_ae"),
                      F.col("_c").alias("_actual")))
    return (scored.groupBy("event_type")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_days"),
                 F.round(F.sum("_ae") / F.count(F.lit(1)), 6).alias("mae"),
                 F.round(F.sum("_ae") / F.sum("_actual"), 6).alias("wape")))
