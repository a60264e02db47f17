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


def rfm_segments(df: DataFrame, n_tiles: int = 5,
                 user_col: str = "user_id", ts_col: str = "ts",
                 value_col: str = "value") -> DataFrame:
    """RFM (recency / frequency / monetary) user segmentation: per-user
    days-since-last-event (vs the corpus max date), event count, and exact
    decimal value sum, each cut into `n_tiles` equal-population tiles
    (tile 1 = best: most recent / most frequent / highest value).

    Returns (user, recency_days, frequency, monetary, r_tile, f_tile,
    m_tile, segment) with segment = concatenated tile digits ("111" =
    champions). Monetary sums as DECIMAL(18,2) so the fold is
    order-insensitive; ntile ordering ties break on the user id, keeping
    every tile assignment total and deterministic.

    Shape for 100 TB: ONE partial-aggregated shuffle of events down to the
    per-user table, a broadcast of the 1-row corpus max date, then ntile
    windows over the AGGREGATE (orders of magnitude smaller than events).
    The global ntile sort is the one scale liability — beyond ~10^9 users
    swap the exact tiles for percentile_approx boundaries broadcast back
    (percentile_filter's approx shape); at that point tile edges are
    sketch-approximate, which segmentation tolerates.
    """
    if n_tiles < 1:
        raise ValueError("rfm_segments: n_tiles must be >= 1")
    per_user = (df.groupBy(F.col(user_col).alias("user"))
                .agg(F.max(F.to_date(ts_col)).alias("_last"),
                     F.count(F.lit(1)).cast("bigint").alias("frequency"),
                     F.sum(F.col(value_col).cast("decimal(18,2)"))
                     .alias("_mon")))
    ref = df.agg(F.max(F.to_date(ts_col)).alias("_ref"))
    base = (per_user.crossJoin(F.broadcast(ref))
            .select("user",
                    F.datediff("_ref", "_last").cast("bigint")
                    .alias("recency_days"),
                    "frequency",
                    F.col("_mon").cast("double").alias("monetary")))
    r_w = Window.orderBy(F.col("recency_days"), F.col("user"))
    f_w = Window.orderBy(F.col("frequency").desc(), F.col("user"))
    m_w = Window.orderBy(F.col("monetary").desc(), F.col("user"))
    return (base
            .withColumn("r_tile", F.ntile(n_tiles).over(r_w))
            .withColumn("f_tile", F.ntile(n_tiles).over(f_w))
            .withColumn("m_tile", F.ntile(n_tiles).over(m_w))
            .withColumn("segment", F.concat_ws("", "r_tile", "f_tile",
                                               "m_tile")))


def count_anomalies(df: DataFrame, z: float = 3.0, min_days: int = 3,
                    user_col: str = "user_id",
                    ts_col: str = "ts") -> DataFrame:
    """Per-user daily-volume anomaly detection: flag (user, day) cells
    whose event count exceeds that user's own mean by more than `z`
    population standard deviations — the bot-burst / incident detector a
    100 TB event pipeline runs before training on behavioral data.

    The test is INTEGER-EXACT: with per-user integer sums S1 = sum(c),
    S2 = sum(c^2) over n days, `c > mean + z*sigma` rearranges to
    (n*c - S1)^2 > z^2 * (n*S2 - S1^2) with c above the mean — no float
    accumulation anywhere, so any engine replays the verdict bit-for-bit.
    The reported zscore is then two IEEE ops on exact integers (one sqrt,
    one divide), rounded for display.

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
                       & (F.col("_dev") * F.col("_dev")
                          > F.lit(float(z * z)) * F.col("_var_n2"))))
    return (flagged
            .withColumn("zscore",
                        F.round(F.col("_dev")
                                / F.sqrt(F.col("_var_n2")), 6))
            .select("user", "day", "c", "n_days", "zscore"))
