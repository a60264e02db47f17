"""Temporal joins: as-of (point-in-time) join.

Spark has no ASOF JOIN; the classic scalable re-expression is union-and-fill:
tag both sides, union them, and per join-key forward-fill the most recent
right-side payload over a time-ordered window. ONE shuffle on the join key,
no range join, no pairwise explosion — each left row reads the latest right
row at or before its timestamp from the running window state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(left: DataFrame, right: DataFrame, on: list[str] | str,
              left_ts: str = "ts", right_ts: str = "ts",
              direction: str = "backward",
              right_prefix: str = "r_") -> DataFrame:
    """Point-in-time join: every left row gains the right row with the
    LATEST right_ts <= left_ts (direction='backward', inclusive — pandas
    merge_asof / DuckDB ASOF JOIN semantics) or the EARLIEST right_ts >=
    left_ts ('forward') for the same key. Unmatched left rows keep NULL
    right columns. Right payload columns come back prefixed.

    Shape for 100 TB: both sides project (key, ts, payload), union
    (map-only), ONE hash shuffle on the key, per-key time-ordered window
    with last(ignorenulls) running fill — state is one payload per key, no
    buffering of the right side, no range-bucketed self join. Skewed keys
    behave like any single-key window (AQE handles the exchange; a hot key
    serializes its own timeline only).
    """
    keys = [on] if isinstance(on, str) else list(on)
    if direction not in ("backward", "forward"):
        raise ValueError("asof_join: direction must be backward|forward")
    payload = [c for c in right.columns if c not in keys and c != right_ts]
    l = left.withColumn("__ts", F.col(left_ts).cast("timestamp")) \
            .withColumn("__src", F.lit(1))
    # ONE struct of all right payload columns, built only on right rows: the
    # fill picks whole rows, so a matched row's genuinely-NULL payload value
    # propagates as NULL (pandas merge_asof / DuckDB ASOF semantics) instead
    # of an older row's value leaking in, and every filled column comes from
    # the SAME matched right row
    r = right.select(
        *keys,
        F.col(right_ts).cast("timestamp").alias("__ts"),
        F.lit(0).alias("__src"),
        F.struct(
            *[F.col(c).alias(f"{right_prefix}{c}") for c in payload],
            F.col(right_ts).cast("timestamp")
             .alias(f"{right_prefix}{right_ts}")).alias("__rpay"))
    rcols = [f"{right_prefix}{c}" for c in payload] + \
            [f"{right_prefix}{right_ts}"]
    for c in left.columns:
        if c in rcols:
            raise ValueError(f"asof_join: column collision on {c!r}; pick a "
                             "different right_prefix")
    u = l.unionByName(r, allowMissingColumns=True)
    if direction == "backward":
        # right rows sort BEFORE left rows at equal ts => inclusive match
        w = (Window.partitionBy(*keys).orderBy(F.col("__ts").asc(),
                                               F.col("__src").asc())
             .rowsBetween(Window.unboundedPreceding, 0))
    else:
        w = (Window.partitionBy(*keys).orderBy(F.col("__ts").desc(),
                                               F.col("__src").asc())
             .rowsBetween(Window.unboundedPreceding, 0))
    filled = u.withColumn("__f", F.last("__rpay", ignorenulls=True).over(w))
    return (filled.filter(F.col("__src") == 1)
            .select(*left.columns,
                    *[F.col(f"__f.{c}").alias(c) for c in rcols]))


def resample(df: DataFrame, on: list[str] | str, ts: str = "ts",
             step: str = "1 hour", trunc: str = "hour",
             values: list[str] | None = None,
             right_prefix: str = "r_") -> DataFrame:
    """Regularize an irregular time series: per key, build a uniform time
    grid from date_trunc(trunc, min(ts)) to date_trunc(trunc, max(ts)) at
    `step` spacing, and forward-fill the latest observation at or before
    each grid point (gap-fill + last-observation-carried-forward).

    Shape for 100 TB: one partial-agg shuffle for per-key bounds (result is
    O(keys), tiny), a map-only sequence()+explode to mint the grid — the
    spine never materializes driver-side — then the asof_join union+window
    fill: ONE hash shuffle on the key. No range join, no per-point lookup.

    Rows with duplicate (key, ts) should be pre-aggregated by the caller if
    deterministic fill values are required (same contract as DuckDB's ASOF
    JOIN, whose pick among equal timestamps is unspecified).
    """
    keys = [on] if isinstance(on, str) else list(on)
    vals = values if values is not None else \
        [c for c in df.columns if c not in keys and c != ts]
    t = F.col(ts).cast("timestamp")
    bounds = df.groupBy(*keys).agg(
        F.date_trunc(trunc, F.min(t)).alias("__lo"),
        F.date_trunc(trunc, F.max(t)).alias("__hi"))
    spine = bounds.select(
        *keys,
        F.explode(F.sequence(F.col("__lo"), F.col("__hi"),
                             F.expr(f"interval {step}"))).alias(ts))
    right = df.select(*keys, ts, *vals)
    return asof_join(spine, right, keys, left_ts=ts, right_ts=ts,
                     right_prefix=right_prefix)
