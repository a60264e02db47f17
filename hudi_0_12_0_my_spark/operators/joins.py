"""Scale-safe join strategies Spark's optimizer does not plan on its own.

- ``interval_join``: point-in-interval (range) joins. Catalyst plans a pure
  range predicate (``start <= p AND p < end``) as BroadcastNestedLoopJoin or
  a cartesian product — O(|L|·|R|) compares, a non-starter at 100 TB. The
  classic re-expression (Databricks range-join binning, DuckDB IEJoin's
  bucketed cousin) assigns every point to ONE fixed-width bucket, explodes
  each interval over the buckets it covers, equi-joins on the bucket id, and
  re-checks the exact predicate. Each (point, interval) match meets exactly
  once — at the point's own bucket — so no dedup pass is needed.

- ``salted_join``: equi-joins where the key domain is tiny or heavy-tailed
  (event_type, language, domain). A plain shuffle join sends every row of a
  hot key to one reducer; salting fans each key across ``salts`` synthetic
  sub-keys by replicating the SMALL side once per salt (map-only explode)
  and hashing the big side's rows over salts. Result set is identical to the
  plain join — only the exchange layout changes. AQE's skew-join split only
  rescues sort-merge joins after the fact; salting fixes the layout up
  front and also covers aggregate-after-join pipelines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T


def _bucket_expr(col: F.Column, width: float) -> F.Column:
    return F.floor(col.cast("double") / F.lit(float(width))).cast("long")


def interval_join(left: DataFrame, right: DataFrame, *,
                  left_point: str, right_start: str, right_end: str,
                  bucket_width: float, on: list[str] | str | None = None,
                  closed: str = "left",
                  right_prefix: str = "") -> DataFrame:
    """Inner-join left rows to right intervals containing their point.

    ``closed='left'`` matches ``start <= p < end`` (half-open, the default
    for time windows); ``'both'`` matches ``start <= p <= end``. Optional
    ``on`` adds equality keys to the bucket join. Timestamp columns are
    compared as epoch seconds; pick ``bucket_width`` near the typical
    interval length (seconds for timestamps) — shorter widths explode
    intervals into more buckets, longer widths put more false candidates
    into the exact-predicate filter, correctness is unaffected either way.

    Shape for 100 TB: one map-only bucket projection on the left, one
    map-only explode on the right (|interval|/width rows each), ONE hash
    shuffle on (keys, bucket), and a codegen'd exact filter. No nested-loop
    join, no cartesian product, no dedup shuffle.
    """
    if closed not in ("left", "both"):
        raise ValueError("interval_join: closed must be 'left' or 'both'")
    keys = [on] if isinstance(on, str) else list(on or [])
    coll = set(left.columns) & {f"{right_prefix}{c}" for c in right.columns
                                if c not in keys}
    if coll:
        raise ValueError(f"interval_join: column collision on {sorted(coll)}; "
                         "set right_prefix")

    def _num(df, c):
        if isinstance(df.schema[c].dataType, (T.TimestampType,
                                              T.TimestampNTZType, T.DateType)):
            return F.col(c).cast("timestamp").cast("double")
        return F.col(c).cast("double")

    l = left.withColumn("__b", _bucket_expr(_num(left, left_point),
                                            bucket_width))
    pay = [c for c in right.columns if c not in keys]
    r = right.select(
        *keys,
        _num(right, right_start).alias("__s"),
        _num(right, right_end).alias("__e"),
        *[F.col(c).alias(f"{right_prefix}{c}") for c in pay])
    r = r.withColumn(
        "__b", F.explode(F.sequence(
            _bucket_expr(F.col("__s"), bucket_width),
            _bucket_expr(F.col("__e"), bucket_width))))
    p = _num(l, left_point)
    exact = (F.col("__s") <= p) & \
        ((p < F.col("__e")) if closed == "left" else (p <= F.col("__e")))
    return (l.join(r, keys + ["__b"]).filter(exact)
            .drop("__b", "__s", "__e"))


def salted_join(left: DataFrame, right: DataFrame, on: list[str] | str,
                *, salts: int = 16, how: str = "inner") -> DataFrame:
    """Join big ``left`` to small ``right`` on ``on``, spreading each join
    key over ``salts`` sub-partitions. Output rows are exactly the plain
    join's (each left row carries one deterministic salt; the right side is
    replicated across all salts, so every matching pair meets once).

    ``how``: 'inner' or 'left'. The left salt is hashed from the whole row
    (deterministic, plan-independent); any per-row spread works because the
    salt never reaches the result.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join: how must be 'inner' or 'left'")
    if salts < 1:
        raise ValueError("salted_join: salts must be >= 1")
    keys = [on] if isinstance(on, str) else list(on)
    l = left.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]),
                         F.lit(salts)).cast("int"))
    r = right.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0).cast("int"),
                             F.lit(salts - 1).cast("int"))))
    return l.join(r, keys + ["__salt"], how).drop("__salt")
