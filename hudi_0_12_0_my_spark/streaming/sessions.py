"""Streaming sessionization: the stateful analogue of operators/sessions.py.

`applyInPandasWithState` keeps one state entry per user (current session
start, last-seen ts, event count, value sum) and emits the updated session
row for every touched user each micro-batch; an OPT-IN processing-time
timeout (`idle_flush_seconds`) flushes idle users' final session and drops
their state. This is the custom-stateful-operator
pattern Structured Streaming prescribes when the built-in
`F.session_window` aggregation cannot express the semantics (here: session
ids must match the deterministic batch numbering, and we want running
per-session aggregates, not only closed windows).

Scale shape: state is hash-partitioned by user (one shuffle per batch, the
minimum for stateful-by-key), state size is O(users) not O(events), and the
per-batch work is Arrow-vectorized pandas per partition.

For gap semantics identical to the batch operator use
`session_window`-based `windowed_sessions` below — pure built-in, watermark
-driven, closes sessions exactly at `gap` event-time inactivity.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_OUT_SCHEMA = ("user_id bigint, session_id bigint, n_events bigint, "
               "session_start timestamp, session_end timestamp, "
               "sum_value double")
_STATE_SCHEMA = "session_id bigint, start_us bigint, last_us bigint, n bigint, sv double"


def _session_fn(gap_us: int, idle_flush_ms: int | None):
    def fn(key: Tuple[Any], pdf_iter: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        (user,) = key
        if state.hasTimedOut:
            # idle flush: re-emit the final session row and drop the state
            # (the running-stats emission below already delivered the same
            # values; the flush exists so downstream can treat it as the
            # closing row and the store stays O(active users))
            sid, start, last, n, sv = state.get
            state.remove()
            yield _emit([(user, sid, n, start, last, sv)])
            return
        sid, start, last, n, sv = (state.get if state.exists
                                   else (0, None, None, 0, 0.0))
        rows = []
        ev = pd.concat(list(pdf_iter), ignore_index=True)
        ev = ev.sort_values(["ts", "event_id"])
        for ts, val in zip(ev["ts"], ev["value"]):
            us = int(ts.value // 1000)  # pandas ns -> us
            if last is None or us - last > gap_us:
                if last is not None:
                    rows.append((user, sid, n, start, last, sv))  # close prev
                sid, start, n, sv = sid + 1, us, 0, 0.0
            last = us
            n += 1
            sv += float(val) if val == val else 0.0
        state.update((sid, start, last, n, sv))
        if idle_flush_ms:
            state.setTimeoutDuration(idle_flush_ms)
        # emit the (possibly still-open) current session's running stats too,
        # so downstream sees updates without waiting for the gap to pass
        rows.append((user, sid, n, start, last, sv))
        yield _emit(rows)

    return fn


def _emit(rows) -> pd.DataFrame:
    return pd.DataFrame(rows, columns=["user_id", "session_id", "n_events",
                                       "_start_us", "_end_us", "sum_value"]) \
        .assign(session_start=lambda d: pd.to_datetime(d["_start_us"], unit="us"),
                session_end=lambda d: pd.to_datetime(d["_end_us"], unit="us")) \
        .drop(columns=["_start_us", "_end_us"])


def streaming_sessionize(events: DataFrame, gap_seconds: int = 1800,
                         user_col: str = "user_id",
                         idle_flush_seconds: int | None = None) -> DataFrame:
    """Stateful per-user sessionization over a streaming DataFrame.

    Emits one row per (user, session) per micro-batch with running stats;
    session_id numbering matches operators.sessions.sessionize on the same
    (fully-delivered, in-order-per-batch) data. Use output mode "update".

    ``idle_flush_seconds`` (opt-in) arms a processing-time timeout that
    re-emits an idle user's final session row and DROPS its state (keeps
    the store O(active users) on long-running queries). Leave it None for
    Trigger.AvailableNow batch-drains: an armed processing-time timeout
    keeps the query alive until the timeout fires (measured: a one-row
    drain took >110s with a 60s timeout armed, milliseconds without), and
    the running-stats emission already delivers every session's latest
    values each batch.
    """
    flush_ms = idle_flush_seconds * 1000 if idle_flush_seconds else None
    return events.groupBy(user_col).applyInPandasWithState(
        _session_fn(gap_seconds * 1_000_000, flush_ms),
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=(GroupStateTimeout.ProcessingTimeTimeout if flush_ms
                     else GroupStateTimeout.NoTimeout))


def windowed_sessions(events: DataFrame, gap_seconds: int = 1800,
                      watermark: str = "1 hour",
                      user_col: str = "user_id",
                      ts_col: str = "ts") -> DataFrame:
    """Built-in session-window aggregation (watermark-driven close).

    The pure-Catalyst path: `F.session_window` merges events within
    `gap_seconds` of each other; the watermark bounds state and closes
    sessions once event time passes end+gap. Append output mode.
    """
    gap = f"{gap_seconds} seconds"
    return (events.withWatermark(ts_col, watermark)
            .groupBy(F.session_window(F.col(ts_col), gap).alias("w"),
                     F.col(user_col))
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"),
                 F.sum("value").alias("sum_value"))
            .select(user_col, F.col("w.start").alias("session_start"),
                    F.col("w.end").alias("session_end"), "n_events",
                    "sum_value"))
