"""Hudi table as a Structured Streaming sink (foreachBatch upsert).

Re-expression of HoodieStreamingSink.scala:41-139: one commit per micro-batch
(the fork's checkpoint-commit cadence, HoodieFlinkStreamerWithApollo.java:
70-74), with retry / ignore-failed-batch knobs and optional inline table
services after each batch (the deterministic stand-in for the reference's
async compaction/clustering).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame

from .. import payloads
from ..config import MOR


def _wants_batch_id(fn) -> bool:
    import inspect
    try:
        params = [p for p in inspect.signature(fn).parameters.values()
                  if p.kind in (p.POSITIONAL_ONLY, p.POSITIONAL_OR_KEYWORD)]
    except (TypeError, ValueError):
        return False
    return len(params) >= 2


def stream_write(table, stream_df: DataFrame, checkpoint_dir: str,
                 operation: str = "upsert", cdc_op_col: str | None = None,
                 retry_count: int = 3, retry_interval_sec: float = 1.0,
                 ignore_failed_batch: bool = False,
                 inline_compact: bool = True, inline_clean: bool = False,
                 transform=None, post_commit=None, async_services=None):
    """Build a ``DataStreamWriter`` writing every micro-batch into ``table``.

    Caller starts it:  ``stream_write(...).trigger(availableNow=True).start()``

    - ``operation``: upsert | insert | bulk_insert
    - ``cdc_op_col``: column holding I/U/D ops; D rows become deletes
      (StringToRowDataMapFunction.java:110 RowKind mapping)
    - ``transform``: optional fn(DataFrame) -> DataFrame applied per batch
      (SqlQueryBasedTransformer equivalent hook); a two-argument callable
      receives (DataFrame, batch_id) — quarantine writers key idempotent
      side outputs on the batch id
    - ``inline_compact``: MOR only — run the NUM_COMMITS compaction trigger
      after each batch (CompactFunction.java equivalent, synchronous)
    - ``async_services``: an ``AsyncTableServices`` runner — compaction is
      scheduled inline but EXECUTES on its background worker while later
      micro-batches commit (HoodieStreamingSink.scala:41-139 async
      compaction trigger); pass ``inline_compact=False`` with it
    - ``post_commit``: optional fn(table) run after each committed batch —
      e.g. ``derived.sync_rollup`` to keep a downstream materialized view
      current with the stream
    """

    def last_committed_batch() -> int:
        """Largest batch id this sink already committed to the table
        (HoodieStreamingSink.scala's getLatestBatchId: commit metadata is
        the authority, surviving a lost/rebuilt Spark checkpoint)."""
        last = -1
        for ins in table.timeline.completed_write_instants():
            md = table.timeline.metadata(ins) or {}
            s = (md.get("extra_metadata") or {}).get("streaming") or {}
            if s.get("checkpoint") == checkpoint_dir:
                last = max(last, int(s.get("batch_id", -1)))
        return last

    def handle_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if batch_id <= last_committed_batch():
            # replayed micro-batch (failure between table commit and Spark
            # checkpoint write): already applied, skipping keeps
            # insert/bulk_insert exactly-once instead of duplicating rows
            return
        if transform is None:
            df = batch_df
        elif _wants_batch_id(transform):
            df = transform(batch_df, batch_id)
        else:
            df = transform(batch_df)
        if cdc_op_col and cdc_op_col in df.columns:
            df = payloads.apply_cdc_ops(df, op_col=cdc_op_col)
        attempt, delay = 0, retry_interval_sec
        while True:
            try:
                table.writer.set_extra_metadata(
                    {"streaming": {"batch_id": batch_id,
                                   "checkpoint": checkpoint_dir}})
                getattr(table.writer, operation)(df)
                break
            except Exception:  # noqa: BLE001 — HoodieStreamingSink retry loop
                attempt += 1
                if attempt > retry_count:
                    if ignore_failed_batch:
                        return
                    raise
                time.sleep(delay)
                delay *= 2
        if async_services is not None:
            # compaction triggers only accumulate on MOR deltacommits;
            # async clustering applies to COW streams too
            async_services.maybe_trigger()
        elif inline_compact and table.cfg.table_type == MOR:
            from ..services.compaction import maybe_inline_compact
            maybe_inline_compact(table)
        if inline_clean:
            table.clean()
        if post_commit is not None:
            post_commit(table)

    return (stream_df.writeStream
            .foreachBatch(handle_batch)
            .option("checkpointLocation", checkpoint_dir))
