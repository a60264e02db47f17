"""MOR compaction: merge base + delta files into new base file slices.

Re-expression of HoodieCompactor
(hudi-client/hudi-client-common/.../compact/HoodieCompactor.java:78,102,263)
with the schedule/run split kept (requested plan instant on the timeline) and
the LogFileSizeBased / UnBounded plan strategies
(hudi-client/hudi-client-common/.../compact/strategy/).

Execution is ONE Spark job for the whole plan: base ∪ deltas of every selected
file group -> window payload resolution -> staged write keyed by the group's
stable fileId — the per-file-group parallelism Hudi gets from its RDD
partitioner falls out of the repartition by (partition, fileId).
"""

from __future__ import annotations

import threading

from pyspark.sql import functions as F

from .. import meta, payloads
from .. import timeline as tl
from ..writer import base_read_schema, delta_read_schema, read_files


def schedule_compaction(table, strategy: str = "log_file_size",
                        max_groups: int | None = None,
                        target_io_bytes: int | None = None,
                        target_partitions: int = 10,
                        reference_date: str | None = None) -> dict | None:
    """Write a requested compaction plan instant; returns the plan.

    Strategies (hudi-client/hudi-client-common/.../compact/strategy/):
      log_file_size — biggest delta backlog first
                      (LogFileSizeBasedCompactionStrategy)
      day_based     — newest `target_partitions` partitions only
                      (DayBasedCompactionStrategy: partition paths are
                      day-formatted, so reverse-lexicographic = newest first)
      bounded_io    — greedy under an IO budget: read base + read logs +
                      rewrite base per group (BoundedIOCompactionStrategy,
                      hoodie.compaction.target.io)
      bounded_partition_aware — every partition within `target_partitions`
                      days of `reference_date` (default: the table's newest
                      partition, so tests are deterministic; the reference
                      uses the wall clock). Unlike day_based this keeps ALL
                      partitions past the cutoff, not a fixed count
                      (BoundedPartitionAwareCompactionStrategy.java:58-66:
                      earliestPartitionPathToCompact = currentDay - N days,
                      then a >= comparison on the day-formatted path).
      unbounded     — everything with deltas (UnBoundedCompactionStrategy)
    """
    view = table.view()
    cands = [(g, s) for g, s in view.live_slices() if s.deltas]
    if not cands:
        return None
    if strategy == "log_file_size":        # LogFileSizeBasedCompactionStrategy
        cands.sort(key=lambda gs: gs[1].delta_bytes, reverse=True)
    elif strategy == "day_based":          # DayBasedCompactionStrategy
        newest = sorted({g.partition for g, _s in cands},
                        reverse=True)[:target_partitions]
        cands = [(g, s) for g, s in cands if g.partition in newest]
        cands.sort(key=lambda gs: (gs[0].partition, gs[0].file_id),
                   reverse=True)
    elif strategy == "bounded_io":         # BoundedIOCompactionStrategy
        cands.sort(key=lambda gs: gs[1].delta_bytes, reverse=True)
        budget = target_io_bytes if target_io_bytes is not None \
            else 500 * 1024 * 1024         # reference default 500GB scaled down
        picked, spent = [], 0
        for g, s in cands:
            base_bytes = s.base_file.bytes if s.base_file else 0
            io = base_bytes * 2 + s.delta_bytes   # read base + logs, write base
            if picked and spent + io > budget:
                break
            picked.append((g, s))
            spent += io
        cands = picked
    elif strategy == "bounded_partition_aware":
        # BoundedPartitionAwareCompactionStrategy: keep every partition whose
        # day is within target_partitions days of the reference day (all of
        # them, not a fixed count — a table with gaps compacts fewer).
        from datetime import datetime, timedelta

        def _day(p: str):
            # yyyy[-MM[-dd]] paths: pad month/day so a 6-digit "199811"
            # (yyyy-MM partition) can't mis-parse as 1998-01-01 via
            # strptime's greedy backtracking
            digits = "".join(ch for ch in p if ch.isdigit())
            if len(digits) >= 8:
                s = digits[:8]
            elif len(digits) >= 6:
                s = digits[:6] + "01"
            elif len(digits) >= 4:
                s = digits[:4] + "0101"
            else:
                return None
            try:
                return datetime.strptime(s, "%Y%m%d")
            except ValueError:
                return None
        ref = _day(reference_date) if reference_date else \
            max((d for d in (_day(g.partition) for g, _s in cands) if d),
                default=None)
        if ref is not None:
            cutoff = ref - timedelta(days=target_partitions)
            cands = [(g, s) for g, s in cands
                     if (_day(g.partition) or cutoff) >= cutoff]
        cands.sort(key=lambda gs: (gs[0].partition, gs[0].file_id),
                   reverse=True)
    elif strategy != "unbounded":
        raise ValueError(f"unknown compaction strategy {strategy!r}")
    if max_groups:
        cands = cands[:max_groups]
    instant = table.timeline.new_instant()
    plan = {"operation": "compact", "strategy": strategy,
            "groups": [{"partition": g.partition, "file_id": g.file_id}
                       for g, s in cands]}
    table.timeline.save_requested(instant, tl.COMMIT, plan)
    return {"instant": instant, **plan}


def run_compaction(table, strategy: str = "log_file_size",
                   max_groups: int | None = None,
                   plan: dict | None = None,
                   target_io_bytes: int | None = None,
                   target_partitions: int = 10,
                   reference_date: str | None = None,
                   on_merge_start=None) -> str | None:
    cfg = table.cfg
    spec = payloads.get(cfg.payload)
    if plan is None:
        # run a pending plan if one exists, else schedule inline
        pending = [i for i in table.timeline.pending()
                   if i.action == tl.COMMIT and i.state == tl.REQUESTED
                   and table.timeline.metadata(i).get("operation") == "compact"]
        if pending:
            ins = pending[0]
            plan = {"instant": ins.time, **table.timeline.metadata(ins)}
        else:
            plan = schedule_compaction(table, strategy, max_groups,
                                       target_io_bytes=target_io_bytes,
                                       target_partitions=target_partitions,
                                       reference_date=reference_date)
    if plan is None:
        return None
    from .. import metrics as _metrics
    _started = _metrics.now()
    instant = plan["instant"]
    selected = {(g["partition"], g["file_id"]) for g in plan["groups"]}
    lock = table.writer._lock()
    # Async-safe three-phase execution (the reference's async compaction
    # model, HoodieStreamingSink.scala:41-139 + AsyncCompactService): the
    # timeline transition and file listing take the table lock BRIEFLY, the
    # heavy merge job runs WITHOUT it (micro-batches keep committing), and
    # completion revalidates under the lock.
    from ..util import clear_heartbeat, touch_heartbeat
    with lock:
        touch_heartbeat(table.base_path, instant)
        table.timeline.save_inflight(instant, tl.COMMIT, plan)
        view = table.view()
        base_paths, delta_paths = [], []
        for g, s in view.live_slices():
            if (g.partition, g.file_id) not in selected:
                continue
            if s.base_file is not None:
                base_paths.append(view.abs(s.base_file.path))
            # merge ONLY deltas at-or-before the plan instant: a deltacommit
            # that landed between schedule and run has a LATER instant and
            # must stay attached to the new slice (the timeline fold hangs it
            # on the compacted base), not be baked into a base stamped with
            # the earlier compaction instant — otherwise a time-travel read
            # as-of [compaction, delta) would see future rows. Mirrors Hudi:
            # logs after a requested compaction target the new base instant
            # (HoodieCompactor merges logs <= compactionInstantTime).
            delta_paths.extend(view.abs(d.path) for d in s.deltas
                               if d.instant <= instant)
    # heartbeat refresher covers the whole unlocked phase so the lazy
    # failed-write healer of a concurrent writer sees this instant as LIVE
    hb_stop = threading.Event()

    def _beat():
        while not hb_stop.wait(15.0):
            touch_heartbeat(table.base_path, instant)

    hb = threading.Thread(target=_beat, daemon=True)
    hb.start()
    try:
        base = read_files(table.spark, base_paths, base_read_schema(cfg), cfg)
        from ..reader import bootstrap_instant, fill_bootstrap_meta
        bs = bootstrap_instant(table.timeline)
        if bs:
            # adopted bootstrap bases carry no meta columns; without
            # reconstruction the key-window resolve and the fileId stamp
            # below would silently DROP their rows from the compacted base
            base = fill_bootstrap_meta(table.spark, base, cfg, view, bs)
        delta = read_files(table.spark, delta_paths, delta_read_schema(cfg), cfg)
        merged = payloads.resolve(
            base.unionByName(delta, allowMissingColumns=True),
            cfg, spec, drop_deletes=True)
        # stable fileId: every row's _hoodie_file_name prefix IS its group id
        merged = merged.withColumn(meta.TARGET_FILE_ID,
                                   meta.file_id_from_name())
        if on_merge_start is not None:
            on_merge_start()      # observability/test seam: unlocked phase
        stats = table.writer.stage_write(merged, instant, "base")
        with lock:
            # revalidate: a replacecommit (clustering / insert_overwrite /
            # delete_partition) that landed during the unlocked merge
            # supersedes the plan's groups — completing would resurrect
            # replaced slices
            # (SimpleConcurrentFileWritesConflictResolutionStrategy outcome)
            live_now = {(g.partition, g.file_id)
                        for g, _s in table.view().live_slices()}
            if not selected <= live_now:
                table.writer._abort_staged(instant)
                return None
            replaced = table.writer.emptied_groups(selected, stats)
            md = table.writer._commit_md("compact", stats, replaced,
                                         consume_extra=False)
            md["compacted_groups"] = sorted(f"{p}/{fid}"
                                            for p, fid in selected)
            _metrics.fold(md, "compact", _started)
            table.timeline.save_completed(instant, tl.COMMIT, md)
            table.writer._maybe_index_blooms(instant, md)
            table.writer._remove_marker(instant)
            _metrics.report(cfg, table.base_path, instant, tl.COMMIT, md)
    finally:
        hb_stop.set()
        hb.join()
        clear_heartbeat(table.base_path, instant)
    return instant


def compaction_due(table) -> bool:
    """NUM_COMMITS trigger (fork: compaction.trigger.strategy NUM_OR_TIME,
    HoodieMuiltiTableFlinkStreamer.java initHudiConfig): true when the
    number of deltacommits since the last compaction reaches the config."""
    n = 0
    for ins in reversed(table.timeline.completed_write_instants()):
        if ins.action == tl.DELTACOMMIT:
            n += 1
        else:
            break
    return n >= table.cfg.compaction_max_delta_commits


def maybe_inline_compact(table) -> str | None:
    """Synchronous NUM_COMMITS-triggered compaction (CompactFunction.java
    equivalent)."""
    if compaction_due(table):
        return run_compaction(table)
    return None
