"""Clustering: rewrite file groups for layout, as a replacecommit.

Re-expression of SparkSizeBasedClusteringPlanStrategy (pick small files) +
SparkSortAndSizeExecutionStrategy
(hudi-client/hudi-spark-client/.../clustering/run/strategy/
SparkSortAndSizeExecutionStrategy.java:45) and the layout-optimization
strategies linear / z-order / hilbert (HoodieClusteringConfig.java:238-243).

Plan: per partition, select file groups under the small-file limit (or ALL
groups when changing layout). Execute: read -> sort by the layout key ->
repartitionByRange -> write new file groups -> replacecommit marks the old
groups dead.

Async-safe like compaction: schedule/run are split (pending replacecommit
plan instant on the timeline), execution is three-phase (timeline
transitions under the table lock, the heavy rewrite outside it, completion
revalidated), and a heartbeat marks the run live. Concurrent UPDATES to a
file group under pending clustering are REJECTED at the writer — the
reference's default hoodie.clustering.updates.strategy
(SparkRejectUpdateStrategy.java / HoodieClusteringUpdateException); inserts
are safe (they pack only into unblocked groups or open new ones).
"""

from __future__ import annotations

import math
import threading

from pyspark.sql import functions as F

from .. import meta
from .. import timeline as tl
from ..util import clear_heartbeat, new_file_id, touch_heartbeat
from ..writer import base_read_schema, read_files


def pending_clustering_groups(timeline) -> set:
    """(partition, file_id) of every file group under a PENDING clustering
    plan (fileGroupsInPendingClustering in the reference's
    HoodieTableFileSystemView)."""
    out: set = set()
    for ins in timeline.pending():
        if ins.action != tl.REPLACECOMMIT:
            continue
        md = timeline.metadata(ins) or {}
        if md.get("operation") == "cluster":
            out.update((g["partition"], g["file_id"])
                       for g in md.get("groups", []))
    return out


def clustering_due(table) -> bool:
    """Async clustering trigger (hoodie.clustering.async.max.commits,
    HoodieClusteringConfig: default 4): true when that many write commits
    landed since the last completed clustering and none is pending."""
    if table.cfg.index_type in ("bucket", "bucket_consistent"):
        return False
    if pending_clustering_groups(table.timeline):
        return False
    n = 0
    for ins in reversed(table.timeline.completed_write_instants()):
        if ins.action == tl.REPLACECOMMIT and \
                (table.timeline.metadata(ins) or {}).get("operation") == "cluster":
            break
        n += 1
    return n >= table.cfg.clustering_async_max_commits


def _check_bucket(cfg) -> None:
    if cfg.index_type in ("bucket", "bucket_consistent"):
        # Bucket addressing IS the file-group id prefix: a sort-clustering
        # rewrite would re-home rows into fresh non-bucket group ids, after
        # which bucket-tagged writes (incl. delete tombstones) silently
        # target empty groups — found by the randomized DAG suite as
        # resurrecting deleted rows. The reference rejects clustering for
        # the bucket index too (consistent hashing resizes through its own
        # split/merge replacecommits — services/bucket_resize.py).
        raise ValueError(
            f"clustering is not supported with index_type={cfg.index_type!r}"
            " (bucket ids address file groups; use resize_buckets for"
            " consistent hashing)")


def schedule_clustering(table, sort_cols: list | None = None,
                        layout: str = "linear",
                        partitions: list | None = None,
                        target_file_bytes: int | None = None,
                        small_files_only: bool | None = None,
                        boundary_mode: str = "minmax") -> dict | None:
    """Write a requested clustering plan instant (replacecommit); returns
    the plan (ClusteringPlanActionExecutor schedule side)."""
    cfg = table.cfg
    _check_bucket(cfg)
    target = target_file_bytes or cfg.target_file_bytes
    if small_files_only is None:
        small_files_only = layout == "linear" and sort_cols is None
    view = table.view()
    already = pending_clustering_groups(table.timeline)
    selected = []
    for g, s in view.live_slices(partitions):
        if s.deltas:       # MOR groups with pending logs: compact first
            continue
        if s.base_file is None:
            continue
        if (g.partition, g.file_id) in already:
            continue       # one pending plan per group at a time
        if small_files_only and s.base_file.bytes >= cfg.small_file_limit_bytes:
            continue
        selected.append((g, s))
    # size-based plan needs at least 2 inputs to be useful; layout rewrite
    # (explicit sort_cols / curve) runs on any non-empty selection
    if not selected or (small_files_only and len(selected) < 2):
        return None
    with table.writer._lock():
        instant = table.timeline.new_instant()
        # Stamp a heartbeat at schedule time: a requested cluster plan
        # REJECTS concurrent updates to its groups, so a plan whose owner
        # died before running it would block writers forever. The healer
        # aborts requested cluster plans once the heartbeat goes stale
        # (hoodie.clustering.rollback.pending.replacecommit semantics);
        # the async runner keeps beating while it executes.
        touch_heartbeat(table.base_path, instant)
        plan = {"operation": "cluster", "layout": layout,
                "boundary_mode": boundary_mode,
                "sort_cols": sort_cols or [],
                "target_file_bytes": target,
                "groups": [{"partition": g.partition, "file_id": g.file_id,
                            "path": s.base_file.path,
                            "bytes": s.base_file.bytes}
                           for g, s in selected]}
        table.timeline.save_requested(instant, tl.REPLACECOMMIT, plan)
    return {"instant": instant, **plan}


def run_clustering(table, sort_cols: list | None = None,
                   layout: str = "linear",
                   partitions: list | None = None,
                   target_file_bytes: int | None = None,
                   small_files_only: bool | None = None,
                   boundary_mode: str = "minmax",
                   plan: dict | None = None,
                   on_rewrite_start=None) -> str | None:
    cfg = table.cfg
    _check_bucket(cfg)
    from .. import metrics as _metrics
    _started = _metrics.now()
    if plan is None:
        pending = [i for i in table.timeline.pending()
                   if i.action == tl.REPLACECOMMIT
                   and i.state == tl.REQUESTED
                   and (table.timeline.metadata(i) or {})
                   .get("operation") == "cluster"]
        if pending:
            ins = pending[0]
            plan = {"instant": ins.time, **table.timeline.metadata(ins)}
        else:
            plan = schedule_clustering(
                table, sort_cols, layout, partitions, target_file_bytes,
                small_files_only, boundary_mode)
    if plan is None:
        return None
    instant = plan["instant"]
    layout = plan.get("layout", layout)
    boundary_mode = plan.get("boundary_mode", boundary_mode)
    sort_cols = plan.get("sort_cols") or None
    target = plan.get("target_file_bytes") or cfg.target_file_bytes
    selected = {(g["partition"], g["file_id"]) for g in plan["groups"]}
    lock = table.writer._lock()
    # three-phase execution (same shape as run_compaction): the rewrite job
    # runs WITHOUT the lock; concurrent updates to the selected groups are
    # rejected at the writer (SparkRejectUpdateStrategy), so the inputs
    # cannot drift
    with lock:
        touch_heartbeat(table.base_path, instant)
        table.timeline.save_inflight(instant, tl.REPLACECOMMIT, plan)
        view = table.view()
        paths, total_bytes, base_instants = [], 0, {}
        for g, s in view.live_slices():
            if (g.partition, g.file_id) not in selected:
                continue
            paths.append(view.abs(s.base_file.path))
            total_bytes += s.base_file.bytes
            base_instants[(g.partition, g.file_id)] = s.base_file.instant
        if set(base_instants) != selected:
            # a replace (delete_partition / insert_overwrite / restore)
            # landed between schedule and run and superseded part of the
            # plan: abort it rather than rewrite a stale subset
            table.writer._abort_staged(instant)
            clear_heartbeat(table.base_path, instant)
            return None
    hb_stop = threading.Event()

    def _beat():
        while not hb_stop.wait(15.0):
            touch_heartbeat(table.base_path, instant)

    hb = threading.Thread(target=_beat, daemon=True)
    hb.start()
    try:
        nfiles = max(1, math.ceil(total_bytes / target))
        df = read_files(table.spark, paths, base_read_schema(cfg), cfg)
        from ..reader import bootstrap_instant, fill_bootstrap_meta
        bs = bootstrap_instant(table.timeline)
        if bs:
            # adopted bootstrap bases are meta-less; the rewrite must stamp
            # real keys/partitions or every later tag scan sees null keys
            df = fill_bootstrap_meta(table.spark, df, cfg, view, bs)

        if layout in ("zorder", "hilbert") and sort_cols:
            # boundary_mode sample = range-boundary sampling for skewed
            # columns (orderDataFrameBySamplingValues); minmax = direct
            # value mapping (orderDataFrameByMappingValues)
            from .layout import with_curve_key
            df = with_curve_key(df, sort_cols, strategy=layout,
                                boundary_mode=boundary_mode)
            range_cols, file_sort = ["__curve_key"], ["__curve_key"]
        elif sort_cols:
            range_cols, file_sort = list(sort_cols), list(sort_cols)
        else:
            range_cols, file_sort = [meta.RECORD_KEY], [meta.RECORD_KEY]

        if on_rewrite_start is not None:
            on_rewrite_start()    # observability/test seam: unlocked phase
        prefix = new_file_id()[:16]
        ranged = (df.repartitionByRange(nfiles, meta.PARTITION_PATH,
                                        *[F.col(c) for c in range_cols])
                    .withColumn(meta.TARGET_FILE_ID,
                                F.format_string("%s%08d", F.lit(prefix),
                                                F.spark_partition_id())))
        transient = ["__curve_key"] if "__curve_key" in ranged.columns else None
        stats = table.writer.stage_write(ranged, instant, "base",
                                         sort_cols=file_sort,
                                         already_partitioned=True,
                                         drop_after_sort=transient)
        with lock:
            # revalidate: every selected group must still be live with the
            # SAME base slice we read — update rejection makes drift
            # impossible in-process, but a rogue writer without it (or a
            # replace/restore) must abort the stale rewrite, not lose rows
            now = {(g.partition, g.file_id): s.base_file.instant
                   for g, s in table.view().live_slices()
                   if s.base_file is not None}
            if any(now.get(k) != v for k, v in base_instants.items()):
                table.writer._abort_staged(instant)
                return None
            replaced: dict = {}
            for p, fid in sorted(selected):
                replaced.setdefault(p, []).append(fid)
            md = table.writer._commit_md("cluster", stats, replaced,
                                         consume_extra=False)
            md["layout"] = layout
            _metrics.fold(md, "cluster", _started)
            table.timeline.save_completed(instant, tl.REPLACECOMMIT, md)
            table.writer._maybe_index_blooms(instant, md)
            table.writer._remove_marker(instant)
            _metrics.report(table.cfg, table.base_path, instant,
                            tl.REPLACECOMMIT, md)
    finally:
        hb_stop.set()
        hb.join()
        clear_heartbeat(table.base_path, instant)
    return instant
