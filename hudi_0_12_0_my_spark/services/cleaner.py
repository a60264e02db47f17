"""Cleaning: delete obsolete file slices past the retention policy.

Re-expression of CleanPlanner
(hudi-client/hudi-client-common/.../clean/CleanPlanner.java:74, 497 LoC) with
policies KEEP_LATEST_COMMITS / KEEP_LATEST_FILE_VERSIONS /
KEEP_LATEST_BY_HOURS (HoodieCleaningPolicy.java:25), plus replaced-file-group
GC (groups invalidated by insert_overwrite / delete_partition / clustering are
fully cleaned once out of retention). Savepointed files are never cleaned
(SavepointActionExecutor contract). Driver-side metadata planning + file
deletes only — no Spark job.
"""

from __future__ import annotations

import os

from .. import timeline as tl
from ..storage import get_storage


def _execute_plan(table, instant: str, md: dict) -> None:
    """Delete the planned files, then complete the clean instant. Idempotent
    (unlink tolerates already-gone files), so a crashed execution replays
    safely (HoodieCleanActionExecutor.runPendingClean)."""
    from .. import metrics as _metrics
    started = _metrics.now()
    for paths in (md.get("removed_files") or {}).values():
        for rel in paths:
            p = table.abs(rel)
            get_storage(p).unlink(p)
    _metrics.fold(md, tl.CLEAN, started)
    table.timeline.save_completed(instant, tl.CLEAN, md)
    _metrics.report(table.cfg, table.base_path, instant, tl.CLEAN, md)


def finish_pending_cleans(table) -> int:
    """Replay crashed clean plans before anything else — plan-then-execute
    means a pending clean's file list is authoritative and its deletes may
    have partially happened."""
    n = 0
    for ins in table.timeline.pending():
        if ins.action == tl.CLEAN:
            _execute_plan(table, ins.time, table.timeline.metadata(ins))
            n += 1
    return n


def run_clean(table, policy: str | None = None, retain: int | None = None) -> dict:
    cfg = table.cfg
    policy = policy or cfg.cleaner_policy
    if cfg.concurrency_mode == "occ":
        # LAZY failed-write cleaning (hoodie.cleaner.policy.failed.writes):
        # multi-writer mode has no single-writer guard to heal crashed
        # writers, so the CLEANER reaps pending write instants whose
        # heartbeat expired — the reference's rollbackFailedWrites hook in
        # CleanActionExecutor. Live writers carry fresh heartbeats (writer.
        # _mint / stage_write / _commit_completed) and are left alone; a
        # writer reaped mid-write fails its commit with a conflict error
        # instead of committing dangling files.
        with table.writer._lock():
            table.writer._heal_stale()
    finish_pending_cleans(table)
    view = table.view()
    writes = table.timeline.completed_write_instants()
    removed: dict = {}
    earliest_retained = None

    def _remove_slice(partition, s):
        # PLAN only — deletes happen in _execute_plan after the requested
        # clean instant (with the full file list) is durably on the
        # timeline, mirroring CleanPlanner -> requested plan -> executor.
        # A crash mid-delete therefore leaves a replayable plan instead of
        # silently missing files (found by the crash-injection sweep).
        if s.base_file.path in view.savepointed_files:
            return
        removed.setdefault(partition, []).append(s.base_file.path)
        for d in s.deltas:
            removed.setdefault(partition, []).append(d.path)

    def _clean_replaced_group(partition, g, boundary):
        """A group replaced by insert_overwrite / delete_partition /
        clustering has NO live slice — once the replacement is out of the
        retention window (and nothing is savepointed) every file is dead
        (CleanPlanner cleans replaced file groups; ADVICE r1). Returns True
        when the group was handled here."""
        if g.replaced_at is None:
            return False
        if boundary is not None and g.replaced_at > boundary:
            return True   # replaced but still in retention: keep everything
        for s in g.slices:
            if s.base_file is not None:
                _remove_slice(partition, s)
        return True

    if policy in ("KEEP_LATEST_COMMITS", "KEEP_LATEST_BY_HOURS"):
        if policy == "KEEP_LATEST_COMMITS":
            n = retain or cfg.cleaner_retain_commits
            if len(writes) <= n:
                return {"removed": 0}
            retain_instant = writes[-n].time
        else:
            # KEEP_LATEST_BY_HOURS (HoodieCleaningPolicy.java:25): keep every
            # slice a commit in the last N hours could still serve — i.e. the
            # boundary is the earliest completed write inside the window
            import time as _time
            hours = cfg.cleaner_retain_hours if retain is None else retain
            cutoff = _time.strftime("%Y%m%d%H%M%S",
                                    _time.gmtime(_time.time() - hours * 3600)) + "000"
            inside = [i for i in writes if i.time >= cutoff]
            # no commit inside the window -> still keep the latest snapshot
            retain_instant = inside[0].time if inside else writes[-1].time
            if not writes or retain_instant == writes[0].time:
                return {"removed": 0}
        earliest_retained = retain_instant
        for (partition, fid), g in sorted(view.groups.items()):
            if _clean_replaced_group(partition, g, retain_instant):
                continue
            slices = [s for s in g.slices if s.base_file is not None]
            # the slice active AT retain_instant must survive; everything older goes
            keep_from = None
            for i, s in enumerate(slices):
                if s.base_instant <= retain_instant:
                    keep_from = i
            for s in (slices[:keep_from] if keep_from is not None else []):
                _remove_slice(partition, s)
    elif policy == "KEEP_LATEST_FILE_VERSIONS":
        n = retain or cfg.cleaner_retain_file_versions
        for (partition, fid), g in sorted(view.groups.items()):
            if _clean_replaced_group(partition, g, None):
                continue
            slices = [s for s in g.slices if s.base_file is not None]
            for s in slices[:-n] if len(slices) > n else []:
                _remove_slice(partition, s)
    else:
        raise ValueError(f"unknown cleaning policy {policy}")

    nremoved = sum(len(v) for v in removed.values())
    if nremoved:
        instant = table.timeline.new_instant()
        md = {"operation": "clean", "policy": policy, "removed_files": removed}
        if earliest_retained:
            md["earliest_retained_instant"] = earliest_retained
        table.timeline.save_requested(instant, tl.CLEAN, md)
        _execute_plan(table, instant, md)
    return {"removed": nremoved, "files": removed}
