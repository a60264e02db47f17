"""Rollback: undo a commit (completed or crashed) by deleting its files.

Re-expression of hudi-client/.../table/action/rollback/ (12 files):
MarkerBasedRollbackStrategy (pending instants — the marker file written before
any data move lists every intended path) and ListingBasedRollbackStrategy
(completed instants — the commit metadata lists every written file).
"""

from __future__ import annotations

import os

from .. import timeline as tl
from ..util import read_json, rm_rf
from ..storage import get_storage


def _delete_files(table, rel_paths) -> list[str]:
    deleted = []
    for rel in rel_paths:
        p = table.abs(rel)
        st = get_storage(p)
        if st.exists(p):
            st.unlink(p)
            deleted.append(rel)
    return deleted


def _restore_rings(table, md: dict, instant_time: str) -> None:
    """Undo a consistent-bucket resize: put the previous rings back so ring
    and file-system view cannot stay divergent (services/bucket_resize.py)."""
    prev = md.get("prev_rings")
    if not prev:
        return
    from .. import buckets as bk
    for p, nodes in prev.items():
        bk.save_ring(table.base_path, p, nodes, f"rollback-{instant_time}")


def _execute_rollback(table, rb_instant: str, plan: dict) -> dict:
    """Execute a planned rollback. Every step is idempotent, so a crashed
    execution replays safely from its requested plan (the rollback analogue
    of HoodieCleanActionExecutor.runPendingClean)."""
    timeline = table.timeline
    target = plan["rolled_back_instant"]
    _delete_files(table, plan.get("deleted_files") or [])
    _restore_rings(table, plan, target)
    timeline.remove(target)
    if plan.get("was_completed"):
        # a manifest checkpoint folded at/after this instant bakes its files
        # into the view state — drop it so the view re-folds without them
        from .archival import invalidate_manifests_from
        invalidate_manifests_from(table.base_path, target)
    marker = table.writer._marker_path(target)
    if get_storage(marker).exists(marker):
        get_storage(marker).unlink(marker)
    temp_root = os.path.join(table.base_path, ".hoodie", ".temp")
    st = get_storage(temp_root)
    if st.isdir(temp_root):
        for d in st.listdir(temp_root):
            if d.startswith(target):
                rm_rf(os.path.join(temp_root, d))
    timeline.save_completed(rb_instant, tl.ROLLBACK, plan)
    return plan


def finish_pending_rollbacks(table) -> int:
    """Replay crashed rollback plans (their deletes may have partially run;
    the plan's file list is authoritative)."""
    n = 0
    for ins in table.timeline.pending():
        if ins.action == tl.ROLLBACK:
            _execute_rollback(table, ins.time, table.timeline.metadata(ins))
            n += 1
    return n


def rollback_instant(table, instant_time: str, _allow_non_latest: bool = False) -> dict:
    """Plan-then-execute: the requested rollback instant carries the full
    file list and ring-restore state BEFORE any delete, so a crash mid-way
    leaves a replayable plan and the file-system view hides the target
    commit the moment the plan lands (never a committed instant pointing at
    half-deleted files — found by the crash-injection sweep)."""
    timeline = table.timeline
    finish_pending_rollbacks(table)
    completed = [i for i in timeline.completed_write_instants() if i.time == instant_time]
    pending = [i for i in timeline.pending() if i.time == instant_time]
    if completed:
        ins = completed[0]
        latest = timeline.latest_completed_write()
        if not _allow_non_latest and latest and latest.time != instant_time:
            raise ValueError(
                f"can only rollback the latest commit {latest.time}; use "
                f"restore() for multi-commit undo (RestoreActionExecutor)")
        md = timeline.metadata(ins)
        rels = [st["path"] for sts in (md.get("partition_to_write_stats") or {}).values()
                for st in sts]
        plan = {"operation": "rollback", "rolled_back_instant": instant_time,
                "deleted_files": rels, "was_completed": True,
                "prev_rings": md.get("prev_rings")}
    elif pending:
        marker = table.writer._marker_path(instant_time)
        rels = read_json(marker)["files"] \
            if get_storage(marker).exists(marker) else []
        prev_rings = None
        for ins in pending:
            try:
                prev_rings = (timeline.metadata(ins) or {}).get("prev_rings") \
                    or prev_rings
            except (OSError, ValueError):
                pass
        plan = {"operation": "rollback", "rolled_back_instant": instant_time,
                "deleted_files": rels, "was_completed": False,
                "prev_rings": prev_rings}
    else:
        raise ValueError(f"no instant {instant_time} on the timeline")
    rb = timeline.new_instant()
    timeline.save_requested(rb, tl.ROLLBACK, plan)
    return _execute_rollback(table, rb, plan)


def rollback_pending(table) -> dict:
    """Roll back every crashed/incomplete instant (HoodieWriteClient's
    rollbackFailedWrites on startup)."""
    out = {"rolled_back": []}
    finish_pending_rollbacks(table)
    for ins in table.timeline.pending():
        if ins.action not in tl.WRITE_ACTIONS:
            continue
        rollback_instant(table, ins.time)
        out["rolled_back"].append(ins.time)
    return out
