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


def rollback_instant(table, instant_time: str, _allow_non_latest: bool = False) -> dict:
    timeline = table.timeline
    completed = [i for i in timeline.completed_write_instants() if i.time == instant_time]
    pending = [i for i in timeline.pending() if i.time == instant_time]
    deleted: list[str] = []
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
        deleted = _delete_files(table, rels)
        _restore_rings(table, md, instant_time)
        timeline.remove(instant_time, ins.action)
        # a manifest checkpoint folded at/after this instant bakes its files
        # into the view state — drop it so the view re-folds without them
        from .archival import invalidate_manifests_from
        invalidate_manifests_from(table.base_path, instant_time)
    elif pending:
        marker = table.writer._marker_path(instant_time)
        if get_storage(marker).exists(marker):
            deleted = _delete_files(table, read_json(marker)["files"])
            get_storage(marker).unlink(marker)
        for ins in pending:
            try:
                _restore_rings(table, timeline.metadata(ins), instant_time)
            except (OSError, ValueError):
                pass
            timeline.remove(instant_time, ins.action)
        # drop any staging leftovers of the crashed write
        temp_root = os.path.join(table.base_path, ".hoodie", ".temp")
        st = get_storage(temp_root)
        if st.isdir(temp_root):
            for d in st.listdir(temp_root):
                if d.startswith(instant_time):
                    rm_rf(os.path.join(temp_root, d))
    else:
        raise ValueError(f"no instant {instant_time} on the timeline")
    rb = timeline.new_instant()
    md = {"operation": "rollback", "rolled_back_instant": instant_time,
          "deleted_files": deleted}
    timeline.save_completed(rb, tl.ROLLBACK, md)
    return md


def rollback_pending(table) -> dict:
    """Roll back every crashed/incomplete instant (HoodieWriteClient's
    rollbackFailedWrites on startup)."""
    out = {"rolled_back": []}
    for ins in table.timeline.pending():
        rollback_instant(table, ins.time)
        out["rolled_back"].append(ins.time)
    return out
