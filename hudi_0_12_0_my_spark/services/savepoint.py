"""Savepoint / restore.

Re-expression of hudi-client/.../table/action/savepoint/SavepointActionExecutor
(pin the file slices live at an instant against cleaning) and
restore/ (HoodieRestorePlanActionExecutor: rollback every commit after the
savepoint, newest first).
"""

from __future__ import annotations

from .. import timeline as tl
from .rollback import rollback_instant


def create_savepoint(table, instant_time: str | None = None) -> str:
    timeline = table.timeline
    if instant_time is None:
        latest = timeline.latest_completed_write()
        if latest is None:
            raise ValueError("nothing to savepoint: empty timeline")
        instant_time = latest.time
    view = table.view(as_of=instant_time)
    files: dict = {}
    for g, s in view.live_slices():
        files.setdefault(g.partition, []).append(s.base_file.path)
        files[g.partition].extend(d.path for d in s.deltas_as_of(instant_time))
    sp = timeline.new_instant()
    timeline.save_completed(sp, tl.SAVEPOINT,
                            {"operation": "savepoint", "pinned_instant": instant_time,
                             "files": files})
    return sp


def restore_to_savepoint(table, savepoint_or_instant: str) -> dict:
    """Restore table state to a savepointed instant: rollback newer commits,
    newest first."""
    timeline = table.timeline
    target = savepoint_or_instant
    for ins in timeline.completed(actions=(tl.SAVEPOINT,)):
        if ins.time == savepoint_or_instant:
            target = timeline.metadata(ins)["pinned_instant"]
            break
    # every commit newer than the target must still be ACTIVE — rollback
    # needs its commit metadata (file lists); archival refuses to cross a
    # savepoint pin (services/archival.py), so this only trips on tables
    # whose savepoint landed after the damage was already done
    gone = [i.time for i, _ in timeline.archived()
            if i.action in tl.WRITE_ACTIONS and i.time > target]
    if gone:
        raise ValueError(
            f"cannot restore to {target}: {len(gone)} newer commit(s) are "
            f"already archived (earliest {gone[0]}) and cannot be rolled "
            "back")
    rolled = []
    for ins in reversed(timeline.completed_write_instants()):
        if ins.time > target:
            rollback_instant(table, ins.time, _allow_non_latest=True)
            rolled.append(ins.time)
    rs = timeline.new_instant()
    timeline.save_completed(rs, tl.RESTORE,
                            {"operation": "restore", "restored_to": target,
                             "rolled_back": rolled})
    return {"restored_to": target, "rolled_back": rolled}
