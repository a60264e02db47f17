"""Timeline archival: keep the active timeline O(recent commits).

Re-expression of HoodieTimelineArchiver
(hudi-client/hudi-client-common/.../client/HoodieTimelineArchiver.java +
HoodieArchivedTimeline.java) adapted to the fold-based file-system view: before
moving old instants to the archived timeline, a MANIFEST CHECKPOINT of the
folded view state is written, so normal reads never replay archived history.
This is the 100 TB answer: snapshot planning cost stays O(live files +
retained commits) no matter how many commits the table has ever seen; only
deep time travel (before the checkpoint) replays the archived batches.
"""

from __future__ import annotations

import os

from .. import timeline as tl
from ..util import atomic_write_json, read_json
from ..storage import get_storage


def manifest_dir(base_path: str) -> str:
    return os.path.join(base_path, ".hoodie", "manifest")


def invalidate_manifests_from(base_path: str, instant_time: str) -> list[str]:
    """Delete manifest checkpoints folded at/after `instant_time`.

    Called by rollback/restore: a checkpoint whose boundary >= the rolled-back
    instant has that commit's files baked into its fold state and would keep
    serving the dead slice. Dropping it is safe — the view falls back to
    re-folding archived batches (which are never deleted) + active timeline.
    """
    d = manifest_dir(base_path)
    dropped = []
    st = get_storage(d)
    if st.isdir(d):
        for f in st.listdir(d):
            if f.endswith(".json") and f[:-len(".json")] >= instant_time:
                st.unlink(os.path.join(d, f))
                dropped.append(f)
    return dropped


def latest_manifest(base_path: str) -> dict | None:
    d = manifest_dir(base_path)
    st = get_storage(d)
    if not st.isdir(d):
        return None
    names = [f for f in st.listdir(d) if f.endswith(".json")]
    return read_json(os.path.join(d, names[-1])) if names else None


def _serialize_view(view, instant: str) -> dict:
    groups = []
    for (p, fid), g in sorted(view.groups.items()):
        groups.append({
            "partition": p, "file_id": fid, "replaced_at": g.replaced_at,
            "slices": [{
                "base_instant": s.base_instant,
                "base_file": None if s.base_file is None else vars(s.base_file),
                "deltas": [vars(d) for d in s.deltas],
            } for s in g.slices],
        })
    return {"instant": instant, "groups": groups,
            "earliest_retained": view.earliest_retained,
            "savepointed_files": sorted(view.savepointed_files)}


def archive_timeline(table, retain_active: int = 20) -> dict:
    """Checkpoint the folded view, then move older completed instants into one
    archived batch file."""
    timeline = table.timeline
    # heal a crash between writing a batch file and unlinking the archived
    # instants from the active timeline: the batch is authoritative (it is
    # written atomically before any unlink), so active copies of archived
    # instants are leftovers — finish the deferred unlinks first
    in_archive = {(i.time, i.action) for i, _ in timeline.archived()}
    if in_archive:
        for i in timeline.completed():
            if (i.time, i.action) in in_archive:
                get_storage(timeline.path(i)).unlink(timeline.path(i))
    completed = [i for i in timeline.completed() if i.action != tl.SAVEPOINT]
    if len(completed) <= retain_active:
        return {"archived": 0}
    to_archive = completed[:-retain_active]
    # Never archive at/past the earliest savepoint pin: restore rolls back
    # every commit NEWER than the pin via its active commit metadata, so
    # archiving those commits would make a later restore silently skip them
    # (HoodieTimelineArchiver stops at the first savepointed instant).
    pins = [(timeline.metadata(i) or {}).get("pinned_instant")
            for i in timeline.completed(actions=(tl.SAVEPOINT,))]
    min_pin = min((p for p in pins if p), default=None)
    if min_pin is not None:
        to_archive = [i for i in to_archive if i.time < min_pin]
    if not to_archive:
        return {"archived": 0}
    boundary = to_archive[-1].time

    # Fold EXACTLY up to the boundary (not the full timeline): retained active
    # instants are replayed on top of this checkpoint at view() time, so baking
    # them in would double-apply their slices/deltas, and a later rollback of a
    # retained commit could never remove it from the checkpointed state.
    from ..fsview import FileSystemView
    view = FileSystemView(table.base_path, timeline, upto=boundary)
    atomic_write_json(os.path.join(manifest_dir(table.base_path),
                                   f"{boundary}.json"),
                      _serialize_view(view, boundary))

    batch = [{"time": i.time, "action": i.action, "metadata": timeline.metadata(i)}
             for i in to_archive]
    adir = os.path.join(table.base_path, ".hoodie", "archived")
    atomic_write_json(os.path.join(adir, f"batch_{boundary}.json"), batch)
    for i in to_archive:
        get_storage(timeline.path(i)).unlink(timeline.path(i))
    return {"archived": len(to_archive), "checkpoint": boundary}
