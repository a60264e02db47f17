"""Cleaning: delete obsolete file slices past the retention policy.

Re-expression of CleanPlanner
(hudi-client/hudi-client-common/.../clean/CleanPlanner.java:74, 497 LoC) with
policies KEEP_LATEST_COMMITS / KEEP_LATEST_FILE_VERSIONS
(HoodieCleaningPolicy.java:25). Savepointed files are never cleaned
(SavepointActionExecutor contract). Driver-side metadata planning + file
deletes only — no Spark job.
"""

from __future__ import annotations

import os

from .. import timeline as tl


def run_clean(table, policy: str | None = None, retain: int | None = None) -> dict:
    cfg = table.cfg
    policy = policy or cfg.cleaner_policy
    view = table.view()
    writes = table.timeline.completed_write_instants()
    removed: dict = {}
    earliest_retained = None

    def _remove(path_rel):
        p = table.abs(path_rel)
        if os.path.exists(p):
            os.unlink(p)
        return path_rel

    if policy == "KEEP_LATEST_COMMITS":
        n = retain or cfg.cleaner_retain_commits
        if len(writes) <= n:
            return {"removed": 0}
        retain_instant = writes[-n].time
        earliest_retained = retain_instant
        for (partition, fid), g in sorted(view.groups.items()):
            slices = [s for s in g.slices if s.base_file is not None]
            # the slice active AT retain_instant must survive; everything older goes
            keep_from = None
            for i, s in enumerate(slices):
                if s.base_instant <= retain_instant:
                    keep_from = i
            for s in (slices[:keep_from] if keep_from is not None else []):
                if s.base_file.path in view.savepointed_files:
                    continue
                removed.setdefault(partition, []).append(_remove(s.base_file.path))
                for d in s.deltas:
                    removed.setdefault(partition, []).append(_remove(d.path))
    elif policy == "KEEP_LATEST_FILE_VERSIONS":
        n = retain or cfg.cleaner_retain_file_versions
        for (partition, fid), g in sorted(view.groups.items()):
            slices = [s for s in g.slices if s.base_file is not None]
            for s in slices[:-n] if len(slices) > n else []:
                if s.base_file.path in view.savepointed_files:
                    continue
                removed.setdefault(partition, []).append(_remove(s.base_file.path))
                for d in s.deltas:
                    removed.setdefault(partition, []).append(_remove(d.path))
    else:
        raise ValueError(f"unknown cleaning policy {policy}")

    nremoved = sum(len(v) for v in removed.values())
    if nremoved:
        instant = tl.new_instant_time()
        md = {"operation": "clean", "policy": policy, "removed_files": removed}
        if earliest_retained:
            md["earliest_retained_instant"] = earliest_retained
        table.timeline.save_completed(instant, tl.CLEAN, md)
    return {"removed": nremoved, "files": removed}
