"""Consistent-bucket resizing: split oversized / merge undersized buckets.

Re-expression of Hudi's consistent-hashing clustering
(SparkConsistentBucketClusteringPlanStrategy +
ConsistentBucketIdentifier#splitBucket/mergeBucket): runs as a
replacecommit — the rewritten buckets' rows are re-assigned onto the NEW
ring and written as fresh file groups; untouched buckets never move.

Crash safety (single-writer): the requested plan instant records the
previous rings (``prev_rings``); new rings are saved before the commit
completes, and rolling back the instant — pending or completed — restores
``prev_rings`` (see services/rollback.py), so ring and view can never stay
divergent.
"""

from __future__ import annotations

import os

from .. import buckets as bk
from .. import meta, payloads
from .. import timeline as tl
from ..writer import base_read_schema, delta_read_schema, read_files


def resize_buckets(table, split_above: int | None = None,
                   merge_below: int | None = None,
                   partitions: list | None = None) -> str | None:
    """Split buckets larger than ``split_above`` (default: the table's target
    file size) and merge adjacent buckets smaller than ``merge_below``
    (default: no merging). Returns the replacecommit instant or None."""
    cfg = table.cfg
    if cfg.index_type != "bucket_consistent":
        raise ValueError("resize_buckets requires index_type='bucket_consistent'")
    split_above = split_above or cfg.target_file_bytes
    spec = payloads.get(cfg.payload)
    view = table.view()

    sizes: dict = {}          # partition -> {file_id: bytes}
    slices: dict = {}         # (partition, file_id) -> slice
    for g, s in view.live_slices(partitions):
        base = s.base_file.bytes if s.base_file else 0
        sizes.setdefault(g.partition, {})[g.file_id] = base + s.delta_bytes
        slices[(g.partition, g.file_id)] = s

    prev_rings, new_rings, rewritten = {}, {}, {}
    for p, ring in bk.all_rings(table.base_path).items():
        if partitions is not None and p not in partitions:
            continue
        plan = bk.plan_resize(ring["nodes"], sizes.get(p, {}),
                              split_above, merge_below)
        if plan:
            prev_rings[p] = ring["nodes"]
            new_rings[p], rewritten[p] = plan
    if not rewritten:
        return None

    with table.writer._lock():
        instant = table.timeline.new_instant()
        selected = {(p, fid) for p, fids in rewritten.items() for fid in fids}
        table.timeline.save_requested(instant, tl.REPLACECOMMIT, {
            "operation": "cluster", "layout": "consistent_bucket_resize",
            "prev_rings": prev_rings,
            "groups": [{"partition": p, "file_id": fid} for p, fid in selected]})
        for p, nodes in new_rings.items():
            bk.save_ring(table.base_path, p, nodes, instant)

        base_paths, delta_paths = [], []
        for key in selected:
            s = slices.get(key)
            if s is None:
                continue
            if s.base_file is not None:
                base_paths.append(view.abs(s.base_file.path))
            delta_paths.extend(view.abs(d.path) for d in s.deltas)
        base = read_files(table.spark, base_paths, base_read_schema(cfg), cfg)
        delta = read_files(table.spark, delta_paths, delta_read_schema(cfg), cfg)
        merged = payloads.resolve(base.unionByName(delta, allowMissingColumns=True),
                                  cfg, spec, drop_deletes=True)
        # re-assign onto the NEW ring: split rows land in the two children,
        # merged rows in the union node; everything else was not read
        assigned = bk.tag_with_ring(merged.drop(meta.TARGET_FILE_ID)
                                    if meta.TARGET_FILE_ID in merged.columns
                                    else merged,
                                    table.base_path, cfg.num_buckets, instant)
        stats = table.writer.stage_write(assigned, instant, "base")
        replaced: dict = {}
        for p, fid in selected:
            replaced.setdefault(p, []).append(fid)
        md = table.writer._commit_md("cluster", stats, replaced)
        md["layout"] = "consistent_bucket_resize"
        md["prev_rings"] = prev_rings
        md["resized"] = {p: acts for p, acts in rewritten.items()}
        table.timeline.save_completed(instant, tl.REPLACECOMMIT, md)
        table.writer._maybe_index_blooms(instant, md)
        table.writer._remove_marker(instant)
        return instant
