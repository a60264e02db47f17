"""Clustering: rewrite file groups for layout, as a replacecommit.

Re-expression of SparkSizeBasedClusteringPlanStrategy (pick small files) +
SparkSortAndSizeExecutionStrategy
(hudi-client/hudi-spark-client/.../clustering/run/strategy/
SparkSortAndSizeExecutionStrategy.java:45) and the layout-optimization
strategies linear / z-order / hilbert (HoodieClusteringConfig.java:238-243).

Plan: per partition, select file groups under the small-file limit (or ALL
groups when changing layout). Execute: read -> sort by the layout key ->
repartitionByRange -> write new file groups -> replacecommit marks the old
groups dead (update-conflict strategy: single-writer, so "reject" is implicit).
"""

from __future__ import annotations

import math
import os

from pyspark.sql import functions as F

from .. import meta
from .. import timeline as tl
from ..util import new_file_id
from ..writer import base_read_schema, read_files


def run_clustering(table, sort_cols: list | None = None, layout: str = "linear",
                   partitions: list | None = None,
                   target_file_bytes: int | None = None,
                   small_files_only: bool | None = None,
                   boundary_mode: str = "minmax") -> str | None:
    cfg = table.cfg
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
    target = target_file_bytes or cfg.target_file_bytes
    if small_files_only is None:
        small_files_only = layout == "linear" and sort_cols is None
    view = table.view()
    selected = []
    for g, s in view.live_slices(partitions):
        if s.deltas:       # MOR groups with pending logs: compact first
            continue
        if s.base_file is None:
            continue
        if small_files_only and s.base_file.bytes >= cfg.small_file_limit_bytes:
            continue
        selected.append((g, s))
    # size-based plan needs at least 2 inputs to be useful; layout rewrite
    # (explicit sort_cols / curve) runs on any non-empty selection
    if not selected or (small_files_only and len(selected) < 2):
        return None

    with table.writer._lock():
        instant = table.timeline.new_instant()
        plan = {"operation": "cluster", "layout": layout,
                "boundary_mode": boundary_mode,
                "sort_cols": sort_cols or [],
                "groups": [{"partition": g.partition, "file_id": g.file_id}
                           for g, s in selected]}
        table.timeline.save_requested(instant, tl.REPLACECOMMIT, plan)
        paths = [view.abs(s.base_file.path) for g, s in selected]
        total_bytes = sum(s.base_file.bytes for g, s in selected)
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

        prefix = new_file_id()[:16]
        ranged = (df.repartitionByRange(nfiles, meta.PARTITION_PATH, *[F.col(c) for c in range_cols])
                    .withColumn(meta.TARGET_FILE_ID,
                                F.format_string("%s%08d", F.lit(prefix),
                                                F.spark_partition_id())))
        transient = ["__curve_key"] if "__curve_key" in ranged.columns else None
        stats = table.writer.stage_write(ranged, instant, "base",
                                         sort_cols=file_sort,
                                         already_partitioned=True,
                                         drop_after_sort=transient)
        replaced: dict = {}
        for g, s in selected:
            replaced.setdefault(g.partition, []).append(g.file_id)
        md = table.writer._commit_md("cluster", stats, replaced)
        md["layout"] = layout
        table.timeline.save_completed(instant, tl.REPLACECOMMIT, md)
        table.writer._maybe_index_blooms(instant, md)
        table.writer._remove_marker(instant)
        return instant
