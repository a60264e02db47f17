"""Async metadata-index build — the ``indexing`` table-service action.

Reference spec: hudi-client/hudi-client-common/src/main/java/org/apache/hudi/
table/action/index/RunIndexActionExecutor.java (async build of a metadata
partition for files written before the index existed) and
HoodieIndexingConfig / MetadataPartitionType.BLOOM_FILTERS.

Spark-first: the build is the same pure-Catalyst bitset pipeline the write
path uses (bloom.build_blooms); this service only decides WHICH files still
need entries, scans just those (3 meta columns), and stamps an ``indexing``
instant on the timeline so the operation is observable/auditable like any
other table service.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from .. import bloom, meta
from .. import timeline as tl


def run_index(table) -> dict:
    """Backfill the bloom_filters partition for live base files lacking a
    bitset (tables created before bloom was enabled, or service-rewritten
    files from compaction/clustering runs while it was off)."""
    cfg = table.cfg
    view = table.view()
    live = [(g.partition, s.base_file) for g, s in view.live_slices()
            if s.base_file is not None]
    have: set = set()
    existing = bloom.load_blooms(table.spark, table.base_path,
                                 cfg.bloom_num_hashes)
    if existing is not None:
        have = {r[0] for r in existing.select("file_name").collect()}
    missing = [view.abs(bf.path) for _p, bf in live
               if os.path.basename(bf.path) not in have]
    if not missing:
        return {"files_indexed": 0, "instant": None}
    keys = (table.writer._meta_scan(view, missing)
            .select(F.col(meta.PARTITION_PATH).alias("partition"),
                    F.col(meta.FILE_NAME).alias("file_name"),
                    F.col(meta.RECORD_KEY).alias("key")))
    instant = table.timeline.new_instant()
    n = bloom.write_blooms(
        bloom.build_blooms(keys, cfg.bloom_bits_per_key, cfg.bloom_num_hashes),
        table.base_path, instant)
    table.timeline.save_completed(
        instant, tl.INDEXING,
        {"operation": "index", "metadata_partitions": ["bloom_filters"],
         "files_indexed": n})
    return {"files_indexed": n, "instant": instant}


def drop_index(table) -> dict:
    """DROP INDEX counterpart (deleteMetadataPartition): remove the
    bloom_filters partition and disable the probe."""
    from ..storage import get_storage
    from .. import config as cfgmod
    d = bloom.bloom_dir(table.base_path)
    st = get_storage(d)
    existed = st.isdir(d)
    st.rm_rf(d)
    if table.cfg.bloom_index_enabled:
        table.cfg.bloom_index_enabled = False
        cfgmod.save_config(table.base_path, table.cfg)
    return {"dropped": existed}
