"""Bootstrap: adopt an existing plain-parquet dataset into a lake table.

Re-expression of BootstrapMode.java:29-34 (METADATA_ONLY / FULL_RECORD),
HoodieSparkSqlWriter.scala:424 dispatch and the read side
HoodieBootstrapRelation.scala:55 + HoodieBootstrapRDD.scala.

- METADATA_ONLY: no data rewrite. Existing parquet files are registered as
  the initial file slices of a commit; their (absolute) paths go into the
  commit metadata, so every reader sees them immediately. Missing meta
  columns are reconstructed at read time by the reader (key/partition from
  keygen expressions, commit time = the bootstrap instant) — the vectorized
  equivalent of Hudi's skeleton-file join.
- FULL_RECORD: one bulk_insert pass over the source (full rewrite with meta
  columns materialized).
"""

from __future__ import annotations

import os

from . import timeline as tl
from .table import LakeTable


def bootstrap_table(spark, base_path: str, source_dir: str,
                    mode: str = "METADATA_ONLY", partition_from_dirs: bool = True,
                    **cfg_kwargs) -> LakeTable:
    """Create ``base_path`` as a lake table adopting ``source_dir`` parquet.

    ``partition_from_dirs``: hive-style ``k=v`` subdirectories of source_dir
    become table partitions (the common layout for existing datasets);
    otherwise all files land in the root partition.
    """
    mode = mode.upper()
    if mode not in ("METADATA_ONLY", "FULL_RECORD"):
        raise ValueError(f"unknown bootstrap mode {mode!r}")

    t = LakeTable.create(spark, base_path, **cfg_kwargs)
    if mode == "FULL_RECORD":
        t.bulk_insert(spark.read.parquet(source_dir))
        return t

    import pyarrow.parquet as pq

    # discover (partition_path, file) pairs; a single parquet file is a
    # one-file unpartitioned dataset
    found: list[tuple[str, str]] = []
    if os.path.isfile(source_dir):
        found.append(("", source_dir))
    for root, _dirs, files in os.walk(source_dir):
        rel = os.path.relpath(root, source_dir)
        partition = "" if rel == "." else rel
        if not partition_from_dirs:
            partition = ""
        for f in sorted(files):
            if f.endswith(".parquet"):
                found.append((partition, os.path.join(root, f)))
    if not found:
        raise FileNotFoundError(f"no parquet files under {source_dir}")

    # register one file group per source file; absolute paths mark slices
    # whose bytes live outside the table dir (Hudi's bootstrap base path)
    schema = spark.read.parquet(found[0][1]).schema
    cfg = t.cfg
    cfg.schema_json = schema.json()
    from . import config as cfgmod
    cfgmod.save_config(base_path, cfg)

    instant = t.timeline.new_instant()
    stats_by_partition: dict = {}
    for i, (partition, path) in enumerate(found):
        md = pq.read_metadata(path)
        stats_by_partition.setdefault(partition, []).append({
            "file_id": f"bootstrap-{i:08d}",
            "file_name": os.path.basename(path),
            "path": os.path.abspath(path),      # external to the table dir
            "kind": "base", "records": md.num_rows,
            "bytes": os.path.getsize(path), "col_stats": {},
            "bootstrap": True,
        })
    commit_md = {"operation": "bootstrap", "schema": cfg.schema_json,
                 "partition_to_write_stats": stats_by_partition,
                 "total_records": sum(s["records"]
                                      for sts in stats_by_partition.values()
                                      for s in sts)}
    t.timeline.save_completed(instant, tl.COMMIT, commit_md)
    return t.reload()
