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

HFile decision (HoodieFileFormat.java lists PARQUET/ORC/HFILE): HFile is
NOT adopted, by design. The reference uses HFile only for the metadata
table (and as an exotic base format via HBase's reader); this engine's
metadata design is manifest-Parquet, and every metadata partition
(files/col-stats/bloom) is DERIVABLE from the data files — so when the
bootstrap source is itself a Hudi table, its ``.hoodie`` tree (HFile or
otherwise) is skipped and the equivalent metadata is rebuilt from the
adopted parquet. HFile DATA files cannot be read without HBase and are
refused loudly with the migration path (see ``_refuse_hfile_bases``).
"""

from __future__ import annotations

import os

from . import timeline as tl
from .table import LakeTable


def _refuse_hfile_bases(path: str) -> None:
    """Loud, documented refusal of HFile DATA files (HoodieFileFormat.HFILE):
    reading them needs HBase's HFile reader, which this pure-PySpark engine
    deliberately does not carry. Migration path: materialize the source
    through an engine that can read it, then adopt the parquet."""
    raise NotImplementedError(
        f"HFile base files are not supported ({path}). Migration: run a "
        "snapshot read of the source table with Spark+Hudi (or compact the "
        "source to parquet), write plain parquet, then bootstrap that "
        "directory — METADATA_ONLY adoption and FULL_RECORD rewrite both "
        "work from parquet. Metadata-table HFiles need no migration: the "
        "equivalent files/col-stats/bloom metadata is rebuilt from data.")


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
        if source_dir.endswith(".hfile"):   # same refusal as the dir walk
            _refuse_hfile_bases(source_dir)
        found.append(("", source_dir))
    for root, dirs, files in os.walk(source_dir):
        # a source that is itself a Hudi table: never adopt its internal
        # tree — timeline files are meaningless here and metadata-table
        # partitions (parquet or HFILE) are derivable, rebuilt from data
        if ".hoodie" in dirs:
            dirs.remove(".hoodie")
        rel = os.path.relpath(root, source_dir)
        partition = "" if rel == "." else rel
        if not partition_from_dirs:
            partition = ""
        for f in sorted(files):
            if f.endswith(".parquet"):
                found.append((partition, os.path.join(root, f)))
            elif f.endswith(".hfile"):
                _refuse_hfile_bases(os.path.join(root, f))
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
