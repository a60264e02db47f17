"""Hudi meta columns (hudi-common/.../model/HoodieRecord.java:37-54)."""

from __future__ import annotations

from pyspark.sql import functions as F

COMMIT_TIME = "_hoodie_commit_time"
COMMIT_SEQNO = "_hoodie_commit_seqno"
RECORD_KEY = "_hoodie_record_key"
PARTITION_PATH = "_hoodie_partition_path"
FILE_NAME = "_hoodie_file_name"
OPERATION = "_hoodie_operation"          # internal change-op for MOR deltas (I/U/D)
DELETE_MARKER = "_hoodie_is_deleted"     # user-facing tombstone column

META_COLS = [COMMIT_TIME, COMMIT_SEQNO, RECORD_KEY, PARTITION_PATH, FILE_NAME]

# internal write-path column: target file group of each row
TARGET_FILE_ID = "_target_file_id"

# every "__"-prefixed scratch-column namespace the engine stamps on user
# frames (lookup joins, heartbeat/location tags, stats, clustering curves).
# prepare() rejects ONLY these (plus the "_hoodie_" meta namespace) so a
# pre-existing business column like "__my_col" keeps working — the reference
# likewise reserves only the _hoodie_ namespace (HoodieRecord.java:37-54).
# New internal scratch columns MUST use one of these prefixes (or extend the
# tuple), never a bare "__name".
INTERNAL_PREFIXES = ("__pk_", "__hb_", "__loc_", "__old_", "__bs_",
                     "__curve_", "__main_", "__mn_", "__mx_", "__null_",
                     "__q_", "__root_", "__sc_",
                     # exact scratch names the write path stamps on user
                     # frames (stage_write partition/file-group keys, the
                     # bucket index, bloom tag probes, the bootstrap-meta
                     # reader join, consistent-hash rings, derived-table
                     # folds) — admitting a business column with one of
                     # these names would silently overwrite its values or
                     # make the write fail with an ambiguous reference
                     "__pp", "__fid", "__bucket", "__bf", "__bk", "__bm",
                     "__bs", "__fp", "__old", "__ring", "__rn", "__wm")


def file_id_from_name(col=FILE_NAME):
    """fileId prefix of ``<fileid>_<instant>...parquet`` (fileId is uuid-hex,
    never contains '_' — HoodieBaseFile/FSUtils.getFileId equivalent)."""
    return F.substring_index(F.col(col), "_", 1)


def strip_meta(df, keep_delete_marker: bool = False):
    drop = [c for c in META_COLS + [OPERATION, TARGET_FILE_ID] if c in df.columns]
    if not keep_delete_marker and DELETE_MARKER in df.columns:
        drop.append(DELETE_MARKER)
    return df.drop(*drop)
