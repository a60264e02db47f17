"""Table configuration — the engine's ``hoodie.properties``.

Reference: hudi-common/src/main/java/org/apache/hudi/common/table/HoodieTableConfig.java
(table name/type/key/precombine/partition/payload persisted per table) and
hudi-client/.../config/HoodieWriteConfig.java / HoodieStorageConfig.java defaults
(120MB max file size, 100MB small-file limit — HoodieStorageConfig.java:43,
HoodieCompactionConfig.java:81).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field, asdict

from .util import atomic_write_json, read_json
from .storage import get_storage

COW = "cow"
MOR = "mor"


@dataclass
class TableConfig:
    name: str
    table_type: str = COW                    # cow | mor (HoodieTableType.java:30-31)
    record_key_fields: list = field(default_factory=lambda: ["id"])
    precombine_field: str | None = None      # ordering field for payload resolution
    partition_field: str | None = None       # source column for partition path
    keygen: str = "simple"                   # simple|complex|nonpartitioned|timestamp|custom|uuid|global_delete (keygen/ dir)
    partition_style: str = "value"           # value|timestamp (CustomAvroKeyGenerator mix)
    keygen_timestamp_unit: str = "auto"      # auto|epochms|epochsec|timestamp|date_string|mixed (TimestampBasedAvroKeyGenerator types)
    keygen_output_format: str = "yyyy-MM-dd" # fork default (HoodieFlinkStreamerWithApollo.java:100-112)
    keygen_input_format: str | None = None   # DATE_STRING/MIXED input format(s), comma-separated
    hive_style_partitioning: bool = False    # KeyGeneratorOptions hive-style flag
    payload: str = "overwrite_latest"        # payloads.py registry key
    global_index: bool = False               # HoodieGlobalSimpleIndex vs HoodieSimpleIndex
    index_type: str = "simple"               # simple | bucket | bucket_consistent | inmemory (HoodieIndex.java:45 impls)
    num_buckets: int = 8                     # bucket index (HoodieSimpleBucketIndex.java:40)
    # bloom_filters metadata partition (MetadataPartitionType.java:24-27):
    # when enabled, write-path tagging probes per-file bitsets after key-range
    # pruning, and every commit appends bitsets for its new base files
    bloom_index_enabled: bool = False
    bloom_bits_per_key: int = 10             # ~0.9% fpp with 5 hashes
    bloom_num_hashes: int = 5
    concurrency_mode: str = "single_writer"  # single_writer | occ (WriteConcurrencyMode.java:30-32)
    # sizing (HoodieStorageConfig.java:43, HoodieCompactionConfig.java:81)
    target_file_bytes: int = 120 * 1024 * 1024
    small_file_limit_bytes: int = 100 * 1024 * 1024
    record_size_estimate: int = 1024         # UpsertPartitioner avg-record-size fallback
    # services
    cleaner_policy: str = "KEEP_LATEST_COMMITS"   # HoodieCleaningPolicy.java:25
    cleaner_retain_commits: int = 10
    cleaner_retain_file_versions: int = 3
    cleaner_retain_hours: int = 24                # KEEP_LATEST_BY_HOURS window
    compaction_max_delta_commits: int = 5         # inline-compaction trigger (NUM_COMMITS)
    # post-commit notification (HoodieWriteCommitCallback):
    # "module:function" | "file:/path" | "http(s)://url" — see callbacks.py
    commit_callback: str | None = None
    # stats / skipping
    stats_columns: list | None = None        # None => all top-level primitive columns
    schema_json: str | None = None           # canonical table schema (StructType.json())
    # schema evolution: list of {"from": old, "to": new} renames, applied at read
    column_renames: list = field(default_factory=list)

    def to_dict(self) -> dict:
        return asdict(self)

    @staticmethod
    def from_dict(d: dict) -> "TableConfig":
        known = {f for f in TableConfig.__dataclass_fields__}
        return TableConfig(**{k: v for k, v in d.items() if k in known})


def config_path(base_path: str) -> str:
    return os.path.join(base_path, ".hoodie", "table_config.json")


def save_config(base_path: str, cfg: TableConfig) -> None:
    atomic_write_json(config_path(base_path), cfg.to_dict())


def load_config(base_path: str) -> TableConfig:
    return TableConfig.from_dict(read_json(config_path(base_path)))


def table_exists(base_path: str) -> bool:
    return get_storage(base_path).exists(config_path(base_path))
