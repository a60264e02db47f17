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
    partition_urlencode: bool = False        # hoodie.datasource.write.partitionpath.urlencode (PartitionPathEncodeUtils.escapePathName)
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
    # transaction/lock/ provider family (hoodie.write.lock.provider):
    # filesystem | inprocess | conditional_put | "pkg.mod:Class" dotted path
    lock_provider: str = "filesystem"
    # filesystem-lock stale reclaim (hoodie.write.lock.filesystem.expire,
    # FileSystemBasedLockProvider.checkIfExpired): 0 = never expire by age;
    # same-host dead-pid locks reclaim regardless (locks.py)
    lock_expire_sec: float = 0.0
    # async clustering trigger: write commits since the last clustering
    # (hoodie.clustering.async.max.commits, HoodieClusteringConfig)
    clustering_async_max_commits: int = 4
    # base-file format, parquet | orc (HoodieFileFormat.java; HFile is the
    # reference's HBase-backed metadata format, out of scope). MOR delta
    # files stay parquet regardless — the reference's log is its own
    # HoodieLogFormat independent of the base format too
    base_format: str = "parquet"
    # parquet codec for base/delta files (HoodieStorageConfig
    # PARQUET_COMPRESSION_CODEC_NAME; reference default gzip, Spark default
    # snappy): zstd measures ~25% smaller at equal write/scan speed on the
    # bench shapes — at scale that is 25% fewer bytes through every scan,
    # page cache and rewrite. Per-table override via create_table(...);
    # mixed codecs within one table are fine (parquet is per-file).
    parquet_codec: str = "zstd"
    # zstd compression level for parquet writes (parquet-mr's
    # parquet.compression.codec.zstd.level, default 3). Level 1 measured
    # best-or-tied on EVERY cold-JVM write/read step of the bench trio
    # (r8 A/B: bulk 5.58s vs snappy 6.78s / zstd-3 5.88s; format scan
    # 4.05 vs 4.77/4.71) at only +7.6% bytes over level 3 — still -28%
    # vs snappy. Applied per WRITE (option / ParquetWriter arg), never as
    # a session or hadoop-conf default the user's own writes would
    # inherit.
    parquet_codec_level: int = 1
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
    # per-commit metrics reporter (HoodieMetrics / MetricsReporterType):
    # "console" | "json:/path" | "module:function" | a metrics.register()ed
    # name; None disables reporting (counters still land in commit metadata)
    metrics_reporter: str | None = None
    # pre-commit validators (HoodiePreCommitValidatorConfig.java:43-71):
    # list of {"kind": equality|inequality|single_value, "queries": "sql[;sql]"}
    # run against before/after states of touched partitions; failure aborts
    # the staged write — see services/validators.py
    precommit_validators: list = field(default_factory=list)
    # stats / skipping
    stats_columns: list | None = None        # None => all top-level primitive columns
    schema_json: str | None = None           # canonical table schema (StructType.json())
    # schema evolution: list of {"from": old, "to": new} renames, applied at read
    column_renames: list = field(default_factory=list)
    # schema evolution: dropped column names (TableChanges.java delete):
    # registry-only drop — files keep the bytes, reads never project them.
    # Names stay here forever so a re-add can't resurface pre-drop values.
    dropped_columns: list = field(default_factory=list)

    def to_dict(self) -> dict:
        return asdict(self)

    @staticmethod
    def from_dict(d: dict) -> "TableConfig":
        known = {f for f in TableConfig.__dataclass_fields__}
        return TableConfig(**{k: v for k, v in d.items() if k in known})


def config_path(base_path: str) -> str:
    return os.path.join(base_path, ".hoodie", "table_config.json")


_PAYLOAD_TO_CLASS = {
    "overwrite_latest": "org.apache.hudi.common.model.OverwriteWithLatestAvroPayload",
    "default": "org.apache.hudi.common.model.DefaultHoodieRecordPayload",
    "event_time": "org.apache.hudi.common.model.DefaultHoodieRecordPayload",
    "partial_update": "org.apache.hudi.common.model.OverwriteNonDefaultsWithLatestAvroPayload",
    "overwrite_non_defaults": "org.apache.hudi.common.model.OverwriteNonDefaultsWithLatestAvroPayload",
    "validate_dup": "org.apache.hudi.common.model.ValidateDuplicateKeyPayload",
}

_KEYGEN_TO_CLASS = {
    "simple": "org.apache.hudi.keygen.SimpleKeyGenerator",
    "complex": "org.apache.hudi.keygen.ComplexKeyGenerator",
    "nonpartitioned": "org.apache.hudi.keygen.NonpartitionedKeyGenerator",
    "timestamp": "org.apache.hudi.keygen.TimestampBasedKeyGenerator",
    "custom": "org.apache.hudi.keygen.CustomKeyGenerator",
    "uuid": "org.apache.hudi.keygen.UuidKeyGenerator",
    "global_delete": "org.apache.hudi.keygen.GlobalDeleteKeyGenerator",
}


def hoodie_properties(cfg: TableConfig) -> str:
    """The table config rendered as a reference-format `hoodie.properties`
    (HoodieTableConfig.java:88-190 keys) — written alongside the engine's
    canonical JSON so external Hudi-aware tooling can identify the table."""
    props = {
        "hoodie.table.name": cfg.name,
        "hoodie.table.type": ("MERGE_ON_READ" if cfg.table_type == MOR
                              else "COPY_ON_WRITE"),
        "hoodie.table.version": "5",
        "hoodie.table.recordkey.fields": ",".join(cfg.record_key_fields),
        "hoodie.table.base.file.format": "PARQUET",
        "hoodie.table.log.file.format": "PARQUET",
        "hoodie.table.keygenerator.class":
            _KEYGEN_TO_CLASS.get(cfg.keygen,
                                 _KEYGEN_TO_CLASS["simple"]),
        "hoodie.compaction.payload.class":
            _PAYLOAD_TO_CLASS.get(cfg.payload,
                                  _PAYLOAD_TO_CLASS["overwrite_latest"]),
        "hoodie.datasource.write.hive_style_partitioning":
            str(cfg.hive_style_partitioning).lower(),
        "hoodie.timeline.layout.version": "1",
    }
    if cfg.precombine_field:
        props["hoodie.table.precombine.field"] = cfg.precombine_field
    if cfg.partition_field:
        props["hoodie.table.partition.fields"] = cfg.partition_field
    lines = ["#Updated at write time", "#hudi_0_12_0_my_spark"]
    lines += [f"{k}={v}" for k, v in sorted(props.items())]
    return "\n".join(lines) + "\n"


def save_config(base_path: str, cfg: TableConfig) -> None:
    from . import keygen as kg
    d = cfg.to_dict()
    # Effective keygen SEMANTICS recorded at write time, not just the name:
    # keygen.register() can shadow a builtin name, making the format
    # planner's str(value) bucket/partition addressing silently wrong —
    # datasource.py gates its pruning on these flags (ADVICE r6). Computed
    # fields, not dataclass fields: recomputed on every save, so a stale
    # value can't survive a registration change (see refresh_keygen_flags).
    d["identity_record_key"] = kg.is_identity_record_key(cfg)
    d["identity_partition_source"] = kg.is_identity_partition_source(cfg)
    atomic_write_json(config_path(base_path), d)
    storage = get_storage(base_path)
    storage.atomic_put(os.path.join(base_path, ".hoodie", "hoodie.properties"),
                       hoodie_properties(cfg).encode())


def refresh_keygen_flags(base_path: str, cfg: TableConfig) -> None:
    """Re-persist the identity-semantics flags when they changed since the
    last save — keygen.register() may shadow a builtin name AFTER table
    creation but before a write; the write path calls this so the
    persisted flags always reflect the keygen that actually built the
    keys (writer.prepare)."""
    from . import keygen as kg
    try:
        d = read_json(config_path(base_path))
    except Exception:  # noqa: BLE001 — no config yet; first save covers it
        return
    if (d.get("identity_record_key"), d.get("identity_partition_source")) \
            != (kg.is_identity_record_key(cfg),
                kg.is_identity_partition_source(cfg)):
        save_config(base_path, cfg)


def load_config(base_path: str) -> TableConfig:
    return TableConfig.from_dict(read_json(config_path(base_path)))


def table_exists(base_path: str) -> bool:
    return get_storage(base_path).exists(config_path(base_path))
