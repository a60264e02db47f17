"""Hudi datasource option-string compatibility layer.

The reference's primary user API is option-driven::

    df.write.format("hudi")
      .option("hoodie.datasource.write.recordkey.field", "uuid")
      .option("hoodie.datasource.write.operation", "upsert")
      .mode("append").save(path)
    spark.read.format("hudi")
      .option("hoodie.datasource.query.type", "incremental")
      .option("hoodie.datasource.read.begin.instanttime", t0)
      .load(path)

This module accepts those exact option keys/values
(DataSourceOptions.scala:52-246, KeyGeneratorOptions.java:35-54,
HoodieIndexConfig.java:66-267, HoodieWriteConfig payload/precombine keys) and
dispatches onto the engine's native API, so a reference user's option strings
run unchanged.  It deliberately does NOT route data through a Python
DataSource: writes and reads stay on the engine's JVM-side DataFrame plans —
the option layer only does driver-side dispatch.

Fluent wrappers mirror the reference call shape::

    HudiWriteBuilder(df).options(**opts).mode("append").save(path)
    HudiReadBuilder(spark).options(**opts).load(path)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import config as cfgmod
from .table import LakeTable

# --------------------------------------------------------------- option keys
OPERATION = "hoodie.datasource.write.operation"
TABLE_TYPE = "hoodie.datasource.write.table.type"
TABLE_TYPE_ALT = "hoodie.datasource.write.storage.type"   # withAlternatives
TABLE_NAME = "hoodie.table.name"
RECORDKEY_FIELD = "hoodie.datasource.write.recordkey.field"
PRECOMBINE_FIELD = "hoodie.datasource.write.precombine.field"
PARTITIONPATH_FIELD = "hoodie.datasource.write.partitionpath.field"
HIVE_STYLE = "hoodie.datasource.write.hive_style_partitioning"
URL_ENCODE = "hoodie.datasource.write.partitionpath.urlencode"
PAYLOAD_CLASS = "hoodie.datasource.write.payload.class"
KEYGEN_CLASS = "hoodie.datasource.write.keygenerator.class"
DROP_DUPS = "hoodie.datasource.write.insert.drop.duplicates"
PARTITIONS_TO_DELETE = "hoodie.datasource.write.partitions.to.delete"
INDEX_TYPE = "hoodie.index.type"
BUCKET_ENGINE = "hoodie.index.bucket.engine"
NUM_BUCKETS = "hoodie.bucket.index.num.buckets"
BULK_SORT_MODE = "hoodie.bulkinsert.sort.mode"
TIMESTAMP_TYPE = "hoodie.deltastreamer.keygen.timebased.timestamp.type"
TIMESTAMP_INPUT = "hoodie.deltastreamer.keygen.timebased.input.dateformat"
TIMESTAMP_OUTPUT = "hoodie.deltastreamer.keygen.timebased.output.dateformat"
CLEANER_COMMITS = "hoodie.cleaner.commits.retained"
CLEANER_POLICY = "hoodie.cleaner.policy"
LOCK_PROVIDER = "hoodie.write.lock.provider"
LOCK_EXPIRE = "hoodie.write.lock.filesystem.expire"   # minutes, 0 = never
# HoodiePreCommitValidatorConfig.java:43-71
VALIDATOR_CLASSES = "hoodie.precommit.validators"
VALIDATOR_EQUALITY_SQL = "hoodie.precommit.validators.equality.sql.queries"
VALIDATOR_SINGLE_VALUE_SQL = "hoodie.precommit.validators.single.value.sql.queries"
VALIDATOR_INEQUALITY_SQL = "hoodie.precommit.validators.inequality.sql.queries"
BASE_FILE_FORMAT = "hoodie.table.base.file.format"

QUERY_TYPE = "hoodie.datasource.query.type"
QUERY_TYPE_ALT = "hoodie.datasource.view.type"
BEGIN_INSTANTTIME = "hoodie.datasource.read.begin.instanttime"
END_INSTANTTIME = "hoodie.datasource.read.end.instanttime"
AS_OF_INSTANT = "as.of.instant"
INCREMENTAL_FORMAT = "hoodie.datasource.query.incremental.format"

_PAYLOAD_CLASSES = {
    # java class name (DataSourceOptions PAYLOAD_CLASS values) -> SPECS key
    "org.apache.hudi.common.model.OverwriteWithLatestAvroPayload": "overwrite_latest",
    "org.apache.hudi.common.model.DefaultHoodieRecordPayload": "default",
    "org.apache.hudi.common.model.OverwriteNonDefaultsWithLatestAvroPayload": "overwrite_non_defaults",
    "org.apache.hudi.common.model.PartialUpdateAvroPayload": "partial_update",
    # EmptyHoodieRecordPayload.java: combineAndGetUpdateValue/getInsertValue
    # both return Option.empty — every record is a delete, not an upsert
    "org.apache.hudi.common.model.EmptyHoodieRecordPayload": "empty",
    "org.apache.hudi.common.model.HoodieAvroPayload": "overwrite_latest",
    "org.apache.hudi.common.model.ValidateDuplicateKeyPayload": "validate_dup",
}

_KEYGEN_CLASSES = {
    "org.apache.hudi.keygen.SimpleKeyGenerator": "simple",
    "org.apache.hudi.keygen.ComplexKeyGenerator": "complex",
    "org.apache.hudi.keygen.NonpartitionedKeyGenerator": "nonpartitioned",
    "org.apache.hudi.keygen.TimestampBasedKeyGenerator": "timestamp",
    "org.apache.hudi.keygen.TimestampBasedAvroKeyGenerator": "timestamp",
    "org.apache.hudi.keygen.CustomKeyGenerator": "custom",
    "org.apache.hudi.keygen.CustomAvroKeyGenerator": "custom",
    "org.apache.hudi.keygen.UuidKeyGenerator": "uuid",
    "org.apache.hudi.keygen.GlobalDeleteKeyGenerator": "global_delete",
    "org.apache.hudi.keygen.GlobalAvroDeleteKeyGenerator": "global_delete",
}


def _short(name: str) -> str:
    return name.rsplit(".", 1)[-1]


def _bool(v) -> bool:
    return str(v).strip().lower() in ("true", "1", "yes")


def options_to_config(options: dict) -> dict:
    """Translate hoodie.* write options into TableConfig kwargs
    (HoodieTableConfig / HoodieWriteConfig equivalents)."""
    kw: dict = {}
    if TABLE_NAME in options:
        kw["name"] = options[TABLE_NAME]
    ttype = options.get(TABLE_TYPE, options.get(TABLE_TYPE_ALT))
    if ttype is not None:
        t = str(ttype).upper()
        if t in ("COPY_ON_WRITE", "COW"):
            kw["table_type"] = cfgmod.COW
        elif t in ("MERGE_ON_READ", "MOR"):
            kw["table_type"] = cfgmod.MOR
        else:
            raise ValueError(f"unknown {TABLE_TYPE}={ttype!r}")
    if RECORDKEY_FIELD in options:
        kw["record_key_fields"] = [c.strip() for c in
                                   str(options[RECORDKEY_FIELD]).split(",")]
    if PRECOMBINE_FIELD in options:
        kw["precombine_field"] = options[PRECOMBINE_FIELD]
    if PARTITIONPATH_FIELD in options:
        # CustomKeyGenerator "field:simple,field:timestamp" specs pass through;
        # keygen.py parses the colon syntax (CustomAvroKeyGenerator.java:71).
        kw["partition_field"] = options[PARTITIONPATH_FIELD] or None
    if HIVE_STYLE in options:
        kw["hive_style_partitioning"] = _bool(options[HIVE_STYLE])
    if URL_ENCODE in options:
        kw["partition_urlencode"] = _bool(options[URL_ENCODE])
    if PAYLOAD_CLASS in options:
        from . import payloads
        cls = str(options[PAYLOAD_CLASS])
        payload = _PAYLOAD_CLASSES.get(cls) or _PAYLOAD_CLASSES.get(
            next((k for k in _PAYLOAD_CLASSES if _short(k) == cls), ""))
        if payload is None and cls in payloads.SPECS:   # native SPECS keys too
            payload = cls
        if payload is None:
            raise ValueError(f"unknown payload class {cls!r}")
        kw["payload"] = payload
    if KEYGEN_CLASS in options:
        cls = options[KEYGEN_CLASS]
        gen = _KEYGEN_CLASSES.get(cls) or _KEYGEN_CLASSES.get(
            next((k for k in _KEYGEN_CLASSES if _short(k) == cls), ""))
        if gen is None:
            raise ValueError(f"unknown keygenerator class {cls!r}")
        kw["keygen"] = gen
    if TIMESTAMP_TYPE in options:
        t = str(options[TIMESTAMP_TYPE]).upper()
        unit = {"EPOCHMILLISECONDS": "epochms", "UNIX_TIMESTAMP": "epochsec",
                "SCALAR": "epochsec", "DATE_STRING": "date_string",
                "MIXED": "mixed", "TIMESTAMP": "timestamp"}.get(t)
        if unit is None:
            raise ValueError(f"unknown timestamp type {t!r}")
        kw["keygen_timestamp_unit"] = unit
    if TIMESTAMP_INPUT in options:
        kw["keygen_input_format"] = options[TIMESTAMP_INPUT]
    if TIMESTAMP_OUTPUT in options:
        kw["keygen_output_format"] = options[TIMESTAMP_OUTPUT]
    if INDEX_TYPE in options:
        t = str(options[INDEX_TYPE]).upper()
        if t in ("SIMPLE",):
            kw["index_type"] = "simple"
        elif t in ("GLOBAL_SIMPLE",):
            kw["index_type"], kw["global_index"] = "simple", True
        elif t == "BLOOM":
            kw["index_type"], kw["bloom_index_enabled"] = "simple", True
        elif t == "GLOBAL_BLOOM":
            kw["index_type"] = "simple"
            kw["bloom_index_enabled"] = kw["global_index"] = True
        elif t == "BUCKET":
            engine = str(options.get(BUCKET_ENGINE, "SIMPLE")).upper()
            kw["index_type"] = ("bucket_consistent"
                                if engine == "CONSISTENT_HASHING" else "bucket")
        elif t == "INMEMORY":
            kw["index_type"] = "inmemory"
        else:
            raise ValueError(f"unsupported {INDEX_TYPE}={t!r} (HBASE needs an "
                             "external system)")
    if NUM_BUCKETS in options:
        kw["num_buckets"] = int(options[NUM_BUCKETS])
    if CLEANER_COMMITS in options:
        kw["cleaner_retain_commits"] = int(options[CLEANER_COMMITS])
    if CLEANER_POLICY in options:
        kw["cleaner_policy"] = str(options[CLEANER_POLICY])
    if BASE_FILE_FORMAT in options:
        # HoodieTableConfig BASE_FILE_FORMAT (HoodieFileFormat.java)
        fmt = str(options[BASE_FILE_FORMAT]).lower()
        if fmt not in ("parquet", "orc"):
            raise ValueError(f"unsupported {BASE_FILE_FORMAT}={fmt!r} "
                             "(HFILE is the HBase metadata format, out of "
                             "scope)")
        kw["base_format"] = fmt
    if LOCK_PROVIDER in options:
        # transaction/lock/ java classes -> locks.py registry keys; an
        # unrecognized value passes through as a dotted Python path
        java = {"FileSystemBasedLockProvider": "filesystem",
                "InProcessLockProvider": "inprocess",
                "DynamoDBBasedLockProvider": "conditional_put",
                "ZookeeperBasedLockProvider": None}
        short = str(options[LOCK_PROVIDER]).rsplit(".", 1)[-1]
        mapped = java.get(short, str(options[LOCK_PROVIDER]))
        if mapped is None:
            raise ValueError(f"{LOCK_PROVIDER}={options[LOCK_PROVIDER]!r} "
                             "needs an external ZooKeeper ensemble (out of "
                             "scope); use filesystem/inprocess or a "
                             "conditional_put subclass")
        kw["lock_provider"] = mapped
    if LOCK_EXPIRE in options:
        kw["lock_expire_sec"] = float(options[LOCK_EXPIRE]) * 60.0
    if VALIDATOR_CLASSES in options:
        # class list -> {"kind", "queries"} specs; each configured class pulls
        # its queries from its own key (HoodiePreCommitValidatorConfig)
        kinds = {"SqlQueryEqualityPreCommitValidator":
                     ("equality", VALIDATOR_EQUALITY_SQL),
                 "SqlQueryInequalityPreCommitValidator":
                     ("inequality", VALIDATOR_INEQUALITY_SQL),
                 "SqlQuerySingleResultPreCommitValidator":
                     ("single_value", VALIDATOR_SINGLE_VALUE_SQL)}
        specs = []
        for cls in str(options[VALIDATOR_CLASSES]).split(","):
            cls = cls.strip()
            if not cls:
                continue
            kind_key = kinds.get(_short(cls))
            if kind_key is None:
                raise ValueError(f"unknown pre-commit validator class {cls!r}")
            kind, qkey = kind_key
            specs.append({"kind": kind, "queries": str(options.get(qkey, ""))})
        kw["precommit_validators"] = specs
    return kw


def write_hudi(df: DataFrame, path: str, options: dict | None = None,
               mode: str = "append") -> LakeTable:
    """df.write.format("hudi") equivalent: create-if-absent then dispatch on
    hoodie.datasource.write.operation (DataSourceOptions.scala:207-216,
    HoodieSparkSqlWriter.scala write() dispatch)."""
    options = dict(options or {})
    op = str(options.get(OPERATION, "upsert")).lower()
    # EmptyHoodieRecordPayload as a per-write option: every record resolves
    # to empty (delete) — route the write through the delete path instead of
    # letting the table's stored payload turn it into a normal upsert
    if (_PAYLOAD_CLASSES.get(str(options.get(PAYLOAD_CLASS))) == "empty"
            and op in ("upsert", "insert", "bulk_insert", "delete")):
        op = "delete"
    spark = df.sparkSession
    exists = cfgmod.table_exists(path)
    mode_l = mode.lower()
    if mode_l == "overwrite" and exists:
        t = LakeTable(spark, path)
        if op == "insert_overwrite":
            # explicit partition-scoped overwrite stays partition-scoped
            # (reference only re-creates the table for the other operations)
            t.insert_overwrite(df)
        else:
            # reference: mode=Overwrite re-creates the table
            # (HoodieSparkSqlWriter deletes basePath); same-config equivalent
            t.insert_overwrite_table(df)
        return t
    if not exists:
        kw = options_to_config(options)
        name = kw.pop("name", None)
        t = LakeTable.create(spark, path, name=name, **kw)
    else:
        if mode_l in ("error", "errorifexists"):
            raise FileExistsError(f"table exists at {path} (mode={mode})")
        if mode_l == "ignore":
            return LakeTable(spark, path)   # SaveMode.Ignore: no-op
        t = LakeTable(spark, path)
    if op == "upsert":
        t.upsert(df)
    elif op == "insert":
        # INSERT_DROP_DUPS drops incoming rows whose key already exists
        # (HoodieWriteHelper tag+filter), it does NOT raise
        t.insert(df, drop_duplicates=_bool(options.get(DROP_DUPS, False)))
    elif op == "bulk_insert":
        t.bulk_insert(df, sort_mode=str(options.get(BULK_SORT_MODE,
                                                    "GLOBAL_SORT")).upper())
    elif op == "delete":
        # reference builds HoodieKey(record key, partition path) from the
        # incoming rows and ignores the data columns
        # (HoodieSparkSqlWriter.scala DELETE branch); project the key fields so
        # the engine's semi-join matches on keys, not full rows
        from .keygen import _partition_specs
        cols = list(t.cfg.record_key_fields)
        if not t.cfg.global_index:
            pfields = [f for f, _ in _partition_specs(t.cfg)]
            missing = [f for f in pfields if f not in df.columns]
            if missing:
                # non-global delete is partition-scoped (HoodieKey needs the
                # partition path); deleting on key alone would over-delete
                # across partitions — reference keygen would fail the same way
                raise ValueError(
                    f"delete on a non-global-index table requires the "
                    f"partition source column(s) {missing}; only a global "
                    f"index deletes by key alone")
            cols += [f for f in pfields if f not in cols]
        t.delete(keys_df=df.select(*cols))
    elif op == "delete_partition":
        parts = options.get(PARTITIONS_TO_DELETE)
        if parts:
            vals = [p.strip() for p in str(parts).split(",")]
        else:   # reference: derive partitions from the incoming rows
            from .keygen import partition_path_expr
            vals = [r[0] for r in df.select(
                partition_path_expr(t.cfg, df)).distinct().collect()]
        t.delete_partition(vals)
    elif op == "insert_overwrite":
        t.insert_overwrite(df)
    elif op == "insert_overwrite_table":
        t.insert_overwrite_table(df)
    else:
        raise ValueError(f"unknown {OPERATION}={op!r}")
    return t


def read_hudi(spark: SparkSession, path: str,
              options: dict | None = None) -> DataFrame:
    """spark.read.format("hudi") equivalent: dispatch on
    hoodie.datasource.query.type (DefaultSource.scala:112-146)."""
    options = dict(options or {})
    t = LakeTable(spark, path)
    qt = str(options.get(QUERY_TYPE, options.get(QUERY_TYPE_ALT,
                                                 "snapshot"))).lower()
    if qt == "realtime":        # legacy view.type value -> snapshot
        qt = "snapshot"
    if qt == "snapshot" and AS_OF_INSTANT in options:
        return t.time_travel(str(options[AS_OF_INSTANT]))
    if qt == "snapshot":
        return t.snapshot()
    if qt == "read_optimized":
        return t.read_optimized()
    if qt == "incremental":
        begin = options.get(BEGIN_INSTANTTIME)
        end = options.get(END_INSTANTTIME)
        if str(options.get(INCREMENTAL_FORMAT, "latest_state")).lower() == "cdc":
            return t.incremental_cdc(begin, end)
        return t.incremental(begin, end)
    raise ValueError(f"unknown {QUERY_TYPE}={qt!r}")


class HudiWriteBuilder:
    """Fluent shape of DataFrameWriter for drop-in-looking call sites."""

    def __init__(self, df: DataFrame):
        self._df, self._opts, self._mode = df, {}, "append"

    def option(self, k: str, v) -> "HudiWriteBuilder":
        self._opts[k] = v
        return self

    def options(self, **kw) -> "HudiWriteBuilder":
        self._opts.update(kw)
        return self

    def mode(self, m: str) -> "HudiWriteBuilder":
        self._mode = m
        return self

    def save(self, path: str) -> LakeTable:
        return write_hudi(self._df, path, self._opts, mode=self._mode)


class HudiReadBuilder:
    def __init__(self, spark: SparkSession):
        self._spark, self._opts = spark, {}

    def option(self, k: str, v) -> "HudiReadBuilder":
        self._opts[k] = v
        return self

    def options(self, **kw) -> "HudiReadBuilder":
        self._opts.update(kw)
        return self

    def load(self, path: str) -> DataFrame:
        return read_hudi(self._spark, path, self._opts)
