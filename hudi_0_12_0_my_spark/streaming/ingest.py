"""Config-driven (multi-table) streaming CDC ingestion — fork parity.

The reason the reference fork exists (SURVEY.md §2.9):
- HoodieFlinkStreamerWithApollo.java:57-138 — one Kafka-JSON topic -> one Hudi
  table, schema from a config center, forced timestamp keygen;
- HoodieMuiltiTableFlinkStreamer.java:60-180 — N topics -> N tables in ONE
  job, per-table JSON config {db, table, fields[], kafka_config, hudi_config};
- SchemaUtils.java:35-108 — config field types varchar/string, decimal(p,s),
  timestamp, int, bigint -> row schema;
- StringToRowDataMapFunction.java:67-130 — JSON string -> typed row with
  I/U/D op -> RowKind mapping;
- schema HOT-RELOAD mid-stream (Apollo change listener blocks in
  MyRowDataToHoodieFunction.java etc.).

Spark-first re-expression: one SparkSession, N Structured Streaming queries.
Each micro-batch re-reads its config file and re-derives the schema before
parsing (`from_json`), so a config edit takes effect on the next batch with
no restart — the per-batch equivalent of the Apollo listener. Kafka sources
use the built-in kafka reader; a JSON-file source covers containers without
a broker (same parse path).
"""

from __future__ import annotations

import io
import json
import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

from .. import payloads
from ..config import MOR
from .sink import stream_write
from ..storage import get_storage

_TYPE_ALIASES = {
    "varchar": T.StringType(), "string": T.StringType(),
    "timestamp": T.TimestampType(), "int": T.IntegerType(),
    "integer": T.IntegerType(), "bigint": T.LongType(),
    "long": T.LongType(), "double": T.DoubleType(),
    "float": T.FloatType(), "boolean": T.BooleanType(),
    "date": T.DateType(),
}


def _parse_type(s: str) -> T.DataType:
    """SchemaUtils.java:35-108 type strings (plus a few natural extensions)."""
    s = s.strip().lower()
    if s.startswith("decimal"):
        inner = s[s.index("(") + 1:s.rindex(")")] if "(" in s else "38,10"
        p, sc = (int(x) for x in inner.split(","))
        return T.DecimalType(p, sc)
    if s.startswith("varchar(") or s.startswith("char("):
        return T.StringType()
    if s in _TYPE_ALIASES:
        return _TYPE_ALIASES[s]
    raise ValueError(f"unsupported config field type: {s!r}")


def schema_from_fields(fields: list[dict]) -> T.StructType:
    """[{"name": ..., "type": ...}, ...] -> StructType."""
    return T.StructType([T.StructField(f["name"], _parse_type(f["type"]))
                         for f in fields])


@dataclass
class TableStreamConfig:
    """One table's ingestion config (HoodieMuiltiTableFlinkStreamer per-table
    JSON: {db, table, fields[], kafka_config, hudi_config})."""
    name: str
    base_path: str
    fields: list = field(default_factory=list)   # [{"name","type"},...]
    record_key_fields: list = field(default_factory=list)
    precombine_field: str | None = None
    partition_field: str | None = None
    partition_style: str = "value"
    keygen_output_format: str = "yyyy-MM-dd"
    table_type: str = "cow"
    payload: str = "overwrite_latest"
    op_col: str | None = "op"                    # CDC I/U/D column (None = plain)
    source: dict = field(default_factory=dict)   # {"format": kafka|json-files, ...}
    config_path: str | None = None               # backing file (hot reload)
    # optional schema provider spec ({"kind": file|registry|hive|jdbc, ...});
    # when set it wins over the inline `fields` list
    # (utilities/schema/SchemaProvider.java family)
    schema_provider: dict | None = None
    # optional catalog sync block ({sync_db, sync_table, metastore_uris...},
    # the fork's per-table hive_sync_config,
    # HoodieMuiltiTableFlinkStreamer.java:186-205): after each committed
    # batch the Spark session catalog is refreshed (sync.SparkCatalogSync)
    hive_sync_config: dict | None = None
    # bad-record quarantine. The fork's map function THROWS on malformed
    # JSON (StringToRowDataMapFunction.java:70 JSON.parseObject), so one
    # poison Kafka message fails the task forever. With a quarantine path
    # set, malformed lines and rows with NULL record keys are diverted to
    # parquet at that path (partitioned by batch id, dynamic overwrite =
    # idempotent under batch replays) and the good rows commit; unset, the
    # batch FAILS on the first bad record (strict fork parity) instead of
    # silently upserting null-keyed rows
    quarantine_path: str | None = None

    @staticmethod
    def from_file(path: str) -> "TableStreamConfig":
        with io.StringIO(get_storage(path).read_bytes(path).decode()) as fh:
            d = json.load(fh)
        known = set(TableStreamConfig.__dataclass_fields__)
        cfg = TableStreamConfig(**{k: v for k, v in d.items() if k in known})
        cfg.config_path = path
        return cfg


def load_stream_configs(config_dir: str) -> list[TableStreamConfig]:
    return [TableStreamConfig.from_file(os.path.join(config_dir, f))
            for f in get_storage(config_dir).listdir(config_dir) if f.endswith(".json")]


def _raw_stream(spark, source: dict) -> DataFrame:
    """Raw stream of JSON strings in a `value` column."""
    fmt = source.get("format", "json-files")
    if fmt == "kafka":
        # JsonKafkaSource.java:48 equivalent; untestable without a broker here
        reader = spark.readStream.format("kafka")
        for k, v in source.get("options", {}).items():
            reader = reader.option(k, v)
        return reader.load().select(F.col("value").cast("string").alias("value"))
    if fmt == "json-files":
        return (spark.readStream.format("text")
                .option("maxFilesPerTrigger",
                        source.get("max_files_per_trigger", 100))
                .load(source["path"])
                .withColumnRenamed("value", "value"))
    raise ValueError(f"unsupported stream source format {fmt!r}")


def _ensure_table(engine, cfg: TableStreamConfig):
    if engine.table_exists(cfg.base_path):
        t = engine.load_table(cfg.base_path)
    else:
        t = engine.create_table(
            cfg.base_path, name=cfg.name,
            record_key_fields=cfg.record_key_fields,
            precombine_field=cfg.precombine_field,
            partition_field=cfg.partition_field,
            partition_style=cfg.partition_style,
            keygen_output_format=cfg.keygen_output_format,
            table_type=cfg.table_type, payload=cfg.payload)
    engine.register_table(cfg.name, cfg.base_path)
    return t


def start_table_stream(engine, cfg: TableStreamConfig, checkpoint_root: str,
                       trigger: dict | None = None, **sink_kwargs):
    """One streaming query: raw JSON strings -> typed rows -> upsert.

    Schema hot-reload: the parse happens inside the per-batch transform, which
    re-reads ``cfg.config_path`` (if set) every batch — a field added to the
    config file is picked up by the NEXT micro-batch, no restart (the fork's
    Apollo-listener behavior, per-batch granularity).
    """
    table = _ensure_table(engine, cfg)
    raw = _raw_stream(engine.spark, cfg.source)

    def parse(batch_df: DataFrame, batch_id: int) -> DataFrame:
        live = cfg
        if cfg.config_path and get_storage(cfg.config_path).exists(cfg.config_path):
            live = TableStreamConfig.from_file(cfg.config_path)
        if live.schema_provider:
            from ..sources.schema_providers import create_schema_provider
            schema = create_schema_provider(
                live.schema_provider, engine.spark).source_schema()
        else:
            schema = schema_from_fields(live.fields)
        if live.op_col:
            schema = schema.add(T.StructField(live.op_col, T.StringType()))
        # PERMISSIVE from_json turns a malformed line into an all-null row;
        # the corrupt-record column is what actually flags it. A valid line
        # missing its record key is just as unwritable (the fork NPEs there)
        corrupt = "_corrupt_record"
        parsed = batch_df.select(
            "value",
            F.from_json("value", schema.add(T.StructField(corrupt, T.StringType())),
                        {"columnNameOfCorruptRecord": corrupt}).alias("r"))
        key_null = F.lit(False)
        for k in live.record_key_fields or cfg.record_key_fields:
            key_null = key_null | F.col(f"r.{k}").isNull()
        reason = (F.when(F.col("r").isNull() |
                         F.col(f"r.{corrupt}").isNotNull(),
                         F.lit("malformed_json"))
                  .when(key_null, F.lit("null_record_key")))
        parsed = parsed.withColumn("_reason", reason)
        bad = parsed.filter(F.col("_reason").isNotNull())
        if live.quarantine_path or cfg.quarantine_path:
            qpath = live.quarantine_path or cfg.quarantine_path
            (bad.select(F.col("value").alias("raw"), "_reason",
                        F.lit(cfg.name).alias("_table"),
                        F.lit(batch_id).alias("_batch_id"))
             .write.mode("overwrite").partitionBy("_batch_id")
             .option("partitionOverwriteMode", "dynamic").parquet(qpath))
        else:
            sample = bad.select("value", "_reason").take(3)
            if sample:
                raise ValueError(
                    f"batch {batch_id} for table {cfg.name!r} has bad "
                    f"records and no quarantine_path is configured; first: "
                    f"{[(r['_reason'], r['value'][:80]) for r in sample]}")
        return (parsed.filter(F.col("_reason").isNull())
                .select("r.*").drop(corrupt))

    if cfg.hive_sync_config is not None and "post_commit" not in sink_kwargs:
        from ..sync import make_post_commit_sync
        sink_kwargs = dict(sink_kwargs,
                           post_commit=make_post_commit_sync(
                               table, cfg.hive_sync_config))
    writer = stream_write(
        table, raw, os.path.join(checkpoint_root, cfg.name),
        cdc_op_col=cfg.op_col, transform=parse, **sink_kwargs)
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.queryName(f"ingest_{cfg.name}").start()


def start_multi_table_ingest(engine, configs, checkpoint_root: str,
                             trigger: dict | None = None, **sink_kwargs):
    """N tables in one job — one streaming query each, shared SparkSession
    (HoodieMuiltiTableFlinkStreamer.java:60-180 equivalent)."""
    if isinstance(configs, str):
        configs = load_stream_configs(configs)
    return [start_table_stream(engine, c, checkpoint_root,
                               trigger=trigger, **sink_kwargs)
            for c in configs]


class ContinuousIngest:
    """Managed continuous-mode ingest loop — HoodieDeltaStreamer continuous
    (HoodieDeltaStreamer.java:94 onward, DeltaSyncService): each ROUND
    ingests everything currently available (one ``availableNow`` pass per
    table ≙ syncOnce), hands due table services (compaction / clustering /
    clean) to a per-table background worker (AsyncCompactService
    equivalent), then waits out the remainder of ``min_sync_interval_sec``
    before the next round. Exactly-once holds across rounds AND crashes:
    every micro-batch rides the sink's batch-id ledger in commit metadata
    (streaming/sink.py:58), so a round replayed after a crash skips batches
    the table already holds.

    Graceful shutdown (onDeltaSyncShutdown): :meth:`request_shutdown` (or
    reaching ``max_rounds``) lets the in-flight round finish, waits for the
    service workers, closes them, and surfaces any service error.

    ``run(max_rounds=N)`` drives the loop on the calling thread; pass
    ``max_rounds=None`` for a true long-lived service (stop it from another
    thread via ``request_shutdown()``).
    """

    def __init__(self, engine, configs, checkpoint_root: str,
                 min_sync_interval_sec: float = 0.0,
                 compact: bool = True, clean: bool = False,
                 cluster: bool = False, cluster_kwargs: dict | None = None,
                 **sink_kwargs):
        import threading
        if isinstance(configs, str):
            configs = load_stream_configs(configs)
        self.engine = engine
        self.configs = list(configs)
        self.checkpoint_root = checkpoint_root
        self.min_sync_interval_sec = min_sync_interval_sec
        self._svc_opts = {"compact": compact, "clean": clean,
                          "cluster": cluster,
                          "cluster_kwargs": cluster_kwargs}
        self.sink_kwargs = sink_kwargs
        self._stop = threading.Event()
        self._services: dict[str, object] = {}
        self.rounds: list[dict] = []

    def request_shutdown(self) -> None:
        """Ask the loop to stop after the in-flight round (graceful)."""
        self._stop.set()

    def _service(self, cfg: TableStreamConfig):
        svc = self._services.get(cfg.name)
        if svc is None:
            from .async_services import AsyncTableServices
            svc = AsyncTableServices(self.engine.load_table(cfg.base_path),
                                     **self._svc_opts)
            self._services[cfg.name] = svc
        return svc

    def _sync_once(self) -> dict:
        import time as _t
        t0 = _t.monotonic()
        queries = []
        for c in self.configs:
            _ensure_table(self.engine, c)
            q = start_table_stream(
                self.engine, c, self.checkpoint_root,
                trigger={"availableNow": True},
                async_services=self._service(c), inline_compact=False,
                **self.sink_kwargs)
            queries.append(q)
        for q in queries:
            q.awaitTermination()
        return {"round": len(self.rounds),
                "duration_sec": _t.monotonic() - t0,
                "tables": [c.name for c in self.configs]}

    def run(self, max_rounds: int | None = None) -> list[dict]:
        """Drive sync rounds until ``max_rounds`` or a shutdown request.
        Returns the per-round stats. Any ingest error stops the loop (the
        reference shuts the service down on a failed sync) after closing
        the service workers; any service error surfaces on close."""
        done = 0                 # per-invocation: run() is re-entrant
        try:
            while not self._stop.is_set() and \
                    (max_rounds is None or done < max_rounds):
                stat = self._sync_once()
                self.rounds.append(stat)
                done += 1
                remaining = self.min_sync_interval_sec - stat["duration_sec"]
                if remaining > 0 and \
                        (max_rounds is None or done < max_rounds):
                    self._stop.wait(remaining)   # interruptible sleep
        finally:
            self.close()
        return self.rounds[-done:] if done else []

    def close(self) -> None:
        """Wait for in-flight service executions and release the workers;
        raises the first service error if one occurred."""
        errs = []
        for svc in self._services.values():
            try:
                svc.wait()
                svc.close()
            except Exception as e:  # noqa: BLE001 — re-raised below
                errs.append(e)
        self._services.clear()
        if errs:
            raise errs[0]


def run_continuous(engine, configs, checkpoint_root: str,
                   min_sync_interval_sec: float = 0.0,
                   max_rounds: int | None = None, **kwargs) -> list[dict]:
    """One-call continuous mode: build a :class:`ContinuousIngest` and run
    it for ``max_rounds`` (None = until shutdown from another thread)."""
    return ContinuousIngest(engine, configs, checkpoint_root,
                            min_sync_interval_sec=min_sync_interval_sec,
                            **kwargs).run(max_rounds=max_rounds)
