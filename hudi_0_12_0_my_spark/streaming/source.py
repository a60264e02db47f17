"""Hudi table as a Structured Streaming source.

Re-expression of HoodieStreamSource.scala:50,130-144,157: stream offsets are
commit instant times; each micro-batch is the incremental query over the
instant range (start, end]. Implemented with Spark 4's Python Data Source API
(pyspark.sql.datasource) so it plugs into readStream natively:

    register_stream_source(spark)
    df = (spark.readStream.format("hudi_stream")
          .option("path", table_base_path).load())

Rows carry the business columns plus `_hoodie_commit_time` (useful for
downstream watermarking/audit). Workers read parquet with pyarrow directly —
no SparkSession exists executor-side — and filter rows to the offset range,
which keeps COW bystander rows (rewritten but unchanged) out of the batch,
matching IncrementalRelation.scala:199-204 semantics.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql.datasource import (DataSource, DataSourceReader,
                                    DataSourceStreamReader, InputPartition)
from pyspark.sql.types import StructType

COMMIT_TIME = "_hoodie_commit_time"
WRITE_ACTIONS = ("commit", "deltacommit", "replacecommit")


def _timeline_dir(base_path: str) -> str:
    return os.path.join(base_path, ".hoodie", "timeline")


def _completed_write_instants(base_path: str) -> list[str]:
    """Instant times of completed write commits, sorted (no package imports —
    this runs inside pickled driver-side reader methods)."""
    d = _timeline_dir(base_path)
    if not os.path.isdir(d):
        return []
    out = []
    for f in os.listdir(d):
        parts = f.split(".")
        if len(parts) == 2 and parts[1] in WRITE_ACTIONS:
            out.append(parts[0])
    return sorted(out)


def _archived_write_entries(base_path: str) -> list[tuple[str, dict]]:
    """(instant, metadata) of archived write commits — a change pull whose
    range predates the archive boundary must still enumerate their files
    (same fix as Table.incremental; HoodieArchivedTimeline parity)."""
    adir = os.path.join(base_path, ".hoodie", "archived")
    if not os.path.isdir(adir):
        return []
    out = []
    for f in os.listdir(adir):
        if not f.endswith(".json"):
            continue
        with open(os.path.join(adir, f)) as fh:
            for e in json.load(fh):
                if e.get("action") in WRITE_ACTIONS:
                    out.append((e["time"], e.get("metadata") or {}))
    out.sort(key=lambda x: x[0])
    return out


def _instant_metadata(base_path: str, instant: str) -> dict:
    d = _timeline_dir(base_path)
    for action in WRITE_ACTIONS:
        p = os.path.join(d, f"{instant}.{action}")
        if os.path.exists(p):
            with open(p) as fh:
                return json.load(fh)
    return {}


def _rename_map(base_path: str) -> dict:
    """final_name -> [older physical names, newest first] from the table
    config's column_renames (writer.rename_chains parity, duplicated here
    because this module deliberately has no package-internal imports):
    files written before an ALTER TABLE RENAME must surface their values
    under the CURRENT name in change batches, not NULLs."""
    try:
        p = os.path.join(base_path, ".hoodie", "table_config.json")
        with open(p) as fh:
            renames = (json.load(fh) or {}).get("column_renames") or []
    except (OSError, ValueError):
        return {}
    chains: dict = {}
    for r in renames:
        olds = chains.pop(r["from"], [])
        chains[r["to"]] = [r["from"]] + olds
    return chains


@dataclass
class _FilesPartition(InputPartition):
    paths: list
    begin: str
    end: str


class HudiStreamReader(DataSourceStreamReader):
    def __init__(self, schema: StructType, options: dict):
        self.base_path = options.get("path")
        if not self.base_path:
            raise ValueError("hudi_stream requires .option('path', <table dir>)")
        self.start_instant = options.get("startinstant", "")
        self._schema = schema
        self.files_per_partition = int(options.get("filesperpartition", "4"))
        self._renames = _rename_map(self.base_path)

    def initialOffset(self) -> dict:
        return {"instant": self.start_instant}

    def latestOffset(self) -> dict:
        instants = _completed_write_instants(self.base_path)
        return {"instant": instants[-1] if instants else self.start_instant}

    def partitions(self, start: dict, end: dict):
        return _range_partitions(self.base_path, start.get("instant", ""),
                                 end.get("instant", ""),
                                 self.files_per_partition)

    def read(self, partition: _FilesPartition):
        yield from _change_batches(self._schema, partition, self._renames)

    def commit(self, end: dict) -> None:
        pass


def _change_batches(schema: StructType, partition: _FilesPartition,
                    renames: dict | None = None):
    """Arrow batches of change rows for one file-list partition (shared by
    the stream reader and the batch reader; runs in the Python worker, so
    pyarrow only — no SparkSession exists executor-side)."""
    import pyarrow.parquet as pq

    want = [f.name for f in schema.fields]
    for path in partition.paths:
        if not os.path.exists(path):   # cleaned/rolled back afterwards
            continue
        tbl = pq.read_table(path)
        cols = set(tbl.column_names)
        if COMMIT_TIME in cols:
            import pyarrow.compute as pc
            m = pc.and_(
                pc.greater(tbl[COMMIT_TIME], partition.begin),
                pc.less_equal(tbl[COMMIT_TIME], partition.end))
            tbl = tbl.filter(m)
        # drop tombstones (mirrors payloads.is_tombstone): COW carries a
        # business _hoodie_is_deleted marker; MOR delta files persist
        # deletes as _hoodie_operation='D' rows
        if "_hoodie_is_deleted" in cols:
            import pyarrow.compute as pc
            alive = pc.fill_null(
                pc.invert(tbl["_hoodie_is_deleted"].cast("bool")), True)
            tbl = tbl.filter(alive)
        if "_hoodie_operation" in cols:
            import pyarrow.compute as pc
            alive = pc.fill_null(
                pc.not_equal(tbl["_hoodie_operation"], "D"), True)
            tbl = tbl.filter(alive)
        missing = [c for c in want if c not in tbl.column_names]
        if missing:
            import pyarrow as pa
            for c in missing:
                # rename replay: a file written pre-rename carries the
                # value under the old physical name
                src = next((o for o in (renames or {}).get(c, ())
                            if o in tbl.column_names), None)
                tbl = tbl.append_column(c, tbl[src]) if src else \
                    tbl.append_column(c, pa.nulls(len(tbl)))
        tbl = tbl.select(want)
        # exact arrow schema Spark expects (parquet may differ in
        # timestamp tz flavor / nullability -> ArrowInvalid otherwise)
        from pyspark.sql.pandas.types import to_arrow_schema
        target = to_arrow_schema(schema)
        yield from tbl.cast(target).to_batches()


def _range_partitions(base_path: str, lo: str, hi: str,
                      files_per_partition: int) -> list:
    paths = []
    entries = _archived_write_entries(base_path) + \
        [(ins, None) for ins in _completed_write_instants(base_path)]
    for ins, md in entries:
        if lo < ins <= hi:
            if md is None:
                md = _instant_metadata(base_path, ins)
            for stats in (md.get("partition_to_write_stats") or {}).values():
                for st in stats:
                    paths.append(os.path.join(base_path, st["path"]))
    if not paths:
        return []
    n = files_per_partition
    return [_FilesPartition(paths[i:i + n], lo, hi)
            for i in range(0, len(paths), n)]


class HudiBatchChangesReader(DataSourceReader):
    """Batch flavor of the same change feed: all change rows with
    begininstant < _hoodie_commit_time <= endinstant (endinstant defaults to
    the latest commit). NOTE these are RAW change rows — per-key payload
    resolution is the library reader's job (`Table.incremental`); this
    format exists so external Spark jobs can pull increments through
    `spark.read.format("hudi_stream")` without importing the package."""

    def __init__(self, schema: StructType, options: dict):
        self.base_path = options.get("path")
        if not self.base_path:
            raise ValueError("hudi_stream requires .option('path', <table dir>)")
        self.begin = options.get("begininstant", "")
        instants = _completed_write_instants(self.base_path)
        self.end = options.get("endinstant") or \
            (instants[-1] if instants else "")
        self._schema = schema
        self.files_per_partition = int(options.get("filesperpartition", "4"))
        self._renames = _rename_map(self.base_path)

    def partitions(self):
        parts = _range_partitions(self.base_path, self.begin, self.end,
                                  self.files_per_partition)
        # the API requires at least one partition; an empty range yields an
        # empty file list, which _change_batches turns into zero batches
        return parts or [_FilesPartition([], self.begin, self.end)]

    def read(self, partition: _FilesPartition):
        yield from _change_batches(self._schema, partition, self._renames)


class HudiStreamDataSource(DataSource):
    """spark.readStream.format("hudi_stream").option("path", ...)."""

    @classmethod
    def name(cls) -> str:
        return "hudi_stream"

    def schema(self):
        base_path = self.options.get("path")
        cfg_path = os.path.join(base_path, ".hoodie", "table_config.json")
        with open(cfg_path) as fh:
            cfg = json.load(fh)
        if not cfg.get("schema_json"):
            raise ValueError(f"table at {base_path} has no committed schema yet")
        schema = StructType.fromJson(json.loads(cfg["schema_json"]))
        names = {f.name for f in schema.fields}
        out = StructType([f for f in schema.fields])
        if COMMIT_TIME not in names:
            from pyspark.sql.types import StringType, StructField
            out = out.add(StructField(COMMIT_TIME, StringType()))
        return out

    def streamReader(self, schema: StructType):
        return HudiStreamReader(schema, dict(self.options))

    def reader(self, schema: StructType):
        return HudiBatchChangesReader(schema, dict(self.options))


def register_stream_source(spark) -> None:
    """Register the source AND ship the package to Python workers.

    The datasource class is pickled by reference, so executors must be able
    to import this package; a zip via addPyFile covers both local mode with
    a driver running outside the repo and real clusters (--py-files
    equivalent)."""
    import sys
    try:
        # this module deliberately has no package-internal imports, so it can
        # be shipped by VALUE: neither the planner's python worker nor the
        # executors then need the package installed
        from pyspark import cloudpickle
        cloudpickle.register_pickle_by_value(sys.modules[__name__])
    except Exception:  # noqa: BLE001 — fall back to by-reference pickling
        pass
    spark.dataSource.register(HudiStreamDataSource)
