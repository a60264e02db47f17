"""``spark.read.format("hudi")`` — the reference quickstart surface.

Re-expression of the batch read side of hudi-spark-datasource
(DefaultSource.scala / DataSourceReadOptions: ``hoodie.datasource.query.type``
snapshot | read_optimized | incremental, ``as.of.instant`` time travel,
``hoodie.datasource.read.begin/end.instanttime``) with Spark 4's Python Data
Source API, so external Spark jobs can read a table WITHOUT importing this
package:

    register_hudi_format(spark)        # or just construct Engine(spark)
    df = spark.read.format("hudi").load(table_base_path)
    inc = (spark.read.format("hudi")
           .option("hoodie.datasource.query.type", "incremental")
           .option("hoodie.datasource.read.begin.instanttime", t0)
           .load(table_base_path))

Architecture: the planner side folds the timeline into file slices with a
STANDALONE re-implementation of fsview._fold (this module deliberately has
no package-internal imports, so cloudpickle ships it by value — neither the
planner's python worker nor the executors need the package installed); the
executor side reads parquet with pyarrow and resolves the per-key winner
with an arrow-native sort + group-boundary mask that replays
payloads.resolve's ordering exactly (ordering fields desc, nulls last,
COMMIT_SEQNO string tiebreak).

Scope, stated honestly:
- Payloads with per-row resolution semantics a worker can replay
  (overwrite_latest / default / event_time / validate_dup). column-merge,
  always-delete and register()ed custom payloads raise with a pointer to
  the library API, which is also the FAST path (JVM parquet scan +
  Catalyst merge) — this format trades throughput for zero-import compat.
- Column RENAME history is not replayed (files written before a rename
  surface NULLs for the new name); use the library reader on tables with
  rename evolution. Type widening and added/dropped columns work (each
  file casts to the evolved schema).
- MOR snapshot merges base + delta per file group; bootstrap bases get
  NULL meta columns (single-version groups, so resolution is unaffected).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

from pyspark.sql.datasource import (DataSource, DataSourceReader,
                                    InputPartition)
from pyspark.sql.types import StringType, StructField, StructType

COMMIT_TIME = "_hoodie_commit_time"
COMMIT_SEQNO = "_hoodie_commit_seqno"
RECORD_KEY = "_hoodie_record_key"
PARTITION_PATH = "_hoodie_partition_path"
FILE_NAME = "_hoodie_file_name"
OPERATION = "_hoodie_operation"
DELETE_MARKER = "_hoodie_is_deleted"
META5 = [COMMIT_TIME, COMMIT_SEQNO, RECORD_KEY, PARTITION_PATH, FILE_NAME]
WRITE_ACTIONS = ("commit", "deltacommit", "replacecommit")

# payload -> per-row resolution the worker can replay (payloads.SPECS
# equivalents); anything else needs the library reader
_EVENT_TIME_ORDERED = {"default", "event_time"}
_SIMPLE = {"overwrite_latest", "validate_dup"} | _EVENT_TIME_ORDERED


def _read_cfg(base_path: str) -> dict:
    with open(os.path.join(base_path, ".hoodie", "table_config.json")) as fh:
        return json.load(fh)


def _timeline_entries(base_path: str) -> list[tuple[str, str, dict]]:
    """(instant, action, metadata) for every completed instant, archived
    first, sorted by instant — the stream the fold consumes."""
    out = []
    adir = os.path.join(base_path, ".hoodie", "archived")
    if os.path.isdir(adir):
        for f in os.listdir(adir):
            if f.endswith(".json"):
                with open(os.path.join(adir, f)) as fh:
                    for e in json.load(fh):
                        out.append((e["time"], e.get("action", ""),
                                    e.get("metadata") or {}))
    tdir = os.path.join(base_path, ".hoodie", "timeline")
    if os.path.isdir(tdir):
        for f in os.listdir(tdir):
            parts = f.split(".")
            if len(parts) != 2:          # requested/inflight: not completed
                continue
            with open(os.path.join(tdir, f)) as fh:
                md = json.load(fh)
            out.append((parts[0], parts[1], md))
    out.sort(key=lambda x: x[0])
    return out


@dataclass
class _Slice:
    base_instant: str
    base: str | None = None              # relative path
    deltas: list = field(default_factory=list)   # [(instant, rel_path)]
    base_stats: dict = field(default_factory=dict)  # {col: {min,max,nulls}}


@dataclass
class _Group:
    slices: list = field(default_factory=list)
    replaced_at: str | None = None

    def latest(self, as_of: str | None) -> _Slice | None:
        live = [s for s in self.slices
                if (as_of is None or s.base_instant <= as_of)
                and s.base is not None]
        return live[-1] if live else None


def _fold(entries, as_of: str | None):
    """Standalone replay of fsview._fold (fsview.py:136): base files open
    slices, deltas attach to the latest slice at/below their instant,
    replacecommits retire groups, cleans remove files physically gone
    regardless of as_of."""
    groups: dict = {}
    earliest_retained = None

    def grp(p, fid) -> _Group:
        return groups.setdefault((p, fid), _Group())

    for instant, action, md in entries:
        if action in WRITE_ACTIONS:
            if as_of is not None and instant > as_of:
                continue
            for p, stats in (md.get("partition_to_write_stats") or {}).items():
                for st in stats:
                    g = grp(p, st["file_id"])
                    if st.get("kind", "base") == "base":
                        g.slices.append(_Slice(instant, st["path"],
                                               base_stats=st.get("col_stats")
                                               or {}))
                        g.slices.sort(key=lambda s: s.base_instant)
                    else:
                        target = None
                        for s in g.slices:
                            if s.base_instant <= instant:
                                target = s
                        if target is None:      # log-only group
                            target = _Slice(instant, None)
                            g.slices.append(target)
                            g.slices.sort(key=lambda s: s.base_instant)
                        target.deltas.append((instant, st["path"]))
            for p, fids in (md.get("replaced_file_groups") or {}).items():
                for fid in fids:
                    grp(p, fid).replaced_at = instant
        elif action == "clean":
            removed = set()
            for paths in (md.get("removed_files") or {}).values():
                removed.update(paths)
            er = md.get("earliest_retained_instant")
            if er and (earliest_retained is None or er > earliest_retained):
                earliest_retained = er
            for g in groups.values():
                for s in list(g.slices):
                    if s.base is not None and s.base in removed:
                        g.slices.remove(s)
                    else:
                        s.deltas = [(i, d) for i, d in s.deltas
                                    if d not in removed]
    if as_of is not None and earliest_retained and as_of < earliest_retained:
        raise ValueError(
            f"time-travel to {as_of} impossible: cleaner retained only "
            f">= {earliest_retained} (HoodieCleaningPolicy)")
    return groups


@dataclass
class _SlicePartition(InputPartition):
    base: str | None                    # absolute path
    deltas: list                        # absolute paths
    merge: bool
    lo: str | None = None               # incremental: commit_time range
    hi: str | None = None


class HudiBatchReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.base_path = options.get("path")
        if not self.base_path:
            raise ValueError("hudi format requires .load(<table dir>) or "
                             ".option('path', <table dir>)")
        cfg = _read_cfg(self.base_path)
        payload = cfg.get("payload", "overwrite_latest")
        if payload not in _SIMPLE:
            raise NotImplementedError(
                f"format('hudi') cannot replay payload {payload!r} "
                "executor-side; read through the library API "
                "(Table.snapshot / incremental) instead")
        self.qtype = options.get("hoodie.datasource.query.type", "snapshot")
        self.as_of = options.get("as.of.instant")
        self.begin = options.get("hoodie.datasource.read.begin.instanttime")
        self.end = options.get("hoodie.datasource.read.end.instanttime")
        self._schema = schema
        pre = cfg.get("precombine_field")
        if payload in _EVENT_TIME_ORDERED and pre:
            ordering = [pre, COMMIT_TIME]
        else:
            ordering = [COMMIT_TIME] + ([pre] if pre else [])
        self.ordering = ordering + [COMMIT_SEQNO]
        self.key_fields = [RECORD_KEY] if cfg.get("global_index") \
            else [PARTITION_PATH, RECORD_KEY]
        # executor-side cast/concat target: output schema + the merge
        # machinery columns (ordering extras + tombstone markers)
        extra = StructType(self._schema.fields.copy())
        names = set(self._schema.fieldNames())
        for c in self.ordering + [OPERATION, DELETE_MARKER]:
            if c not in names:
                extra = extra.add(StructField(c, StringType()))
                names.add(c)
        self.extended = extra

    def _abs(self, rel: str) -> str:
        return os.path.join(self.base_path, rel)

    def pushFilters(self, filters):
        """Data skipping from the commit-metadata column stats (the same
        min/max/null footer stats the library's HoodieFileIndex-equivalent
        uses): supported predicates prune whole FILES in partitions() —
        but only for delta-free slices, because a delta row may carry
        values outside its base file's range AND pruning a newer version's
        file could promote a stale row past the merge. ALL filters are
        returned as unhandled, so Spark still applies them row-level —
        pruning can only skip files, never change results."""
        from pyspark.sql import datasource as dsf
        preds = []
        for f in filters:
            attr = getattr(f, "attribute", None)
            if not attr or len(attr) != 1:      # nested paths: ignore
                continue
            col = attr[0]
            if isinstance(f, dsf.EqualTo):
                preds.append((col, "ge", f.value))
                preds.append((col, "le", f.value))
            elif isinstance(f, (dsf.GreaterThan, dsf.GreaterThanOrEqual)):
                preds.append((col, "ge", f.value))
            elif isinstance(f, (dsf.LessThan, dsf.LessThanOrEqual)):
                preds.append((col, "le", f.value))
            elif isinstance(f, dsf.In):
                vs = list(f.value)
                if vs:
                    preds.append((col, "ge", min(vs)))
                    preds.append((col, "le", max(vs)))
        self._stat_preds = preds
        return filters                           # Spark re-applies everything

    def _stats_exclude(self, stats: dict) -> bool:
        """True when the column stats PROVE no row of the file can satisfy
        the pushed predicates. Conservative: any missing stat, type
        mismatch, or failed comparison keeps the file."""
        for col, op, v in getattr(self, "_stat_preds", ()):
            cs = stats.get(col)
            if not cs:
                continue
            lo, hi = cs.get("min"), cs.get("max")
            try:
                if op == "ge" and hi is not None and hi < v:
                    return True      # need value >= v but max < v
                if op == "le" and lo is not None and lo > v:
                    return True
            except TypeError:        # json-safe stat vs python literal
                continue
        return False

    def partitions(self):
        entries = _timeline_entries(self.base_path)
        out = []
        if self.qtype == "incremental":
            lo = self.begin or ""
            hi = self.end or (max((i for i, a, _m in entries
                                   if a in WRITE_ACTIONS), default=""))
            per_group: dict = {}
            for instant, action, md in entries:
                if action not in WRITE_ACTIONS or not lo < instant <= hi:
                    continue
                for p, stats in (md.get("partition_to_write_stats")
                                 or {}).items():
                    for st in stats:
                        per_group.setdefault((p, st["file_id"]), []).append(
                            self._abs(st["path"]))
            for paths in per_group.values():
                out.append(_SlicePartition(None, paths, True, lo, hi))
        elif self.qtype in ("snapshot", "read_optimized"):
            groups = _fold(entries, self.as_of)
            for (p, fid), g in sorted(groups.items()):
                if g.replaced_at is not None and \
                        (self.as_of is None or g.replaced_at <= self.as_of):
                    continue
                s = g.latest(self.as_of)
                if s is None:
                    continue
                base = self._abs(s.base)
                if self.as_of is not None and not os.path.exists(base):
                    raise ValueError(
                        f"time-travel to {self.as_of}: base file {s.base} "
                        "was cleaned; the requested version is gone")
                if self.qtype == "read_optimized":
                    if self._stats_exclude(s.base_stats):
                        continue
                    out.append(_SlicePartition(base, [], False))
                else:
                    deltas = [self._abs(d) for i, d in s.deltas
                              if self.as_of is None or i <= self.as_of]
                    # stats skipping only for delta-free slices (see
                    # pushFilters): a delta may exceed the base's range
                    if not deltas and self._stats_exclude(s.base_stats):
                        continue
                    out.append(_SlicePartition(base, deltas, bool(deltas)))
        else:
            raise ValueError(
                f"unknown hoodie.datasource.query.type {self.qtype!r} "
                "(snapshot | read_optimized | incremental)")
        # the API requires >= 1 partition; zero files -> zero batches
        return out or [_SlicePartition(None, [], False)]

    # ------------------------------------------------ executor side (pyarrow)
    def read(self, partition: _SlicePartition):
        import pyarrow as pa
        import pyarrow.compute as pc
        from pyspark.sql.pandas.types import to_arrow_schema

        target = to_arrow_schema(self.extended)
        tables = []
        paths = ([partition.base] if partition.base else []) + \
            list(partition.deltas)
        for path in paths:
            if not os.path.exists(path):    # rolled back / cleaned after plan
                continue
            import pyarrow.parquet as pq
            tbl = pq.read_table(path)
            for f in target:
                if f.name not in tbl.column_names:
                    tbl = tbl.append_column(
                        f.name, pa.nulls(len(tbl), type=f.type))
            tables.append(tbl.select(target.names).cast(target))
        if not tables:
            return
        tbl = pa.concat_tables(tables)
        if partition.lo is not None:        # incremental commit-time window
            tbl = tbl.filter(pc.and_(
                pc.greater(tbl[COMMIT_TIME], partition.lo),
                pc.less_equal(tbl[COMMIT_TIME], partition.hi)))
        if partition.merge or partition.lo is not None:
            tbl = _latest_per_key(tbl, self.key_fields, self.ordering)
        # drop tombstone winners (payloads.is_tombstone): COW business
        # marker and/or the MOR delta op column
        alive = pc.invert(pc.fill_null(
            pc.cast(tbl[DELETE_MARKER], pa.bool_()), False))
        alive = pc.and_(alive, pc.fill_null(
            pc.not_equal(tbl[OPERATION], "D"), True))
        tbl = tbl.filter(alive)
        out = to_arrow_schema(self._schema)
        yield from tbl.select(out.names).cast(out).to_batches()


def _latest_per_key(tbl, key_fields: list, ordering: list):
    """One winner row per key: sort (keys asc, ordering desc, nulls last —
    arrow's default null placement matches desc_nulls_last) and keep each
    key group's first row via a shifted-comparison boundary mask. Replays
    payloads.resolve's window exactly, including the string COMMIT_SEQNO
    tiebreak."""
    import pyarrow as pa
    import pyarrow.compute as pc

    n = len(tbl)
    if n <= 1:
        return tbl
    srt = tbl.sort_by([(k, "ascending") for k in key_fields]
                      + [(o, "descending") for o in ordering])
    first = None
    for k in key_fields:
        col = srt[k].combine_chunks()
        if isinstance(col, pa.ChunkedArray):
            col = col.chunks[0] if col.num_chunks else pa.array([], col.type)
        neq = pc.not_equal(col.slice(1), col.slice(0, n - 1))
        neq = pc.fill_null(neq, True)      # NULL key boundary: keep row
        first = neq if first is None else pc.or_(first, neq)
    mask = pa.concat_arrays([pa.array([True]), first])
    return srt.filter(mask)


class HudiDataSource(DataSource):
    """spark.read.format("hudi").load(path) — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "hudi"

    def schema(self):
        base_path = self.options.get("path")
        if not base_path:
            raise ValueError("hudi format requires .load(<table dir>) or "
                             ".option('path', <table dir>)")
        cfg = _read_cfg(base_path)
        if not cfg.get("schema_json"):
            raise ValueError(f"table at {base_path} has no committed "
                             "schema yet")
        business = StructType.fromJson(json.loads(cfg["schema_json"]))
        out = StructType([StructField(m, StringType()) for m in META5])
        for f in business.fields:
            if f.name not in META5 and f.name != OPERATION:
                out = out.add(f)
        return out

    def reader(self, schema: StructType):
        return HudiBatchReader(schema, dict(self.options))

    def writer(self, schema: StructType, overwrite: bool):
        # a Python Data Source writer would route every row through Python
        # workers and could not run the engine's tag/commit machinery from
        # the planner process — writes stay on the JVM-side option layer
        raise NotImplementedError(
            "df.write.format('hudi') is not routed through the Python Data "
            "Source (it would serialize rows through Python workers). Use "
            "the option-compatible writer instead — same option strings, "
            "JVM-side plan:\n"
            "  from hudi_0_12_0_my_spark.compat import HudiWriteBuilder\n"
            "  HudiWriteBuilder(df).options(**opts).mode('append')"
            ".save(path)")


def register_hudi_format(spark) -> None:
    """Register ``format("hudi")`` and ship this module by value so the
    planner python worker and executors need no package install (same
    mechanism as streaming.register_stream_source). Also enables
    ``spark.sql.python.filterPushdown.enabled``: the reader implements
    pushFilters for stats-based file skipping, and Spark refuses to plan a
    pushdown-capable Python reader while the flag is off (register through
    this helper — or set the conf — before reading)."""
    import sys
    try:
        from pyspark import cloudpickle
        cloudpickle.register_pickle_by_value(sys.modules[__name__])
    except Exception:  # noqa: BLE001 — fall back to by-reference pickling
        pass
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(HudiDataSource)
