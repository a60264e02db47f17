"""``spark.read/write.format("hudi")`` — the reference quickstart surface.

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

The WRITE side covers the quickstart's insert-shaped writes
(HoodieSparkSqlWriter.scala:68 dispatch, insert/bulk_insert + the
mode("overwrite") first write) with per-task parquet writes and a
driver-side commit fold; tag-requiring operations refuse with a pointer
to the option-compatible library writer — see HudiFormatWriter. Streaming
reads serve under the same name (streamReader -> streaming/source.py).

Architecture: the planner side folds the timeline into file slices with a
STANDALONE re-implementation of fsview._fold (this module deliberately has
no package-internal imports, so cloudpickle ships it by value — neither the
planner's python worker nor the executors need the package installed); the
executor side reads parquet with pyarrow and resolves the per-key winner
with an arrow-native sort + group-boundary mask that replays
payloads.resolve's ordering exactly (ordering fields desc, nulls last,
COMMIT_SEQNO string tiebreak).

IO shape (100 TB posture): every file scan projects to the columns the
plan actually needs (``columns=`` into pyarrow — old files carrying
since-dropped columns don't pay for them), and merge-free slices stream
row-group batches instead of materializing whole files; only slices that
genuinely merge (base+deltas / commit-time windows) materialize, bounded
by file-group size. Planned files that are MISSING at execution raise
loudly (a clean/rollback raced the plan) — never a silently short result;
the incremental planner additionally detects cleaned in-range files UP
FRONT and falls back to the snapshot-as-of-end + commit-window plan, the
same fallback the library reader uses (reader.py:347-374,
IncrementalRelation.scala:199-254).

Scope, stated honestly:
- Payloads with per-row resolution semantics a worker can replay
  (overwrite_latest / default / event_time / validate_dup). column-merge,
  always-delete and register()ed custom payloads raise with a pointer to
  the library API, which is also the FAST path (JVM parquet scan +
  Catalyst merge) — this format trades throughput for zero-import compat.
- Column RENAME history IS replayed (writer.rename_chains parity,
  AlterHoodieTableChangeColumnCommand / TableChanges rename): the
  planner collapses cfg["column_renames"] into final->older-names
  chains, and each file scan resolves a target column absent from the
  file to its newest pre-rename physical name — so files of every era
  surface their values under the current name, exactly like the
  library reader. Type widening and added/dropped columns work too
  (each file casts to the evolved schema).
- MOR snapshot merges base + delta per file group. Bootstrap bases carry
  NULL meta columns; a bootstrap slice WITH deltas (or a bootstrap base
  inside an incremental window) would need the library's
  fill_bootstrap_meta key reconstruction (reader.py:51) to merge
  correctly, so those reads refuse loudly instead of resolving wrong.
- Bucket-index point lookups prune at the planner: an EqualTo/In on the
  single record-key field of a simple-bucket table addresses file groups
  directly via pmod(xxhash64(key), num_buckets) — the planner replays
  Spark's XXH64 (seed 42) in pure python, byte-verified against
  F.xxhash64 — mirroring BucketIdentifier.java's bucketId addressing.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

from pyspark.sql.datasource import (DataSource, DataSourceArrowWriter,
                                    DataSourceReader, InputPartition,
                                    WriterCommitMessage)
from pyspark.sql.types import StringType, StructField, StructType

# Streaming under the SAME "hudi" name (the reference registers one name
# for batch and stream — HoodieStreamSource.scala:50): delegate to the
# stream-source machinery. Guarded import so this module still unpickles
# by value in package-less workers; register_hudi_format registers the
# streaming module by value too, so the zero-import property holds for
# the stream path as well.
try:
    from hudi_0_12_0_my_spark.streaming.source import (
        HudiStreamReader as _HudiStreamReader)
except Exception:  # noqa: BLE001 — package not importable here
    _HudiStreamReader = None

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

# keygens whose record key for a SINGLE key field is the field value cast
# to string (keygen.record_key_expr's default branch) — the set the bucket
# point-lookup pruner can address planner-side. complex/global_delete
# build "f:v" composites, uuid is random, register()ed customs are
# arbitrary python the standalone planner cannot see.
_IDENTITY_KEYGENS = {"simple", "nonpartitioned", "timestamp", "custom"}

# cluster-wide core count captured at register_hudi_format() time (the
# session's sparkContext.defaultParallelism) — the scan-parallelism floor.
# None until a registration runs (e.g. the reader planned from a session
# that registered by class name only): fall back to env/cpu heuristics.
_CLUSTER_PARALLELISM: int | None = None


def _read_cfg(base_path: str) -> dict:
    with open(os.path.join(base_path, ".hoodie", "table_config.json")) as fh:
        return json.load(fh)


def _rename_chains(renames: list) -> dict:
    """final_name -> [older physical names, newest first] — standalone
    replay of writer.rename_chains (writer.py:103): chronological
    {"from","to"} entries collapse chains (a->b->c) so files of every era
    resolve to the current name at read."""
    chains: dict = {}
    for r in renames or []:
        olds = chains.pop(r["from"], [])
        chains[r["to"]] = [r["from"]] + olds
    return chains


def _resolve_columns(have: set, wanted: list, chains: dict) -> dict:
    """target name -> physical column present in the file. A target absent
    from the file resolves to its newest pre-rename physical name (rename
    replay); still-absent targets are simply not in the mapping (NULL
    fill). A file carrying the target itself always uses it directly —
    rows in that file were written post-rename."""
    out = {}
    for n in wanted:
        if n in have:
            out[n] = n
            continue
        for old in chains.get(n, ()):
            if old in have:
                out[n] = old
                break
    return out


def _assemble(pa, tbl, phys: dict, target):
    """Physical-name arrow table -> the target schema: each target column
    pulls its resolved physical column (renaming replayed pre-rename
    names), absent targets fill with typed NULLs, then one cast to the
    target schema (covers type widening)."""
    arrays = []
    for f in target:
        p = phys.get(f.name)
        arrays.append(tbl[p] if p is not None
                      else pa.nulls(tbl.num_rows, type=f.type))
    return pa.Table.from_arrays(arrays, names=list(target.names)).cast(target)


def _timeline_entries(base_path: str) -> list[tuple[str, str, dict]]:
    """(instant, action, metadata) for every completed instant, archived
    first, sorted by instant — the stream the fold consumes. Mirrors the
    library's _write_history hygiene (reader.py:207): an instant present in
    BOTH the archive batch and the active dir (crash mid-archival) counts
    once, and write commits targeted by a PENDING rollback plan are dead —
    their files may be half-deleted already."""
    out = []
    seen: set = set()
    rolled: set = set()
    adir = os.path.join(base_path, ".hoodie", "archived")
    if os.path.isdir(adir):
        for f in os.listdir(adir):
            if f.endswith(".json"):
                with open(os.path.join(adir, f)) as fh:
                    for e in json.load(fh):
                        k = (e["time"], e.get("action", ""))
                        if k not in seen:
                            seen.add(k)
                            out.append((e["time"], e.get("action", ""),
                                        e.get("metadata") or {}))
    tdir = os.path.join(base_path, ".hoodie", "timeline")
    if os.path.isdir(tdir):
        completed = set()
        names = os.listdir(tdir)
        for f in names:
            parts = f.split(".")
            if len(parts) == 2:
                completed.add(parts[0])
        for f in names:
            parts = f.split(".")
            if len(parts) == 3 and parts[1] == "rollback" \
                    and parts[0] not in completed:
                try:
                    with open(os.path.join(tdir, f)) as fh:
                        tgt = (json.load(fh) or {}).get(
                            "rolled_back_instant")
                    if tgt:
                        rolled.add(tgt)
                except (OSError, ValueError):
                    continue
            if len(parts) != 2:          # requested/inflight: not completed
                continue
            if (parts[0], parts[1]) in seen:
                continue
            with open(os.path.join(tdir, f)) as fh:
                md = json.load(fh)
            out.append((parts[0], parts[1], md))
    if rolled:
        out = [(i, a, md) for i, a, md in out
               if not (a in WRITE_ACTIONS and i in rolled)]
    out.sort(key=lambda x: x[0])
    return out


# --------------------------------------------------------------- xxhash64
# Spark-compatible XXH64 (seed 42) so the planner can address simple-bucket
# file groups exactly like F.pmod(F.xxhash64(key), num_buckets)
# (writer._tag_bucket / BucketIdentifier.java). Byte-verified against
# F.xxhash64 in tests/test_format_datasource.py.
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M64 = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _xxhash64(data: bytes, seed: int = 42) -> int:
    """Signed-64 XXH64 of ``data`` — identical to Spark's xxhash64()."""
    n = len(data)
    i = 0
    if n >= 32:
        v = [(seed + _P1 + _P2) & _M64, (seed + _P2) & _M64,
             seed & _M64, (seed - _P1) & _M64]
        while i <= n - 32:
            for k in range(4):
                lane = int.from_bytes(data[i:i + 8], "little")
                v[k] = (_rotl((v[k] + lane * _P2) & _M64, 31) * _P1) & _M64
                i += 8
        h = (_rotl(v[0], 1) + _rotl(v[1], 7)
             + _rotl(v[2], 12) + _rotl(v[3], 18)) & _M64
        for vk in v:
            h ^= (_rotl((vk * _P2) & _M64, 31) * _P1) & _M64
            h = (h * _P1 + _P4) & _M64
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while i <= n - 8:
        lane = int.from_bytes(data[i:i + 8], "little")
        h ^= (_rotl((lane * _P2) & _M64, 31) * _P1) & _M64
        h = ((_rotl(h, 27) * _P1) + _P4) & _M64
        i += 8
    if i <= n - 4:
        h ^= (int.from_bytes(data[i:i + 4], "little") * _P1) & _M64
        h = ((_rotl(h, 23) * _P2) + _P3) & _M64
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M64
        h = (_rotl(h, 11) * _P1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h - (1 << 64) if h >= (1 << 63) else h


def _bucket_of(key: str, num_buckets: int) -> int:
    # python's % on a signed int == Spark's pmod for positive modulus
    return _xxhash64(key.encode("utf-8")) % num_buckets


@dataclass
class _Slice:
    base_instant: str
    base: str | None = None              # relative path
    deltas: list = field(default_factory=list)   # [(instant, rel_path)]
    base_stats: dict = field(default_factory=dict)  # {col: {min,max,nulls}}
    bootstrap: bool = False              # base bytes live outside the table


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
                                               or {},
                                               bootstrap=bool(
                                                   st.get("bootstrap"))))
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
    # snapshot-fallback incremental (cleaned in-range file): resolve the
    # latest version per key FIRST, then window-filter — the inverse order
    # of the file-list plan, matching reader.incremental's fallback
    resolve_then_window: bool = False


@dataclass
class _PackedPartition(InputPartition):
    """Several independent file slices read by ONE task. Small file groups
    dominate real tables; one task per slice pays the per-task Python
    runner cost (measured: a data source with 86 EMPTY partitions costs
    ~6s cold / ~1s warm on local[32], vs ~0.5s at 32) for microseconds of
    IO. Packing mirrors Spark's own scan-split sizing
    (spark.sql.files.maxPartitionBytes): bins target split_target_bytes,
    floored at a minimum partition count so parallelism survives. Each
    slice still merges independently inside the task — packing never
    changes which rows a slice resolves to, only which task reads it."""
    slices: list


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
        self._renames = _rename_chains(cfg.get("column_renames"))
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
        # bucket point-lookup addressing (simple pmod buckets only; the
        # consistent-hash ring rotates fids on resize, out of planner scope)
        kf = cfg.get("record_key_fields") or []
        # the identity_record_key flag records the EFFECTIVE keygen
        # semantics at write time (keygen.is_identity_record_key): a
        # register()ed shadow of a builtin name stores arbitrary keys, so
        # the name heuristic alone would prune the wrong file group. Flag
        # absent (pre-r7 table): fall back to the name check.
        idk = cfg.get("identity_record_key")
        self._bucket_addressable = (
            cfg.get("index_type") == "bucket" and len(kf) == 1
            and (idk if idk is not None
                 else cfg.get("keygen", "simple") in _IDENTITY_KEYGENS))
        self._key_field = kf[0] if len(kf) == 1 else None
        self._num_buckets = int(cfg.get("num_buckets") or 0)
        # partition-path addressing: a single value-style partition field's
        # path is coalesce(cast(field as string), 'default') (+ optional
        # hive k=v prefix) — keygen.partition_path_expr — so an EqualTo/In
        # on that column prunes whole PARTITIONS at the planner, the same
        # partition pruning Catalyst does for native tables. Excluded:
        # global index (an update routed to a key's ORIGINAL partition can
        # leave a row whose column value differs from its storage
        # partition), urlencoded paths, timestamp-formatted styles, and
        # multi-field specs — those keep every partition.
        pf = cfg.get("partition_field")
        ipp = cfg.get("identity_partition_source")   # write-time semantics
        keygen_ok = ipp if ipp is not None else (
            cfg.get("keygen", "simple") in ("simple", "complex")
            and isinstance(pf, str) and bool(pf)
            and ":" not in pf and "," not in pf)
        self._part_prunable = (
            cfg.get("partition_style", "value") == "value"
            and not cfg.get("global_index")
            and not cfg.get("partition_urlencode")
            and bool(keygen_ok)
            and isinstance(pf, str) and bool(pf))
        self._part_field = pf
        self._hive_style = bool(cfg.get("hive_style_partitioning"))
        # scan-split sizing (guide: fewer, larger input splits): pack
        # small file slices into shared read tasks. Mirrors Spark's own
        # FilePartition sizing — maxSplitBytes = min(maxPartitionBytes,
        # max(openCostInBytes, bytes/cores)) — with a larger open cost
        # (each slice costs a Python-runner round trip, not a JVM file
        # open) so a tiny table never fans out to one near-empty task per
        # core and a huge table stays bytes-driven. The parallelism floor
        # is the CLUSTER core count captured at registration
        # (sparkContext.defaultParallelism — os.cpu_count() here would see
        # only the planning worker's host); options override everything.
        def _opt_int(key: str, default: int) -> int:
            try:
                return int(options.get(key, default))
            except (TypeError, ValueError):
                return default
        self._split_target_bytes = _opt_int(
            "hoodie.datasource.read.split.target.bytes", 128 * 1024 * 1024)
        self._split_open_cost = _opt_int(
            "hoodie.datasource.read.split.open.cost.bytes", 4 * 1024 * 1024)
        self._split_min_bytes = _opt_int(
            "hoodie.datasource.read.split.min.bytes", 8 * 1024 * 1024)
        env_cpus = os.environ.get("SPARK_GRAFT_CPUS") or ""
        floor_default = (_CLUSTER_PARALLELISM
                         or (int(env_cpus) if env_cpus.isdigit() else 0)
                         or os.cpu_count() or 8)
        self._min_read_partitions = _opt_int(
            "hoodie.datasource.read.min.partitions", floor_default)
        # an EXPLICIT min.partitions is a hard floor on the bin count (the
        # documented option contract); the default floor is soft — it only
        # sizes splits via bytes/cores, Spark's minPartitionNum semantics —
        # so a tiny table is never fanned out to near-empty Python tasks
        self._min_partitions_explicit = (
            "hoodie.datasource.read.min.partitions" in options)
        self._manifest_sizes: dict = {}
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
        file could promote a stale row past the merge. An EqualTo/In on a
        simple-bucket table's record-key field additionally prunes to the
        addressed BUCKET's file groups (safe with deltas: a key lives only
        in its bucket's group). ALL filters are returned as unhandled, so
        Spark still applies them row-level — pruning can only skip files,
        never change results. Per-filter extraction is exception-guarded:
        a NULL or mixed-type value list skips that filter (pruning is an
        optimization — on any doubt, keep the files), never fails the read."""
        from pyspark.sql import datasource as dsf

        def addressable(vals):
            # str(value) must equal Spark's cast-to-string: ints and
            # strings only (bool excluded: str(True) != 'true')
            return all(isinstance(v, (int, str)) and not isinstance(v, bool)
                       for v in vals)

        preds = []
        key_values: list | None = None
        part_values: list | None = None
        meta_part_values: list | None = None
        for f in filters:
            try:
                attr = getattr(f, "attribute", None)
                if not attr or len(attr) != 1:      # nested paths: ignore
                    continue
                col = attr[0]
                if isinstance(f, dsf.EqualTo):
                    if f.value is None:
                        continue
                    preds.append((col, "ge", f.value))
                    preds.append((col, "le", f.value))
                    if col == self._key_field:
                        key_values = [f.value]
                    if col == self._part_field:
                        part_values = [f.value]
                    if col == PARTITION_PATH and isinstance(f.value, str):
                        # the meta column IS the fold key: exact pruning,
                        # valid for every index type and keygen
                        meta_part_values = [f.value]
                elif isinstance(f, (dsf.GreaterThan, dsf.GreaterThanOrEqual)):
                    if f.value is not None:
                        preds.append((col, "ge", f.value))
                elif isinstance(f, (dsf.LessThan, dsf.LessThanOrEqual)):
                    if f.value is not None:
                        preds.append((col, "le", f.value))
                elif isinstance(f, dsf.In):
                    vs = [v for v in f.value if v is not None]
                    if vs:
                        preds.append((col, "ge", min(vs)))
                        preds.append((col, "le", max(vs)))
                        if col == self._key_field:
                            key_values = vs
                        if col == self._part_field:
                            part_values = vs
                        if col == PARTITION_PATH and \
                                all(isinstance(v, str) for v in vs):
                            meta_part_values = vs
            except (TypeError, ValueError):
                continue        # keep-the-file-on-doubt, per _stats_exclude
        self._stat_preds = preds
        self._buckets_wanted = None
        if key_values is not None and self._bucket_addressable \
                and self._num_buckets > 0 and addressable(key_values):
            self._buckets_wanted = {
                "%08d" % _bucket_of(str(v), self._num_buckets)
                for v in key_values}
        self._parts_wanted = None
        if part_values is not None and self._part_prunable \
                and addressable(part_values):
            # NULL partition values land in 'default'; a non-null EqualTo
            # can never match them, so pruning 'default' is safe
            self._parts_wanted = {
                f"{self._part_field}={v}" if self._hive_style else str(v)
                for v in part_values}
        if meta_part_values is not None:
            wanted = set(meta_part_values)
            self._parts_wanted = wanted if self._parts_wanted is None \
                else self._parts_wanted & wanted
        return filters                           # Spark re-applies everything

    def _stats_exclude(self, stats: dict) -> bool:
        """True when the column stats PROVE no row of the file can satisfy
        the pushed predicates. Conservative: any missing stat, type
        mismatch, or failed comparison keeps the file."""
        for col, op, v in getattr(self, "_stat_preds", ()):
            cs = stats.get(col)
            if not cs:
                # files written pre-rename carry stats under the old
                # physical name — same logical column, so pruning on
                # them is exact
                for old in self._renames.get(col, ()):
                    cs = stats.get(old)
                    if cs:
                        break
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

    def _bucket_exclude(self, fid: str) -> bool:
        """True when bucket addressing PROVES the pushed record-key
        equality cannot match this file group (file_id prefix is the
        8-digit bucket number — writer._tag_bucket's fid convention)."""
        wanted = getattr(self, "_buckets_wanted", None)
        return wanted is not None and fid[:8] not in wanted

    def _partition_exclude(self, p: str) -> bool:
        """True when the pushed partition-column equality PROVES no row of
        partition ``p`` can match (value-style path == str(value))."""
        wanted = getattr(self, "_parts_wanted", None)
        return wanted is not None and p not in wanted

    # ------------------------------------------------------------ planning
    def _snapshot_partitions(self, entries, as_of, lo=None, hi=None):
        """File-slice partitions for snapshot semantics as of ``as_of``;
        with lo/hi set they become the incremental snapshot-fallback
        (resolve, then commit-window)."""
        out = []
        groups = _fold(entries, as_of)
        for (p, fid), g in sorted(groups.items()):
            if g.replaced_at is not None and \
                    (as_of is None or g.replaced_at <= as_of):
                continue
            s = g.latest(as_of)
            if s is None:
                continue
            if self._bucket_exclude(fid) or self._partition_exclude(p):
                continue
            base = self._abs(s.base)
            if as_of is not None and not os.path.exists(base):
                raise ValueError(
                    f"time-travel to {as_of}: base file {s.base} "
                    "was cleaned; the requested version is gone")
            if self.qtype == "read_optimized":
                if self._stats_exclude(s.base_stats):
                    continue
                out.append(_SlicePartition(base, [], False))
                continue
            deltas = [self._abs(d) for i, d in s.deltas
                      if as_of is None or i <= as_of]
            if s.bootstrap and deltas:
                # bootstrap bases carry no meta columns; merging them
                # against deltas needs fill_bootstrap_meta's keygen replay
                # (reader.py:51) — refuse rather than resolve wrong.
                # ValueError, not NotImplementedError: the Python Data
                # Source API treats NotImplementedError from partitions()
                # as "no partitioning support" and silently reads on
                raise ValueError(
                    "format('hudi') cannot merge deltas onto a bootstrap "
                    "base (meta columns must be reconstructed); read "
                    "through the library API instead")
            # stats skipping only for delta-free slices (see pushFilters):
            # a delta may exceed the base's range
            if not deltas and self._stats_exclude(s.base_stats):
                continue
            out.append(_SlicePartition(
                base, deltas, bool(deltas), lo=lo, hi=hi,
                resolve_then_window=lo is not None))
        return out

    def partitions(self):
        entries = _timeline_entries(self.base_path)
        # file sizes from the commit-manifest write stats, for _pack: the
        # planner already holds every entry, so slice sizing needs no
        # per-file stat round trip (os.path.getsize per file is ~free
        # locally but a remote round trip per file on object stores)
        self._manifest_sizes = {
            self._abs(st["path"]): st["bytes"]
            for _i, action, md in entries if action in WRITE_ACTIONS
            for stats in (md.get("partition_to_write_stats") or {}).values()
            for st in stats if st.get("bytes")}
        out = []
        if self.qtype == "incremental":
            lo = self.begin or ""
            hi = self.end or (max((i for i, a, _m in entries
                                   if a in WRITE_ACTIONS), default=""))
            # file groups replaced at-or-before `hi` (insert_overwrite /
            # delete_partition / clustering): their rows are not part of
            # the latest state as of `hi`, so in-range files belonging to
            # them must NOT resurrect — the replacing commit's own files
            # carry any surviving rows (reader.incremental's replaced set,
            # IncrementalRelation's replace-aware listing)
            replaced: set = set()
            for instant, action, md in entries:
                if action not in WRITE_ACTIONS or instant > hi:
                    continue
                for p, fids in (md.get("replaced_file_groups")
                                or {}).items():
                    replaced.update((p, f) for f in fids)
            # per file group: only the NEWEST in-range base participates
            # (a COW rewrite carries every surviving row forward with its
            # original commit time — an older in-range base would
            # resurrect rows the rewrite dropped); deltas all participate
            # (their rows resolve by version) — reader.py:325-346
            base_latest: dict = {}   # (p,fid) -> (instant, abs_path, boot)
            delta_paths: dict = {}   # (p,fid) -> [abs_path]
            for instant, action, md in entries:
                if action not in WRITE_ACTIONS or not lo < instant <= hi:
                    continue
                for p, stats in (md.get("partition_to_write_stats")
                                 or {}).items():
                    for st in stats:
                        gk = (p, st["file_id"])
                        if gk in replaced or self._bucket_exclude(
                                st["file_id"]) or self._partition_exclude(p):
                            continue
                        if st.get("kind", "base") == "base":
                            prev = base_latest.get(gk)
                            if prev is None or instant > prev[0]:
                                base_latest[gk] = (
                                    instant, self._abs(st["path"]),
                                    bool(st.get("bootstrap")))
                        else:
                            delta_paths.setdefault(gk, []).append(
                                self._abs(st["path"]))
            if any(boot for _i, _p, boot in base_latest.values()):
                # ValueError for the same API reason as the bootstrap-delta
                # refusal above
                raise ValueError(
                    "format('hudi') incremental over a bootstrap commit: "
                    "bootstrap bases carry no _hoodie_commit_time, so the "
                    "commit window cannot be applied executor-side; read "
                    "through the library API (Table.incremental) instead")
            planned = {gk: ([base_latest[gk][1]] if gk in base_latest
                            else []) + sorted(set(delta_paths.get(gk, [])))
                       for gk in set(base_latest) | set(delta_paths)}
            missing = any(not os.path.exists(f)
                          for fs in planned.values() for f in fs)
            if missing:
                # an in-range file was cleaned: a row whose latest in-range
                # version lived in it would silently VANISH from the
                # file-list plan. Fall back to snapshot-as-of-`hi` +
                # commit-window — always correct, each surviving row
                # carries the commit time of its latest version <= hi
                # (reader.py:356-374, IncrementalRelation.scala:199-254);
                # if cleaning also removed pre-`hi` history, the LATEST
                # snapshot + window (rows updated after `hi` drop out).
                try:
                    return self._snapshot_partitions(
                        entries, hi, lo=lo, hi=hi) \
                        or [_SlicePartition(None, [], False)]
                except ValueError:
                    return self._snapshot_partitions(
                        entries, None, lo=lo, hi=hi) \
                        or [_SlicePartition(None, [], False)]
            for gk in sorted(planned):
                base = base_latest.get(gk)
                out.append(_SlicePartition(
                    base[1] if base else None,
                    sorted(set(delta_paths.get(gk, []))), True, lo, hi))
        elif self.qtype in ("snapshot", "read_optimized"):
            out = self._snapshot_partitions(entries, self.as_of)
        else:
            raise ValueError(
                f"unknown hoodie.datasource.query.type {self.qtype!r} "
                "(snapshot | read_optimized | incremental)")
        # the API requires >= 1 partition; zero files -> zero batches
        if not out:
            return [_SlicePartition(None, [], False)]
        return self._pack(out)

    def _pack(self, slices: list) -> list:
        """Bin slices into read tasks, mirroring Spark's FilePartition
        sizing: each slice is charged its bytes plus an OPEN COST (here
        the per-task Python-runner round trip, not a file open), and

            max_split = min(split_target, max(split_min, charged/floor))
            nbins     = clamp(ceil(charged_total / max_split), 1, n)

        so a tiny table packs into a handful of tasks (the split_min
        floor stops core-count fan-out of near-empty Python tasks — the
        analog of Spark's openCostInBytes floor on maxSplitBytes), while
        a large table is bytes-driven with parallelism >= the cluster
        floor. The bin COUNT uses real bytes only; the per-slice open
        cost enters the LPT weights (so many-tiny-slice groups still
        spread across bins) but not the count — per-slice decode work is
        constant under any packing, and charging it into the count would
        fan tiny many-file tables back out to near-empty tasks.
        Longest-processing-time assignment keeps bins even. With
        at least as many bins as slices this is the identity (tests and
        single-file tables see plain _SlicePartitions). Sizes come from
        the commit-manifest write stats (no per-file stat round trip —
        at object-store latencies getsize per file would dominate the
        plan); files unknown to the manifest (bootstrap sources) fall
        back to a local stat."""
        def size(s):
            b = 0
            for p in ([s.base] if s.base else []) + list(s.deltas):
                known = self._manifest_sizes.get(p)
                if known is not None:
                    b += known
                    continue
                try:
                    b += os.path.getsize(p)
                except OSError:
                    pass            # vanished file: read() raises loudly
            return b
        oc = max(self._split_open_cost, 0)
        sized = [(size(s) + oc, i, s) for i, s in enumerate(slices)]
        total = sum(b for b, _i, _s in sized) - oc * len(slices)
        floor = max(self._min_read_partitions, 1)
        max_split = min(max(self._split_target_bytes, 1),
                        max(self._split_min_bytes, 1, total // floor))
        nbins = min(len(slices), max(1, -(-total // max_split)))
        if self._min_partitions_explicit:
            nbins = min(len(slices), max(nbins, floor))
        if nbins >= len(slices):
            return slices
        import heapq
        heap = [(0, i, []) for i in range(nbins)]   # (bytes, idx, members)
        heapq.heapify(heap)
        for b, _i, s in sorted(sized, reverse=True):
            load, i, members = heapq.heappop(heap)
            members.append(s)
            heapq.heappush(heap, (load + b, i, members))
        return [_PackedPartition(members) for _load, _i, members in heap
                if members]

    # ------------------------------------------------ executor side (pyarrow)
    def _load_file(self, pq, pa, path, target):
        """One file -> arrow table projected+cast to the extended schema.
        Only the physical columns the plan needs are read (files from
        before a DROP COLUMN carry columns the plan doesn't need — don't
        pay their IO); a target absent under its current name reads its
        newest pre-rename physical column (rename replay); still-absent
        target columns surface as NULLs."""
        pf = pq.ParquetFile(path)
        have = set(pf.schema_arrow.names)
        phys = _resolve_columns(have, list(target.names), self._renames)
        cols = list(dict.fromkeys(phys.values()))
        self._last_columns = cols       # in-process observability for tests
        return _assemble(pa, pf.read(columns=cols), phys, target)

    def read(self, partition):
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_schema

        target = to_arrow_schema(self.extended)
        out = to_arrow_schema(self._schema)
        slices = partition.slices if isinstance(partition, _PackedPartition) \
            else [partition]
        for part in slices:
            yield from self._read_slice(part, pa, pc, pq, target, out)

    def _read_slice(self, partition: _SlicePartition, pa, pc, pq, target,
                    out):
        paths = ([partition.base] if partition.base else []) + \
            list(partition.deltas)
        gone = [p for p in paths if not os.path.exists(p)]
        if gone:
            # a planned file vanished between planning and execution
            # (concurrent clean/rollback): silent skipping would return a
            # silently SHORT result — fail loudly, like the library
            # reader's time-travel guard; re-running re-plans correctly
            raise FileNotFoundError(
                f"hudi format: planned file(s) {gone} disappeared during "
                "the read (concurrent clean/rollback?) — re-run the query")
        if not paths:
            return

        def alive_mask(tbl):
            # drop tombstone winners (payloads.is_tombstone): COW business
            # marker and/or the MOR delta op column
            m = pc.invert(pc.fill_null(
                pc.cast(tbl[DELETE_MARKER], pa.bool_()), False))
            return pc.and_(m, pc.fill_null(
                pc.not_equal(tbl[OPERATION], "D"), True))

        if not partition.merge and partition.lo is None:
            # merge-free slice: stream row-group batches, never
            # materialize the file (single-version groups dominate a
            # mostly-insert table — this is the hot path at scale)
            for path in paths:
                pf = pq.ParquetFile(path)
                have = set(pf.schema_arrow.names)
                phys = _resolve_columns(have, list(target.names),
                                        self._renames)
                cols = list(dict.fromkeys(phys.values()))
                self._last_columns = cols
                for batch in pf.iter_batches(columns=cols):
                    tbl = _assemble(pa, pa.Table.from_batches([batch]),
                                    phys, target)
                    tbl = tbl.filter(alive_mask(tbl))
                    yield from tbl.select(out.names).cast(out).to_batches()
            return
        tbl = pa.concat_tables(
            [self._load_file(pq, pa, p, target) for p in paths])

        def window(t):
            return t.filter(pc.and_(
                pc.greater(t[COMMIT_TIME], partition.lo),
                pc.less_equal(t[COMMIT_TIME], partition.hi)))

        if partition.resolve_then_window:
            # snapshot-fallback incremental: latest version per key FIRST
            # (snapshot semantics), tombstones out, THEN the commit window
            tbl = _latest_per_key(tbl, self.key_fields, self.ordering)
            tbl = tbl.filter(alive_mask(tbl))
            tbl = window(tbl)
        else:
            if partition.lo is not None:    # incremental commit-time window
                tbl = window(tbl)
            if partition.merge or partition.lo is not None:
                tbl = _latest_per_key(tbl, self.key_fields, self.ordering)
            tbl = tbl.filter(alive_mask(tbl))
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


# ------------------------------------------------------------- write path
# df.write.format("hudi") for INSERT-SHAPED writes — the reference
# quickstart's write line (HoodieSparkSqlWriter.scala:68). Scope, stated
# honestly: insert / bulk_insert need no index tagging, so they fit the
# Python Data Source writer model exactly (per-task parquet file writes,
# commit fold + timeline JSON in the driver-side commit() from the
# WriterCommitMessages). upsert is accepted only when it degenerates to
# insert (mode("overwrite"), or a table with no live file groups — which
# makes the LITERAL quickstart first write work); everything that needs
# tag/merge/delete machinery refuses loudly, pointing at the
# option-compatible library writer. No OCC lock and no inline table
# services run on this path (single external writer at a time; services
# via the library/CALL procedures) — configs that REQUIRE them
# (concurrency_mode=occ, pre-commit validators, bucket indexes) refuse.
# Crash-safety model: file visibility is commit-manifest-only (a crashed
# write leaves orphan data files no reader ever lists; the commit JSON
# lands atomically), the same manifest-gated visibility the read side
# already relies on.
_OPT_OPERATION = "hoodie.datasource.write.operation"
_OPT_TABLE_NAME = "hoodie.table.name"
_OPT_TABLE_TYPE = "hoodie.datasource.write.table.type"
_OPT_RECORDKEY = "hoodie.datasource.write.recordkey.field"
_OPT_PARTITIONPATH = "hoodie.datasource.write.partitionpath.field"
_OPT_PRECOMBINE = "hoodie.datasource.write.precombine.field"
_OPT_HIVE_STYLE = "hoodie.datasource.write.hive_style_partitioning"

_KEYABLE_TYPES = ("string", "long", "integer", "short", "byte")


def _new_instant(base_path: str) -> str:
    """Monotonic yyyyMMddHHmmssSSS instant (HoodieInstantTimeGenerator
    format), bumping the same .hoodie/.last_instant watermark the
    library's Timeline.new_instant uses so interleaved library writes
    never mint a colliding instant."""
    import time
    hdir = os.path.join(base_path, ".hoodie")
    os.makedirs(hdir, exist_ok=True)
    marker = os.path.join(hdir, ".last_instant")
    last = 0
    try:
        with open(marker) as fh:
            last = int(fh.read().strip() or 0)
    except (OSError, ValueError):
        pass
    ms = max(int(time.time() * 1000), last + 1)
    tmp = marker + ".fmtw.tmp"
    with open(tmp, "w") as fh:
        fh.write(str(ms))
    os.replace(tmp, marker)
    t = time.gmtime(ms / 1000.0)
    return time.strftime("%Y%m%d%H%M%S", t) + f"{ms % 1000:03d}"


def _atomic_json(path: str, obj) -> None:
    tmp = path + ".fmtw.tmp"
    with open(tmp, "w") as fh:
        json.dump(obj, fh)
    os.replace(tmp, path)


def _all_nullable_json(struct_json: dict) -> dict:
    """Schema registration makes every level nullable (writer.nullable_type
    parity): a later library write carrying NULLs (tombstone union,
    outer-join fill) must not die in the cast to the registered type."""
    if isinstance(struct_json, dict):
        return {k: (True if k in ("nullable", "containsNull",
                                  "valueContainsNull")
                    else _all_nullable_json(v))
                for k, v in struct_json.items()}
    if isinstance(struct_json, list):
        return [_all_nullable_json(x) for x in struct_json]
    return struct_json


def _json_safe_stat(v):
    """Footer-stat value -> JSON-safe (writer._json_safe parity)."""
    import datetime
    import decimal
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, bytes):
        return None
    return v


def _footer_stats(path: str, stats_cols) -> dict:
    """records/bytes/col_stats from the written file's parquet footer —
    the same {col: {min,max,nulls}} shape writer._parquet_footer_stats
    records, so the library's stats-skipping reads them identically."""
    import pyarrow.parquet as pq
    md = pq.ParquetFile(path).metadata
    out = {"records": md.num_rows, "bytes": os.path.getsize(path),
           "col_stats": {}}
    acc: dict = {}
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for ci in range(g.num_columns):
            c = g.column(ci)
            name = c.path_in_schema
            if "." in name or name.startswith("_hoodie_"):
                continue                     # nested / meta: no stats
            if stats_cols is not None and name not in stats_cols:
                continue
            st = c.statistics
            if st is None or not st.has_min_max:
                continue
            mn = _json_safe_stat(st.min)
            mx = _json_safe_stat(st.max)
            if mn is None or mx is None:
                continue
            cur = acc.get(name)
            if cur is None:
                acc[name] = {"min": mn, "max": mx,
                             "nulls": st.null_count or 0}
            else:
                cur["min"] = min(cur["min"], mn)
                cur["max"] = max(cur["max"], mx)
                cur["nulls"] += st.null_count or 0
    out["col_stats"] = acc
    return out


@dataclass
class _WriteMessage(WriterCommitMessage):
    files: list                  # stage_write-shaped stat dicts + partition


class HudiFormatWriter(DataSourceArrowWriter):
    """Executor side: stream arrow batches into one parquet file per
    (task, partition path), stamping the meta columns with vectorized
    arrow compute; driver side: fold the per-file stats into one commit.
    File count = upstream partitions x partition paths (size files by
    repartitioning before the write, exactly like bulk_insert NONE)."""

    def __init__(self, schema: StructType, options: dict, overwrite: bool):
        self.base_path = options.get("path")
        if not self.base_path:
            raise ValueError("hudi format write requires .save(<table dir>)")
        self.overwrite = overwrite
        reserved = [f.name for f in schema.fields
                    if f.name.startswith("_hoodie_")]
        if reserved:
            raise ValueError(
                f"'_hoodie_' column namespace is reserved: {reserved}; "
                "rename before writing (writer.prepare contract)")
        self.op = str(options.get(_OPT_OPERATION, "upsert")).lower()
        cfg = None
        if os.path.exists(os.path.join(self.base_path, ".hoodie",
                                       "table_config.json")):
            cfg = _read_cfg(self.base_path)
        self._existing_live = []
        if cfg is not None:
            self._init_existing(cfg)
        else:
            cfg = self._init_new(schema, options)
        self.cfg = cfg
        self.table_type = cfg.get("table_type", "cow")
        if self.op in ("insert", "bulk_insert"):
            pass
        elif self.op == "upsert":
            # upsert == insert when there is nothing to update against:
            # mode("overwrite") (the literal quickstart first write) or an
            # empty table. Anything else needs index tagging.
            if not self.overwrite and self._existing_live:
                raise NotImplementedError(
                    "df.write.format('hudi') supports insert-shaped writes "
                    "only (insert / bulk_insert / first write / "
                    "mode('overwrite')); upsert against existing data "
                    "needs index tagging — use the option-compatible "
                    "writer:\n"
                    "  from hudi_0_12_0_my_spark.compat import "
                    "HudiWriteBuilder\n"
                    "  HudiWriteBuilder(df).options(**opts)"
                    ".mode('append').save(path)")
        else:
            raise NotImplementedError(
                f"df.write.format('hudi') cannot run operation "
                f"{self.op!r}; use HudiWriteBuilder "
                "(hudi_0_12_0_my_spark.compat) for the full surface")
        # key/partition generation the executor replays EXACTLY like
        # keygen.record_key_expr / partition_path_expr's identity branch
        kf = cfg.get("record_key_fields") or []
        idk = cfg.get("identity_record_key")
        if idk is None:
            idk = (cfg.get("keygen", "simple") in _IDENTITY_KEYGENS
                   and len(kf) == 1)
        if len(kf) != 1 or not idk:
            raise NotImplementedError(
                "df.write.format('hudi') generates keys for single-field "
                "identity keygens only (str(value) keys); composite/"
                "custom keygens need HudiWriteBuilder")
        self.key_field = kf[0]
        self.part_field = cfg.get("partition_field") or None
        if self.part_field is not None:
            ipp = cfg.get("identity_partition_source")
            if ipp is None:
                ipp = (cfg.get("keygen", "simple") in ("simple", "complex")
                       and ":" not in self.part_field
                       and "," not in self.part_field)
            if (not ipp or cfg.get("partition_style", "value") != "value"
                    or cfg.get("partition_urlencode")):
                raise NotImplementedError(
                    "df.write.format('hudi') writes value-style single-"
                    "field partition paths only; timestamp/custom/"
                    "urlencoded partitioning needs HudiWriteBuilder")
        self.hive_style = bool(cfg.get("hive_style_partitioning"))
        by_name = {f.name: f for f in schema.fields}
        kf_field = by_name.get(self.key_field)
        if kf_field is None:
            raise ValueError(f"record key field {self.key_field!r} missing "
                             "from the written DataFrame")
        if kf_field.dataType.typeName() not in _KEYABLE_TYPES:
            raise NotImplementedError(
                f"record key type {kf_field.dataType.simpleString()} would "
                "need Spark's cast-to-string semantics replayed; key on a "
                "string/integral column or use HudiWriteBuilder")
        if self.part_field is not None:
            pfld = by_name.get(self.part_field)
            if pfld is None:
                raise ValueError(f"partition field {self.part_field!r} "
                                 "missing from the written DataFrame")
            if pfld.dataType.typeName() not in _KEYABLE_TYPES:
                raise NotImplementedError(
                    f"partition type {pfld.dataType.simpleString()} would "
                    "need cast-to-string replay; use HudiWriteBuilder")
        # business columns actually written: incoming minus dropped names
        # (dropped values are discarded on write, writer.prepare parity)
        dropped = set(cfg.get("dropped_columns") or [])
        self.business = [f.name for f in schema.fields
                         if f.name not in dropped]
        self._incoming_schema_json = json.dumps(schema.jsonValue())
        if cfg.get("schema_json"):
            reg_fields = {f["name"]: f for f in
                          json.loads(cfg["schema_json"])["fields"]}
            for f in schema.fields:
                rf = reg_fields.get(f.name)
                if rf is not None and _all_nullable_json(rf["type"]) != \
                        _all_nullable_json(f.jsonValue()["type"]):
                    raise ValueError(
                        f"column {f.name!r}: incoming type "
                        f"{f.dataType.simpleString()} differs from the "
                        "registered schema; type promotion/casting is the "
                        "library writer's job (HudiWriteBuilder)")
        self.instant = _new_instant(self.base_path)
        self.action = "commit" if self.table_type == "cow" else "deltacommit"
        self.stats_cols = cfg.get("stats_columns")

    # ---------------------------------------------------- driver-side setup
    def _init_existing(self, cfg: dict) -> None:
        if cfg.get("concurrency_mode") == "occ":
            raise NotImplementedError(
                "df.write.format('hudi') takes no OCC lock; multi-writer "
                "tables need HudiWriteBuilder")
        if cfg.get("precommit_validators"):
            raise NotImplementedError(
                "df.write.format('hudi') does not run pre-commit "
                "validators; this table configures them — use "
                "HudiWriteBuilder")
        if cfg.get("index_type") in ("bucket", "bucket_consistent"):
            raise NotImplementedError(
                "df.write.format('hudi') cannot route rows into bucket "
                "file groups; bucket-index tables need HudiWriteBuilder")
        groups = _fold(_timeline_entries(self.base_path), None)
        self._existing_live = [
            (p, fid) for (p, fid), g in groups.items()
            if g.replaced_at is None and g.latest(None) is not None]

    def _init_new(self, schema: StructType, options: dict) -> dict:
        rk = options.get(_OPT_RECORDKEY)
        if not rk:
            raise ValueError(
                "creating a table through df.write.format('hudi') needs "
                f"option {_OPT_RECORDKEY!r}")
        rkf = [c.strip() for c in str(rk).split(",") if c.strip()]
        if len(rkf) != 1:
            raise NotImplementedError(
                "df.write.format('hudi') creates single-field-key tables "
                "only; composite keys need HudiWriteBuilder")
        ttype = str(options.get(_OPT_TABLE_TYPE) or options.get(
            "hoodie.datasource.write.storage.type")    # withAlternatives
            or "COPY_ON_WRITE").upper()
        if ttype in ("COPY_ON_WRITE", "COW"):
            tt = "cow"
        elif ttype in ("MERGE_ON_READ", "MOR"):
            tt = "mor"
        else:
            raise ValueError(f"unknown {_OPT_TABLE_TYPE}={ttype!r}")
        pf = options.get(_OPT_PARTITIONPATH) or None
        if pf is not None and (":" in pf or "," in pf):
            raise NotImplementedError(
                "df.write.format('hudi') creates value-style single-field "
                "partitioning only; CustomKeyGenerator specs need "
                "HudiWriteBuilder")
        hive = str(options.get(_OPT_HIVE_STYLE, "false")).lower() \
            in ("true", "1", "yes")
        return {
            "name": options.get(_OPT_TABLE_NAME)
            or os.path.basename(self.base_path.rstrip("/")),
            "table_type": tt,
            "record_key_fields": rkf,
            "precombine_field": options.get(_OPT_PRECOMBINE),
            "partition_field": pf,
            "keygen": "simple" if pf else "nonpartitioned",
            "partition_style": "value",
            "hive_style_partitioning": hive,
            "payload": "overwrite_latest",
            "index_type": "simple",
            "identity_record_key": True,
            "identity_partition_source": bool(pf),
            "schema_json": None,
        }

    # -------------------------------------------------------- executor side
    def write(self, iterator):
        import uuid

        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq
        from pyspark import TaskContext
        from pyspark.sql.pandas.types import to_arrow_schema

        ctx = TaskContext.get()
        tid = ctx.partitionId() if ctx is not None else 0
        meta_schema = pa.schema([(m, pa.string()) for m in META5])
        writers: dict = {}   # partition_path -> [fid, abs, rel, pq.Writer]
        rownum = 0
        for batch in iterator:
            tbl = pa.Table.from_batches([batch])
            if tbl.num_rows == 0:
                continue
            keys = pc.cast(tbl[self.key_field], pa.string())
            if keys.null_count or pc.any(
                    pc.equal(keys, "")).as_py() is True:
                raise ValueError(
                    f"record key field {self.key_field!r} is null/empty "
                    "(HoodieKeyException)")
            if self.part_field is not None:
                pstr = pc.fill_null(
                    pc.cast(tbl[self.part_field], pa.string()), "default")
                parts = pc.unique(pstr.combine_chunks()).to_pylist()
            else:
                pstr, parts = None, [""]
            for pval in parts:
                if pstr is None:
                    sub, skeys = tbl, keys
                else:
                    mask = pc.equal(pstr, pval)
                    sub = tbl.filter(mask)
                    skeys = keys.filter(mask)
                ppath = "" if pstr is None else (
                    f"{self.part_field}={pval}" if self.hive_style
                    else str(pval))
                w = writers.get(ppath)
                if w is None:
                    fid = uuid.uuid4().hex
                    fname = f"{fid}_{self.instant}.parquet"
                    rel = os.path.join(ppath, fname) if ppath else fname
                    absp = os.path.join(self.base_path, rel)
                    os.makedirs(os.path.dirname(absp), exist_ok=True)
                    cols = [f for f in self.business
                            if f in set(sub.schema.names)]
                    out_schema = pa.schema(
                        list(meta_schema)
                        + [sub.schema.field(c) for c in cols])
                    codec = self.cfg.get("parquet_codec") or "zstd"
                    lvl = (self.cfg.get("parquet_codec_level") or 1) \
                        if codec == "zstd" else None
                    w = writers[ppath] = [
                        fid, absp, rel,
                        pq.ParquetWriter(
                            absp, out_schema,
                            # match the library writer's codec + level
                            # (config.py parquet_codec/_level: zstd-1 per
                            # the r8 cold-JVM codec A/B)
                            compression=codec, compression_level=lvl),
                        cols, out_schema]
                fid, absp, rel, pqw, cols, out_schema = w
                m = sub.num_rows
                arrays = [
                    pa.array([self.instant] * m),
                    pa.array([f"{self.instant}_{tid}-{rownum + i}"
                              for i in range(m)]),
                    skeys.combine_chunks(),
                    pa.array([ppath] * m),
                    pa.array([os.path.basename(rel)] * m),
                ] + [sub[c] for c in cols]
                rownum += m
                pqw.write_table(
                    pa.Table.from_arrays(
                        [a.combine_chunks() if isinstance(a, pa.ChunkedArray)
                         else a for a in arrays],
                        schema=out_schema))
        files = []
        for ppath, (fid, absp, rel, pqw, _c, _s) in writers.items():
            pqw.close()
            st = _footer_stats(absp, self.stats_cols)
            st.update({"file_id": fid, "file_name": os.path.basename(rel),
                       "path": rel, "kind": "base"})
            st["partition"] = ppath
            files.append(st)
        return _WriteMessage(files=files)

    # ---------------------------------------------------------- driver side
    def _merge_small_files(self, stats_by_partition: dict) -> None:
        """Spark 4.1's Python DataSourceWriter has no required-distribution
        hook, so an insert-shaped write produces one file per (task x
        partition value) — a small-file generator at any parallelism.
        Before the commit is folded, merge each partition's sub-limit
        files into ~target-sized ones (thread pool, driver-side): IO is
        proportional to SMALL-file bytes only — at scale, per-task files
        are already target-sized and nothing fires. Gates come from the
        table config (small_file_limit_bytes / target_file_bytes, the
        library writer's own packing thresholds); rows are untouched
        except _hoodie_file_name, restamped to the merged file's name.
        Runs before the timeline entry is written: a crash mid-merge
        leaves only uncommitted (invisible) files behind."""
        import pyarrow as pa
        import pyarrow.parquet as pq
        from concurrent.futures import ThreadPoolExecutor

        limit = int(self.cfg.get("small_file_limit_bytes")
                    or 100 * 1024 * 1024)
        target = int(self.cfg.get("target_file_bytes") or 120 * 1024 * 1024)
        if limit <= 0:
            return
        jobs = []                      # (partition, [stats to merge])
        for p, sts in stats_by_partition.items():
            small = [st for st in sts if st.get("bytes", 0) < limit]
            if len(small) < 2:
                continue
            small.sort(key=lambda st: st.get("bytes", 0), reverse=True)
            bin_, bin_bytes = [], 0
            for st in small:
                if bin_ and bin_bytes + st.get("bytes", 0) > target:
                    if len(bin_) > 1:
                        jobs.append((p, bin_))
                    bin_, bin_bytes = [], 0
                bin_.append(st)
                bin_bytes += st.get("bytes", 0)
            if len(bin_) > 1:
                jobs.append((p, bin_))
        if not jobs:
            return

        def _merge(job):
            import uuid
            p, sts = job
            fid = uuid.uuid4().hex
            fname = f"{fid}_{self.instant}.parquet"
            rel = os.path.join(p, fname) if p else fname
            absp = os.path.join(self.base_path, rel)
            parts = [pq.read_table(os.path.join(self.base_path, st["path"]))
                     for st in sts]
            merged = pa.concat_tables(parts)
            i = merged.schema.get_field_index(FILE_NAME)
            merged = merged.set_column(
                i, FILE_NAME, pa.array([fname] * merged.num_rows))
            codec = self.cfg.get("parquet_codec") or "zstd"
            pq.write_table(merged, absp, compression=codec,
                           compression_level=(
                               self.cfg.get("parquet_codec_level") or 1)
                           if codec == "zstd" else None)
            st = _footer_stats(absp, self.stats_cols)
            st.update({"file_id": fid, "file_name": fname, "path": rel,
                       "kind": "base"})
            for old in sts:
                try:
                    os.unlink(os.path.join(self.base_path, old["path"]))
                except OSError:
                    pass
            return p, sts, st
        with ThreadPoolExecutor(max_workers=16) as ex:
            for p, olds, st in ex.map(_merge, jobs):
                gone = {id(o) for o in olds}
                stats_by_partition[p] = [s for s in stats_by_partition[p]
                                         if id(s) not in gone] + [st]

    def commit(self, messages) -> None:
        stats_by_partition: dict = {}
        for msg in messages:
            if msg is None:
                continue
            for st in msg.files:
                p = st.pop("partition")
                stats_by_partition.setdefault(p, []).append(st)
        self._merge_small_files(stats_by_partition)
        cfg = dict(self.cfg)
        schema_struct = {"type": "struct", "fields": []}
        if cfg.get("schema_json"):
            schema_struct = json.loads(cfg["schema_json"])
        reg_names = {f["name"] for f in schema_struct["fields"]}
        incoming = json.loads(self._incoming_schema_json)
        for f in incoming["fields"]:
            if f["name"] in self.business and f["name"] not in reg_names:
                schema_struct["fields"].append(f)
        cfg["schema_json"] = json.dumps(_all_nullable_json(schema_struct))
        replaced: dict = {}
        operation = self.op if self.op != "upsert" else "insert"
        if self.overwrite and self._existing_live:
            # mode("overwrite") on an existing table: the new files ARE the
            # table — retire every pre-existing live group via the same
            # replacecommit semantics insert_overwrite_table uses
            for p, fid in self._existing_live:
                replaced.setdefault(p, []).append(fid)
            operation = "insert_overwrite_table"
        total_records = sum(s.get("records", 0)
                            for sts in stats_by_partition.values()
                            for s in sts)
        total_bytes = sum(s.get("bytes", 0)
                          for sts in stats_by_partition.values()
                          for s in sts)
        md = {"operation": operation, "schema": cfg["schema_json"],
              "partition_to_write_stats": stats_by_partition,
              "replaced_file_groups": replaced,
              "total_records": total_records, "total_bytes": total_bytes}
        action = self.action if not replaced else "replacecommit"
        tdir = os.path.join(self.base_path, ".hoodie", "timeline")
        os.makedirs(tdir, exist_ok=True)
        _atomic_json(os.path.join(self.base_path, ".hoodie",
                                  "table_config.json"), cfg)
        _atomic_json(os.path.join(tdir, f"{self.instant}.{action}"), md)

    def abort(self, messages) -> None:
        for msg in messages:
            if msg is None:
                continue
            for st in msg.files:
                try:
                    os.unlink(os.path.join(self.base_path, st["path"]))
                except OSError:
                    pass


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

    def streamReader(self, schema: StructType):
        """``spark.readStream.format("hudi")`` — one name serves batch AND
        stream, matching the reference (HoodieStreamSource.scala:50;
        "hudi_stream" stays as an alias). Offsets are commit instants;
        each micro-batch is the raw change pull over (start, end] — see
        streaming/source.py."""
        if _HudiStreamReader is None:
            raise ImportError(
                "streaming format('hudi') needs the hudi_0_12_0_my_spark "
                "package importable where the source was registered; "
                "alternatively register format('hudi_stream') via "
                "streaming.source.register_stream_source")
        return _HudiStreamReader(schema, dict(self.options))

    def writer(self, schema: StructType, overwrite: bool):
        """INSERT-shaped writes through the Python Data Source (scope and
        crash-safety model in the write-path comment above
        HudiFormatWriter); operations that need index tagging or service
        machinery refuse with a pointer to the option-compatible
        HudiWriteBuilder (compat.py), which runs the full JVM-side plan."""
        return HudiFormatWriter(schema, dict(self.options), overwrite)


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
        # the stream path (HudiDataSource.streamReader) lives in
        # streaming/source.py — ship it by value too
        from hudi_0_12_0_my_spark.streaming import source as _stream_src
        cloudpickle.register_pickle_by_value(_stream_src)
    except Exception:  # noqa: BLE001 — fall back to by-reference pickling
        pass
    # capture the CLUSTER-wide core count for the scan-parallelism floor:
    # the reader plans inside a Python worker where os.cpu_count() sees the
    # DRIVER host only (8 driver cores on a 200-executor-core cluster would
    # silently floor scan parallelism at 8). Module globals ride along with
    # the by-value pickle above, so the planning worker sees this value.
    global _CLUSTER_PARALLELISM
    try:
        _CLUSTER_PARALLELISM = int(spark.sparkContext.defaultParallelism)
    except Exception:  # noqa: BLE001 — Connect sessions have no sparkContext
        pass
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(HudiDataSource)
