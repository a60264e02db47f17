"""Write path: upsert / insert / bulk_insert / delete / overwrites, COW + MOR.

Re-expression of SparkRDDWriteClient
(hudi-client/hudi-spark-client/.../client/SparkRDDWriteClient.java:150-294) +
BaseSparkCommitActionExecutor.java:153-246 (workload profile -> partitioner ->
per-bucket handles) in DataFrame terms:

  tag      -> left join against live base-file keys (HoodieSimpleIndex.java:50,
              the Spark-native index; SURVEY.md §2.4)
  combine  -> window-function payload resolution (payloads.py) instead of
              HoodieMergeHandle's row-at-a-time Avro merge
  bucket   -> broadcast-joined hash ranges with small-file bin packing
              (UpsertPartitioner.java:94-178) — hash assignment instead of
              positional round-robin so NO extra shuffle or global ordering is
              needed (capacities hold in expectation; scale-friendly)
  write    -> ONE shuffle: repartition by (partition, file group) + dynamic
              partitionBy write, then driver-side renames (metadata-only) into
              `<partition>/<fileId>_<instant>[.delta].parquet`

Scale notes (100 TB): the only data shuffles per upsert are the tag join and
the single write repartition; both are keyed by record key / file group so AQE
can handle skew. Driver work is O(#files touched) metadata ops only.
"""

from __future__ import annotations

import math
import os
import urllib.parse
from concurrent.futures import ThreadPoolExecutor
from contextlib import contextmanager

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

from . import config as cfgmod
from . import meta, payloads
from . import timeline as tl
from .fsview import FileSystemView
from .keygen import partition_path_expr, record_key_expr
from .util import FileLock, atomic_write_json, ensure_dir, new_file_id, read_json, rm_rf

ROOT_SENTINEL = "__ROOT__"   # staging stand-in for the empty (unpartitioned) path

# HoodieInMemoryHashIndex (index/inmemory/HoodieInMemoryHashIndex.java):
# a process-wide {(partition, key) -> file_id} map per table base path — the
# testing index. Like the reference's static ConcurrentHashMap it lives for
# the driver process, is shared across Table reloads, and is updated on write
# (never pruned on delete: stale entries tag to a file group that simply no
# longer holds the key, which the payload merge resolves).
_INMEMORY_INDEX: dict[str, dict] = {}


class ConcurrentWriteConflictError(RuntimeError):
    """OCC conflict: two concurrent commits touched the same file groups."""


class ClusteringUpdateRejected(RuntimeError):
    """Update targets a file group under PENDING clustering — the
    reference's default hoodie.clustering.updates.strategy
    (SparkRejectUpdateStrategy.java -> HoodieClusteringUpdateException).
    Retry after the clustering completes; inserts are unaffected."""


META_FIELDS = [T.StructField(c, T.StringType(), True) for c in meta.META_COLS]


class NoTableSchemaError(RuntimeError):
    """Read of a table with no registered schema: never written AND created
    without DDL. Mirrors TableSchemaResolver.getTableAvroSchema's
    "Failed to read schema from the table" on commit-less tables — the
    opaque alternative is json.loads(None) deep in read planning."""


def business_schema(cfg) -> T.StructType:
    if cfg.schema_json is None:
        raise NoTableSchemaError(
            f"table {cfg.name!r} has no registered schema: no completed "
            "write yet and no schema declared at create time (write once, or "
            "create the table via SQL DDL / schema_json=)")
    return T.StructType.fromJson(__import__("json").loads(cfg.schema_json))


def nullable_type(dt: T.DataType) -> T.DataType:
    """Registered types are fully nullable (fields, array elements, map
    values) — the DataFrame-level analogue of Hudi's Avro nullable-union
    schemas. Without this, a first write whose expression outputs a
    non-nullable container (e.g. array of xxhash64) registers
    containsNull=false, and any later write carrying NULLs in that column
    (tombstone union, outer-join fill) dies in the cast to the registered
    type."""
    if isinstance(dt, T.StructType):
        return T.StructType([T.StructField(f.name, nullable_type(f.dataType),
                                           True, f.metadata)
                             for f in dt.fields])
    if isinstance(dt, T.ArrayType):
        return T.ArrayType(nullable_type(dt.elementType), True)
    if isinstance(dt, T.MapType):
        return T.MapType(nullable_type(dt.keyType),
                         nullable_type(dt.valueType), True)
    return dt


def rename_chains(cfg) -> dict:
    """final_name -> [older physical names, newest first].

    cfg.column_renames is chronological {"from","to"} entries
    (AlterHoodieTableChangeColumnCommand / TableChanges rename actions);
    chains (a->b->c) collapse so files of every era resolve to the current
    name at read."""
    chains: dict = {}
    for r in cfg.column_renames:
        olds = chains.pop(r["from"], [])
        chains[r["to"]] = [r["from"]] + olds
    return chains


def _historical_fields(cfg) -> list:
    """Renamed-away physical names, appended to read schemas so parquet files
    written before a rename still surface their values."""
    by_name = {f.name: f for f in business_schema(cfg).fields}
    out = []
    for final, olds in rename_chains(cfg).items():
        if final not in by_name:
            continue
        for old in olds:
            if old not in by_name:
                out.append(T.StructField(old, by_name[final].dataType, True))
    return out


def base_read_schema(cfg) -> T.StructType:
    return T.StructType(META_FIELDS + list(business_schema(cfg).fields)
                        + _historical_fields(cfg))


def delta_read_schema(cfg) -> T.StructType:
    return T.StructType(base_read_schema(cfg).fields +
                        [T.StructField(meta.OPERATION, T.StringType(), True)])


_LIST_THRESHOLD_CONF = "spark.sql.sources.parallelPartitionDiscovery.threshold"


@contextmanager
def _manifest_listing(spark, n_paths: int):
    """Every path handed to a manifest-driven read is a KNOWN leaf file, so
    the distributed listing JOB Spark launches above
    parallelPartitionDiscovery.threshold (default 32 paths) only re-stats
    them — ~0.5-1s of fixed latency per plan (measured: 172 local files
    list in ~0.15s driver-side vs ~0.6-1.0s as a job). Raise the crossover
    around THIS read only, restoring the session default afterwards, so
    the user's own non-hudi reads keep Spark's distributed-listing
    behavior. SPARK_GRAFT_LIST_THRESHOLD tunes the crossover for
    deployments where per-file stat is a remote round-trip (object
    stores); an explicit user session setting always wins."""
    try:
        thr = int(os.environ.get("SPARK_GRAFT_LIST_THRESHOLD", "10000"))
    except ValueError:
        thr = 10000
    # conf probing/setting stays OUTSIDE the yielding try: an exception
    # raised by the with-block body must propagate, not be swallowed here
    # (a second yield from an except around the body is a RuntimeError
    # that would mask the body's own error)
    raise_it = False
    try:
        # small list, huge list, or explicit user value: leave conf alone
        raise_it = 32 < n_paths <= thr \
            and spark.conf.get(_LIST_THRESHOLD_CONF) == "32"
        if raise_it:
            spark.conf.set(_LIST_THRESHOLD_CONF, str(thr))
    except Exception:        # noqa: BLE001 — conf surface varies by build
        raise_it = False
    if not raise_it:
        yield
        return
    try:
        yield
    finally:
        spark.conf.set(_LIST_THRESHOLD_CONF, "32")


def read_files(spark, paths: list[str], schema: T.StructType,
               cfg=None) -> DataFrame:
    if not paths:
        df = spark.createDataFrame([], schema)
    else:
        # dispatch by extension (HoodieFileFormat): ORC base files and
        # parquet delta/bootstrap files can share one logical scan
        orc = [p for p in paths if p.endswith(".orc")]
        pqt = [p for p in paths if not p.endswith(".orc")]
        parts = []
        with _manifest_listing(spark, len(paths)):
            if pqt:
                parts.append(spark.read.schema(schema).parquet(*pqt))
            if orc:
                # NB: DataFrameReader.orc(path, mergeSchema=...) — unlike
                # parquet(*paths) it is NOT varargs; pass the list
                parts.append(spark.read.schema(schema).orc(orc))
        df = parts[0]
        for extra in parts[1:]:
            df = df.unionByName(extra)
    if cfg is not None and cfg.column_renames:
        names = set(df.columns)
        for final, olds in rename_chains(cfg).items():
            present = [o for o in olds if o in names]
            if final in names and present:
                df = df.withColumn(
                    final, F.coalesce(F.col(final), *[F.col(o) for o in present])
                ).drop(*present)
    return df


_INTEGRAL_RANK = {"tinyint": 1, "smallint": 2, "int": 3, "bigint": 4}
_FRACTIONAL_RANK = {"float": 1, "double": 2}


def promoted_type(reg: T.DataType, inc: T.DataType) -> T.DataType | None:
    """Schema-on-write compatibility (the reference's Avro schema check on
    write + TableChanges type-widen): returns the WIDER type when the incoming
    column legally promotes the registered one (int->long, float->double,
    decimal widening), None when the existing cast is lossless, and raises on
    an incompatible narrowing (long into int, double into float, string into a
    numeric) that the old behavior silently nulled/overflowed."""
    rs, is_ = reg.simpleString(), inc.simpleString()
    if rs == is_:
        return None
    if rs in _INTEGRAL_RANK and is_ in _INTEGRAL_RANK:
        return inc if _INTEGRAL_RANK[is_] > _INTEGRAL_RANK[rs] else None
    if rs in _FRACTIONAL_RANK and is_ in _FRACTIONAL_RANK:
        return inc if _FRACTIONAL_RANK[is_] > _FRACTIONAL_RANK[rs] else None
    if rs in _FRACTIONAL_RANK and is_ in _INTEGRAL_RANK:
        return None                      # int -> double: legal Avro promotion
    if isinstance(reg, T.DecimalType) and isinstance(inc, T.DecimalType):
        if (inc.precision - inc.scale <= reg.precision - reg.scale
                and inc.scale <= reg.scale):
            return None
        ip = max(inc.precision - inc.scale, reg.precision - reg.scale)
        sc = max(inc.scale, reg.scale)
        return T.DecimalType(min(38, ip + sc), sc)
    incompatible = (
        (rs in _INTEGRAL_RANK and is_ in _FRACTIONAL_RANK)
        or ((rs in _INTEGRAL_RANK or rs in _FRACTIONAL_RANK
             or isinstance(reg, T.DecimalType)) and is_ == "string"))
    if incompatible:
        raise ValueError(
            f"incompatible write: incoming type {is_} does not fit registered "
            f"column type {rs} (schema-compatibility check; evolve the schema "
            f"explicitly instead of silently narrowing)")
    return None                          # other combos keep the legacy cast


class Writer:
    def __init__(self, table):
        self.t = table

    # ------------------------------------------------------------- plumbing
    @property
    def spark(self):
        return self.t.spark

    @property
    def cfg(self):
        return self.t.cfg

    @property
    def base(self):
        return self.t.base_path

    @property
    def storage(self):
        from .storage import get_storage
        return get_storage(self.t.base_path)

    def _lock(self):
        from .locks import make_lock
        return make_lock(os.path.join(self.base, ".hoodie", "lock"),
                         getattr(self.cfg, "lock_provider", "filesystem"),
                         expire_sec=getattr(self.cfg, "lock_expire_sec", 0.0))

    def _guard(self):
        """Write-wide mutual exclusion in single-writer mode (plus lazy
        healing of crashed-writer leftovers, Hudi's rollbackFailedWrites);
        a no-op under OCC, where only the commit itself takes the lock
        (WriteConcurrencyMode.java:30-32; LockManager around commit)."""
        import contextlib
        if self.cfg.concurrency_mode == "occ":
            return contextlib.nullcontext()

        @contextlib.contextmanager
        def guarded():
            with self._lock():
                self._heal_stale()
                yield
        return guarded()

    def _heal_stale(self) -> None:
        """Roll back failed writes lazily (BaseHoodieWriteClient.
        rollbackFailedWrites with LAZY cleaning): while we hold the
        single-writer lock no other writer can be active, so any pending
        write instant is a crashed/failed attempt — delete its staged and
        already-moved files (marker-based) and its timeline entries. A
        REQUESTED compaction plan is legitimate pending state (the
        schedule/run split) and is kept; an INFLIGHT one (crash mid-run) is
        fully aborted and must be rescheduled."""
        from .util import heartbeat_fresh
        aborted: set = set()
        for ins in self.t.timeline.pending():
            if ins.time in aborted:
                # _abort_staged removed EVERY state file of that instant;
                # the snapshot taken above may still carry its other
                # (requested/inflight) entry
                continue
            try:
                md = self.t.timeline.metadata(ins) or {}
            except FileNotFoundError:
                # an earlier iteration completed/aborted this instant's
                # other state entry and unlinked this file with it
                continue
            if ins.action == tl.CLEAN:
                # a crashed clean left a replayable plan: its deletes may
                # have partially run, so finish them (idempotent) rather
                # than waiting for the next clean (runPendingClean)
                from .services.cleaner import _execute_plan
                _execute_plan(self.t, ins.time, md)
                aborted.add(ins.time)
                continue
            if ins.action == tl.ROLLBACK:
                # same for crashed rollback plans (services/rollback.py)
                from .services.rollback import _execute_rollback
                _execute_rollback(self.t, ins.time, md)
                aborted.add(ins.time)
                continue
            if ins.action not in (tl.COMMIT, tl.DELTACOMMIT, tl.REPLACECOMMIT):
                continue
            if md.get("operation") == "compact" and ins.state == tl.REQUESTED:
                # legitimate schedule/run split plan, not a crashed write;
                # harmless to keep indefinitely (updates still append logs
                # above the plan's baseline, nothing is blocked)
                continue
            if md.get("operation") == "cluster" and ins.state == tl.REQUESTED:
                # a requested cluster plan REJECTS updates to its groups
                # (SparkRejectUpdateStrategy), so one whose owner died would
                # block writers forever: keep it only while its heartbeat is
                # fresh (scheduler stamps one; the runner keeps beating),
                # abort it once stale — the reference's
                # hoodie.clustering.rollback.pending.replacecommit
                if heartbeat_fresh(self.base, ins.time):
                    continue
                self._abort_staged(ins.time)
                aborted.add(ins.time)
                continue
            if heartbeat_fresh(self.base, ins.time):
                # a LIVE async service execution (HoodieHeartbeatClient
                # semantics): not a crashed write, leave it running
                continue
            self._abort_staged(ins.time)
            aborted.add(ins.time)
        # a crash BETWEEN save_completed and the marker/staging cleanup
        # leaves a durable commit with leftover bookkeeping: finish the
        # deferred cleanup (the data files are live — only the marker, the
        # emptied staging dir, and any superseded requested/inflight
        # timeline entries are stale; never _abort_staged here)
        done = {i.time for i in self.t.timeline.completed_write_instants()}
        done_acts = {(i.time, i.action)
                     for i in self.t.timeline.completed(actions=None)}
        for ins in self.t.timeline.instants(states=(tl.REQUESTED, tl.INFLIGHT)):
            if (ins.time, ins.action) in done_acts:
                self.storage.unlink(self.t.timeline.path(ins))
        mdir = os.path.join(self.base, ".hoodie", "markers")
        if self.storage.isdir(mdir):
            for f in self.storage.listdir(mdir):
                if f.endswith(".json") and f[:-len(".json")] in done:
                    self.storage.unlink(os.path.join(mdir, f))
        tdir = os.path.join(self.base, ".hoodie", ".temp")
        if self.storage.isdir(tdir):
            for d in self.storage.listdir(tdir):
                if d.rsplit("_", 1)[0] in done:
                    rm_rf(os.path.join(tdir, d))

    def _commit_completed(self, instant: str, action: str, md: dict) -> None:
        """Finalize a commit. Under OCC: take the table lock, validate that no
        commit completed since this write's view snapshot touches the same
        file groups (SimpleConcurrentFileWritesConflictResolutionStrategy),
        clean up staged files and abort on conflict."""
        from .services import validators as pv
        try:
            pv.run_precommit(self.t, instant, action, md)
        except pv.PreCommitValidationError:
            self._abort_staged(instant)
            raise
        # fold the HoodieMetrics counter set into the metadata BEFORE the
        # instant file lands: durable, archived with the timeline, exposed
        # by CALL show_commit_metrics (metrics.py)
        from . import metrics as _metrics
        _metrics.fold(md, action,
                      getattr(self, "_op_start", {}).pop(instant, None))
        if self.cfg.concurrency_mode != "occ":
            self.t.timeline.save_completed(instant, action, md)
            self._maybe_index_blooms(instant, md)
            self._fire_callbacks(instant, action, md)
            return
        touched = {(p, st["file_id"])
                   for p, sts in (md.get("partition_to_write_stats") or {}).items()
                   for st in sts}
        for p, fids in (md.get("replaced_file_groups") or {}).items():
            touched.update((p, f) for f in fids)
        since = getattr(self, "_occ_since", None) or "0"
        from .util import clear_heartbeat, touch_heartbeat
        touch_heartbeat(self.base, instant)
        with self._lock():
            if not any(i.time == instant for i in self.t.timeline.pending()):
                # the lazy failed-write cleaner decided this writer was dead
                # (heartbeat expired mid-write) and reclaimed its staged
                # files — completing now would commit dangling paths
                raise ConcurrentWriteConflictError(
                    f"instant {instant} was reclaimed by the failed-write "
                    "cleaner (heartbeat expired mid-write); retry the write")
            for ins in self.t.timeline.completed_write_instants():
                if not (since < ins.time and ins.time != instant):
                    continue
                other = self.t.timeline.metadata(ins)
                theirs = {(p, st["file_id"]) for p, sts in
                          (other.get("partition_to_write_stats") or {}).items()
                          for st in sts}
                for p, fids in (other.get("replaced_file_groups") or {}).items():
                    theirs.update((p, f) for f in fids)
                overlap = touched & theirs
                if overlap:
                    self._abort_staged(instant)
                    raise ConcurrentWriteConflictError(
                        f"commit {instant} conflicts with concurrent commit "
                        f"{ins.time} on file groups {sorted(overlap)[:5]}")
            self.t.timeline.save_completed(instant, action, md)
        clear_heartbeat(self.base, instant)
        self._maybe_index_blooms(instant, md)
        self._fire_callbacks(instant, action, md)

    def _fire_callbacks(self, instant: str, action: str, md: dict) -> None:
        """Post-commit notifications (HoodieWriteCommitCallback) and the
        metrics reporter (HoodieMetrics); failures log, never unwind a
        durable commit."""
        from . import callbacks, metrics
        callbacks.fire(self.cfg, self.base, instant, action, md,
                       extra=getattr(self.t, "_commit_listeners", ()))
        metrics.report(self.cfg, self.base, instant, action, md)

    def _maybe_index_blooms(self, instant: str, md: dict) -> None:
        """Synchronous bloom_filters maintenance on commit
        (HoodieBackedTableMetadataWriter.update equivalent): append bitsets
        for this commit's NEW base files. One narrow scan (3 meta columns) of
        just-written files — cost scales with the write batch, never the
        table. A failure here leaves index entries missing, not wrong: files
        without a bitset simply stay un-bloom-pruned at tag time."""
        if not self.cfg.bloom_index_enabled:
            return
        paths = [os.path.join(self.base, st["path"])
                 for sts in (md.get("partition_to_write_stats") or {}).values()
                 for st in sts if st.get("kind") == "base"]
        if not paths:
            return
        from . import bloom
        keys = (read_files(self.spark, paths, base_read_schema(self.cfg),
                           self.cfg)
                .select(F.col(meta.PARTITION_PATH).alias("partition"),
                        F.col(meta.FILE_NAME).alias("file_name"),
                        F.col(meta.RECORD_KEY).alias("key")))
        bloom.write_blooms(
            bloom.build_blooms(keys, self.cfg.bloom_bits_per_key,
                               self.cfg.bloom_num_hashes),
            self.base, instant)

    def _abort_staged(self, instant: str) -> None:
        """Delete this write's already-moved files + timeline leftovers
        (marker-based undo, MarkerBasedRollbackStrategy.java), plus any
        staging directory a mid-stage crash left behind."""
        # drop the commit timer too: aborted instants never reach
        # _commit_completed's pop, and a long-lived multi-writer process
        # retrying under OCC contention would otherwise grow the dict
        getattr(self, "_op_start", {}).pop(instant, None)
        marker = self._marker_path(instant)
        if self.storage.exists(marker):
            for rel in read_json(marker).get("files", []):
                self.storage.unlink(os.path.join(self.base, rel))
            self.storage.unlink(marker)
        temp_root = os.path.join(self.base, ".hoodie", ".temp")
        for kind in ("base", "delta"):
            rm_rf(os.path.join(temp_root, f"{instant}_{kind}"))
        for ins in self.t.timeline.pending():
            if ins.time == instant:
                try:
                    md = self.t.timeline.metadata(ins) or {}
                except FileNotFoundError:
                    md = {}
                if md.get("prev_rings"):
                    # a crashed consistent-bucket resize saved its NEW rings
                    # before committing; aborting the plan must put the old
                    # rings back or every later bucket-tagged write/delete
                    # targets ring nodes whose file groups don't exist —
                    # duplicate key versions across old/new groups (found by
                    # the bucket crash-DAG sweep)
                    from .services.rollback import _restore_rings
                    _restore_rings(self.t, md, instant)
                self.t.timeline.remove(instant, ins.action)
        from .util import clear_heartbeat
        clear_heartbeat(self.base, instant)

    # ------------------------------------------------------- incoming prep
    def prepare(self, df: DataFrame, instant: str) -> DataFrame:
        """Align to table schema (evolving it additively), derive key/partition
        via keygen expressions, stamp meta columns, normalize tombstones into
        the internal _hoodie_operation column."""
        cfg = self.cfg
        # keep the persisted keygen-semantics flags honest: a register()ed
        # shadow of a builtin name between table creation and this write
        # changes what the keys below actually are (config.py, ADVICE r6)
        cfgmod.refresh_keygen_flags(self.base, cfg)
        df = df.drop(*[c for c in meta.META_COLS + [meta.TARGET_FILE_ID] if c in df.columns])

        # enforce the reserved namespaces, not just use them: "_hoodie_"
        # belongs to the meta columns and the enumerated INTERNAL_PREFIXES
        # to internal lookup frames and footer-stat exclusions — a business
        # column there would resurface the ambiguous-reference failures the
        # prefixes exist to prevent, or silently lose its column stats.
        # Deliberately NOT a blanket "__" ban: the reference reserves only
        # the _hoodie_ namespace, and a table written by an earlier version
        # with e.g. a "__source" business column must stay writable.
        reserved = [c for c in df.columns
                    if (c.startswith("_hoodie_")
                        or c.startswith(meta.INTERNAL_PREFIXES))
                    and c != meta.DELETE_MARKER]
        if reserved:
            raise ValueError(
                f"column names in the '_hoodie_' namespace or with an "
                f"engine-internal prefix {meta.INTERNAL_PREFIXES} are "
                f"reserved: {sorted(reserved)}. Migration path: rename the "
                f"column before writing (ALTER TABLE ... RENAME COLUMN via "
                f"table.rename_column, then upsert under the new name).")

        marker_is_business = False
        if cfg.schema_json is None:
            fields = [f for f in df.schema.fields]
            cfg.schema_json = nullable_type(T.StructType(fields)).json()
            cfgmod.save_config(self.base, cfg)
            marker_is_business = meta.DELETE_MARKER in df.columns
        else:
            schema = business_schema(cfg)
            marker_is_business = meta.DELETE_MARKER in schema.fieldNames()
            # additive evolution: new incoming columns append to the registry
            # (AlterHoodieTableAddColumnsCommand.scala / TableChanges.java add)
            # dropped names never re-enter via additive evolution: values are
            # discarded (Avro projection — old-schema writers keep working)
            known = set(schema.fieldNames()) | set(cfg.dropped_columns)
            new_fields = [f for f in df.schema.fields
                          if f.name not in known and f.name != meta.DELETE_MARKER]
            if new_fields:
                schema = T.StructType(list(schema.fields)
                                      + [T.StructField(
                                          f.name, nullable_type(f.dataType),
                                          True) for f in new_fields])
                cfg.schema_json = schema.json()
                cfgmod.save_config(self.base, cfg)
            # type promotion / narrowing guard (reference: Avro schema
            # compatibility on write): widen the registry for wider incoming
            # types, refuse silent narrowing
            in_types = {f.name: f.dataType for f in df.schema.fields}
            promoted_fields, changed = [], False
            for f in business_schema(cfg).fields:
                inc = in_types.get(f.name)
                p = promoted_type(f.dataType, inc) if inc is not None else None
                if p is not None:
                    promoted_fields.append(T.StructField(f.name, p, True))
                    changed = True
                else:
                    promoted_fields.append(f)
            if changed:
                cfg.schema_json = T.StructType(promoted_fields).json()
                cfgmod.save_config(self.base, cfg)

        schema = business_schema(cfg)
        if payloads.get(cfg.payload).always_delete:
            # EmptyHoodieRecordPayload: every record is a tombstone
            tombstone = F.lit(True)
        elif meta.DELETE_MARKER in df.columns:
            tombstone = F.coalesce(F.col(meta.DELETE_MARKER).cast("boolean"),
                                   F.lit(False))
        else:
            tombstone = F.lit(False)
        cols = []
        for f in schema.fields:
            if f.name in df.columns:
                cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
            else:
                cols.append(F.lit(None).cast(f.dataType).alias(f.name))
        out = df.select(
            F.lit(instant).alias(meta.COMMIT_TIME),
            F.concat(F.lit(instant + "_"), F.spark_partition_id().cast("string"),
                     F.lit("-"), F.monotonically_increasing_id().cast("string")
                     ).alias(meta.COMMIT_SEQNO),
            record_key_expr(cfg).alias(meta.RECORD_KEY),
            partition_path_expr(cfg, df).alias(meta.PARTITION_PATH),
            F.lit("").alias(meta.FILE_NAME),
            *cols,
            F.when(tombstone, F.lit("D")).otherwise(F.lit("U")).alias(meta.OPERATION),
        )
        if not marker_is_business and meta.DELETE_MARKER in out.columns:
            out = out.drop(meta.DELETE_MARKER)
        return out

    # ------------------------------------------------------- staged writes
    def stage_write(self, df: DataFrame, instant: str, kind: str = "base",
                    sort_cols: list | None = None,
                    already_partitioned: bool = False,
                    drop_after_sort: list | None = None) -> dict:
        """Write one parquet file per (partition_path, file group) in a single
        Spark job, then move into place with driver-side renames.

        Equivalent of HoodieCreateHandle/HoodieMergeHandle/HoodieAppendHandle IO
        (hudi-client/hudi-client-common/.../io/) but expressed as one dynamic
        partitionBy write: all rows of a file group are co-located by the
        repartition, so each staging directory holds exactly one part file.
        """
        if self.cfg.index_type == "inmemory" \
                and meta.RECORD_KEY in df.columns \
                and meta.TARGET_FILE_ID in df.columns:
            # updateLocation (HoodieInMemoryHashIndex.java): remember every
            # written record's file group (testing index; driver-side collect
            # is the point — it only runs when this index is selected)
            idx = _INMEMORY_INDEX.setdefault(self.base, {})
            for r in df.select(meta.PARTITION_PATH, meta.RECORD_KEY,
                               meta.TARGET_FILE_ID).collect():
                idx[(r[0], r[1])] = r[2]
        if self.cfg.concurrency_mode == "occ":
            # refresh liveness before the (possibly long) write job so the
            # lazy failed-write cleaner never reaps a live writer
            from .util import touch_heartbeat
            touch_heartbeat(self.base, instant)
        fmt = self.cfg.base_format if kind == "base" else "parquet"
        if fmt not in ("parquet", "orc"):
            raise ValueError(f"unsupported base_format {fmt!r} "
                             "(HoodieFileFormat: parquet | orc)")
        ext = f".{fmt}" if kind == "base" else ".delta.parquet"
        staging = os.path.join(self.base, ".hoodie", ".temp", f"{instant}_{kind}")
        rm_rf(staging)
        if kind == "base" and meta.OPERATION in df.columns:
            df = df.drop(meta.OPERATION)   # change-op is delta-file-only state

        df = (df.withColumn(meta.FILE_NAME,
                            F.concat(F.col(meta.TARGET_FILE_ID), F.lit("_" + instant + ext)))
                .withColumn("__pp", F.when(F.col(meta.PARTITION_PATH) == "",
                                           F.lit(ROOT_SENTINEL))
                                     .otherwise(F.col(meta.PARTITION_PATH)))
                .withColumnRenamed(meta.TARGET_FILE_ID, "__fid"))
        if not already_partitioned:
            df = df.repartition("__pp", "__fid")
        df = df.sortWithinPartitions("__pp", "__fid", *(sort_cols or []))
        if drop_after_sort:
            # project AFTER the sort: ordering flows through the projection, so
            # transient sort keys (e.g. space-curve values) never hit parquet
            df = df.drop(*drop_after_sort)
        w = df.write.mode("overwrite").partitionBy("__pp", "__fid")
        if fmt == "parquet":
            codec = getattr(self.cfg, "parquet_codec", None) or "zstd"
            w = w.option("compression", codec)
            level = getattr(self.cfg, "parquet_codec_level", None)
            if codec == "zstd" and level:
                # write options merge into THIS job's hadoop conf
                # (newHadoopConfWithOptions) — scoped, unlike a session
                # default; level 1 per the r8 cold-JVM codec A/B
                w = w.option("parquet.compression.codec.zstd.level",
                             str(level))
        w.format(fmt).save(staging)

        moves = []   # (src, dest_rel, partition, fid)
        for ppdir in self.storage.listdir(staging):
            if not ppdir.startswith("__pp="):
                continue
            ppval = urllib.parse.unquote(ppdir[len("__pp="):])
            partition = "" if ppval == ROOT_SENTINEL else ppval
            for fiddir in self.storage.listdir(os.path.join(staging, ppdir)):
                if not fiddir.startswith("__fid="):
                    continue
                fid = urllib.parse.unquote(fiddir[len("__fid="):])
                d = os.path.join(staging, ppdir, fiddir)
                parts = [f for f in self.storage.listdir(d)
                         if f.endswith((".parquet", ".orc"))]
                assert len(parts) == 1, f"file group split across tasks: {d} -> {parts}"
                dest_rel = os.path.join(partition, f"{fid}_{instant}{ext}") if partition \
                    else f"{fid}_{instant}{ext}"
                moves.append((os.path.join(d, parts[0]), dest_rel, partition, fid))

        # marker file BEFORE any move: enables rollback of a crashed commit
        # (MarkerBasedRollbackStrategy.java / MarkerType.DIRECT)
        self._append_marker(instant, [m[1] for m in moves])

        stats_by_partition: dict = {}
        stats_cols = self._stats_columns()

        def _move_and_stat(m):
            src, dest_rel, partition, fid = m
            dest = os.path.join(self.base, dest_rel)
            self.storage.move(src, dest)
            st = (_orc_file_stats(dest, stats_cols)
                  if dest.endswith(".orc")
                  else _parquet_footer_stats(dest, stats_cols))
            st.update({"file_id": fid, "file_name": os.path.basename(dest_rel),
                       "path": dest_rel, "kind": kind})
            return partition, st

        with ThreadPoolExecutor(max_workers=16) as ex:
            for partition, st in ex.map(_move_and_stat, moves):
                stats_by_partition.setdefault(partition, []).append(st)
        rm_rf(staging)
        return stats_by_partition

    def _marker_path(self, instant: str) -> str:
        return os.path.join(self.base, ".hoodie", "markers", f"{instant}.json")

    def _append_marker(self, instant: str, rel_paths: list[str]) -> None:
        p = self._marker_path(instant)
        existing = read_json(p)["files"] if self.storage.exists(p) else []
        atomic_write_json(p, {"files": existing + rel_paths})

    def _remove_marker(self, instant: str) -> None:
        self.storage.unlink(self._marker_path(instant))

    def _stats_columns(self) -> list[str] | None:
        return self.cfg.stats_columns

    # ----------------------------------------------------------- bucketing
    def _avg_record_size(self) -> int:
        """averageBytesPerRecord from recent commit metadata
        (UpsertPartitioner.java:161-166), falling back to the config default."""
        for ins in reversed(self.t.timeline.completed_write_instants()):
            md = self.t.timeline.metadata(ins)
            rec, byt = md.get("total_records", 0), md.get("total_bytes", 0)
            if rec and byt:
                return max(16, byt // rec)
        return self.cfg.record_size_estimate

    def assign_buckets(self, inserts: DataFrame, view: FileSystemView | None,
                       pack_small_files: bool,
                       blocked_groups: set | None = None,
                       counts: dict | None = None) -> tuple[DataFrame, set]:
        """Route insert rows to file groups: fill undersized existing groups
        first (small-file bin packing, UpsertPartitioner.java:94-178), spill the
        rest to new groups sized by target_file_bytes.

        Assignment = pmod(xxhash64(key), partition_weight) mapped onto weighted
        bucket ranges via ONE broadcast join — no shuffle, no global ordering.

        ``counts`` (partition -> insert row count) skips the counting job
        when the caller already aggregated it (upsert folds it into its
        one tagged-batch pass).
        """
        cfg = self.cfg
        if counts is None:
            counts = {r[0]: r[1] for r in
                      inserts.groupBy(meta.PARTITION_PATH).count().collect()}
        if not counts:
            empty = inserts.withColumn(meta.TARGET_FILE_ID, F.lit(None).cast("string"))
            return empty.filter(F.lit(False)), set()
        avg = self._avg_record_size()
        rpf = max(1, cfg.target_file_bytes // avg)   # records per new file
        rows, packed = [], set()
        for p, n in sorted(counts.items()):
            buckets = []   # (fid, weight, existing)
            if pack_small_files and view is not None:
                for g, s in view.live_slices([p]):
                    bf = s.base_file
                    if bf is None or s.deltas:
                        continue
                    if blocked_groups and (g.partition, g.file_id) in blocked_groups:
                        continue   # group under pending clustering: open a
                        # new group instead of racing the rewrite
                    if bf.bytes < cfg.small_file_limit_bytes:
                        cap = (cfg.target_file_bytes - bf.bytes) // avg
                        if cap > 0:
                            buckets.append([g.file_id, int(cap), True])
            cap_total = sum(b[1] for b in buckets)
            remaining = n - cap_total
            if remaining > 0 or not buckets:
                nfiles = max(1, math.ceil(max(remaining, 0) / rpf))
                for _ in range(nfiles):
                    buckets.append([new_file_id(), int(rpf), False])
            w = sum(b[1] for b in buckets)
            lo = 0
            for fid, weight, existing in buckets:
                rows.append((p, w, lo, lo + weight, fid, existing))
                lo += weight
                if existing:
                    packed.add((p, fid))
        # reserved-prefixed range columns: bare names (p, w, fid, ...) would
        # be ambiguous against business columns of the same name
        ranges = self.spark.createDataFrame(
            rows, "__pk_p string, __pk_w long, __pk_lo long, __pk_hi long, "
                  "__pk_fid string, __pk_existing boolean")
        h = F.pmod(F.xxhash64(F.col(meta.RECORD_KEY)), F.col("__pk_w"))
        assigned = (inserts.join(F.broadcast(ranges),
                                 (F.col(meta.PARTITION_PATH)
                                  == F.col("__pk_p"))
                                 & (h >= F.col("__pk_lo"))
                                 & (h < F.col("__pk_hi")))
                    .withColumn(meta.TARGET_FILE_ID, F.col("__pk_fid"))
                    .drop("__pk_p", "__pk_w", "__pk_lo", "__pk_hi",
                          "__pk_fid", "__pk_existing"))
        return assigned, packed

    # --------------------------------------------------------------- index
    def _candidate_base_files(self, view: FileSystemView, partitions,
                              incoming: DataFrame,
                              ignore_partition: bool = False,
                              bands: dict | None = None) -> list[str]:
        """Key-range file pruning before the tag join — the bloom-index plan
        (HoodieBloomIndex.java:89-161 + IntervalTreeBasedIndexFileFilter.java):
        every live base file carries _hoodie_record_key min/max in its footer
        stats; a file is a tag candidate only if some incoming key can land in
        its range.

        Stage 1 is DRIVER-SIDE and costs at most one tiny agg job: the
        incoming batch's per-partition key band (min/max — callers that
        already aggregate over the batch pass it in via ``bands`` for zero
        extra jobs) is interval-intersected with each file's key range, the
        exact overlap test of IntervalTreeBasedIndexFileFilter. On a
        GLOBAL_SORT table with localized updates this shrinks the tag scan
        from O(partition) to the few files the band touches. Stage 2 (bloom
        only) runs the per-key probe join + bitset check over stage-1
        survivors, where per-key precision actually pays (sparse keys inside
        wide bands). Files written before key stats existed have no range and
        stay unpruned."""
        slices = view.live_slices(None if self.cfg.global_index else partitions)
        per_partition = not self.cfg.global_index and not ignore_partition \
            and meta.PARTITION_PATH in incoming.columns
        if bands is None:
            if per_partition:
                rows = (incoming.groupBy(meta.PARTITION_PATH)
                        .agg(F.min(meta.RECORD_KEY).alias("kmin"),
                             F.max(meta.RECORD_KEY).alias("kmax")).collect())
                bands = {r[0]: (r[1], r[2]) for r in rows}
            else:
                r = incoming.agg(F.min(meta.RECORD_KEY),
                                 F.max(meta.RECORD_KEY)).collect()[0]
                bands = {None: (r[0], r[1])}
        if not per_partition and None not in bands:
            # collapse to one global band (global index: an incoming key may
            # be stored under any partition)
            mins = [b[0] for b in bands.values() if b[0] is not None]
            maxs = [b[1] for b in bands.values() if b[1] is not None]
            bands = {None: (min(mins, default=None), max(maxs, default=None))}
        ranged, unpruned = [], []
        for g, s in slices:
            ks = (s.base_file.col_stats or {}).get(meta.RECORD_KEY) or {}
            kmin, kmax = ks.get("min"), ks.get("max")
            if kmin is None or kmax is None:
                unpruned.append(view.abs(s.base_file.path))
                continue
            b = bands.get(None) if None in bands else bands.get(g.partition)
            if b is None or b[0] is None or b[1] is None:
                continue            # no incoming rows can touch this file
            if str(kmax) < str(b[0]) or str(kmin) > str(b[1]):
                continue            # disjoint ranges -> pruned
            ranged.append((g.partition, s.base_file.path,
                           str(kmin), str(kmax)))
        if not ranged:
            return unpruned
        if not self.cfg.bloom_index_enabled:
            return [view.abs(p) for _, p, _, _ in ranged] + unpruned
        rdf = self.spark.createDataFrame(
            ranged, "p string, path string, kmin string, kmax string")
        cond = ((F.col(meta.RECORD_KEY) >= F.col("kmin"))
                & (F.col(meta.RECORD_KEY) <= F.col("kmax")))
        probe_cols = [meta.RECORD_KEY]
        if per_partition:
            cond = cond & (F.col(meta.PARTITION_PATH) == F.col("p"))
            probe_cols.insert(0, meta.PARTITION_PATH)
        hits = incoming.select(*probe_cols).join(F.broadcast(rdf), cond)
        hits = self._bloom_prune(hits)
        rows = hits.select("path").distinct().collect()
        return [view.abs(r[0]) for r in rows] + unpruned

    def _bloom_prune(self, hits: DataFrame) -> DataFrame:
        """Second pruning layer after key ranges (HoodieBloomIndex.java:115-132
        probe, HoodieMetadataBloomIndexCheckFunction.java): a (key, candidate
        file) pair survives only if the file has no bitset or all k bits for
        the key are set. The bloom side is NOT force-broadcast — AQE
        broadcasts small candidate sets and shuffle-joins big ones, so a
        100 TB table with thousands of MB-sized bitsets can't OOM the driver."""
        from . import bloom
        bl = bloom.load_blooms(self.spark, self.base, self.cfg.bloom_num_hashes)
        if bl is None:
            return hits
        bl = bl.select(F.col("file_name").alias("__bf"),
                       F.col("num_bits").alias("__bm"),
                       F.col("bitset").alias("__bs"))
        fname = F.element_at(F.split(F.col("path"), "/"), -1)
        pairs = (hits.withColumn("__bk", F.col(meta.RECORD_KEY))
                 .join(bl, fname == F.col("__bf"), "left"))
        keep = F.col("__bf").isNull() \
            | F.expr(bloom.probe_sql(self.cfg.bloom_num_hashes))
        return pairs.filter(keep).drop("__bf", "__bm", "__bs", "__bk")

    def _meta_scan(self, view: FileSystemView, paths: list[str]) -> DataFrame:
        """Read base files with their hudi meta columns; bootstrapped source
        files lack them, so reconstruct (wider scan only for bootstrapped
        tables)."""
        from .reader import bootstrap_instant, fill_bootstrap_meta
        bs = bootstrap_instant(self.t.timeline)
        if bs:
            return fill_bootstrap_meta(
                self.spark,
                read_files(self.spark, paths, base_read_schema(self.cfg), self.cfg),
                self.cfg, view, bs)
        return read_files(self.spark, paths, base_read_schema(self.cfg),
                          self.cfg)

    def _drop_existing_keys(self, df: DataFrame) -> DataFrame:
        """INSERT_DROP_DUPS for the bucket-index path: anti-join the raw
        incoming batch against located keys BEFORE the write routes through
        bucket assignment (the non-bucket path does this inline in insert()).
        Keys/partitions are derived with the keygen expressions; the location
        scan is the usual key-range-pruned meta scan."""
        from .keygen import partition_path_expr, record_key_expr
        keyed = (df.withColumn(meta.RECORD_KEY, record_key_expr(self.cfg))
                 .withColumn(meta.PARTITION_PATH,
                             partition_path_expr(self.cfg, df)))
        band_rows = (keyed.groupBy(meta.PARTITION_PATH)
                     .agg(F.min(meta.RECORD_KEY).alias("kmin"),
                          F.max(meta.RECORD_KEY).alias("kmax"))
                     .collect())
        partitions = [r[0] for r in band_rows]
        bands = {r[0]: (r[1], r[2]) for r in band_rows}
        loc = self._location_df(self.t.view(), partitions, keyed, bands=bands)
        if loc is None:
            return df
        if self.cfg.global_index:
            on = [meta.RECORD_KEY]
        else:
            on = [meta.RECORD_KEY, meta.PARTITION_PATH]
            loc = loc.withColumnRenamed("__loc_pp", meta.PARTITION_PATH)
        return (keyed.join(loc.select(*on), on=on, how="left_anti")
                .drop(meta.RECORD_KEY, meta.PARTITION_PATH))

    def _location_df(self, view: FileSystemView, partitions: list[str],
                     incoming: DataFrame | None = None,
                     bands: dict | None = None) -> DataFrame | None:
        """HoodieSimpleIndex.tagLocation (index/simple/HoodieSimpleIndex.java:50):
        key -> (partition, fileId) from live base files, reading only the three
        meta columns (parquet column pruning keeps this scan narrow). When the
        incoming batch is provided, candidate files are key-range pruned first
        (see _candidate_base_files)."""
        if self.cfg.index_type == "inmemory":
            idx = _INMEMORY_INDEX.get(self.base, {})
            pset = None if (self.cfg.global_index or partitions is None) \
                else set(partitions)
            rows = [(k, pp, fid) for (pp, k), fid in idx.items()
                    if pset is None or pp in pset]
            if not rows:
                return None
            return self.spark.createDataFrame(
                rows, f"{meta.RECORD_KEY} string, __loc_pp string, "
                      "__loc_fid string")
        if incoming is not None:
            paths = self._candidate_base_files(view, partitions, incoming,
                                               bands=bands)
        else:
            paths = view.live_base_files(None if self.cfg.global_index else partitions)
        if not paths:
            return None
        df = self._meta_scan(view, paths)
        df = (df.select(F.col(meta.RECORD_KEY),
                        F.col(meta.PARTITION_PATH).alias("__loc_pp"),
                        meta.file_id_from_name().alias("__loc_fid")))
        dead = self._shadow_deleted_keys(view, set(paths))
        if dead is not None:
            df = df.join(dead, on=[meta.RECORD_KEY, "__loc_pp", "__loc_fid"],
                         how="left_anti")
        return df

    def _shadow_deleted_keys(self, view: FileSystemView,
                             candidate_paths: set) -> DataFrame | None:
        """Keys whose base-file copy is shadowed by a live delta tombstone
        (MOR, pre-compaction). The plain base meta scan would tag such a key
        to its OLD file group, so with a global index a re-insert of a
        deleted key would be revived in the old partition — and the row's
        physical placement would then depend on compaction timing. Resolving
        the dirty groups' (key, partition) winners (same ordering as
        payloads.resolve) and subtracting tombstone winners makes placement
        deterministic: a deleted key always re-inserts into its keygen
        partition, exactly like COW (where the delete rewrote the base).

        Only dirty groups (those with deltas) can shadow, and only the ones
        whose base file survived the key-range candidate prune can mistag —
        so this subplan reads nothing after compaction, nothing outside the
        incoming key bands, and only meta + precombine columns.
        """
        from pyspark.sql import Window
        if self.cfg.table_type != cfgmod.MOR or not self.cfg.global_index:
            return None
        dirty = [(g, s) for g, s in view.live_slices()
                 if s.deltas and s.base_file is not None
                 and view.abs(s.base_file.path) in candidate_paths]
        if not dirty:
            return None
        spec = payloads.get(self.cfg.payload)
        fields = payloads._ordering_fields(spec, self.cfg)
        bases = [view.abs(s.base_file.path) for g, s in dirty if s.base_file]
        deltas = [view.abs(d.path) for g, s in dirty for d in s.deltas]
        b = read_files(self.spark, bases, base_read_schema(self.cfg), self.cfg)
        d = read_files(self.spark, deltas, delta_read_schema(self.cfg), self.cfg)
        u = b.unionByName(d, allowMissingColumns=True)
        narrow = [meta.RECORD_KEY, meta.PARTITION_PATH, meta.FILE_NAME,
                  meta.COMMIT_TIME, meta.COMMIT_SEQNO, meta.OPERATION,
                  meta.DELETE_MARKER]
        if self.cfg.precombine_field:
            narrow.append(self.cfg.precombine_field)
        u = u.select(*[c for c in dict.fromkeys(narrow) if c in u.columns])
        # resolve per FILE GROUP, not per partition: a re-inserted copy of a
        # deleted key may live in a fresh group of the SAME partition, and
        # its live location must not be wiped by the old group's tombstone
        # (found by the randomized DAG sweep, seed 203)
        u = u.withColumn("__loc_fid", meta.file_id_from_name())
        w = (Window.partitionBy(meta.RECORD_KEY, meta.PARTITION_PATH,
                                "__loc_fid")
             .orderBy(*payloads._desc([f for f in fields if f in u.columns])))
        winner = (u.withColumn("__rn", F.row_number().over(w))
                   .filter(F.col("__rn") == 1))
        return (winner.filter(payloads.is_tombstone(winner))
                      .select(F.col(meta.RECORD_KEY),
                              F.col(meta.PARTITION_PATH).alias("__loc_pp"),
                              F.col("__loc_fid")))

    @staticmethod
    def emptied_groups(affected: set, stats_by_partition: dict) -> dict:
        """Groups whose rewrite produced ZERO rows (every row deleted): no new
        file exists, so the group must be marked replaced or the stale old
        slice would stay live and resurrect deleted rows."""
        written = {(p, st["file_id"]) for p, sts in stats_by_partition.items()
                   for st in sts}
        out: dict = {}
        for p, fid in sorted(affected - written):
            out.setdefault(p, []).append(fid)
        return out

    # ------------------------------------------------------------ commits
    def set_extra_metadata(self, extra: dict | None) -> None:
        """Attach caller metadata to the NEXT commit (Hudi's extraMetadata:
        DeltaStreamer checkpoints, streaming batch ids). Consumed once —
        the streaming sink sets it per micro-batch so a replayed batch can
        be recognized and skipped (HoodieStreamingSink.scala's
        latestBatchId / STREAMING_BATCH_ID mechanism)."""
        self._extra_md = extra

    def _commit_md(self, operation: str, stats_by_partition: dict,
                   replaced: dict | None = None,
                   consume_extra: bool = True) -> dict:
        total_records = sum(s.get("records", 0) for sts in stats_by_partition.values()
                            for s in sts)
        total_bytes = sum(s.get("bytes", 0) for sts in stats_by_partition.values()
                          for s in sts)
        md = {"operation": operation, "schema": self.cfg.schema_json,
              "partition_to_write_stats": stats_by_partition,
              "replaced_file_groups": replaced or {},
              "total_records": total_records, "total_bytes": total_bytes}
        # consume_extra=False for service commits that may run on a
        # background thread (async compaction): they must not steal the
        # caller-attached metadata destined for the next WRITE commit
        extra = getattr(self, "_extra_md", None) if consume_extra else None
        if extra:
            md["extra_metadata"] = extra
            self._extra_md = None
        return md

    def _mint(self, action: str, md: dict) -> str:
        """Mint a write instant in requested state. Under OCC the writer also
        stamps (and keeps refreshing, see stage_write/_commit_completed) a
        heartbeat: multi-writer mode has no single-writer guard, so LIVENESS —
        not the lock — is what tells the lazy failed-write cleaner that a
        pending instant's owner is still alive (HoodieHeartbeatClient.start;
        hoodie.cleaner.policy.failed.writes=LAZY)."""
        instant = self.t.timeline.new_instant()
        # commit timer starts at mint (HoodieMetrics.getCommitCtx shape)
        from . import metrics as _metrics
        if not hasattr(self, "_op_start"):
            self._op_start = {}
        self._op_start[instant] = _metrics.now()
        if self.cfg.concurrency_mode == "occ":
            # stamp BEFORE the requested file lands: a cleaner must never
            # observe a pending instant without its liveness marker
            from .util import touch_heartbeat
            touch_heartbeat(self.base, instant)
        self.t.timeline.save_requested(instant, action, md)
        return instant

    # ========================================================== operations
    def upsert(self, df: DataFrame, operation: str = "upsert") -> str:
        """WriteOperationType.UPSERT (SparkRDDWriteClient.java:150): precombine,
        tag against the index, rewrite affected file groups (COW) or append
        delta files (MOR), insert the rest with small-file packing."""
        cfg, spec = self.cfg, payloads.get(self.cfg.payload)
        cow = cfg.table_type == cfgmod.COW
        action = tl.COMMIT if cow else tl.DELTACOMMIT
        with self._guard():
            instant = self._mint(action, {"operation": operation})
            incoming = payloads.precombine(self.prepare(df, instant), cfg, spec)
            incoming.persist()
            try:
                view = self.t.view()
                self._occ_since = self.t.timeline.latest_completed_write().time if self.t.timeline.latest_completed_write() else "0"
                if cfg.index_type in ("bucket", "bucket_consistent"):
                    return self._upsert_bucket(incoming, view, instant,
                                               operation, action)
                # ONE agg job yields both the touched partitions and the
                # per-partition key bands the candidate-file prune needs
                band_rows = (incoming.groupBy(meta.PARTITION_PATH)
                             .agg(F.min(meta.RECORD_KEY).alias("kmin"),
                                  F.max(meta.RECORD_KEY).alias("kmax"))
                             .collect())
                partitions = [r[0] for r in band_rows]
                bands = {r[0]: (r[1], r[2]) for r in band_rows}
                loc = self._location_df(view, partitions, incoming, bands=bands)
                if loc is None:
                    tagged = (incoming
                              .withColumn("__loc_pp", F.lit(None).cast("string"))
                              .withColumn("__loc_fid", F.lit(None).cast("string")))
                else:
                    on = [meta.RECORD_KEY] if cfg.global_index \
                        else [meta.RECORD_KEY, meta.PARTITION_PATH]
                    if cfg.global_index:
                        tagged = incoming.join(loc, on=on, how="left")
                        # global index default: update lands in the stored
                        # partition (HoodieGlobalSimpleIndex, update_partition_path=false)
                        tagged = tagged.withColumn(
                            meta.PARTITION_PATH,
                            F.coalesce(F.col("__loc_pp"), F.col(meta.PARTITION_PATH)))
                    else:
                        loc = loc.withColumnRenamed("__loc_pp", meta.PARTITION_PATH)
                        tagged = incoming.join(loc, on=on, how="left")
                tagged.persist()
                updates = (tagged.filter(F.col("__loc_fid").isNotNull())
                           .withColumn(meta.TARGET_FILE_ID, F.col("__loc_fid"))
                           .drop("__loc_fid", "__loc_pp"))
                inserts = (tagged.filter(F.col("__loc_fid").isNull())
                           .drop("__loc_fid", "__loc_pp")
                           .filter(F.col(meta.OPERATION) != "D"))  # delete of absent key = no-op
                # ONE pass over the tagged batch yields everything the
                # driver needs downstream: the touched file groups (the
                # COW rewrite set / clustering-conflict probe — every
                # update, deletes included, rewrites its group) and the
                # per-partition INSERT counts assign_buckets sizes new
                # groups from — previously two separate jobs (a distinct
                # collect over updates + a groupBy count over inserts)
                tag_rows = (tagged.groupBy(meta.PARTITION_PATH, "__loc_fid")
                            .agg(F.count(F.when(
                                F.col(meta.OPERATION) != "D", True))
                                .alias("__n_live"),
                                F.count(F.lit(1)).alias("__n_all"))
                            .collect())
                upd_groups = {(r[0], r[1]) for r in tag_rows
                              if r[1] is not None}
                ins_counts = {r[0]: r[2] for r in tag_rows
                              if r[1] is None and r[2] > 0}
                n_upd_rows = sum(r[3] for r in tag_rows if r[1] is not None)
                # groups under a pending clustering plan: updates rejected
                # (SparkRejectUpdateStrategy), inserts never pack into them.
                # The extra distinct-collect below runs ONLY while a
                # clustering is pending.
                from .services.clustering import pending_clustering_groups
                blocked = pending_clustering_groups(self.t.timeline)
                if blocked and self.cfg.concurrency_mode == "occ":
                    # single-writer mode reaps a dead scheduler's plan in the
                    # write guard; under OCC no guard runs, so without this a
                    # stale plan would wedge EVERY writer until a clean runs.
                    # Reap stale-heartbeat cluster plans here, under the
                    # lock (live runs keep beating and stay untouched).
                    from .util import heartbeat_fresh
                    stale = set()
                    for i in self.t.timeline.pending():
                        if i.action != tl.REPLACECOMMIT:
                            continue
                        try:
                            op = (self.t.timeline.metadata(i) or {}) \
                                .get("operation")
                        except FileNotFoundError:
                            continue
                        if op == "cluster" \
                                and not heartbeat_fresh(self.base, i.time):
                            stale.add(i.time)
                    if stale:
                        with self._lock():
                            for s in sorted(stale):
                                self._abort_staged(s)
                        blocked = pending_clustering_groups(self.t.timeline)
                if blocked:
                    bad = sorted(upd_groups & blocked)
                    if bad:
                        # controlled rejection, not a crash: the writer is
                        # alive, so retract its own minted instant (and OCC
                        # heartbeat) instead of leaving a pending commit for
                        # the failed-write healer/cleaner to reap later.
                        self._abort_staged(instant)
                        raise ClusteringUpdateRejected(
                            f"updates target file group(s) under pending "
                            f"clustering: {bad[:5]}")
                inserts_assigned, packed = self.assign_buckets(
                    inserts, view, pack_small_files=cow,
                    blocked_groups=blocked, counts=ins_counts)
                if cow:
                    affected = upd_groups | packed
                    old_paths = [view.abs(s.base_file.path)
                                 for g, s in view.live_slices()
                                 if (g.partition, g.file_id) in affected]
                    old = read_files(self.spark, old_paths, base_read_schema(cfg), cfg)
                    from .reader import bootstrap_instant, fill_bootstrap_meta
                    bs = bootstrap_instant(self.t.timeline)
                    if bs:
                        old = fill_bootstrap_meta(self.spark, old, cfg, view, bs)
                    old = old.withColumn(meta.TARGET_FILE_ID,
                                         meta.file_id_from_name())
                    # contested-key split: the payload window (exchange+sort)
                    # runs ONLY over updated keys; unchanged rows of rewritten
                    # files and fresh inserts stream through without shuffling
                    # (incoming was already precombined, so inserts are
                    # key-unique by construction)
                    if not upd_groups:
                        # all-inserts batch (every first derived-table sync,
                        # packing-only rewrites): live-file rows are
                        # key-unique and inserts target absent keys, so the
                        # split/window machinery would be a provable no-op —
                        # stream both sides straight to the write
                        merged = old.unionByName(inserts_assigned,
                                                 allowMissingColumns=True)
                    elif (jr := self._resolve_by_broadcast_join(
                            old, updates, spec, n_upd_rows)) is not None:
                        # small batch + ordering-resolvable payload: ONE
                        # scan of the affected files, no window at all
                        merged = jr.unionByName(inserts_assigned,
                                                allowMissingColumns=True)
                    else:
                        on = [meta.PARTITION_PATH, meta.RECORD_KEY]
                        ukeys = updates.select(*on).distinct()
                        untouched = old.join(ukeys, on=on, how="left_anti")
                        contested = old.join(ukeys, on=on, how="left_semi")
                        resolved = payloads.resolve(
                            contested.unionByName(updates,
                                                  allowMissingColumns=True),
                            cfg, spec, drop_deletes=True)
                        merged = (resolved
                                  .unionByName(untouched,
                                               allowMissingColumns=True)
                                  .unionByName(inserts_assigned,
                                               allowMissingColumns=True))
                    stats = self.stage_write(merged, instant, "base")
                    replaced = self.emptied_groups(affected, stats)
                else:
                    replaced = None
                    # the one-pass tagged agg proves which side is empty —
                    # skip that side's write JOB outright (a delta-only
                    # upsert previously still paid a full empty base write:
                    # repartition + dynamic-partition commit + listing)
                    stats = self.stage_write(updates, instant, "delta") \
                        if upd_groups else {}
                    base_stats = self.stage_write(
                        inserts_assigned, instant, "base") \
                        if ins_counts else {}
                    for p, sts in base_stats.items():
                        stats.setdefault(p, []).extend(sts)
                md = self._commit_md(operation, stats, replaced)
                self._commit_completed(instant, action, md)
                self._remove_marker(instant)
                return instant
            finally:
                incoming.unpersist()
                try:
                    tagged.unpersist()
                except Exception:
                    pass

    def _resolve_by_broadcast_join(self, old: DataFrame, updates: DataFrame,
                                   spec, n_updates: int) -> DataFrame | None:
        """COW contested-key resolution as ONE broadcast join over ONE scan
        of the affected files, replacing the semi+anti double scan + the
        payload window when (a) the payload resolves by ordering fields
        alone (no column_merge, no custom resolve_fn) and (b) the update
        batch is small enough to broadcast (estimated as tagged-update
        count x the table's average record size;
        SPARK_GRAFT_UPSERT_BROADCAST_BYTES overrides the 64 MB default —
        at cluster scale a bigger driver/executor heap can carry more).

        Replays payloads.resolve exactly for this shape: per key at most
        ONE live old row (live COW base files are key-unique) meets at
        most ONE precombined update, so the window's max-over-ordering-
        fields degenerates to a pairwise comparison — for commit-time-
        ordered payloads the update always wins (its commit instant is
        strictly newer than every stored one); for event-time-ordered
        payloads the update wins iff coalesce(u.pre >= o.pre, o.pre IS
        NULL) (desc_nulls_last: a NULL ordering value is weakest; an
        exact tie falls to the newer commit time, i.e. the update). A
        winning tombstone drops the row (the drop_deletes=True path).
        Returns None when the gate fails — the caller keeps the
        two-probe split plan, which never materializes the batch on the
        driver."""
        cfg = self.cfg
        if spec.resolve_fn is not None or spec.column_merge:
            return None
        try:
            cap = int(os.environ.get("SPARK_GRAFT_UPSERT_BROADCAST_BYTES",
                                     64 * 1024 * 1024))
        except ValueError:
            cap = 64 * 1024 * 1024
        if cap <= 0 or n_updates * self._avg_record_size() > cap:
            return None
        keys = [meta.RECORD_KEY] if cfg.global_index \
            else [meta.PARTITION_PATH, meta.RECORD_KEY]
        pre = cfg.precombine_field
        upd_cols = [c for c in updates.columns if c not in keys]
        u = updates.select(
            *keys,
            payloads.is_tombstone(updates).alias("__u_tomb"),
            F.lit(True).alias("__u_hit"),
            *[F.col(c).alias(f"__u_{c}") for c in upd_cols])
        j = old.join(F.broadcast(u), on=keys, how="left")
        if spec.event_time_ordered and pre:
            win = F.coalesce(F.col(f"__u_{pre}") >= F.col(pre),
                             F.col(pre).isNull())
        else:
            win = F.lit(True)
        take_u = F.coalesce(F.col("__u_hit"), F.lit(False)) & win
        old_cols, upd_set = set(old.columns), set(upd_cols)
        out = []
        for c in dict.fromkeys(list(old.columns) + upd_cols):
            if c in keys:
                out.append(F.col(c))
                continue
            u_c = F.col(f"__u_{c}") if c in upd_set else F.lit(None)
            o_c = F.col(c) if c in old_cols else F.lit(None)
            out.append(F.when(take_u, u_c).otherwise(o_c).alias(c))
        dead = take_u & F.coalesce(F.col("__u_tomb"), F.lit(False))
        return j.filter(~dead).select(*out)

    def _tag_bucket(self, incoming: DataFrame, view: FileSystemView | None,
                    instant: str, fresh_groups: bool = False) -> DataFrame:
        """Assign ``_hoodie_target_file_id`` for bucket-index tables.

        simple bucket (HoodieSimpleBucketIndex.java:40, BucketIdentifier.java):
        bucket = pmod(hash(key), num_buckets); the bucket number is the first
        8 chars of the fileId (Hudi's bucketIdFromFileId prefix convention),
        so a bucket keeps its identity across file-group generations —
        replaced groups (insert_overwrite / delete_partition) get a fresh
        suffix instead of resurrecting a dead group id.

        bucket_consistent (HoodieSparkConsistentBucketIndex.java): ring
        lookup via buckets.tag_with_ring.

        Both are shuffle-free: driver-side metadata + one broadcast join.
        """
        cfg = self.cfg
        if cfg.index_type == "bucket_consistent":
            from . import buckets as bk
            dead = set()
            if view is not None:
                dead = {(g.partition, g.file_id)
                        for g in view.groups.values()
                        if g.replaced_at is not None}
            return bk.tag_with_ring(incoming, self.t.base_path,
                                    cfg.num_buckets, instant,
                                    dead_groups=dead, rotate_all=fresh_groups)
        b = F.format_string("%08d", F.pmod(F.xxhash64(F.col(meta.RECORD_KEY)),
                                           F.lit(cfg.num_buckets)))
        with_b = incoming.withColumn("__bucket", b)
        touched = [(r[0], r[1]) for r in
                   with_b.select(meta.PARTITION_PATH, "__bucket")
                   .distinct().collect()]
        live: dict = {}
        if view is not None and not fresh_groups:
            for g, _s in view.live_slices():
                live[(g.partition, g.file_id[:8])] = g.file_id
        rows = [(p, bkt, live.get((p, bkt), bkt + new_file_id()[:8]))
                for p, bkt in touched]
        mdf = self.spark.createDataFrame(
            rows, f"{meta.PARTITION_PATH} string, __bucket string, __fid string")
        return (with_b.join(F.broadcast(mdf),
                            on=[meta.PARTITION_PATH, "__bucket"])
                .withColumn(meta.TARGET_FILE_ID, F.col("__fid"))
                .drop("__bucket", "__fid"))

    def _upsert_bucket(self, incoming: DataFrame, view: FileSystemView,
                       instant: str, operation: str, action: str) -> str:
        """Bucket-index upsert: deterministic assignment, so tagging needs NO
        index scan and NO shuffle. At 100 TB this removes the full-table
        meta-column scan + shuffle that simple index tagging costs; the trade
        is a fixed bucket count per partition (lifted by the consistent-hash
        variant, which resizes via services/bucket_resize.py).
        """
        cfg, spec = self.cfg, payloads.get(self.cfg.payload)
        cow = cfg.table_type == cfgmod.COW
        tagged = self._tag_bucket(incoming, view, instant)
        touched = {(r[0], r[1]) for r in
                   tagged.select(meta.PARTITION_PATH, meta.TARGET_FILE_ID)
                   .distinct().collect()}
        existing = {(g.partition, g.file_id): s for g, s in view.live_slices()
                    if (g.partition, g.file_id) in touched}
        if cow:
            old_paths = [view.abs(s.base_file.path) for s in existing.values()]
            old = (read_files(self.spark, old_paths, base_read_schema(cfg), cfg)
                   .withColumn(meta.TARGET_FILE_ID, meta.file_id_from_name()))
            allr = old.unionByName(tagged, allowMissingColumns=True)
            merged = payloads.resolve(allr, cfg, spec, drop_deletes=True)
            stats = self.stage_write(merged, instant, "base")
            replaced = self.emptied_groups(set(existing), stats)
        else:
            # rows whose bucket has a base file -> delta; first write of a
            # bucket -> base file (Flink bucket stream write behavior)
            # reserved-prefixed lookup columns: tagged carries the user's
            # business schema, where bare p/f would be ambiguous
            has_base = self.spark.createDataFrame(
                [(p, f) for p, f in existing] or
                [("", "")], "__hb_p string, __hb_f string")
            deltas = tagged.join(
                F.broadcast(has_base),
                (F.col(meta.PARTITION_PATH) == F.col("__hb_p"))
                & (F.col(meta.TARGET_FILE_ID) == F.col("__hb_f"))) \
                .drop("__hb_p", "__hb_f")
            news = tagged.join(
                F.broadcast(has_base),
                (F.col(meta.PARTITION_PATH) == F.col("__hb_p"))
                & (F.col(meta.TARGET_FILE_ID) == F.col("__hb_f")),
                "left_anti").filter(F.col(meta.OPERATION) != "D")
            replaced = None
            stats = self.stage_write(deltas, instant, "delta")
            base_stats = self.stage_write(news, instant, "base")
            for p, sts in base_stats.items():
                stats.setdefault(p, []).extend(sts)
        md = self._commit_md(operation, stats, replaced)
        self._commit_completed(instant, action, md)
        self._remove_marker(instant)
        return instant

    def insert(self, df: DataFrame, validate_duplicates: bool = False,
               drop_duplicates: bool = False) -> str:
        """WriteOperationType.INSERT (SparkRDDWriteClient.java:175): no index
        lookup; small-file packing only. Duplicate keys are allowed unless
        validate_duplicates (ValidateDuplicateKeyPayload semantics) or
        drop_duplicates (INSERT_DROP_DUPS: incoming records whose key already
        exists in the table are silently dropped — HoodieWriteHelper tag +
        filter-located, TestCOWDataSource testDropInsertDup)."""
        cfg = self.cfg
        if cfg.index_type in ("bucket", "bucket_consistent"):
            # bucket tables route EVERY write through bucket assignment —
            # a size-based file id would shadow the bucket's existing slice
            if drop_duplicates:
                df = self._drop_existing_keys(df)
            return self.upsert(df, operation="insert")
        cow = cfg.table_type == cfgmod.COW
        action = tl.COMMIT if cow else tl.DELTACOMMIT
        with self._guard():
            instant = self._mint(action, {"operation": "insert"})
            incoming = self.prepare(df, instant).filter(F.col(meta.OPERATION) != "D")
            incoming.persist()
            try:
                view = self.t.view()
                self._occ_since = self.t.timeline.latest_completed_write().time if self.t.timeline.latest_completed_write() else "0"
                if validate_duplicates or cfg.payload == "validate_dup":
                    keys = [meta.RECORD_KEY] if cfg.global_index \
                        else [meta.PARTITION_PATH, meta.RECORD_KEY]
                    paths = view.live_base_files()
                    existing = read_files(self.spark, paths, base_read_schema(cfg), cfg) \
                        .select(*keys)
                    dup = (incoming.select(*keys).unionByName(existing)
                           .groupBy(*keys).count().filter(F.col("count") > 1))
                    if dup.limit(1).count() > 0:
                        raise ValueError("duplicate record keys on INSERT "
                                         "(ValidateDuplicateKeyPayload)")
                if drop_duplicates:
                    # same key-range-pruned, tombstone-aware candidate scan
                    # the upsert tag path uses; located keys are filtered out
                    band_rows = (incoming.groupBy(meta.PARTITION_PATH)
                                 .agg(F.min(meta.RECORD_KEY).alias("kmin"),
                                      F.max(meta.RECORD_KEY).alias("kmax"))
                                 .collect())
                    partitions = [r[0] for r in band_rows]
                    bands = {r[0]: (r[1], r[2]) for r in band_rows}
                    loc = self._location_df(view, partitions, incoming,
                                            bands=bands)
                    if loc is not None:
                        if cfg.global_index:
                            on = [meta.RECORD_KEY]
                        else:
                            on = [meta.RECORD_KEY, meta.PARTITION_PATH]
                            loc = loc.withColumnRenamed("__loc_pp",
                                                        meta.PARTITION_PATH)
                        incoming_kept = incoming.join(
                            loc.select(*on), on=on, how="left_anti")
                        incoming.unpersist()
                        incoming = incoming_kept
                        incoming.persist()
                from .services.clustering import pending_clustering_groups
                assigned, packed = self.assign_buckets(
                    incoming, view, pack_small_files=cow,
                    blocked_groups=pending_clustering_groups(self.t.timeline))
                if cow and packed:
                    old_paths = [view.abs(s.base_file.path)
                                 for g, s in view.live_slices()
                                 if (g.partition, g.file_id) in packed]
                    old = (read_files(self.spark, old_paths, base_read_schema(cfg), cfg)
                           .withColumn(meta.TARGET_FILE_ID, meta.file_id_from_name()))
                    assigned = old.unionByName(assigned, allowMissingColumns=True)
                stats = self.stage_write(assigned, instant, "base")
                md = self._commit_md("insert", stats)
                self._commit_completed(instant, action, md)
                self._remove_marker(instant)
                return instant
            finally:
                incoming.unpersist()

    def bulk_insert(self, df: DataFrame, sort_mode: str = "GLOBAL_SORT") -> str:
        """WriteOperationType.BULK_INSERT (SparkRDDWriteClient.java:229-250) with
        BulkInsertSortMode NONE / GLOBAL_SORT / PARTITION_SORT
        (BulkInsertSortMode.java:24-27; Dataset fast path
        HoodieDatasetBulkInsertHelper.scala:39). GLOBAL_SORT =
        repartitionByRange(partition, key) — one range shuffle, sorted files,
        best min/max key pruning for later upserts."""
        cfg = self.cfg
        if cfg.index_type in ("bucket", "bucket_consistent"):
            return self.upsert(df, operation="bulk_insert")
        cow = cfg.table_type == cfgmod.COW
        action = tl.COMMIT if cow else tl.DELTACOMMIT
        sort_mode = sort_mode.upper()
        with self._guard():
            instant = self._mint(action, {"operation": "bulk_insert"})
            incoming = self.prepare(df, instant).filter(F.col(meta.OPERATION) != "D")
            try:
                if sort_mode == "GLOBAL_SORT":
                    incoming.persist()
                    n = incoming.count()
                    avg = self._avg_record_size()
                    rpf = max(1, cfg.target_file_bytes // avg)
                    nfiles = max(1, math.ceil(n / rpf))
                    prefix = new_file_id()[:16]
                    ranged = (incoming.repartitionByRange(
                                  nfiles, meta.PARTITION_PATH, meta.RECORD_KEY)
                              .withColumn(meta.TARGET_FILE_ID,
                                          F.format_string("%s%08d", F.lit(prefix),
                                                          F.spark_partition_id())))
                    stats = self.stage_write(ranged, instant, "base",
                                             sort_cols=[meta.RECORD_KEY],
                                             already_partitioned=True)
                else:
                    assigned, _ = self.assign_buckets(incoming, None,
                                                      pack_small_files=False)
                    sort_cols = [meta.RECORD_KEY] if sort_mode == "PARTITION_SORT" else None
                    stats = self.stage_write(assigned, instant, "base",
                                             sort_cols=sort_cols)
                md = self._commit_md("bulk_insert", stats)
                self._commit_completed(instant, action, md)
                self._remove_marker(instant)
                return instant
            finally:
                try:
                    incoming.unpersist()
                except Exception:
                    pass

    def delete(self, keys_df: DataFrame | None = None, where=None) -> str:
        """WriteOperationType.DELETE (SparkRDDWriteClient.java:256): tombstone
        upsert via EmptyHoodieRecordPayload semantics."""
        snap = self.t.snapshot()
        if where is not None:
            target = snap.filter(where)
        elif keys_df is not None:
            target = snap.join(keys_df, on=list(keys_df.columns), how="left_semi")
        else:
            raise ValueError("delete requires keys_df or where")
        tomb = target.withColumn(meta.DELETE_MARKER, F.lit(True))
        return self.upsert(tomb, operation="delete")

    def insert_overwrite(self, df: DataFrame, whole_table: bool = False) -> str:
        """WriteOperationType.INSERT_OVERWRITE(_TABLE)
        (SparkRDDWriteClient.java:203-223): write new file groups, then a
        replacecommit marks every prior group in the touched partitions (or the
        whole table) replaced — manifest-only invalidation, no data deletes."""
        with self._guard():
            instant = self._mint(tl.REPLACECOMMIT,
                                 {"operation": "insert_overwrite"})
            incoming = self.prepare(df, instant).filter(F.col(meta.OPERATION) != "D")
            incoming.persist()
            try:
                view = self.t.view()
                self._occ_since = self.t.timeline.latest_completed_write().time if self.t.timeline.latest_completed_write() else "0"
                if self.cfg.index_type in ("bucket", "bucket_consistent"):
                    # bucket identities must survive the overwrite with FRESH
                    # group ids — writing into a just-replaced group id would
                    # make the new files invisible to the fold
                    assigned = self._tag_bucket(incoming, view, instant,
                                                fresh_groups=True)
                else:
                    assigned, _ = self.assign_buckets(incoming, None,
                                                      pack_small_files=False)
                stats = self.stage_write(assigned, instant, "base")
                if whole_table:
                    parts = None
                else:
                    parts = set(stats.keys())
                replaced: dict = {}
                for g in view.live_groups():
                    if parts is None or g.partition in parts:
                        replaced.setdefault(g.partition, []).append(g.file_id)
                op = "insert_overwrite_table" if whole_table else "insert_overwrite"
                md = self._commit_md(op, stats, replaced)
                self._commit_completed(instant, tl.REPLACECOMMIT, md)
                self._remove_marker(instant)
                return instant
            finally:
                incoming.unpersist()

    def delete_partition(self, partition_values: list[str]) -> str:
        """WriteOperationType.DELETE_PARTITION (SparkRDDWriteClient.java:264-267):
        pure-metadata replacecommit, zero data IO."""
        with self._guard():
            instant = self.t.timeline.new_instant()
            view = self.t.view()
            self._occ_since = self.t.timeline.latest_completed_write().time \
                if self.t.timeline.latest_completed_write() else "0"
            replaced: dict = {}
            for g in view.live_groups(partitions=set(partition_values)):
                replaced.setdefault(g.partition, []).append(g.file_id)
            md = self._commit_md("delete_partition", {}, replaced)
            self._commit_completed(instant, tl.REPLACECOMMIT, md)
            return instant


# --------------------------------------------------------------------- stats
def _json_safe(v):
    import datetime
    import decimal
    if isinstance(v, bytes):
        try:
            return v.decode("utf-8", errors="replace")
        except Exception:
            return repr(v)
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, decimal.Decimal):
        return str(v)
    return v


def _orc_file_stats(path: str, stats_cols: list[str] | None) -> dict:
    """Per-file min/max/null-count stats for an ORC base file. pyarrow's ORC
    reader exposes no stripe-statistics API, so the needed columns (record
    key + configured stats columns only) are read and reduced — a real read,
    unlike the parquet footer path, which is why ORC is the opt-in format:
    the write-side stats cost is O(stats columns), not O(file)."""
    import pyarrow.compute as pc
    import pyarrow.orc as po

    from .storage import get_storage
    st_backend = get_storage(path)
    f = po.ORCFile(path if st_backend.scheme == "file"
                   else st_backend.fs.open(path, "rb"))
    names = [n for n in f.schema.names
             if n == meta.RECORD_KEY
             # same reservation scope as prepare(): a "__"-named BUSINESS
             # column the writer admits must also get column stats
             or (not n.startswith(("_hoodie_",) + meta.INTERNAL_PREFIXES)
                 and (stats_cols is None or n in stats_cols))]
    tbl = f.read(columns=names)
    out = {"records": tbl.num_rows, "bytes": st_backend.size(path),
           "col_stats": {}}
    for n in names:
        arr = tbl[n]
        a = {"min": None, "max": None, "nulls": arr.null_count}
        try:
            if tbl.num_rows > arr.null_count:
                mm = pc.min_max(arr)
                a["min"] = _json_safe(mm["min"].as_py())
                a["max"] = _json_safe(mm["max"].as_py())
        except Exception:  # noqa: BLE001 — non-orderable types: no bounds
            a["min"] = a["max"] = None
        out["col_stats"][n] = a
    return out


def _parquet_footer_stats(path: str, stats_cols: list[str] | None) -> dict:
    """Per-file min/max/null-count column stats from the parquet footer —
    metadata-only read, no data IO (HoodieColumnRangeMetadata.java:151 /
    column_stats metadata partition equivalent). Truncated parquet string
    bounds stay valid (parquet truncates min down / max up)."""
    import pyarrow.parquet as pq
    from .storage import get_storage
    st_backend = get_storage(path)
    if st_backend.scheme == "file":
        pf = pq.ParquetFile(path)
    else:   # remote: pyarrow reads the footer through the fsspec file object
        pf = pq.ParquetFile(st_backend.fs.open(path, "rb"))
    md = pf.metadata
    out = {"records": md.num_rows, "bytes": st_backend.size(path), "col_stats": {}}
    names = {}
    for i in range(md.num_columns if md.num_row_groups else 0):
        col = md.row_group(0).column(i)
        name = col.path_in_schema
        if "." in name:          # nested leaves: skip (top-level primitives only)
            continue
        if name == meta.RECORD_KEY:
            # record-key min/max IS the bloom-parity key-range index
            # (HoodieBloomIndex.java:89-161 loads per-file key ranges before
            # any probe); collected regardless of the stats-column config
            names[i] = name
            continue
        # same reservation scope as prepare(): a "__"-named BUSINESS column
        # the writer admits must also get column stats
        if name.startswith(("_hoodie_",) + meta.INTERNAL_PREFIXES):
            continue
        if stats_cols is not None and name not in stats_cols:
            continue
        names[i] = name
    agg: dict = {}
    unextractable: set = set()   # e.g. BYTE_ARRAY binary — pyarrow raises
    for rg in range(md.num_row_groups):
        for i, name in names.items():
            col = md.row_group(rg).column(i)
            st = col.statistics
            a = agg.setdefault(name, {"min": None, "max": None, "nulls": 0})
            if st is None:
                a["nulls"] = None
                continue
            if st.has_null_count and a["nulls"] is not None:
                a["nulls"] += st.null_count
            if st.has_min_max and name not in unextractable:
                try:
                    mn, mx = _json_safe(st.min), _json_safe(st.max)
                except Exception as e:  # noqa: BLE001
                    if type(e).__name__ != "ArrowNotImplementedError":
                        raise
                    # STICKY: a partial range from other row groups would
                    # be a wrong (unsafely narrow) pruning bound
                    unextractable.add(name)
                    a["min"] = a["max"] = None
                    continue
                a["min"] = mn if a["min"] is None else min(a["min"], mn)
                a["max"] = mx if a["max"] is None else max(a["max"], mx)
    out["col_stats"] = agg
    return out
