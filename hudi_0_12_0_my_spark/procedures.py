"""CALL procedure registry — the Python counterpart of HoodieProcedures.

Reference: hudi-spark-datasource/hudi-spark/src/main/scala/org/apache/spark/
sql/hudi/command/procedures/ (49 registered procedures; HoodieProcedures.scala).
Each procedure takes (engine, **kwargs) and returns a DataFrame so results
compose with spark.sql — mirroring the reference, where every procedure call
yields rows. Table resolution: pass ``table=<registered name>`` or
``path=<base_path>``.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, Row

from .storage import get_storage


def _t(engine, kwargs):
    if "path" in kwargs:
        return engine.load_table(kwargs.pop("path"))
    name = kwargs.pop("table")
    return engine.table(name)


def _df(engine, rows, schema) -> DataFrame:
    return engine.spark.createDataFrame(rows, schema)


# ------------------------------------------------------------------ commits
def show_commits(engine, **kw):
    t = _t(engine, kw)
    limit = int(kw.get("limit", 10))
    rows = [Row(commit_time=c["instant"], action=c["action"],
                operation=c.get("operation"),
                total_records=c.get("total_records"),
                total_bytes=c.get("total_bytes"))
            for c in t.commits()][-limit:]
    return _df(engine, rows or [], "commit_time string, action string, "
               "operation string, total_records long, total_bytes long")


def show_commits_metadata(engine, **kw):
    t = _t(engine, kw)
    rows = []
    for ins in t.timeline.completed():
        md = t.timeline.metadata(ins)
        rows.append(Row(commit_time=ins.time, action=ins.action,
                        metadata=json.dumps(md, default=str)))
    return _df(engine, rows, "commit_time string, action string, metadata string")


def show_commit_metrics(engine, **kw):
    """Typed per-commit counters (HoodieMetrics surface): the metrics block
    metrics.fold() stamps into every write/compact/clean/cluster commit."""
    t = _t(engine, kw)
    limit = int(kw.get("limit", 50))
    rows = []
    for ins in t.timeline.completed():
        m = (t.timeline.metadata(ins) or {}).get("metrics")
        if m is None:
            continue
        rows.append(Row(
            commit_time=ins.time, action=ins.action,
            duration_ms=(float(m["duration_ms"])
                         if m.get("duration_ms") is not None else None),
            total_partitions_written=m.get("total_partitions_written"),
            total_files_written=m.get("total_files_written"),
            total_base_files_written=m.get("total_base_files_written"),
            total_log_files_written=m.get("total_log_files_written"),
            total_records_written=m.get("total_records_written"),
            total_bytes_written=m.get("total_bytes_written"),
            total_files_deleted=m.get("total_files_deleted"),
            total_file_groups_replaced=m.get("total_file_groups_replaced")))
    return _df(engine, rows[-limit:],
               "commit_time string, action string, duration_ms double, "
               "total_partitions_written long, total_files_written long, "
               "total_base_files_written long, total_log_files_written long, "
               "total_records_written long, total_bytes_written long, "
               "total_files_deleted long, total_file_groups_replaced long")


def show_archived_commits(engine, **kw):
    t = _t(engine, kw)
    rows = [Row(commit_time=i.time, action=i.action)
            for i, _md in t.timeline.archived()]
    return _df(engine, rows, "commit_time string, action string")


def commits_compare(engine, **kw):
    t = _t(engine, kw)
    other = engine.load_table(kw["other_path"])
    mine = {c["instant"] for c in t.commits()}
    theirs = {c["instant"] for c in other.commits()}
    rows = [Row(only_in_this=sorted(mine - theirs),
                only_in_other=sorted(theirs - mine))]
    return _df(engine, rows,
               "only_in_this array<string>, only_in_other array<string>")


def export_instants(engine, **kw):
    t = _t(engine, kw)
    out_dir = kw["out_path"]
    st = get_storage(out_dir)
    st.makedirs(out_dir)
    n = 0
    for ins in t.timeline.completed():
        md = t.timeline.metadata(ins)
        st.write_json(os.path.join(out_dir, f"{ins.time}.{ins.action}.json"), md)
        n += 1
    return _df(engine, [Row(exported=n, out_path=out_dir)],
               "exported int, out_path string")


# ----------------------------------------------------------------- services
def run_clean(engine, **kw):
    t = _t(engine, kw)
    retain = kw.get("retain")
    res = t.clean(policy=kw.get("policy"),
                  retain=int(retain) if retain is not None else None)
    return _df(engine, [Row(deleted_files=res.get("removed", 0))],
               "deleted_files int")


def run_compaction(engine, **kw):
    t = _t(engine, kw)
    instant = t.compact(strategy=kw.get("strategy", "log_file_size"))
    return _df(engine, [Row(compaction_instant=instant,
                            executed=instant is not None)],
               "compaction_instant string, executed boolean")


def run_clustering(engine, **kw):
    t = _t(engine, kw)
    sort_cols = kw.get("sort_cols")
    if isinstance(sort_cols, str):
        sort_cols = [c.strip() for c in sort_cols.split(",")]
    instant = t.cluster(sort_cols=sort_cols, layout=kw.get("layout", "linear"))
    return _df(engine, [Row(clustering_instant=instant,
                            executed=instant is not None)],
               "clustering_instant string, executed boolean")


def _show_by_operation(engine, kw, op: str):
    t = _t(engine, kw)
    rows = []
    for state in ("requested", "inflight", "completed"):
        for i in t.timeline.instants(states=(state,)):
            md = t.timeline.metadata(i)
            if md.get("operation") == op:
                rows.append(Row(instant=i.time, action=i.action, state=state))
    return _df(engine, rows, "instant string, action string, state string")


def show_compaction(engine, **kw):
    return _show_by_operation(engine, kw, "compact")


def show_clustering(engine, **kw):
    return _show_by_operation(engine, kw, "cluster")


def show_rollbacks(engine, **kw):
    t = _t(engine, kw)
    rows = []
    for ins in t.timeline.completed(actions=("rollback",)):
        md = t.timeline.metadata(ins)
        rows.append(Row(instant=ins.time,
                        rolled_back=md.get("rolled_back_instant"),
                        deleted_files=len(md.get("deleted_files", []))))
    return _df(engine, rows, "instant string, rolled_back string, deleted_files int")


# --------------------------------------------------------------- savepoints
def show_savepoints(engine, **kw):
    t = _t(engine, kw)
    rows = [Row(savepoint_time=i.time)
            for i in t.timeline.completed(actions=("savepoint",))]
    return _df(engine, rows, "savepoint_time string")


def create_savepoint(engine, **kw):
    t = _t(engine, kw)
    sp = t.savepoint(kw.get("instant_time"))
    return _df(engine, [Row(savepoint_time=sp, created=True)],
               "savepoint_time string, created boolean")


def delete_savepoint(engine, **kw):
    t = _t(engine, kw)
    ts = kw["instant_time"]
    t.timeline.remove(ts, "savepoint")
    return _df(engine, [Row(deleted=True)], "deleted boolean")


def rollback_to_instant(engine, **kw):
    t = _t(engine, kw)
    res = t.rollback(kw["instant_time"])
    deleted = res.get("deleted_files", [])
    return _df(engine, [Row(rolled_back=kw["instant_time"],
                            deleted_files=len(deleted))],
               "rolled_back string, deleted_files int")


def rollback_to_savepoint(engine, **kw):
    t = _t(engine, kw)
    res = t.restore(kw["instant_time"])
    return _df(engine, [Row(restored_to=kw["instant_time"],
                            rolled_back=res.get("rolled_back", []))],
               "restored_to string, rolled_back array<string>")


# ------------------------------------------------------------ fsview / meta
def show_fsview_all(engine, **kw):
    t = _t(engine, kw)
    rows = []
    for g, s in t.view().live_slices():
        rows.append(Row(partition=g.partition, file_id=g.file_id,
                        base_instant=s.base_instant,
                        base_file=s.base_file.path if s.base_file else None,
                        num_log_files=len(s.deltas)))
    return _df(engine, rows, "partition string, file_id string, "
               "base_instant string, base_file string, num_log_files int")


def show_partitions(engine, **kw):
    t = _t(engine, kw)
    return _df(engine, [Row(partition=p) for p in t.partitions()],
               "partition string")


def show_metadata_table_files(engine, **kw):
    t = _t(engine, kw)
    view = t.view()
    rows = []
    for g, s in view.live_slices():
        for f in ([s.base_file] if s.base_file else []) + list(s.deltas):
            p = view.abs(f.path)
            st = get_storage(p)
            rows.append(Row(partition=g.partition, file=f.path,
                            size_bytes=st.size(p) if st.exists(p) else None))
    return _df(engine, rows, "partition string, file string, size_bytes long")


def show_metadata_table_stats(engine, **kw):
    t = _t(engine, kw)
    rows = []
    for r in t.view().stats_rows():
        for col, mm in (r["col_stats"] or {}).items():
            rows.append(Row(file=r["path"], column=col,
                            min=str(mm.get("min")), max=str(mm.get("max")),
                            nulls=mm.get("nulls")))
    return _df(engine, rows,
               "file string, column string, min string, max string, nulls long")


def stats_file_sizes(engine, **kw):
    t = _t(engine, kw)
    view = t.view()
    sizes = []
    for _g, s in view.live_slices():
        for f in ([s.base_file] if s.base_file else []) + list(s.deltas):
            p = view.abs(f.path)
            st = get_storage(p)
            if st.exists(p):
                sizes.append(st.size(p))
    if not sizes:
        return _df(engine, [], "num_files int, total_bytes long, "
                   "min_bytes long, max_bytes long, avg_bytes long")
    return _df(engine, [Row(num_files=len(sizes), total_bytes=sum(sizes),
                            min_bytes=min(sizes), max_bytes=max(sizes),
                            avg_bytes=sum(sizes) // len(sizes))],
               "num_files int, total_bytes long, min_bytes long, "
               "max_bytes long, avg_bytes long")


def copy_to_table(engine, **kw):
    """Materialize a query-type view of the table as plain parquet."""
    t = _t(engine, kw)
    query_type = kw.get("query_type", "snapshot")
    out = kw["out_path"]
    df = getattr(t, query_type)() if query_type != "snapshot" else t.snapshot()
    df.write.mode("overwrite").parquet(out)
    return _df(engine, [Row(out_path=out, rows=df.count())],
               "out_path string, rows long")


def delete_marker(engine, **kw):
    t = _t(engine, kw)
    instant = kw["instant_time"]
    t.writer._remove_marker(instant)
    return _df(engine, [Row(deleted=True)], "deleted boolean")


def stats_wa(engine, **kw):
    """Write amplification: bytes written by each commit vs live table bytes
    (stats_wa procedure)."""
    t = _t(engine, kw)
    live = sum(get_storage(t.base_path).size(t.view().abs(f.path))
               for _g, s in t.view().live_slices()
               for f in ([s.base_file] if s.base_file else []) + list(s.deltas)
               if get_storage(t.base_path).exists(t.view().abs(f.path)))
    rows = []
    for c in t.commits():
        wb = c.get("total_bytes") or 0
        rows.append(Row(commit_time=c["instant"], written_bytes=wb,
                        live_bytes=live,
                        amplification=round(wb / live, 4) if live else None))
    return _df(engine, rows, "commit_time string, written_bytes long, "
               "live_bytes long, amplification double")


def show_logfile_metadata(engine, **kw):
    """Delta ("log") files per file group with size/records
    (show_logfile_metadata)."""
    t = _t(engine, kw)
    rows = []
    for g, s in t.view().live_slices():
        for d in s.deltas:
            rows.append(Row(partition=g.partition, file_id=g.file_id,
                            file=d.path, instant=d.instant,
                            records=d.records, size_bytes=d.bytes))
    return _df(engine, rows, "partition string, file_id string, file string, "
               "instant string, records long, size_bytes long")


def show_logfile_records(engine, **kw):
    """Rows stored in delta files (show_logfile_records), latest first."""
    t = _t(engine, kw)
    limit = int(kw.get("limit", 10))
    from .writer import delta_read_schema, read_files
    paths = [t.view().abs(d.path) for _g, s in t.view().live_slices()
             for d in s.deltas]
    if not paths:
        return engine.spark.createDataFrame([], delta_read_schema(t.cfg))
    return read_files(engine.spark, paths, delta_read_schema(t.cfg),
                      t.cfg).limit(limit)


def validate_metadata_table_files(engine, **kw):
    """Check every manifest-listed file exists on disk
    (ValidateMetadataTableFilesProcedure)."""
    t = _t(engine, kw)
    view = t.view()
    rows = []
    for g, s in view.live_slices():
        for f in ([s.base_file] if s.base_file else []) + list(s.deltas):
            p = view.abs(f.path)
            rows.append(Row(partition=g.partition, file=f.path,
                            exists=get_storage(p).exists(p)))
    return _df(engine, rows, "partition string, file string, exists boolean")


def hdfs_parquet_import(engine, **kw):
    """Import a plain parquet directory into the table via bulk_insert
    (HdfsParquetImportProcedure equivalent)."""
    t = _t(engine, kw)
    src = kw["src_path"]
    df = engine.spark.read.parquet(src)
    instant = t.bulk_insert(df)
    return _df(engine, [Row(instant=instant, rows=df.count())],
               "instant string, rows long")


# ---------------------------------------------------------------- bootstrap
def run_bootstrap(engine, **kw):
    """Adopt an existing parquet dataset (RunBootstrapProcedure)."""
    path = kw.pop("path")
    src = kw.pop("src_path")
    mode = kw.pop("mode", "METADATA_ONLY")
    t = engine.bootstrap(path, src, mode=mode, **kw)
    total = sum(c.get("total_records") or 0 for c in t.commits())
    return _df(engine, [Row(base_path=path, mode=mode.upper(),
                            total_records=total)],
               "base_path string, mode string, total_records long")


def _bootstrap_slices(t):
    for g, s in t.view().live_slices():
        if s.base_file and g.file_id.startswith("bootstrap-"):
            yield g, s


def show_bootstrap_mapping(engine, **kw):
    """file group -> external source file (ShowBootstrapMappingProcedure)."""
    t = _t(engine, kw)
    rows = [Row(partition=g.partition, file_id=g.file_id,
                source_file=s.base_file.path, records=s.base_file.records)
            for g, s in _bootstrap_slices(t)]
    return _df(engine, rows, "partition string, file_id string, "
               "source_file string, records long")


def show_bootstrap_partitions(engine, **kw):
    t = _t(engine, kw)
    parts = sorted({g.partition for g, _s in _bootstrap_slices(t)})
    return _df(engine, [Row(partition=p) for p in parts], "partition string")


# ----------------------------------------------------- metadata-table admin
def show_metadata_table_partitions(engine, **kw):
    """Metadata partitions a-la MetadataPartitionType: files / column_stats."""
    t = _t(engine, kw)
    view = t.view()
    slices = view.live_slices()
    n_files = sum(1 + len(s.deltas) for _g, s in slices)
    n_stats = sum(len(s.base_file.col_stats or {})
                  for _g, s in slices if s.base_file)
    from . import bloom
    bl = bloom.load_blooms(engine.spark, t.base_path, t.cfg.bloom_num_hashes)
    n_blooms = bl.count() if bl is not None else 0
    rows = [Row(partition="files", enabled=True, entries=n_files),
            Row(partition="column_stats", enabled=True, entries=n_stats),
            Row(partition="bloom_filters", enabled=t.cfg.bloom_index_enabled,
                entries=n_blooms)]
    return _df(engine, rows, "partition string, enabled boolean, entries long")


def run_index(engine, **kw):
    """Async bloom_filters metadata-partition build (RunIndexActionExecutor):
    backfills bitsets for live base files lacking one and commits an
    `indexing` instant."""
    from .services.indexing import run_index as _run
    t = _t(engine, kw)
    if kw.get("enable", True) and not t.cfg.bloom_index_enabled:
        from . import config as cfgmod
        t.cfg.bloom_index_enabled = True
        cfgmod.save_config(t.base_path, t.cfg)
    r = _run(t)
    return _df(engine, [Row(instant=r["instant"],
                            files_indexed=r["files_indexed"])],
               "instant string, files_indexed long")


def drop_index(engine, **kw):
    """DROP INDEX counterpart: delete the bloom_filters partition and disable
    the probe (deleteMetadataPartition equivalent)."""
    from .services.indexing import drop_index as _drop
    t = _t(engine, kw)
    r = _drop(t)
    return _df(engine, [Row(dropped=r["dropped"])], "dropped boolean")


def create_metadata_table(engine, **kw):
    """Materialize the folded view as a manifest checkpoint, so reads start
    from O(live files) state instead of replaying the timeline
    (HoodieBackedTableMetadataWriter bootstrap equivalent)."""
    from .services.archival import _serialize_view, manifest_dir
    from .util import atomic_write_json
    t = _t(engine, kw)
    instant = t.latest_instant()
    if instant is None:
        return _df(engine, [], "instant string, file_groups int")
    view = t.view()
    snap = _serialize_view(view, instant)
    atomic_write_json(os.path.join(manifest_dir(t.base_path),
                                   f"{instant}.json"), snap)
    return _df(engine, [Row(instant=instant, file_groups=len(snap["groups"]))],
               "instant string, file_groups int")


def init_metadata_table(engine, **kw):
    return create_metadata_table(engine, **kw)


def delete_metadata_table(engine, **kw):
    from .services.archival import manifest_dir
    t = _t(engine, kw)
    d = manifest_dir(t.base_path)
    st = get_storage(d)
    existed = st.isdir(d)
    st.rm_rf(d)
    return _df(engine, [Row(deleted=existed)], "deleted boolean")


# ------------------------------------------------------------------ repairs
PARTITION_META = ".partition_metadata.json"


def repair_add_partition_meta(engine, **kw):
    """Write a partition-metadata marker into each partition dir
    (RepairAddpartitionmetaProcedure; Hudi's .hoodie_partition_metadata)."""
    t = _t(engine, kw)
    dry = str(kw.get("dry_run", "false")).lower() == "true"
    rows = []
    for p in t.partitions():
        pdir = os.path.join(t.base_path, p) if p else t.base_path
        marker = os.path.join(pdir, PARTITION_META)
        if get_storage(marker).exists(marker):
            action = "exists"
        else:
            action = "would_add" if dry else "added"
            if not dry:
                from .util import atomic_write_json
                get_storage(pdir).makedirs(pdir)
                atomic_write_json(marker, {
                    "commit_time": t.latest_instant(),
                    "partition_depth": len([x for x in p.split("/") if x])})
        rows.append(Row(partition=p, action=action))
    return _df(engine, rows, "partition string, action string")


def repair_migrate_partition_meta(engine, **kw):
    """Rewrite legacy (non-JSON) partition markers into the canonical JSON
    form (RepairMigratePartitionMetaProcedure)."""
    import json as _json
    from .util import atomic_write_json
    t = _t(engine, kw)
    rows = []
    for p in t.partitions():
        pdir = os.path.join(t.base_path, p) if p else t.base_path
        marker = os.path.join(pdir, PARTITION_META)
        action = "missing"
        if get_storage(marker).exists(marker):
            try:
                _json.loads(get_storage(marker).read_bytes(marker).decode())
                action = "ok"
            except (ValueError, OSError):
                atomic_write_json(marker, {
                    "commit_time": t.latest_instant(),
                    "partition_depth": len([x for x in p.split("/") if x])})
                action = "migrated"
        rows.append(Row(partition=p, action=action))
    return _df(engine, rows, "partition string, action string")


def repair_corrupted_clean_files(engine, **kw):
    """Drop clean-instant files whose metadata JSON cannot be parsed
    (RepairCorruptedCleanFilesProcedure)."""
    t = _t(engine, kw)
    removed = []
    for ins in t.timeline.instants(states=("requested", "inflight", "completed"),
                                   actions=("clean",)):
        try:
            t.timeline.metadata(ins)
        except (ValueError, OSError):
            os.remove(t.timeline.path(ins))
            removed.append(ins.time)
    return _df(engine, [Row(removed_instants=removed, n_removed=len(removed))],
               "removed_instants array<string>, n_removed int")


def repair_deduplicate(engine, **kw):
    """Remove duplicate record keys inside a partition by rewriting it
    (RepairDeduplicateProcedure). Duplicates can only come from insert /
    bulk_insert paths (upsert dedupes by design)."""
    from pyspark.sql import Window, functions as F
    t = _t(engine, kw)
    partition = kw["partition"]
    dry = str(kw.get("dry_run", "false")).lower() == "true"
    snap = t.snapshot(keep_meta=True) \
        .filter(F.col("_hoodie_partition_path") == partition)
    order = [F.desc(t.cfg.precombine_field)] if t.cfg.precombine_field else []
    order.append(F.desc("_hoodie_commit_time"))
    w = Window.partitionBy("_hoodie_record_key").orderBy(*order)
    deduped = (snap.withColumn("_rn", F.row_number().over(w))
               .filter("_rn = 1").drop("_rn"))
    total, kept = snap.count(), deduped.count()
    if not dry and kept < total:
        from .meta import strip_meta
        t.insert_overwrite(strip_meta(deduped))
    return _df(engine, [Row(partition=partition, total_rows=total,
                            duplicate_rows=total - kept,
                            rewritten=(not dry and kept < total))],
               "partition string, total_rows long, duplicate_rows long, "
               "rewritten boolean")


def repair_overwrite_hoodie_props(engine, **kw):
    """Overwrite table config keys (RepairOverwriteHoodiePropsProcedure).
    Pass new values as new_props=<json object string> or direct kwargs."""
    import json as _json
    from . import config as cfgmod
    t = _t(engine, kw)
    props = kw.get("new_props")
    props = _json.loads(props) if isinstance(props, str) else (props or {})
    d = t.cfg.to_dict()
    d.update(props)
    cfgmod.save_config(t.base_path, cfgmod.TableConfig.from_dict(d))
    t.reload()
    rows = [Row(key=k, value=str(v))
            for k, v in sorted(cfgmod.load_config(t.base_path).to_dict().items())]
    return _df(engine, rows, "key string, value string")


# --------------------------------------------------------- version / sync
_VERSION_FILE = "version.json"
CURRENT_TABLE_VERSION = 5          # Hudi 0.12 = table version FIVE


def _version_path(t):
    return os.path.join(t.base_path, ".hoodie", _VERSION_FILE)


def _read_version(t) -> int:
    from .util import read_json
    try:
        return int(read_json(_version_path(t))["version"])
    except (OSError, ValueError, KeyError):
        return CURRENT_TABLE_VERSION


def _write_version(engine, t, to_version: int):
    from .util import atomic_write_json
    old = _read_version(t)
    atomic_write_json(_version_path(t), {"version": to_version})
    return _df(engine, [Row(old_version=old, new_version=to_version)],
               "old_version int, new_version int")


def upgrade_table(engine, **kw):
    t = _t(engine, kw)
    return _write_version(engine, t,
                          int(kw.get("to_version", CURRENT_TABLE_VERSION)))


def downgrade_table(engine, **kw):
    t = _t(engine, kw)
    return _write_version(engine, t,
                          int(kw.get("to_version", CURRENT_TABLE_VERSION - 1)))


def validate_hoodie_sync(engine, **kw):
    """Compare row/commit counts of this table vs a synced copy
    (ValidateHoodieSyncProcedure)."""
    t = _t(engine, kw)
    other = engine.load_table(kw["other_path"])
    a, b = t.snapshot().count(), other.snapshot().count()
    ca, cb = len(t.commits()), len(other.commits())
    return _df(engine, [Row(source_rows=a, target_rows=b,
                            source_commits=ca, target_commits=cb,
                            in_sync=(a == b))],
               "source_rows long, target_rows long, source_commits int, "
               "target_commits int, in_sync boolean")


def show_fs_path_detail(engine, **kw):
    """Recursive file listing with sizes for any path
    (ShowFsPathDetailProcedure)."""
    root = kw["path"]
    limit = int(kw.get("limit", 100))
    sort_desc = str(kw.get("sort", "true")).lower() == "true"
    rows = []
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            p = os.path.join(dirpath, f)
            try:
                rows.append(Row(path=os.path.relpath(p, root),
                                size_bytes=os.path.getsize(p)))
            except OSError:
                continue
    rows.sort(key=lambda r: (-r.size_bytes if sort_desc else r.size_bytes,
                             r.path))
    return _df(engine, rows[:limit], "path string, size_bytes long")


def show_commit_files(engine, **kw):
    """File-level write stats of one commit (ShowCommitFilesProcedure)."""
    t = _t(engine, kw)
    instant = kw["instant"]
    rows = []
    for ins in t.timeline.completed():
        if ins.time != instant:
            continue
        md = t.timeline.metadata(ins)
        for partition, sts in (md.get("partition_to_write_stats") or {}).items():
            for st in sts:
                rows.append(Row(
                    partition=partition, file_id=st.get("file_id"),
                    path=st.get("path"), kind=st.get("kind", "base"),
                    records=st.get("records", 0), bytes=st.get("bytes", 0)))
    return _df(engine, rows, "partition string, file_id string, path string, "
               "kind string, records long, bytes long")


def show_commit_partitions(engine, **kw):
    """Per-partition aggregates of one commit (ShowCommitPartitionsProcedure)."""
    t = _t(engine, kw)
    instant = kw["instant"]
    rows = []
    for ins in t.timeline.completed():
        if ins.time != instant:
            continue
        md = t.timeline.metadata(ins)
        for partition, sts in (md.get("partition_to_write_stats") or {}).items():
            rows.append(Row(
                partition=partition, num_files=len(sts),
                total_records=sum(s.get("records", 0) for s in sts),
                total_bytes=sum(s.get("bytes", 0) for s in sts)))
    return _df(engine, rows, "partition string, num_files int, "
               "total_records long, total_bytes long")


def show_commit_write_stats(engine, **kw):
    """Whole-commit write stats (ShowCommitWriteStatsProcedure)."""
    t = _t(engine, kw)
    instant = kw["instant"]
    rows = []
    for ins in t.timeline.completed():
        if ins.time != instant:
            continue
        md = t.timeline.metadata(ins)
        nfiles = sum(len(sts) for sts in
                     (md.get("partition_to_write_stats") or {}).values())
        rows.append(Row(commit_time=ins.time, action=ins.action,
                        operation=md.get("operation"), total_files=nfiles,
                        total_records=md.get("total_records", 0),
                        total_bytes=md.get("total_bytes", 0)))
    return _df(engine, rows, "commit_time string, action string, "
               "operation string, total_files int, total_records long, "
               "total_bytes long")


def show_archived_commits_metadata(engine, **kw):
    """Archived instants with full metadata
    (ShowArchivedCommitsProcedure includeExtraMetadata=true)."""
    t = _t(engine, kw)
    rows = [Row(commit_time=i.time, action=i.action,
                metadata=json.dumps(md, default=str))
            for i, md in t.timeline.archived()]
    return _df(engine, rows, "commit_time string, action string, metadata string")


def show_rollback_detail(engine, **kw):
    """Files deleted by one rollback instant (ShowRollbackDetailProcedure)."""
    t = _t(engine, kw)
    instant = kw["instant"]
    rows = []
    from . import timeline as tl
    for ins in t.timeline.completed(actions=(tl.ROLLBACK,)):
        if ins.time != instant:
            continue
        md = t.timeline.metadata(ins)
        for f in md.get("deleted_files", []):
            rows.append(Row(rollback_instant=ins.time,
                            rolled_back_instant=md.get("rolled_back_instant"),
                            deleted_file=f))
    return _df(engine, rows, "rollback_instant string, "
               "rolled_back_instant string, deleted_file string")


def show_fsview_latest(engine, **kw):
    """Latest live file slice per file group, optionally one partition
    (ShowFileSystemViewProcedure 'latest')."""
    t = _t(engine, kw)
    part = kw.get("partition")
    view = t.view()
    rows = []
    for g, s in view.live_slices([part] if part is not None else None):
        rows.append(Row(
            partition=g.partition, file_id=g.file_id,
            base_instant=s.base_instant,
            base_file=None if s.base_file is None else s.base_file.path,
            base_bytes=0 if s.base_file is None else s.base_file.bytes,
            num_deltas=len(s.deltas), delta_bytes=s.delta_bytes))
    return _df(engine, rows, "partition string, file_id string, "
               "base_instant string, base_file string, base_bytes long, "
               "num_deltas int, delta_bytes long")


PROCEDURES = {
    "show_commits": show_commits,
    "show_commits_metadata": show_commits_metadata,
    "show_commit_metrics": show_commit_metrics,
    "show_archived_commits": show_archived_commits,
    "commits_compare": commits_compare,
    "export_instants": export_instants,
    "run_clean": run_clean,
    "run_compaction": run_compaction,
    "run_clustering": run_clustering,
    "show_compaction": show_compaction,
    "show_clustering": show_clustering,
    "show_rollbacks": show_rollbacks,
    "show_savepoints": show_savepoints,
    "create_savepoint": create_savepoint,
    "delete_savepoint": delete_savepoint,
    "rollback_to_instant": rollback_to_instant,
    "rollback_to_savepoint": rollback_to_savepoint,
    "show_fsview_all": show_fsview_all,
    "show_partitions": show_partitions,
    "show_metadata_table_files": show_metadata_table_files,
    "show_metadata_table_stats": show_metadata_table_stats,
    "stats_file_sizes": stats_file_sizes,
    "copy_to_table": copy_to_table,
    "delete_marker": delete_marker,
    "stats_wa": stats_wa,
    "show_logfile_metadata": show_logfile_metadata,
    "show_logfile_records": show_logfile_records,
    "validate_metadata_table_files": validate_metadata_table_files,
    "hdfs_parquet_import": hdfs_parquet_import,
    "run_bootstrap": run_bootstrap,
    "show_bootstrap_mapping": show_bootstrap_mapping,
    "show_bootstrap_partitions": show_bootstrap_partitions,
    "show_metadata_table_partitions": show_metadata_table_partitions,
    "create_metadata_table": create_metadata_table,
    "init_metadata_table": init_metadata_table,
    "delete_metadata_table": delete_metadata_table,
    "repair_add_partition_meta": repair_add_partition_meta,
    "repair_migrate_partition_meta": repair_migrate_partition_meta,
    "repair_corrupted_clean_files": repair_corrupted_clean_files,
    "repair_deduplicate": repair_deduplicate,
    "repair_overwrite_hoodie_props": repair_overwrite_hoodie_props,
    "upgrade_table": upgrade_table,
    "downgrade_table": downgrade_table,
    "validate_hoodie_sync": validate_hoodie_sync,
    "show_fs_path_detail": show_fs_path_detail,
    "show_commit_files": show_commit_files,
    "show_commit_partitions": show_commit_partitions,
    "show_commit_write_stats": show_commit_write_stats,
    "show_archived_commits_metadata": show_archived_commits_metadata,
    "show_rollback_detail": show_rollback_detail,
    "show_fsview_latest": show_fsview_latest,
    "run_index": run_index,
    "drop_index": drop_index,
}


def call(engine, procedure: str, **kwargs) -> DataFrame:
    if procedure not in PROCEDURES:
        raise ValueError(f"unknown procedure '{procedure}'; "
                         f"available: {sorted(PROCEDURES)}")
    return PROCEDURES[procedure](engine, **kwargs)
