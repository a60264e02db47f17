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
    os.makedirs(out_dir, exist_ok=True)
    n = 0
    for ins in t.timeline.completed():
        md = t.timeline.metadata(ins)
        with open(os.path.join(out_dir, f"{ins.time}.{ins.action}.json"), "w") as f:
            json.dump(md, f, default=str)
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
            rows.append(Row(partition=g.partition, file=f.path,
                            size_bytes=os.path.getsize(p)
                            if os.path.exists(p) else None))
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
            if os.path.exists(p):
                sizes.append(os.path.getsize(p))
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
    live = sum(os.path.getsize(t.view().abs(f.path))
               for _g, s in t.view().live_slices()
               for f in ([s.base_file] if s.base_file else []) + list(s.deltas)
               if os.path.exists(t.view().abs(f.path)))
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
                            exists=os.path.exists(p)))
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


PROCEDURES = {
    "show_commits": show_commits,
    "show_commits_metadata": show_commits_metadata,
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
}


def call(engine, procedure: str, **kwargs) -> DataFrame:
    if procedure not in PROCEDURES:
        raise ValueError(f"unknown procedure '{procedure}'; "
                         f"available: {sorted(PROCEDURES)}")
    return PROCEDURES[procedure](engine, **kwargs)
