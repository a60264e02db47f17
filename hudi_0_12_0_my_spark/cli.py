"""Admin CLI — the hudi-cli command surface over the procedure registry.

The reference ships an interactive shell (hudi-cli/.../commands/: Commits,
Compaction, Cleans, Savepoints, Rollbacks, FileSystemView, Table, Metadata,
Repairs, ...). Every one of those commands is already a CALL procedure
here, so the CLI is a thin argparse front-end:

    python -m hudi_0_12_0_my_spark.cli --table /path/to/table COMMAND ...

COMMAND is either a convenience alias (desc, commits, timeline, partitions,
fsview, compactions, cleans, savepoints, rollback, savepoint, clean,
compact, cluster) or ANY registered procedure name called with --key value
arguments (`call show_commit_files --instant_time 2026...`).
"""

from __future__ import annotations

import argparse
import json
import sys


def _print_df(df, as_json: bool) -> None:
    if as_json:
        for r in df.collect():
            print(json.dumps(r.asDict(recursive=True), default=str))
    else:
        df.show(200, truncate=False)


def _coerce(v: str):
    # booleans only: numeric-looking values stay strings (instant times ARE
    # digit strings; procedures int() their own numeric kwargs)
    if v.lower() in ("true", "false"):
        return v.lower() == "true"
    return v


def main(argv: list[str] | None = None, spark=None) -> int:
    p = argparse.ArgumentParser(prog="hudi-cli", description=__doc__)
    p.add_argument("--table", required=True, help="table base path")
    p.add_argument("--json", action="store_true",
                   help="print JSON lines instead of a table")
    p.add_argument("command", help="alias or procedure name")
    p.add_argument("args", nargs=argparse.REMAINDER,
                   help="--key value pairs passed to the procedure")
    ns = p.parse_args(argv)

    kw = {}
    it = iter(ns.args)
    for a in it:
        if not a.startswith("--"):
            p.error(f"expected --key value pairs, got {a!r}")
        try:
            kw[a[2:]] = _coerce(next(it))
        except StopIteration:
            p.error(f"missing value for {a}")

    own_session = spark is None
    if own_session:
        from pyspark.sql import SparkSession
        spark = (SparkSession.builder.master("local[2]")
                 .appName("hudi-cli")
                 .config("spark.sql.shuffle.partitions", "2")
                 .config("spark.ui.enabled", "false").getOrCreate())
    try:
        from . import Engine
        eng = Engine(spark)
        t = eng.load_table(ns.table)
        name = t.cfg.name

        aliases = {
            "commits": ("show_commits", {}),
            "metrics": ("show_commit_metrics", {}),
            "commit-files": ("show_commit_files", {}),
            "partitions": ("show_partitions", {}),
            "fsview": ("show_fsview_all", {}),
            "fsview-latest": ("show_fsview_latest", {}),
            "compactions": ("show_compaction", {}),
            "clusterings": ("show_clustering", {}),
            "savepoints": ("show_savepoints", {}),
            "rollbacks": ("show_rollbacks", {}),
            "rollback": ("rollback_to_instant", {}),
            "savepoint": ("create_savepoint", {}),
            "clean": ("run_clean", {}),
            "compact": ("run_compaction", {}),
            "cluster": ("run_clustering", {}),
            "stats": ("stats_wa", {}),
        }
        if ns.command == "desc":
            from dataclasses import asdict
            rows = sorted(asdict(t.cfg).items())
            df = spark.createDataFrame(
                [(k, json.dumps(v, default=str)) for k, v in rows],
                "property string, value string")
        elif ns.command == "timeline":
            # full timeline incl. pending states (hudi-cli TimelineCommand)
            rows = [(i.time, i.action, i.state)
                    for i in t.timeline.completed()] + \
                   [(i.time, i.action, i.state)
                    for i in t.timeline.pending()]
            df = spark.createDataFrame(
                sorted(rows), "instant string, action string, state string")
        else:
            proc, extra = aliases.get(ns.command, (ns.command, {}))
            df = eng.call(proc, table=name, **{**extra, **kw})
        _print_df(df, ns.json)
        return 0
    finally:
        if own_session:
            spark.stop()


if __name__ == "__main__":
    sys.exit(main())
