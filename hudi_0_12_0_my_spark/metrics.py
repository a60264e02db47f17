"""Write/commit metrics + pluggable reporters (HoodieMetrics parity).

Reference surface: hudi-client-common/src/main/java/org/apache/hudi/metrics/
HoodieMetrics.java (per-commit timers + counters: totalPartitionsWritten,
totalFilesInsert, totalRecordsWritten, totalBytesWritten, commit duration)
and MetricsReporterType.java (CONSOLE / JMX / GRAPHITE / DATADOG /
PROMETHEUS_PUSHGATEWAY / CLOUDWATCH reporters behind one config key).

Spark-first re-expression: counters are derived from the commit metadata the
engine already assembles (no second stats pass), folded INTO that metadata
under ``md["metrics"]`` *before* the instant file lands — so they are
durable, travel with the timeline (archival included), and are queryable
with ``CALL show_commit_metrics`` / ``show_commits_metadata`` without any
external metrics system. Reporting is a post-commit dispatch:

``cfg.metrics_reporter``:
  - ``"console"``      print one JSON line per commit to stdout
  - ``"json:/path"``   append one JSON line per commit to a file
  - ``"<module>:<fn>"`` import and call with the metrics message
  - a name registered in-process via ``metrics.register(name, fn)``
    (plugin hook, same registry shape as ``payloads.register``)

A reporter failure is LOGGED and swallowed — the commit is already durable,
and the reference's metrics system likewise never unwinds a write
(HoodieMetrics wraps every reporter call defensively).
"""

from __future__ import annotations

import json
import sys
import time

_REGISTRY: dict = {}


def register(name: str, fn) -> None:
    """Register an in-process reporter plugin: ``fn(msg: dict) -> None``,
    selected with ``cfg.metrics_reporter = name``."""
    _REGISTRY[name] = fn


def now() -> float:
    """Monotonic start stamp for a commit timer (writer._mint /
    service-run entry)."""
    return time.monotonic()


def compute(md: dict, action: str, started_at: float | None) -> dict:
    """Fold-able counters from commit metadata — HoodieMetrics'
    updateCommitMetrics set, derived from the write stats already in md:
    duration, partitions / files (split base vs log) / records / bytes
    written, plus clean/replace specifics when present."""
    stats = md.get("partition_to_write_stats") or {}
    files = [st for sts in stats.values() for st in sts]
    out = {
        "duration_ms": (round((time.monotonic() - started_at) * 1000, 3)
                        if started_at is not None else None),
        "total_partitions_written": len(stats),
        "total_files_written": len(files),
        "total_base_files_written": sum(1 for st in files
                                        if st.get("kind") == "base"),
        "total_log_files_written": sum(1 for st in files
                                       if st.get("kind") != "base"),
        "total_records_written": md.get("total_records",
                                        sum(st.get("records", 0)
                                            for st in files)),
        "total_bytes_written": md.get("total_bytes",
                                      sum(st.get("bytes", 0)
                                          for st in files)),
    }
    if action == "clean":
        out["total_files_deleted"] = sum(
            len(v) for v in (md.get("removed_files") or {}).values())
    replaced = md.get("replaced_file_groups") or {}
    if replaced:
        out["total_file_groups_replaced"] = sum(len(v)
                                                for v in replaced.values())
    return out


def fold(md: dict, action: str, started_at: float | None) -> dict:
    """Attach the counters to the metadata in place (pre-save, so the
    instant file carries them durably) and return md for chaining."""
    md["metrics"] = compute(md, action, started_at)
    return md


def build_message(cfg, base_path: str, instant: str, action: str,
                  md: dict) -> dict:
    return {"commit_time": instant, "table_name": cfg.name,
            "base_path": base_path, "action": action,
            "operation": md.get("operation"),
            "metrics": md.get("metrics") or compute(md, action, None)}


def _dispatch_one(spec, msg: dict) -> None:
    if callable(spec):
        spec(msg)
        return
    if spec in _REGISTRY:
        _REGISTRY[spec](msg)
        return
    if spec == "console":
        print("[hudi-metrics] " + json.dumps(msg, default=str))
        return
    if spec.startswith("json:"):
        with open(spec[len("json:"):], "a") as fh:
            fh.write(json.dumps(msg, default=str) + "\n")
        return
    mod, _, fn = spec.partition(":")
    if not fn:
        raise ValueError(
            f"bad metrics_reporter spec {spec!r}; expected 'console', "
            "'json:/path', 'module:function', or a register()ed name")
    import importlib
    getattr(importlib.import_module(mod), fn)(msg)


def report(cfg, base_path: str, instant: str, action: str, md: dict) -> None:
    """Post-commit dispatch to the configured reporter; never raises."""
    spec = getattr(cfg, "metrics_reporter", None)
    if not spec:
        return
    msg = build_message(cfg, base_path, instant, action, md)
    try:
        _dispatch_one(spec, msg)
    except Exception as e:  # noqa: BLE001 — never fail a durable commit
        print(f"[hudi] metrics reporter {spec!r} failed for {instant}: "
              f"{type(e).__name__}: {e}", file=sys.stderr)
