"""Write-commit callbacks (HoodieWriteCommitCallback parity).

The reference notifies an external system after every successful write
commit (hudi-client-common/.../callback/HoodieWriteCommitCallback.java;
HTTP impl HoodieWriteCommitHttpCallback, Kafka impl in hudi-utilities).
Message fields mirror HoodieWriteCommitCallbackMessage: commit time, table
name, base path, write stats.

Configured per table via ``cfg.commit_callback``:
  "module.sub:function"  import and call with the message dict
  "file:/path"           append the message as one JSON line
  "http://..."/"https:"  POST the JSON message (urllib, 5s timeout)
or registered in-process with ``table.on_commit(fn)``.

A callback failure is LOGGED and swallowed — the commit already durably
completed, and the reference's HTTP callback likewise never fails the
write (HoodieWriteCommitHttpCallback logs and returns).
"""

from __future__ import annotations

import json
import sys


def build_message(cfg, base_path: str, instant: str, action: str,
                  md: dict) -> dict:
    return {
        "commit_time": instant,
        "table_name": cfg.name,
        "base_path": base_path,
        "action": action,
        "operation": md.get("operation"),
        "partition_to_write_stats": md.get("partition_to_write_stats") or {},
    }


def _dispatch_one(spec, msg: dict) -> None:
    if callable(spec):
        spec(msg)
        return
    if spec.startswith("file:"):
        with open(spec[len("file:"):], "a") as fh:
            fh.write(json.dumps(msg, default=str) + "\n")
        return
    if spec.startswith(("http://", "https://")):
        import urllib.request
        req = urllib.request.Request(
            spec, data=json.dumps(msg, default=str).encode(),
            headers={"Content-Type": "application/json"})
        urllib.request.urlopen(req, timeout=5).read()
        return
    mod, _, fn = spec.partition(":")
    if not fn:
        raise ValueError(f"bad commit_callback spec {spec!r}; expected "
                         "module:function, file:/path, or http(s)://url")
    import importlib
    getattr(importlib.import_module(mod), fn)(msg)


def fire(cfg, base_path: str, instant: str, action: str, md: dict,
         extra=()) -> None:
    specs = list(extra)
    if getattr(cfg, "commit_callback", None):
        specs.append(cfg.commit_callback)
    if not specs:
        return
    msg = build_message(cfg, base_path, instant, action, md)
    for spec in specs:
        try:
            _dispatch_one(spec, msg)
        except Exception as e:  # noqa: BLE001 — never fail a durable commit
            print(f"[hudi] commit callback {spec!r} failed for {instant}: "
                  f"{type(e).__name__}: {e}", file=sys.stderr)
