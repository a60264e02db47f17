"""Filesystem + JSON helpers.

All driver-side FS side effects funnel through the Storage abstraction in
storage.py so the metadata backend can be swapped (posix default; fsspec for
object stores — see storage.py for the atomicity contract per backend, and
SURVEY.md §7 "What's hard" #2 for why rename-free stores need PUT-atomic
timeline files).
"""

from __future__ import annotations

import os
import time
import uuid

from .storage import get_storage


def atomic_write_json(path: str, obj) -> None:
    """Write JSON atomically: temp+rename on posix, single PUT on object
    stores. Mirrors Hudi's createImmutableFileInPath protocol (reference:
    hudi-common/.../table/timeline/HoodieActiveTimeline.java)."""
    get_storage(path).write_json(path, obj)


def read_json(path: str):
    return get_storage(path).read_json(path)


def new_file_id() -> str:
    """File-group id: uuid-hex, guaranteed to contain no '_' or '.' so the
    base-file naming scheme ``<fileid>_<instant>.parquet`` is parseable."""
    return uuid.uuid4().hex


def ensure_dir(path: str) -> None:
    get_storage(path).makedirs(path)


def rm_rf(path: str) -> None:
    get_storage(path).rm_rf(path)


def FileLock(path: str, timeout_sec: float = 60.0, poll_sec: float = 0.05):
    """Create-if-absent lock file (FileSystemBasedLockProvider.java).

    Kept as the default/legacy entry point; the pluggable provider family
    lives in locks.py (``cfg.lock_provider`` selects filesystem /
    inprocess / conditional_put / custom dotted path). Backends without
    atomic exclusive create now refuse instead of racing — see
    Storage.create_exclusive.
    """
    from .locks import FileSystemLockProvider
    return FileSystemLockProvider(path, timeout_sec, poll_sec)


# --- instant heartbeats -----------------------------------------------------
# Re-expression of HoodieHeartbeatClient (hudi-client/hudi-client-common/
# .../heartbeat/HoodieHeartbeatClient.java): a long-running service execution
# (async compaction) periodically touches .hoodie/.heartbeat/<instant>; the
# lazy failed-write healer skips pending instants whose heartbeat is fresh —
# only instants whose owner stopped beating (a real crash) are rolled back.

HEARTBEAT_TOLERANCE_SEC = 120.0


def _heartbeat_path(base_path: str, instant: str) -> str:
    return os.path.join(base_path, ".hoodie", ".heartbeat", instant)


def touch_heartbeat(base_path: str, instant: str) -> None:
    get_storage(base_path).atomic_put(
        _heartbeat_path(base_path, instant), str(time.time()).encode())


def clear_heartbeat(base_path: str, instant: str) -> None:
    st = get_storage(base_path)
    p = _heartbeat_path(base_path, instant)
    if st.exists(p):
        st.unlink(p)


def heartbeat_fresh(base_path: str, instant: str,
                    tolerance_sec: float = HEARTBEAT_TOLERANCE_SEC) -> bool:
    st = get_storage(base_path)
    p = _heartbeat_path(base_path, instant)
    if not st.exists(p):
        return False
    try:
        return time.time() - float(st.read_bytes(p)) < tolerance_sec
    except (ValueError, OSError):
        return False
