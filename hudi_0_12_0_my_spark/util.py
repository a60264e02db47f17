"""Filesystem + JSON helpers.

All physical-FS side effects of the engine funnel through this module so the
storage backend can be swapped (posix now; S3A/ABFS would replace rename with
conditional PUT — see SURVEY.md §7 "What's hard" #2).
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import time
import uuid


def atomic_write_json(path: str, obj) -> None:
    """Write JSON atomically: temp file in the same directory + rename.

    Mirrors Hudi's createImmutableFileInPath / requested->inflight->completed
    rename protocol (reference: hudi-common/.../table/timeline/HoodieActiveTimeline.java).
    """
    d = os.path.dirname(path)
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, prefix=".tmp_", suffix=".json")
    try:
        with os.fdopen(fd, "w") as f:
            json.dump(obj, f, separators=(",", ":"), default=str)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def read_json(path: str):
    with open(path) as f:
        return json.load(f)


def new_file_id() -> str:
    """File-group id: uuid-hex, guaranteed to contain no '_' or '.' so the
    base-file naming scheme ``<fileid>_<instant>.parquet`` is parseable."""
    return uuid.uuid4().hex


def ensure_dir(path: str) -> None:
    os.makedirs(path, exist_ok=True)


def rm_rf(path: str) -> None:
    if os.path.isdir(path):
        shutil.rmtree(path, ignore_errors=True)
    elif os.path.exists(path):
        os.unlink(path)


class FileLock:
    """Single-writer exclusion via O_CREAT|O_EXCL lock file.

    v1 of Hudi's WriteConcurrencyMode.SINGLE_WRITER + FileSystemBasedLockProvider
    (reference: hudi-client/hudi-client-common/.../transaction/lock/FileSystemBasedLockProvider.java).
    """

    def __init__(self, path: str, timeout_sec: float = 60.0, poll_sec: float = 0.05):
        self.path = path
        self.timeout = timeout_sec
        self.poll = poll_sec

    def __enter__(self):
        deadline = time.time() + self.timeout
        os.makedirs(os.path.dirname(self.path), exist_ok=True)
        while True:
            try:
                fd = os.open(self.path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.write(fd, str(os.getpid()).encode())
                os.close(fd)
                return self
            except FileExistsError:
                if time.time() > deadline:
                    raise TimeoutError(f"could not acquire table lock {self.path}")
                time.sleep(self.poll)

    def __exit__(self, *exc):
        try:
            os.unlink(self.path)
        except FileNotFoundError:
            pass
        return False
