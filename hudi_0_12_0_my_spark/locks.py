"""Pluggable table lock providers.

Re-expression of the reference's lock-provider family
(hudi-client/hudi-client-common/src/main/java/org/apache/hudi/client/
transaction/lock/: LockProvider, FileSystemBasedLockProvider,
InProcessLockProvider, ZookeeperBasedLockProvider) with the same contract:
``tryLock`` / ``unlock`` around the commit critical section, chosen by
table config (``hoodie.write.lock.provider``).

Providers here:

- ``filesystem`` (default) — create-if-absent lock file. Safe wherever the
  storage backend offers ATOMIC exclusive create: posix O_CREAT|O_EXCL, and
  fsspec backends whose ``open(mode="xb")`` is genuinely exclusive. Backends
  without atomic create now REFUSE loudly (storage.create_exclusive raises)
  instead of the old best-effort exists+write race — exactly why the
  reference documents FileSystemBasedLockProvider as HDFS/posix-only and
  requires an external provider on S3.
- ``inprocess`` — a process-wide ``threading.Lock`` per table path
  (InProcessLockProvider.java): correct for many writer THREADS in one
  driver (async table services, multi-stream one-process), never across
  processes.
- ``conditional_put`` — object stores with compare-and-set semantics
  (S3 If-None-Match PUT, GCS x-goog-if-generation-match, DynamoDB-style
  conditional writes). The generic fsspec API exposes no portable
  conditional-put, so this provider is a HOOK: subclass and implement
  ``try_lock``/``unlock`` against your store's SDK, then register under a
  dotted path in ``lock_provider``. Instantiating the base class refuses
  with that instruction rather than pretending safety.

Custom providers: set ``cfg.lock_provider = "pkg.module:ClassName"`` — the
class is imported and built as ``Cls(path, timeout_sec, poll_sec)``.
"""

from __future__ import annotations

import importlib
import threading
import time

from .storage import get_storage


class LockProvider:
    """Context-manager lock over a table-scoped path (LockProvider.java)."""

    def __init__(self, path: str, timeout_sec: float = 60.0,
                 poll_sec: float = 0.05):
        self.path = path
        self.timeout = timeout_sec
        self.poll = poll_sec

    def try_lock(self) -> bool:
        raise NotImplementedError

    def unlock(self) -> None:
        raise NotImplementedError

    def __enter__(self):
        deadline = time.time() + self.timeout
        while True:
            if self.try_lock():
                return self
            if time.time() > deadline:
                raise TimeoutError(f"could not acquire table lock {self.path}")
            time.sleep(self.poll)

    def __exit__(self, *exc):
        self.unlock()
        return False


def _pid_alive(pid: int) -> bool:
    import os
    try:
        os.kill(pid, 0)
        return True
    except ProcessLookupError:
        return False
    except PermissionError:     # exists, owned by someone else
        return True


class FileSystemLockProvider(LockProvider):
    """FileSystemBasedLockProvider.java: create-if-absent lock file via the
    storage backend's ATOMIC exclusive create.

    Stale-lock reclaim (a crashed writer otherwise blocks the table until
    manual cleanup — the reference docs say exactly that):
    - ``expire_sec`` > 0: a lock older than this is force-deleted before
      acquiring (FileSystemBasedLockProvider.checkIfExpired, the
      hoodie.write.lock.filesystem.expire knob). Age comes from a timestamp
      INSIDE the lock payload, portable across backends without mtime.
    - same-host extension: a lock whose recorded host is this machine and
      whose recorded pid no longer exists is dead by construction and
      reclaimed immediately (never applied cross-host, where pids mean
      nothing).
    """

    def __init__(self, path: str, timeout_sec: float = 60.0,
                 poll_sec: float = 0.05, expire_sec: float = 0.0):
        super().__init__(path, timeout_sec, poll_sec)
        self.expire_sec = expire_sec
        import uuid
        self._token = uuid.uuid4().hex   # unique per acquirer: ownership proof

    def _payload(self) -> bytes:
        import json
        import os
        import socket
        import time as _t
        return json.dumps({"pid": os.getpid(),
                           "host": socket.gethostname(),
                           "token": self._token,
                           "ts": _t.time()}).encode()

    def _read_meta(self, st, path: str):
        import json
        try:
            return json.loads(st.read_bytes(path).decode())
        except (ValueError, OSError):
            return None      # unreadable / vanished / legacy lock

    def _stale(self, meta, grace: float | None = None) -> bool:
        import socket
        import time as _t
        if meta is None:
            return False     # unreadable lock: never force-reclaim
        expire = self.expire_sec if grace is None else grace
        if expire > 0 and \
                _t.time() - float(meta.get("ts", _t.time())) > expire:
            return True
        return (meta.get("host") == socket.gethostname()
                and isinstance(meta.get("pid"), int)
                and not _pid_alive(meta["pid"]))

    def _reclaim(self, st, meta) -> None:
        """TOCTOU-safe stale-lock removal. Two writers that both judge the
        lock stale must not both proceed (the second's unlink would delete
        the first's FRESH lock). Serialized by a per-generation reclaim
        mutex: the stale payload's token names an exclusive tombstone file;
        only its creator may unlink the lock, and only after re-reading and
        confirming the payload still carries that same token — so a lock
        re-created in the window (new token) is never touched."""
        token = meta.get("token") or "legacy"
        tomb = f"{self.path}.reclaim-{token}"
        if st.exists(tomb):
            # a reclaimer crashed mid-reclaim: its tombstone would block this
            # generation forever. Same staleness rules, capped at 60s age —
            # the reclaim critical section is milliseconds.
            tmeta = self._read_meta(st, tomb)
            cap = min(self.expire_sec, 60.0) if self.expire_sec > 0 else 60.0
            if not self._stale(tmeta, grace=cap):
                return
            st.unlink(tomb)
        if not st.create_exclusive(tomb, self._payload()):
            return           # another writer is reclaiming this generation
        try:
            cur = self._read_meta(st, self.path)
            if cur is not None and (cur.get("token") or "legacy") == token:
                st.unlink(self.path)   # verified: still the stale generation
        finally:
            st.unlink(tomb)

    def try_lock(self) -> bool:
        st = get_storage(self.path)
        if st.exists(self.path):
            meta = self._read_meta(st, self.path)
            if not self._stale(meta):
                return False
            self._reclaim(st, meta)    # reference: delete expired lock file
        return st.create_exclusive(self.path, self._payload())

    def unlock(self) -> None:
        st = get_storage(self.path)
        meta = self._read_meta(st, self.path)
        if meta is not None and meta.get("token") not in (None, self._token):
            return   # reclaimed while we thought we held it: the lock at
            # this path belongs to a NEWER holder — never delete it.
        st.unlink(self.path)


_INPROC: dict[str, threading.Lock] = {}
_INPROC_GUARD = threading.Lock()


class InProcessLockProvider(LockProvider):
    """InProcessLockProvider.java: per-path process-wide mutex. Correct for
    concurrent writer THREADS in one driver; never across processes."""

    def _mutex(self) -> threading.Lock:
        with _INPROC_GUARD:
            return _INPROC.setdefault(self.path, threading.Lock())

    def try_lock(self) -> bool:
        return self._mutex().acquire(blocking=False)

    def unlock(self) -> None:
        self._mutex().release()


class ConditionalPutLockProvider(LockProvider):
    """Hook for object-store conditional-put locking (S3 If-None-Match /
    GCS generation-match / DynamoDB conditional write — the reference's
    DynamoDBBasedLockProvider shape). fsspec has no portable
    compare-and-set, so the base class refuses: subclass with your store's
    SDK and register the subclass under ``cfg.lock_provider``."""

    def try_lock(self) -> bool:
        raise NotImplementedError(
            "ConditionalPutLockProvider is a hook: subclass it with your "
            "object store's conditional-put SDK call (S3 If-None-Match PUT, "
            "DynamoDB conditional write) and set lock_provider to the "
            "subclass's dotted path. Generic multi-writer locking on object "
            "stores without compare-and-set is unsafe, exactly as the "
            "reference requires an external lock provider on S3.")

    unlock = try_lock


_BUILTIN = {
    "filesystem": FileSystemLockProvider,
    "inprocess": InProcessLockProvider,
    "conditional_put": ConditionalPutLockProvider,
}


def make_lock(path: str, provider: str = "filesystem",
              timeout_sec: float = 60.0, poll_sec: float = 0.05,
              expire_sec: float = 0.0) -> LockProvider:
    """Build the configured provider (LockManager.getLockProvider)."""
    cls = _BUILTIN.get(provider)
    if cls is None:
        mod, _, attr = provider.replace(":", ".").rpartition(".")
        try:
            cls = getattr(importlib.import_module(mod), attr)
        except (ImportError, AttributeError, ValueError) as e:
            raise ValueError(
                f"unknown lock provider {provider!r}; built-ins: "
                f"{sorted(_BUILTIN)} or a dotted path") from e
    if isinstance(cls, type) and issubclass(cls, FileSystemLockProvider):
        return cls(path, timeout_sec, poll_sec, expire_sec)
    return cls(path, timeout_sec, poll_sec)
