"""Commit timeline: ordered log of instants under ``<table>/.hoodie/timeline``.

Re-expression of Hudi's active timeline
(hudi-common/.../table/timeline/HoodieTimeline.java:46-64 action constants,
HoodieActiveTimeline.java state transitions requested->inflight->completed,
HoodieInstantTimeGenerator ms-precision monotonic instant times).

Each instant is one JSON file named ``<time>.<action>[.<state>]``:
  20260813010203001.commit              (completed)
  20260813010203001.commit.inflight
  20260813010203001.commit.requested
Completed write instants carry full commit metadata (files added per partition
with per-file column stats, replaced file groups) — this doubles as Hudi's
metadata table ``files`` + ``column_stats`` partitions
(hudi-common/.../metadata/MetadataPartitionType.java:24-27): the file-system
view and data-skipping stats are folds over completed-instant metadata.
"""

from __future__ import annotations

import os
import threading
import time
from dataclasses import dataclass

from .storage import get_storage
from .util import atomic_write_json, read_json

# actions (HoodieTimeline.java:46-64)
COMMIT = "commit"
DELTACOMMIT = "deltacommit"
REPLACECOMMIT = "replacecommit"
CLEAN = "clean"
ROLLBACK = "rollback"
SAVEPOINT = "savepoint"
RESTORE = "restore"
INDEXING = "indexing"

WRITE_ACTIONS = {COMMIT, DELTACOMMIT, REPLACECOMMIT}

REQUESTED = "requested"
INFLIGHT = "inflight"
COMPLETED = "completed"

_ts_lock = threading.Lock()
_last_ts = [0]


def new_instant_time() -> str:
    """Monotonic ms-precision instant time ``yyyyMMddHHmmssSSS``.

    Mirrors HoodieInstantTimeGenerator (ms precision since Hudi 0.x); a lock +
    last-value bump guarantees strict monotonicity within this writer process
    (single-writer mode, WriteConcurrencyMode.java:30-32).
    """
    with _ts_lock:
        ms = int(time.time() * 1000)
        if ms <= _last_ts[0]:
            ms = _last_ts[0] + 1
        _last_ts[0] = ms
        t = time.gmtime(ms / 1000.0)
        return time.strftime("%Y%m%d%H%M%S", t) + f"{ms % 1000:03d}"


@dataclass(frozen=True)
class Instant:
    time: str
    action: str
    state: str = COMPLETED

    @property
    def is_write(self) -> bool:
        return self.action in WRITE_ACTIONS


class Timeline:
    def __init__(self, base_path: str):
        self.base_path = base_path
        self.dir = os.path.join(base_path, ".hoodie", "timeline")
        self.storage = get_storage(base_path)
        self.storage.makedirs(self.dir)

    def new_instant(self) -> str:
        """Mint a table-unique instant: the last minted millisecond persists in
        `.hoodie/.last_instant` and is bumped under the table file lock, so two
        WRITER PROCESSES (OCC) can never mint the same instant — the in-process
        `new_instant_time()` lock alone cannot guarantee that, and colliding
        instants would commingle timeline metadata undetectably (the conflict
        check skips same-time instants)."""
        from .util import FileLock, ensure_dir
        ensure_dir(os.path.join(self.base_path, ".hoodie"))
        marker = os.path.join(self.base_path, ".hoodie", ".last_instant")
        with FileLock(os.path.join(self.base_path, ".hoodie", "instant_lock")):
            last = 0
            if self.storage.exists(marker):
                try:
                    last = int(self.storage.read_bytes(marker).strip() or 0)
                except ValueError:
                    last = 0
            ms = max(int(time.time() * 1000), last + 1)
            self.storage.atomic_put(marker, str(ms).encode())
        t = time.gmtime(ms / 1000.0)
        return time.strftime("%Y%m%d%H%M%S", t) + f"{ms % 1000:03d}"

    # -- paths -------------------------------------------------------------
    def _fname(self, instant: Instant) -> str:
        if instant.state == COMPLETED:
            return f"{instant.time}.{instant.action}"
        return f"{instant.time}.{instant.action}.{instant.state}"

    def path(self, instant: Instant) -> str:
        return os.path.join(self.dir, self._fname(instant))

    # -- state transitions ---------------------------------------------------
    def transition(self, instant_time: str, action: str, state: str, metadata: dict | None = None) -> Instant:
        ins = Instant(instant_time, action, state)
        atomic_write_json(self.path(ins), metadata or {})
        return ins

    def save_requested(self, instant_time: str, action: str, metadata: dict | None = None) -> Instant:
        return self.transition(instant_time, action, REQUESTED, metadata)

    def save_inflight(self, instant_time: str, action: str, metadata: dict | None = None) -> Instant:
        return self.transition(instant_time, action, INFLIGHT, metadata)

    def save_completed(self, instant_time: str, action: str, metadata: dict) -> Instant:
        ins = self.transition(instant_time, action, COMPLETED, metadata)
        # completed state supersedes requested/inflight marker files
        for st in (REQUESTED, INFLIGHT):
            self.storage.unlink(self.path(Instant(instant_time, action, st)))
        return ins

    def remove(self, instant_time: str, action: str | None = None) -> None:
        """Drop every state file of an instant (rollback/restore path)."""
        for fname in self.storage.listdir(self.dir):
            t, _, rest = fname.partition(".")
            if t != instant_time:
                continue
            act = rest.split(".")[0]
            if action is None or act == action:
                self.storage.unlink(os.path.join(self.dir, fname))

    # -- reads -------------------------------------------------------------
    def instants(self, states=(COMPLETED,), actions=None) -> list[Instant]:
        out = []
        for fname in self.storage.listdir(self.dir):
            if fname.startswith("."):
                continue
            parts = fname.split(".")
            if len(parts) == 2:
                t, action, state = parts[0], parts[1], COMPLETED
            elif len(parts) == 3:
                t, action, state = parts[0], parts[1], parts[2]
            else:
                continue
            if states and state not in states:
                continue
            if actions and action not in actions:
                continue
            out.append(Instant(t, action, state))
        out.sort(key=lambda i: (i.time, i.action))
        return out

    def completed(self, actions=None) -> list[Instant]:
        return self.instants(states=(COMPLETED,), actions=actions)

    def pending(self) -> list[Instant]:
        """Requested/inflight instants with NO completed state. The completed
        file supersedes: save_completed writes it before unlinking the
        transition files, so a crash in between leaves both on disk — such an
        instant is a DURABLE commit with leftover bookkeeping, and treating
        it as pending would let the failed-write healer delete committed
        data files (found by the crash-injection sweep)."""
        done = {(i.time, i.action) for i in self.instants(states=(COMPLETED,))}
        return [i for i in self.instants(states=(REQUESTED, INFLIGHT))
                if (i.time, i.action) not in done]

    def metadata(self, instant: Instant) -> dict:
        return read_json(self.path(instant))

    def latest_completed_write(self) -> Instant | None:
        writes = self.completed(actions=WRITE_ACTIONS)
        return writes[-1] if writes else None

    def completed_write_instants(self) -> list[Instant]:
        return self.completed(actions=WRITE_ACTIONS)

    def has_instant(self, instant_time: str) -> bool:
        return any(i.time == instant_time for i in self.instants(states=None))

    # -- archived timeline (HoodieArchivedTimeline.java) ---------------------
    def archived(self) -> list[tuple[Instant, dict]]:
        adir = os.path.join(self.base_path, ".hoodie", "archived")
        if not self.storage.isdir(adir):
            return []
        out = []
        for fname in self.storage.listdir(adir):
            if not fname.endswith(".json"):
                continue
            for entry in read_json(os.path.join(adir, fname)):
                out.append((Instant(entry["time"], entry["action"], COMPLETED),
                            entry["metadata"]))
        out.sort(key=lambda im: (im[0].time, im[0].action))
        return out
