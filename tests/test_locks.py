"""Pluggable lock providers (locks.py vs transaction/lock/ in the reference)."""

from __future__ import annotations

import os
import subprocess
import sys
import threading

import pytest

from hudi_0_12_0_my_spark.locks import (ConditionalPutLockProvider,
                                        FileSystemLockProvider,
                                        InProcessLockProvider, make_lock)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_filesystem_provider_mutual_exclusion(tmp_path):
    p = str(tmp_path / "lk")
    a = FileSystemLockProvider(p)
    b = FileSystemLockProvider(p, timeout_sec=0.2)
    with a:
        assert not b.try_lock()
        with pytest.raises(TimeoutError):
            b.__enter__()
    with b:     # released by a's exit
        pass


def test_inprocess_provider_threads(tmp_path):
    p = str(tmp_path / "ip")
    n = [0]

    def bump():
        for _ in range(200):
            with InProcessLockProvider(p):
                n[0] += 1

    ts = [threading.Thread(target=bump) for _ in range(4)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    assert n[0] == 800


def test_conditional_put_is_a_refusing_hook(tmp_path):
    with pytest.raises(NotImplementedError, match="conditional-put"):
        with ConditionalPutLockProvider(str(tmp_path / "cp")):
            pass


def test_make_lock_registry_and_dotted_path(tmp_path):
    assert isinstance(make_lock("/x", "filesystem"), FileSystemLockProvider)
    assert isinstance(make_lock("/x", "inprocess"), InProcessLockProvider)
    got = make_lock("/x", "hudi_0_12_0_my_spark.locks:InProcessLockProvider")
    assert isinstance(got, InProcessLockProvider)
    with pytest.raises(ValueError, match="unknown lock provider"):
        make_lock("/x", "nope")


def test_fsspec_backend_exclusive_create(tmp_path):
    """fsspec LocalFileSystem open('xb') is genuinely exclusive (O_EXCL), so
    the filesystem provider is safe over the fsspec backend; the memory
    backend behaves the same in-process."""
    fsspec = pytest.importorskip("fsspec")
    from hudi_0_12_0_my_spark.storage import get_storage
    st = get_storage("memory://locks/a")
    assert st.create_exclusive("memory://locks/a", b"1") is True
    assert st.create_exclusive("memory://locks/a", b"2") is False
    st.unlink("memory://locks/a")
    assert st.create_exclusive("memory://locks/a", b"3") is True


_HAMMER = """
import sys, time
sys.path.insert(0, {repo!r})
from hudi_0_12_0_my_spark.locks import FileSystemLockProvider
path = {path!r}
counter = {counter!r}
for _ in range(40):
    with FileSystemLockProvider(path, timeout_sec=30):
        with open(counter) as fh:
            v = int(fh.read())
        time.sleep(0.001)      # widen the race window
        with open(counter + ".tmp", "w") as fh:
            fh.write(str(v + 1))
        import os; os.replace(counter + ".tmp", counter)
print("HAMMER DONE")
"""


@pytest.mark.parametrize("backend", ["posix", "fsspec"])
def test_multiprocess_lock_contention(tmp_path, backend):
    """Two real processes contend for the SAME lock: a read-modify-write
    counter under the lock never loses an increment — the atomic-create
    guarantee holds cross-process. The fsspec variant routes through
    FsspecStorage's strict 'xb' (local:// protocol); skipped where fsspec
    is absent."""
    if backend == "fsspec":
        pytest.importorskip("fsspec")
    counter = str(tmp_path / "counter")
    with open(counter, "w") as fh:
        fh.write("0")
    lock_url = str(tmp_path / "the_lock") if backend == "posix" \
        else "local://" + str(tmp_path / "the_lock")
    procs = [subprocess.Popen(
        [sys.executable, "-c",
         _HAMMER.format(repo=REPO, path=lock_url, counter=counter)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for _ in range(2)]
    outs = [p.communicate(timeout=300)[0].decode() for p in procs]
    assert all(p.returncode == 0 for p in procs), outs
    assert all("HAMMER DONE" in o for o in outs)
    with open(counter) as fh:
        assert int(fh.read()) == 80


def test_dead_pid_lock_reclaim(tmp_path):
    """A lock held by a dead same-host process is reclaimed immediately
    (local extension to FileSystemBasedLockProvider, whose docs otherwise
    require manual cleanup after a writer crash)."""
    import json
    import socket
    import subprocess
    import sys
    import time
    from hudi_0_12_0_my_spark.locks import FileSystemLockProvider

    path = str(tmp_path / "lock")
    # a real process that has exited -> its pid is dead by construction
    p = subprocess.Popen([sys.executable, "-c", "pass"])
    p.wait()
    with open(path, "w") as fh:
        json.dump({"pid": p.pid, "host": socket.gethostname(),
                   "ts": time.time()}, fh)
    lk = FileSystemLockProvider(path, timeout_sec=2)
    assert lk.try_lock()                 # reclaimed + acquired
    lk.unlock()


def test_live_pid_lock_not_reclaimed(tmp_path):
    import os
    from hudi_0_12_0_my_spark.locks import FileSystemLockProvider
    path = str(tmp_path / "lock")
    holder = FileSystemLockProvider(path)
    assert holder.try_lock()             # held by THIS live process
    other = FileSystemLockProvider(path, timeout_sec=0.2, poll_sec=0.05)
    assert not other.try_lock()
    with pytest.raises(TimeoutError):
        other.__enter__()
    holder.unlock()


def test_expired_lock_reclaim(tmp_path):
    """Age-based expiry (hoodie.write.lock.filesystem.expire): a lock older
    than expire_sec is force-deleted before acquiring."""
    import json
    import os
    import socket
    import time
    from hudi_0_12_0_my_spark.locks import FileSystemLockProvider
    path = str(tmp_path / "lock")
    with open(path, "w") as fh:          # live pid, but ancient timestamp
        json.dump({"pid": os.getpid(), "host": socket.gethostname(),
                   "ts": time.time() - 3600}, fh)
    assert not FileSystemLockProvider(path).try_lock()           # no expiry
    lk = FileSystemLockProvider(path, expire_sec=60.0)
    assert lk.try_lock()
    lk.unlock()

def test_unlock_is_ownership_checked(tmp_path):
    """ADVICE r3: an expired-but-alive holder's unlock must NOT delete the
    reclaimer's fresh lock. A's lock expires, B reclaims + acquires; A's
    late unlock is a no-op (token mismatch) and B keeps mutual exclusion."""
    import json
    path = str(tmp_path / "lock")
    a = FileSystemLockProvider(path, expire_sec=0.05)
    assert a.try_lock()
    import time
    time.sleep(0.1)                       # A's lock is now age-expired
    b = FileSystemLockProvider(path, expire_sec=0.05)
    assert b.try_lock()                   # reclaims A's stale lock
    a.unlock()                            # late exit of the old holder
    with open(path) as fh:                # B's lock survived A's unlock
        assert json.load(fh)["token"] == b._token
    c = FileSystemLockProvider(path, timeout_sec=0.2)
    assert not c.try_lock()               # B still holds
    b.unlock()
    assert not os.path.exists(path)       # B's own unlock does release


def test_reclaim_serialized_by_tombstone(tmp_path):
    """Two writers that both judged the same lock generation stale are
    serialized by the per-token reclaim tombstone: while one holds the
    tombstone, the other's try_lock returns False instead of double-deleting."""
    import json
    import socket
    import subprocess
    import time
    path = str(tmp_path / "lock")
    dead = subprocess.Popen([sys.executable, "-c", "pass"]); dead.wait()
    with open(path, "w") as fh:           # stale: dead same-host pid
        json.dump({"pid": dead.pid, "host": socket.gethostname(),
                   "ts": time.time(), "token": "gen1"}, fh)
    # a LIVE reclaimer already holds the generation's tombstone
    with open(path + ".reclaim-gen1", "w") as fh:
        json.dump({"pid": os.getpid(), "host": socket.gethostname(),
                   "ts": time.time(), "token": "other"}, fh)
    b = FileSystemLockProvider(path)
    assert not b.try_lock()               # reclaim in progress elsewhere
    # a STALE tombstone (crashed reclaimer) is itself healed
    with open(path + ".reclaim-gen1", "w") as fh:
        json.dump({"pid": dead.pid, "host": socket.gethostname(),
                   "ts": time.time(), "token": "other"}, fh)
    assert b.try_lock()
    b.unlock()


def test_reclaim_verifies_generation_token(tmp_path):
    """TOCTOU guard: if the lock was re-created (new token) between the
    staleness judgement and the reclaim, the reclaim must not unlink it."""
    import json
    import socket
    import subprocess
    import time
    from hudi_0_12_0_my_spark.storage import get_storage
    path = str(tmp_path / "lock")
    dead = subprocess.Popen([sys.executable, "-c", "pass"]); dead.wait()
    stale = {"pid": dead.pid, "host": socket.gethostname(),
             "ts": time.time(), "token": "gen1"}
    b = FileSystemLockProvider(path)
    # simulate: B read `stale`, then another writer re-created the lock
    fresh = {"pid": os.getpid(), "host": socket.gethostname(),
             "ts": time.time(), "token": "gen2"}
    with open(path, "w") as fh:
        json.dump(fresh, fh)
    b._reclaim(get_storage(path), stale)
    with open(path) as fh:                # the fresh generation survived
        assert json.load(fh)["token"] == "gen2"
