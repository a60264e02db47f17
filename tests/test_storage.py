"""Storage abstraction: posix contract + backend-swap of the metadata path.

The reference routes all IO through Hadoop FileSystem (HoodieWrapperFileSystem
/ FSUtils); here the driver-side metadata IO goes through storage.Storage.
MemStorage below is a dict-backed backend registered under a fake scheme —
the timeline (mint / transition / read / archive-list) and the table lock run
against it untouched, proving nothing in the metadata path assumes posix.
"""

import os
import threading

import pytest

from hudi_0_12_0_my_spark import storage as stg
from hudi_0_12_0_my_spark import timeline as tl
from hudi_0_12_0_my_spark.util import FileLock


class MemStorage(stg.Storage):
    scheme = "mem"

    def __init__(self):
        self.blobs: dict[str, bytes] = {}
        self.lock = threading.Lock()

    def _key(self, path):
        return path.rstrip("/")

    def exists(self, path):
        k = self._key(path)
        return k in self.blobs or self.isdir(path)

    def isdir(self, path):
        prefix = self._key(path) + "/"
        return any(b.startswith(prefix) for b in self.blobs)

    def listdir(self, path):
        prefix = self._key(path) + "/"
        names = {b[len(prefix):].split("/", 1)[0]
                 for b in self.blobs if b.startswith(prefix)}
        return sorted(names)

    def read_bytes(self, path):
        try:
            return self.blobs[self._key(path)]
        except KeyError:
            raise FileNotFoundError(path) from None

    def size(self, path):
        return len(self.read_bytes(path))

    def atomic_put(self, path, data):
        with self.lock:
            self.blobs[self._key(path)] = data

    def move(self, src, dst):
        with self.lock:
            if os.path.exists(src):       # local staging -> mem publish
                with open(src, "rb") as f:
                    self.blobs[self._key(dst)] = f.read()
                os.unlink(src)
            else:
                self.blobs[self._key(dst)] = self.blobs.pop(self._key(src))

    def makedirs(self, path):
        pass                              # object-store semantics: no dirs

    def unlink(self, path):
        with self.lock:
            self.blobs.pop(self._key(path), None)

    def rm_rf(self, path):
        with self.lock:
            k, prefix = self._key(path), self._key(path) + "/"
            for b in [b for b in self.blobs if b == k or b.startswith(prefix)]:
                del self.blobs[b]

    def create_exclusive(self, path, data):
        with self.lock:
            k = self._key(path)
            if k in self.blobs:
                return False
            self.blobs[k] = data
            return True


@pytest.fixture()
def mem():
    m = MemStorage()
    stg._CACHE["mem"] = m
    yield m
    stg._CACHE.pop("mem", None)


def test_local_storage_roundtrip(tmp_path):
    st = stg.get_storage(str(tmp_path))
    assert isinstance(st, stg.LocalStorage)
    p = str(tmp_path / "a" / "b.json")
    st.write_json(p, {"x": 1})
    assert st.read_json(p) == {"x": 1}
    assert st.exists(p) and st.size(p) > 0
    assert st.listdir(str(tmp_path / "a")) == ["b.json"]
    st.move(p, str(tmp_path / "c.json"))
    assert not st.exists(p) and st.exists(str(tmp_path / "c.json"))
    assert st.create_exclusive(str(tmp_path / "lock"), b"1")
    assert not st.create_exclusive(str(tmp_path / "lock"), b"2")
    st.unlink(str(tmp_path / "lock"))
    st.unlink(str(tmp_path / "lock"))     # idempotent on missing
    st.rm_rf(str(tmp_path / "a"))
    assert st.listdir(str(tmp_path / "a")) == []


def test_scheme_resolution(mem):
    assert stg.get_storage("/tmp/x") is stg._LOCAL
    assert stg.get_storage("file:///tmp/x") is stg._LOCAL
    assert stg.get_storage("mem://tbl") is mem


def test_timeline_on_mem_backend(mem):
    """Full requested->inflight->completed lifecycle + archive listing against
    the dict backend: no posix call may leak through."""
    t = tl.Timeline("mem://warehouse/tbl")
    i1 = t.new_instant()
    t.save_requested(i1, tl.COMMIT, {"operation": "upsert"})
    t.save_inflight(i1, tl.COMMIT)
    # requested marker stays until completion (HoodieActiveTimeline keeps
    # both state files; only save_completed supersedes them)
    assert {i.state for i in t.pending()} == {tl.REQUESTED, tl.INFLIGHT}
    t.save_completed(i1, tl.COMMIT, {"total_records": 3})
    assert t.pending() == []
    done = t.completed()
    assert [i.time for i in done] == [i1]
    assert t.metadata(done[0])["total_records"] == 3
    i2 = t.new_instant()
    assert i2 > i1                        # minted under the mem-backend lock
    t.remove(i1)
    assert t.completed() == []
    assert t.archived() == []             # missing archive dir -> empty


def test_filelock_on_mem_backend(mem):
    with FileLock("mem://warehouse/tbl/.hoodie/lock", timeout_sec=0.5):
        with pytest.raises(TimeoutError):
            with FileLock("mem://warehouse/tbl/.hoodie/lock",
                          timeout_sec=0.2):
                pass
    # released: re-acquirable
    with FileLock("mem://warehouse/tbl/.hoodie/lock", timeout_sec=0.5):
        pass


def test_fsspec_backend_gated():
    """Without fsspec installed the error is informative, not an ImportError
    at import time (the module itself must import cleanly)."""
    try:
        import fsspec  # noqa: F401
        pytest.skip("fsspec installed; gate test targets the bare env")
    except ImportError:
        pass
    with pytest.raises(RuntimeError, match="fsspec"):
        stg.get_storage("s3://bucket/table")
    stg._CACHE.pop("s3", None)


def test_exists_many_batches_per_directory(tmp_path):
    """exists_many probes with one listdir per parent dir and returns the
    existing subset (missing files AND missing directories handled)."""
    from hudi_0_12_0_my_spark.storage import LocalStorage
    d = tmp_path / "p1"
    d.mkdir()
    (d / "a.parquet").write_text("")
    (tmp_path / "b.log").write_text("")
    st = LocalStorage()
    got = st.exists_many([str(d / "a.parquet"), str(d / "gone.parquet"),
                          str(tmp_path / "b.log"),
                          str(tmp_path / "no_dir" / "x.parquet")])
    assert got == {str(d / "a.parquet"), str(tmp_path / "b.log")}
