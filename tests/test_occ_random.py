"""Randomized multi-writer OCC sweep: N threads upsert overlapping random
key sets with conflict-retry, and the final table must equal the serial
application of exactly the COMMITTED writes in commit-time order.

This is the linearizability check the deterministic OCC tests can't give:
conflicts, retries and commit interleavings arise from real thread timing,
and every surviving value must trace to the latest committed instant that
wrote its key (SimpleConcurrentFileWritesConflictResolutionStrategy — two
commits may both land only when their file groups are disjoint, so
commit-time order over the same key is the only serialization that can
surface; a lost update would show up as a value from a superseded commit).
"""

import random
import threading

import pytest
from pyspark.sql import functions as F  # noqa: F401

from hudi_0_12_0_my_spark import Engine
from hudi_0_12_0_my_spark.writer import ConcurrentWriteConflictError

SCHEMA = "id long, grp string, val double, seq long"
GRPS = ["a", "b"]


@pytest.mark.parametrize("seed", [7, 21])
def test_occ_random_multiwriter_serializes(spark, tmp_path, seed):
    eng = Engine(spark)
    base = str(tmp_path / "t")
    t = eng.create_table(base, record_key_fields=["id"],
                         precombine_field="seq", partition_field="grp",
                         concurrency_mode="occ")
    seed_rows = [(i, GRPS[i % 2], 0.0, 0) for i in range(30)]
    t.bulk_insert(spark.createDataFrame(seed_rows, SCHEMA))

    committed = []           # (instant, {key: (grp, val)}) per successful write
    committed_lock = threading.Lock()
    errors = []

    def writer(tag: int):
        rng = random.Random(seed * 100 + tag)
        try:
            handle = eng.load_table(base)
            for step in range(5):
                ids = rng.sample(range(30), rng.randrange(2, 6))
                seq = step + 1
                val = float(tag * 1000 + step)
                rows = [(i, GRPS[i % 2], val, seq) for i in ids]
                df = spark.createDataFrame(rows, SCHEMA)
                for attempt in range(12):
                    try:
                        ins = handle.upsert(df)
                        with committed_lock:
                            committed.append(
                                (ins, {r[0]: (r[1], r[2]) for r in rows}))
                        break
                    except ConcurrentWriteConflictError:
                        handle = eng.load_table(base)   # fresh view, retry
                else:
                    raise RuntimeError(f"writer {tag}: retries exhausted")
        except Exception as e:  # noqa: BLE001 — surfaced below
            errors.append(e)

    threads = [threading.Thread(target=writer, args=(k,)) for k in range(3)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors, f"writer failed: {errors[0]}"
    assert len(committed) == 15

    # serial replay in commit-time order == the table
    expect = {i: (GRPS[i % 2], 0.0) for i in range(30)}
    for _, kv in sorted(committed, key=lambda c: c[0]):
        expect.update(kv)
    got = {r.id: (r.grp, r.val) for r in t.reload().snapshot().collect()}
    assert got == expect

    # every commit on the timeline is one we recorded (no ghosts), plus the
    # seed bulk_insert; nothing pending survives
    times = {c[0] for c in committed}
    wis = [i.time for i in t.timeline.completed_write_instants()]
    assert set(wis[1:]) == times and len(wis) == 16
    assert not t.timeline.pending()
