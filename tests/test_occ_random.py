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


def test_occ_continuous_ingest_with_concurrent_batch_writer(spark, tmp_path):
    """Multi-writer OCC across the managed CONTINUOUS INGEST loop and a
    concurrent batch upserter, with async compaction interleaving under
    the same file lock (VERDICT r4 item 8): after N rounds the ledger is
    exactly-once (each ingest batch applied once, idle rounds no-ops), no
    committed write is lost, and the final table equals the model — latest
    seq per ingest key, commit-time-order replay for batch keys."""
    import json as _json
    import os
    import threading

    from hudi_0_12_0_my_spark import timeline as tl
    from hudi_0_12_0_my_spark.streaming.ingest import (ContinuousIngest,
                                                       TableStreamConfig)

    def write_jsonl(dirpath, name, rows):
        os.makedirs(dirpath, exist_ok=True)
        tmp = os.path.join(dirpath, f".{name}.tmp")
        with open(tmp, "w") as fh:
            for r in rows:
                fh.write(_json.dumps(r) + "\n")
        os.rename(tmp, os.path.join(dirpath, name))

    eng = Engine(spark)
    base, src = str(tmp_path / "occt"), str(tmp_path / "in")
    eng.create_table(base, name="occt", record_key_fields=["id"],
                     precombine_field="seq", partition_field="grp",
                     table_type="mor", concurrency_mode="occ",
                     compaction_max_delta_commits=2)
    tc = TableStreamConfig(
        name="occt", base_path=base, table_type="mor",
        fields=[{"name": "id", "type": "bigint"},
                {"name": "grp", "type": "string"},
                {"name": "v", "type": "bigint"},
                {"name": "seq", "type": "bigint"}],
        record_key_fields=["id"], precombine_field="seq",
        source={"format": "json-files", "path": src})

    committed = []           # batch writer's (instant, {id: val}) records
    lock = threading.Lock()
    errors = []
    stop = threading.Event()

    def batch_writer():
        try:
            handle = eng.load_table(base)
            step = 0
            while not stop.is_set() and step < 6:
                step += 1
                rows = [(100 + k, GRPS[k % 2], step * 7, step)
                        for k in range(step % 3, 10, 3)]
                df = spark.createDataFrame(rows, SCHEMA_B)
                for _attempt in range(20):
                    try:
                        ins = handle.upsert(df)
                        with lock:
                            committed.append((ins,
                                              {r[0]: r[2] for r in rows}))
                        break
                    except ConcurrentWriteConflictError:
                        handle = eng.load_table(base)
                else:
                    raise RuntimeError("batch writer: retries exhausted")
        except Exception as e:  # noqa: BLE001 — surfaced below
            errors.append(e)

    SCHEMA_B = "id long, grp string, v long, seq long"
    th = threading.Thread(target=batch_writer)
    th.start()
    ci = ContinuousIngest(eng, [tc], str(tmp_path / "ck"),
                          clean=False, retry_count=20,
                          retry_interval_sec=0.1)
    n_batches = 0
    try:
        for rnd in range(1, 5):
            write_jsonl(src, f"b{rnd}.json",
                        [{"id": k, "grp": GRPS[k % 2], "v": rnd * 10 + k,
                          "seq": rnd} for k in range(15)])
            n_batches += 1
            ci.run(max_rounds=1)
        ci.run(max_rounds=1)          # idle round: must be a no-op
    finally:
        stop.set()
        th.join()
    assert not errors, f"batch writer failed: {errors[0]}"
    assert len(committed) == 6

    t = eng.load_table(base)
    got = {r.id: r for r in t.snapshot().collect()}
    # ingest keys: last round wins (ledger exactly-once, no duplicates)
    for k in range(15):
        assert got[k].v == 4 * 10 + k, (k, got[k])
    # batch keys: serial replay of COMMITTED writes in commit-time order
    expect: dict = {}
    for _, kv in sorted(committed, key=lambda c: c[0]):
        expect.update(kv)
    assert {k: got[k].v for k in expect} == expect
    # ledger: one streaming commit per consumed batch, ids distinct, and
    # every batch-writer commit is on the timeline (no lost commits)
    stream_ids = []
    wtimes = set()
    for ins in t.timeline.completed_write_instants():
        md = t.timeline.metadata(ins) or {}
        s = (md.get("extra_metadata") or {}).get("streaming") or {}
        if s:
            stream_ids.append(s.get("batch_id"))
        wtimes.add(ins.time)
    assert len(stream_ids) == len(set(stream_ids)) == n_batches
    assert {c[0] for c in committed} <= wtimes
    assert not t.timeline.pending()
    # async compaction really interleaved (MOR trigger=2 over >= 10 commits)
    assert any(
        (t.timeline.metadata(i) or {}).get("operation") == "compact"
        for i in t.timeline.completed_write_instants()
        if i.action == tl.COMMIT)
