"""Optimistic concurrency control (WriteConcurrencyMode OCC)."""

import pytest
from pyspark.sql import functions as F

from hudi_0_12_0_my_spark import Engine
from hudi_0_12_0_my_spark.writer import ConcurrentWriteConflictError


@pytest.fixture()
def occ_table(spark, tmp_path):
    eng = Engine(spark)
    t = eng.create_table(str(tmp_path / "occ"), record_key_fields=["id"],
                         precombine_field="seq", partition_field="grp",
                         concurrency_mode="occ")
    df = spark.createDataFrame(
        [(i, "a" if i < 10 else "b", float(i), 1) for i in range(20)],
        "id long, grp string, val double, seq long")
    t.bulk_insert(df)
    return eng, t, df


def _inject_commit_during_write(writer, other_fn):
    """Fire `other_fn` after this writer's staging completes but before its
    commit — deterministically emulating an interleaved concurrent writer."""
    orig = writer.stage_write
    fired = []

    def hooked(*a, **kw):
        out = orig(*a, **kw)
        if not fired:
            fired.append(True)
            other_fn()
        return out

    writer.stage_write = hooked
    return lambda: setattr(writer, "stage_write", orig)


def test_occ_conflict_detected_and_aborted(spark, tmp_path, occ_table):
    eng, t, df = occ_table
    other = eng.load_table(t.base_path)

    mut_a = df.filter("id < 5").withColumn("val", F.col("val") + 100) \
              .withColumn("seq", F.lit(2))
    mut_b = df.filter("id < 5").withColumn("val", F.col("val") + 999) \
              .withColumn("seq", F.lit(2))

    restore = _inject_commit_during_write(
        t.writer, lambda: other.upsert(mut_b))
    try:
        with pytest.raises(ConcurrentWriteConflictError):
            t.upsert(mut_a)
    finally:
        restore()

    # the other writer's commit survives; the aborted write left no trace
    snap = {r.id: r.val for r in t.reload().snapshot().collect()}
    assert snap[0] == 999.0
    assert len(snap) == 20
    assert t.timeline.pending() == []
    # a rerun of the failed write now succeeds (fresh view)
    t.upsert(mut_a)
    snap = {r.id: r.val for r in t.snapshot().collect()}
    assert snap[0] == 100.0


def test_occ_disjoint_writes_both_commit(spark, tmp_path, occ_table):
    eng, t, df = occ_table
    other = eng.load_table(t.base_path)

    # writer B touches partition 'b' while writer A touches partition 'a' —
    # disjoint file groups, no conflict
    mut_a = df.filter("grp = 'a' and id < 3") \
              .withColumn("val", F.lit(-1.0)).withColumn("seq", F.lit(2))
    mut_b = df.filter("grp = 'b' and id >= 17") \
              .withColumn("val", F.lit(-2.0)).withColumn("seq", F.lit(2))

    restore = _inject_commit_during_write(
        t.writer, lambda: other.upsert(mut_b))
    try:
        t.upsert(mut_a)
    finally:
        restore()

    snap = {r.id: r.val for r in t.reload().snapshot().collect()}
    assert snap[0] == -1.0 and snap[19] == -2.0
    assert len(t.timeline.completed_write_instants()) == 3


def test_failed_write_healed_on_next_write(spark, tmp_path):
    """A write that dies mid-job leaves a pending instant (+ staged files);
    the next write under the single-writer lock rolls it back lazily
    (rollbackFailedWrites) — but keeps scheduled compaction plans."""
    from pyspark.sql import functions as F
    from hudi_0_12_0_my_spark import Engine
    eng = Engine(spark)
    t = eng.create_table(str(tmp_path / "t"), record_key_fields=["id"],
                         precombine_field="seq", partition_field="grp")
    ok = spark.createDataFrame([(1, "a", 1.0, 1), (2, "a", 2.0, 1)],
                               "id long, grp string, val double, seq long")
    t.bulk_insert(ok)

    bad = ok.withColumn("val", F.expr("raise_error('boom') is null")
                        .cast("double"))
    try:
        t.upsert(bad)
        raise AssertionError("expected the poisoned upsert to fail")
    except AssertionError:
        raise
    except Exception:
        pass
    assert len(t.timeline.pending()) > 0         # crashed attempt left debris

    t.upsert(spark.createDataFrame([(2, "a", 20.0, 2)],
                                   "id long, grp string, val double, seq long"))
    assert t.timeline.pending() == []            # healed
    snap = {r.id: r.val for r in t.snapshot().collect()}
    assert snap == {1: 1.0, 2: 20.0}

    # a scheduled (requested) compaction plan is NOT garbage-collected
    t2 = eng.create_table(str(tmp_path / "m"), record_key_fields=["id"],
                          precombine_field="seq", partition_field="grp",
                          table_type="mor")
    t2.bulk_insert(ok)
    t2.upsert(spark.createDataFrame([(1, "a", 9.0, 2)],
                                    "id long, grp string, val double, seq long"))
    from hudi_0_12_0_my_spark.services.compaction import schedule_compaction
    plan = schedule_compaction(t2)
    assert plan is not None
    t2.upsert(spark.createDataFrame([(2, "a", 8.0, 2)],
                                    "id long, grp string, val double, seq long"))
    kept = [i for i in t2.timeline.pending()]
    assert any(i.time == plan["instant"] for i in kept)   # plan survived


def test_occ_writer_stamps_heartbeat_and_clears_on_commit(spark, tmp_path,
                                                          occ_table):
    import os
    eng, t, df = occ_table
    seen = []
    orig = t.writer.stage_write

    def hooked(df_, instant, *a, **kw):
        hb = os.path.join(t.base_path, ".hoodie", ".heartbeat", instant)
        seen.append(os.path.exists(hb))
        return orig(df_, instant, *a, **kw)

    t.writer.stage_write = hooked
    try:
        t.upsert(df.filter("id < 3").withColumn("seq", F.lit(2)))
    finally:
        t.writer.stage_write = orig
    assert seen == [True]        # live writer carried its liveness marker
    hb_dir = os.path.join(t.base_path, ".hoodie", ".heartbeat")
    assert not os.path.isdir(hb_dir) or not os.listdir(hb_dir)


def test_occ_lazy_clean_reaps_dead_writer_not_live_one(spark, tmp_path):
    """Multi-writer LAZY failed-write cleaning (CleanActionExecutor's
    rollbackFailedWrites + HoodieHeartbeatClient): the cleaner reaps a
    crashed writer's pending instant once its heartbeat expires, leaves a
    fresh-heartbeat one alone, and a reaped writer's late commit fails
    instead of committing dangling files."""
    import os
    from hudi_0_12_0_my_spark import util
    eng = Engine(spark)
    t = eng.create_table(str(tmp_path / "occ2"), record_key_fields=["id"],
                         precombine_field="seq", partition_field="grp",
                         concurrency_mode="occ")
    df = spark.createDataFrame(
        [(i, "a", float(i), 1) for i in range(10)],
        "id long, grp string, val double, seq long")
    t.bulk_insert(df)

    # writer A dies mid-write: stop after staging, before commit
    stop = RuntimeError("writer A dies before commit")
    orig = t.writer._commit_completed
    t.writer._commit_completed = \
        lambda *a, **kw: (_ for _ in ()).throw(stop)
    try:
        with pytest.raises(RuntimeError):
            t.upsert(df.withColumn("seq", F.lit(2)))
    finally:
        t.writer._commit_completed = orig
    dead = [i for i in t.timeline.pending()]
    assert dead, "crashed writer left no pending instant"

    # heartbeat still fresh -> clean must NOT reap it
    t2 = eng.load_table(t.base_path)
    t2.clean(policy="KEEP_LATEST_COMMITS", retain=1)
    assert [i.time for i in t2.timeline.pending()] == \
        [i.time for i in dead]

    # heartbeat expires -> clean reaps instant, marker, staged files
    hb_dir = os.path.join(t.base_path, ".hoodie", ".heartbeat")
    for f in os.listdir(hb_dir):
        with open(os.path.join(hb_dir, f), "w") as fh:
            fh.write("0")
    t2.clean(policy="KEEP_LATEST_COMMITS", retain=1)
    assert not t2.timeline.pending()
    mdir = os.path.join(t.base_path, ".hoodie", "markers")
    assert not os.path.isdir(mdir) or not os.listdir(mdir)
    snap = {r.id: r.seq for r in t2.snapshot().collect()}
    assert snap == {i: 1 for i in range(10)}   # dead write invisible

    # a writer reaped mid-write must fail its commit, not commit dangles
    orig_stage = t.writer.stage_write

    def stage_then_reap(*a, **kw):
        out = orig_stage(*a, **kw)
        for f in os.listdir(hb_dir):
            with open(os.path.join(hb_dir, f), "w") as fh:
                fh.write("0")
        t2.clean(policy="KEEP_LATEST_COMMITS", retain=1)
        return out

    t.writer.stage_write = stage_then_reap
    try:
        with pytest.raises(ConcurrentWriteConflictError):
            t.upsert(df.withColumn("seq", F.lit(3)))
    finally:
        t.writer.stage_write = orig_stage
    snap = {r.id: r.seq for r in t2.reload().snapshot().collect()}
    assert snap == {i: 1 for i in range(10)}
