"""MOR table type + table services. Mirrors TestMORDataSource.scala /
TestCompactionProcedure / TestClusteringProcedure scenarios (SURVEY.md §5) and
the FIXTURES.md F5 expected-state fixtures."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Row

from hudi_0_12_0_my_spark import Engine


def make_rows(spark, rows):
    return spark.createDataFrame(
        [Row(id=i, name=n, price=float(p), ts=t, dt=d) for i, n, p, t, d in rows],
        "id int, name string, price double, ts long, dt string")


BATCH1 = [(1, "a", 10.0, 100, "2021-01-01"),
          (2, "b", 20.0, 100, "2021-01-01"),
          (3, "c", 30.0, 100, "2021-01-02")]


@pytest.fixture()
def mor(spark, tmp_table_dir):
    return Engine(spark).create_table(
        tmp_table_dir, record_key_fields=["id"], precombine_field="ts",
        partition_field="dt", table_type="mor")


def test_mor_snapshot_vs_read_optimized(spark, mor):
    mor.bulk_insert(make_rows(spark, BATCH1))
    mor.upsert(make_rows(spark, [(2, "b2", 21.0, 200, "2021-01-01"),
                                 (9, "i", 90.0, 200, "2021-01-02")]))
    # F5.5: read_optimized misses delta updates, snapshot includes them
    ro = {r.id: r.name for r in mor.read_optimized().collect()}
    assert ro[2] == "b"          # delta not visible in read-optimized
    assert 9 in ro               # MOR inserts create base files -> visible
    snap = {r.id: r.name for r in mor.snapshot().collect()}
    assert snap[2] == "b2" and snap[9] == "i"


def test_mor_delete_via_delta(spark, mor):
    mor.bulk_insert(make_rows(spark, BATCH1))
    mor.delete(where="id = 1")
    assert {r.id for r in mor.snapshot().collect()} == {2, 3}
    # base file untouched: read_optimized still sees id=1
    assert {r.id for r in mor.read_optimized().collect()} == {1, 2, 3}


def test_compaction_aligns_ro_with_snapshot(spark, mor):
    mor.bulk_insert(make_rows(spark, BATCH1))
    mor.upsert(make_rows(spark, [(2, "b2", 21.0, 200, "2021-01-01")]))
    mor.delete(where="id = 3")
    snap_before = {(r.id, r.name) for r in mor.snapshot().collect()}
    c = mor.compact()
    assert c is not None
    snap_after = {(r.id, r.name) for r in mor.snapshot().collect()}
    ro_after = {(r.id, r.name) for r in mor.read_optimized().collect()}
    assert snap_before == snap_after == ro_after == {(1, "a"), (2, "b2")}
    # no dirty slices remain
    assert all(not s.deltas for _, s in mor.view().live_slices())


def test_mor_incremental(spark, mor):
    c1 = mor.bulk_insert(make_rows(spark, BATCH1))
    c2 = mor.upsert(make_rows(spark, [(2, "b2", 21.0, 200, "2021-01-01")]))
    inc = {(r.id, r.name) for r in mor.incremental(begin=c1, end=c2).collect()}
    assert inc == {(2, "b2")}


def test_clustering_preserves_rows(spark, tmp_table_dir):
    eng = Engine(spark)
    # small_file_limit=1 disables bin packing -> each insert makes a new group
    t = eng.create_table(tmp_table_dir, record_key_fields=["id"],
                         precombine_field="ts", partition_field="dt",
                         small_file_limit_bytes=1)
    for i in range(4):
        t.insert(make_rows(spark, [(10 + i, f"n{i}", float(i), 100, "2021-01-01")]))
    files_before = len(t.view().live_base_files())
    assert files_before >= 2
    before = {(r.id, r.name) for r in t.snapshot().collect()}
    c = t.cluster(sort_cols=["id"])
    assert c is not None
    after = {(r.id, r.name) for r in t.snapshot().collect()}
    assert before == after                       # F5.7: row set identical
    assert len(t.view().live_base_files()) < files_before
    # time travel before the replacecommit still sees the old layout
    assert {(r.id, r.name) for r in t.time_travel(as_of=c[:-1] + "0").collect()} == before


def test_zorder_clustering(spark, tmp_table_dir):
    eng = Engine(spark)
    t = eng.create_table(tmp_table_dir, record_key_fields=["id"],
                         precombine_field="ts", partition_field="dt")
    rows = [(i, f"n{i}", float(i % 7), 100, "2021-01-01") for i in range(200)]
    t.bulk_insert(make_rows(spark, rows))
    before = {r.id for r in t.snapshot().collect()}
    c = t.cluster(sort_cols=["price", "ts"], layout="zorder")
    assert c is not None
    assert {r.id for r in t.snapshot().collect()} == before
    snap = t.snapshot()
    assert "__curve_key" not in snap.columns


def test_rollback_completed(spark, tmp_table_dir):
    eng = Engine(spark)
    t = eng.create_table(tmp_table_dir, record_key_fields=["id"],
                         precombine_field="ts", partition_field="dt")
    t.bulk_insert(make_rows(spark, BATCH1))
    c2 = t.upsert(make_rows(spark, [(2, "b2", 21.0, 200, "2021-01-01")]))
    t.rollback(c2)
    snap = {r.id: r.name for r in t.snapshot().collect()}
    assert snap[2] == "b"
    assert all(c["instant"] != c2 for c in t.commits())


def test_rollback_pending_crashed_write(spark, tmp_table_dir):
    eng = Engine(spark)
    t = eng.create_table(tmp_table_dir, record_key_fields=["id"],
                         precombine_field="ts", partition_field="dt")
    t.bulk_insert(make_rows(spark, BATCH1))
    # simulate a crash: requested instant + orphan marker with a moved file
    from hudi_0_12_0_my_spark import timeline as tl
    from hudi_0_12_0_my_spark.util import atomic_write_json
    bad = tl.new_instant_time()
    t.timeline.save_requested(bad, tl.COMMIT, {"operation": "upsert"})
    orphan_rel = os.path.join("2021-01-01", f"deadbeef_{bad}.parquet")
    orphan = t.abs(orphan_rel)
    os.makedirs(os.path.dirname(orphan), exist_ok=True)
    with open(orphan, "w") as f:
        f.write("junk")
    atomic_write_json(t.writer._marker_path(bad), {"files": [orphan_rel]})
    out = t.rollback()      # F5.8: snapshot unchanged, junk cleaned
    assert out["rolled_back"] == [bad]
    assert not os.path.exists(orphan)
    assert len(t.snapshot().collect()) == 3


def test_savepoint_restore(spark, tmp_table_dir):
    eng = Engine(spark)
    t = eng.create_table(tmp_table_dir, record_key_fields=["id"],
                         precombine_field="ts", partition_field="dt")
    c1 = t.bulk_insert(make_rows(spark, BATCH1))
    sp = t.savepoint()
    t.upsert(make_rows(spark, [(2, "b2", 21.0, 200, "2021-01-01")]))
    t.upsert(make_rows(spark, [(3, "c2", 31.0, 300, "2021-01-02")]))
    t.restore(sp)
    snap = {r.id: r.name for r in t.snapshot().collect()}
    assert snap == {1: "a", 2: "b", 3: "c"}
    assert t.latest_instant() == c1


def test_cleaner_keep_latest_commits(spark, tmp_table_dir):
    eng = Engine(spark)
    t = eng.create_table(tmp_table_dir, record_key_fields=["id"],
                         precombine_field="ts", partition_field="dt",
                         cleaner_retain_commits=2)
    t.bulk_insert(make_rows(spark, BATCH1))
    for v in range(1, 4):
        t.upsert(make_rows(spark, [(1, f"v{v}", 10.0 + v, 100 + v, "2021-01-01")]))
    snap_before = {(r.id, r.name) for r in t.snapshot().collect()}
    out = t.clean()
    assert out["removed"] > 0
    assert {(r.id, r.name) for r in t.snapshot().collect()} == snap_before
    # time travel beyond the retention window must now fail loudly
    first = t.commits()[0]["instant"]
    with pytest.raises(ValueError):
        t.time_travel(as_of=first).collect()


def test_cleaner_gc_replaced_groups(spark, tmp_table_dir):
    """Groups replaced by insert_overwrite must be physically cleaned once the
    replacement is out of retention (CleanPlanner replaced-group GC)."""
    eng = Engine(spark)
    t = eng.create_table(tmp_table_dir, record_key_fields=["id"],
                         precombine_field="ts", partition_field="dt",
                         cleaner_retain_commits=1)
    t.bulk_insert(make_rows(spark, BATCH1))
    old_files = set(t.view().live_base_files())
    t.insert_overwrite_table(make_rows(spark, [(9, "z", 9.0, 1, "2021-01-01")]))
    t.upsert(make_rows(spark, [(9, "z2", 10.0, 2, "2021-01-01")]))
    out = t.clean()
    assert out["removed"] > 0
    for p in old_files:               # every replaced group's file is gone
        assert not os.path.exists(p)
    assert {r.name for r in t.snapshot().collect()} == {"z2"}


def test_cleaner_keep_latest_by_hours(spark, tmp_table_dir):
    eng = Engine(spark)
    t = eng.create_table(tmp_table_dir, record_key_fields=["id"],
                         precombine_field="ts", partition_field="dt")
    t.bulk_insert(make_rows(spark, BATCH1))
    for v in range(3):
        t.upsert(make_rows(spark, [(1, f"v{v}", float(v), 100 + v, "2021-01-01")]))
    # a 1000h window keeps everything; a 0h window cleans old slices
    assert t.clean(policy="KEEP_LATEST_BY_HOURS", retain=1000)["removed"] == 0
    out = t.clean(policy="KEEP_LATEST_BY_HOURS", retain=0)
    assert out["removed"] > 0
    assert {r.name for r in t.snapshot().filter("id = 1").collect()} == {"v2"}


def test_schema_promotion_and_narrowing_guard(spark, tmp_table_dir):
    """Wider incoming types promote the registry (int->long, float->double);
    incompatible narrowing raises instead of nulling (ADVICE r1)."""
    import pytest as _pytest

    from hudi_0_12_0_my_spark.writer import business_schema
    eng = Engine(spark)
    t = eng.create_table(tmp_table_dir, record_key_fields=["id"],
                         precombine_field="seq")
    t.bulk_insert(spark.createDataFrame([(1, 1, 1.5, 1)],
                                        "id long, small int, f float, seq long"))
    big = 2 ** 40
    t.upsert(spark.createDataFrame([(2, big, 2.5, 1)],
                                   "id long, small bigint, f double, seq long"))
    sch = {f.name: f.dataType.simpleString()
           for f in business_schema(t.reload().cfg).fields}
    assert sch["small"] == "bigint" and sch["f"] == "double"
    snap = {r.id: r.small for r in t.snapshot().collect()}
    assert snap == {1: 1, 2: big}     # wide value survives, old rows readable
    with _pytest.raises(ValueError, match="incompatible write"):
        t.upsert(spark.createDataFrame([(3, "oops", 0.0, 1)],
                                       "id long, small string, f double, seq long"))


def test_instant_minting_is_table_unique(spark, tmp_table_dir):
    """Instants mint under the table lock with a persisted high-water mark, so
    two writer handles (processes) can never mint the same instant."""
    import hudi_0_12_0_my_spark.timeline as tlmod
    eng = Engine(spark)
    t = eng.create_table(tmp_table_dir, record_key_fields=["id"],
                         precombine_field="ts")
    t2 = eng.load_table(tmp_table_dir)     # separate handle = separate Timeline
    minted = [t.timeline.new_instant() if i % 2 == 0
              else t2.timeline.new_instant() for i in range(20)]
    assert len(set(minted)) == 20
    assert minted == sorted(minted)        # strictly monotonic across handles
    # the high-water mark survives a fresh handle even if the process-local
    # counter is behind
    tlmod._last_ts[0] = 0
    t3 = eng.load_table(tmp_table_dir)
    assert t3.timeline.new_instant() > minted[-1]


def test_compaction_strategies_select_subsets(spark, tmp_table_dir):
    """DayBasedCompactionStrategy limits to the newest partitions;
    BoundedIOCompactionStrategy respects an IO budget (compact/strategy/)."""
    from hudi_0_12_0_my_spark.services.compaction import schedule_compaction
    eng = Engine(spark)
    t = eng.create_table(tmp_table_dir, record_key_fields=["id"],
                         precombine_field="ts", partition_field="dt",
                         table_type="mor")
    days = ["2021-01-01", "2021-01-02", "2021-01-03"]
    t.bulk_insert(make_rows(spark, [(i, f"r{i}", 1.0, 1, d)
                                    for i, d in enumerate(days)]))
    t.upsert(make_rows(spark, [(i, f"u{i}", 2.0, 2, d)
                               for i, d in enumerate(days)]))
    plan = schedule_compaction(t, strategy="day_based", target_partitions=2)
    got_parts = {g["partition"] for g in plan["groups"]}
    assert got_parts == {"2021-01-02", "2021-01-03"}   # newest 2 days only
    t.timeline.remove(plan["instant"], "commit")       # discard requested plan

    plan_io = schedule_compaction(t, strategy="bounded_io", target_io_bytes=1)
    assert len(plan_io["groups"]) == 1                 # budget of 1 byte -> first group only
    t.timeline.remove(plan_io["instant"], "commit")

    plan_all = schedule_compaction(t, strategy="unbounded")
    assert len(plan_all["groups"]) == 3
    t.timeline.remove(plan_all["instant"], "commit")

    # bounded_partition_aware: day-window cutoff, not a fixed count — a 1-day
    # window from the newest partition keeps 01-02 and 01-03 (>= ref - 1d)
    plan_bpa = schedule_compaction(t, strategy="bounded_partition_aware",
                                   target_partitions=1)
    assert {g["partition"] for g in plan_bpa["groups"]} == \
        {"2021-01-02", "2021-01-03"}
    t.timeline.remove(plan_bpa["instant"], "commit")
    # explicit reference date: window is anchored to it, not the table max
    plan_ref = schedule_compaction(t, strategy="bounded_partition_aware",
                                   target_partitions=0,
                                   reference_date="2021-01-02")
    assert {g["partition"] for g in plan_ref["groups"]} == {"2021-01-02",
                                                            "2021-01-03"}
    t.timeline.remove(plan_ref["instant"], "commit")
    # executing the day_based plan leaves the untouched partition's deltas
    instant = t.compact(strategy="day_based", target_partitions=2)
    assert instant is not None
    view = t.view()
    dirty = {g.partition for g, s in view.live_slices() if s.deltas}
    assert dirty == {"2021-01-01"}
    snap = {r.id: r.name for r in t.snapshot().collect()}
    assert snap == {0: "u0", 1: "u1", 2: "u2"}         # results unchanged


def test_archival_manifest_checkpoint(spark, tmp_table_dir):
    eng = Engine(spark)
    t = eng.create_table(tmp_table_dir, record_key_fields=["id"],
                         precombine_field="ts", partition_field="dt")
    t.bulk_insert(make_rows(spark, BATCH1))
    for v in range(6):
        t.upsert(make_rows(spark, [(1, f"v{v}", float(v), 100 + v, "2021-01-01")]))
    snap_before = {(r.id, r.name) for r in t.snapshot().collect()}
    out = t.archive(retain_active=3)
    assert out["archived"] > 0
    assert {(r.id, r.name) for r in t.snapshot().collect()} == snap_before
    # deep time travel (before the checkpoint) replays archived batches
    first = t.commits()[0]["instant"] if t.commits() else None
    old = t.time_travel(as_of=out["checkpoint"]).collect()
    assert len(old) == 3


def test_archive_then_rollback_does_not_resurrect(spark, tmp_table_dir):
    """Checkpoint must be folded as of the boundary, and rollback must drop any
    checkpoint referencing the rolled-back instant (ADVICE r1, high)."""
    eng = Engine(spark)
    t = eng.create_table(tmp_table_dir, record_key_fields=["id"],
                         precombine_field="ts", partition_field="dt")
    t.bulk_insert(make_rows(spark, BATCH1))
    for v in range(6):
        t.upsert(make_rows(spark, [(1, f"v{v}", float(v), 100 + v, "2021-01-01")]))
    out = t.archive(retain_active=2)
    assert out["archived"] > 0
    last = t.latest_instant()
    t.rollback(last)
    snap = {(r.id, r.name) for r in t.snapshot().collect()}
    assert (1, "v5") not in snap          # rolled-back write really gone
    assert (1, "v4") in snap              # previous version served again
    # the retained commit replayed on top of the checkpoint exactly once:
    # every served base file must exist on disk
    view = t.view()
    for _, s in view.live_slices():
        assert os.path.exists(view.abs(s.base_file.path))


def test_merge_into(spark, tmp_table_dir):
    eng = Engine(spark)
    t = eng.create_table(tmp_table_dir, record_key_fields=["id"],
                         precombine_field="ts", partition_field="dt")
    t.bulk_insert(make_rows(spark, BATCH1))
    src = spark.createDataFrame(
        [Row(id=1, price=99.0, flag="u"),    # matched update
         Row(id=2, price=0.0, flag="d"),     # matched delete
         Row(id=7, price=70.0, flag="i")],   # not matched insert
        "id int, price double, flag string")
    t.merge(src, on="t.id = s.id",
            when_matched_update={"price": "s.price"},
            matched_update_condition="s.flag = 'u'",
            when_matched_delete=True,
            matched_delete_condition="s.flag = 'd'",
            when_not_matched_insert={"id": "s.id", "name": "'new'",
                                     "price": "s.price", "ts": "0",
                                     "dt": "'2021-01-03'"})
    snap = {r.id: (r.name, r.price) for r in t.snapshot().collect()}
    assert snap == {1: ("a", 99.0), 3: ("c", 30.0), 7: ("new", 70.0)}


def test_compaction_excludes_post_schedule_deltas(spark, tmp_path):
    """A deltacommit landing between schedule and run must NOT be baked into
    the compacted base (its instant is later than the compaction instant);
    it stays attached to the new slice and still merges at read."""
    from hudi_0_12_0_my_spark import Engine
    from hudi_0_12_0_my_spark.services.compaction import (run_compaction,
                                                          schedule_compaction)
    eng = Engine(spark)
    t = eng.create_table(str(tmp_path / "m"), record_key_fields=["id"],
                         precombine_field="seq", partition_field="grp",
                         table_type="mor")
    df = spark.createDataFrame([(i, "a", float(i), 1) for i in range(10)],
                               "id long, grp string, val double, seq long")
    t.bulk_insert(df)
    t.upsert(spark.createDataFrame([(1, "a", 100.0, 2)],
                                   "id long, grp string, val double, seq long"))
    plan = schedule_compaction(t, strategy="unbounded")
    assert plan is not None
    # late delta AFTER the plan was scheduled
    t.upsert(spark.createDataFrame([(2, "a", 200.0, 2)],
                                   "id long, grp string, val double, seq long"))
    instant = run_compaction(t)
    assert instant == plan["instant"]

    snap = {r.id: r.val for r in t.snapshot().collect()}
    assert snap[1] == 100.0 and snap[2] == 200.0       # late delta applied once
    # read-optimized (base only) must NOT contain the late update
    ro = {r.id: r.val for r in t.read_optimized().collect()}
    assert ro[1] == 100.0 and ro[2] == 2.0
    # time travel as-of the compaction instant: late delta invisible
    tt = {r.id: r.val for r in t.time_travel(instant).collect()}
    assert tt[1] == 100.0 and tt[2] == 2.0


def test_mor_global_reinsert_of_deleted_key_lands_in_keygen_partition(
        spark, tmp_table_dir):
    """A key deleted via a delta tombstone still has a base-file copy until
    compaction; the plain base meta scan would tag a re-insert to the OLD
    group, reviving the row in its old partition — placement would then
    depend on compaction timing. The tag subtracts shadow-deleted keys
    (writer._shadow_deleted_keys), so the re-insert lands in the keygen
    partition, exactly like COW. Found by the randomized DAG suite."""
    t = Engine(spark).create_table(
        tmp_table_dir, record_key_fields=["id"], precombine_field="ts",
        partition_field="dt", table_type="mor", global_index=True)
    t.bulk_insert(make_rows(spark, [(1, "a", 10.0, 100, "2021-01-01")]))
    t.delete(t.snapshot().filter("id = 1"))
    assert t.snapshot().count() == 0
    # NO compaction between delete and re-insert: the stale base copy exists
    t.upsert(make_rows(spark, [(1, "re", 11.0, 300, "2021-01-02")]))
    rows = t.reader.snapshot(keep_meta=True) \
        .select("_hoodie_partition_path", "id", "name").collect()
    assert [(r._hoodie_partition_path, r.id, r.name) for r in rows] == \
        [("2021-01-02", 1, "re")]
    # and the old partition is truly empty: dropping it must not remove the row
    t.delete_partition(["2021-01-01"])
    assert {r.id for r in t.snapshot().collect()} == {1}
    # a LIVE key still updates in place in its stored partition
    t.upsert(make_rows(spark, [(1, "re2", 12.0, 400, "2021-01-03")]))
    rows = t.reload().reader.snapshot(keep_meta=True) \
        .select("_hoodie_partition_path", "name").collect()
    assert [(r._hoodie_partition_path, r.name) for r in rows] == \
        [("2021-01-02", "re2")]


def test_incremental_enumerates_archived_commits(spark, tmp_table_dir):
    """incremental(begin earlier than the archive boundary) must fold the
    archived commits' file stats — rows written by archived commits and
    untouched since would otherwise vanish from the file-list plan. Same for
    the CDC diff's touched-partition scoping."""
    t = Engine(spark).create_table(
        tmp_table_dir, record_key_fields=["id"], precombine_field="ts",
        partition_field="dt")
    t.bulk_insert(make_rows(spark, BATCH1))
    first = t.timeline.completed_write_instants()[-1].time
    for v in range(6):
        t.upsert(make_rows(spark, [(2, f"v{v}", 20.0 + v, 200 + v,
                                    "2021-01-01")]))
    res = t.archive(retain_active=3)
    assert res["archived"] > 0
    inc = {r.id: r.name for r in t.incremental(begin="0").collect()}
    assert inc[1] == "a" and inc[3] == "c" and inc[2] == "v5"
    # CDC diff over the full history sees the archived first commit's rows
    ops = {(r.op, r._hoodie_record_key)
           for r in t.incremental_cdc(begin="0").collect()}
    assert ("i", "1") in ops and ("i", "3") in ops
    # window starting at the archived first commit still yields the updates
    inc2 = {r.id: r.name for r in t.incremental(begin=first).collect()}
    assert inc2 == {2: "v5"}


def test_mor_global_reinsert_same_partition_then_delete(spark, tmp_table_dir):
    """Re-insert of a tombstone-deleted key into the SAME partition creates a
    fresh file group next to the old (still dirty) one; the shadow-key
    subtraction must be file-group-scoped or the live copy's tag is wiped
    too and a later delete silently no-ops (DAG sweep, seed 203)."""
    t = Engine(spark).create_table(
        tmp_table_dir, record_key_fields=["id"], precombine_field="ts",
        partition_field="dt", table_type="mor", global_index=True)
    t.bulk_insert(make_rows(spark, [(1, "a", 10.0, 100, "2021-01-01")]))
    t.delete(t.snapshot().filter("id = 1"))
    t.upsert(make_rows(spark, [(1, "re", 11.0, 300, "2021-01-01")]))
    assert {(r.id, r.name) for r in t.snapshot().collect()} == {(1, "re")}
    t.delete(t.snapshot().filter("id = 1"))          # must actually delete
    assert t.snapshot().count() == 0


def test_archival_stops_at_savepoint_pin(spark, tmp_table_dir):
    """Archival never crosses the earliest savepoint pin: restore rolls
    back newer commits via their ACTIVE metadata, so archiving them would
    make restore silently skip them (HoodieTimelineArchiver stops at the
    first savepointed instant). Found by extending the crash-DAG sweep."""
    eng = Engine(spark)
    t = eng.create_table(tmp_table_dir, record_key_fields=["id"],
                         precombine_field="ts", partition_field="dt")
    t.bulk_insert(make_rows(spark, BATCH1))
    sp = t.savepoint()
    for k in range(2, 8):
        t.upsert(make_rows(spark, [(2, f"b{k}", 21.0, 100 * k,
                                    "2021-01-01")]))
    out = t.archive(retain_active=3)
    assert out["archived"] == 0          # everything is at/after the pin
    t.restore(sp)
    snap = {r.id: r.name for r in t.snapshot().collect()}
    assert snap == {1: "a", 2: "b", 3: "c"}

    # with no savepoint in the way archival proceeds, and a restore that
    # WOULD need archived metadata refuses instead of silently skipping
    t2 = eng.create_table(tmp_table_dir + "_2", record_key_fields=["id"],
                          precombine_field="ts", partition_field="dt")
    t2.bulk_insert(make_rows(spark, BATCH1))
    sp2 = t2.savepoint()
    for k in range(8, 14):
        t2.upsert(make_rows(spark, [(3, f"c{k}", 31.0, 100 * k,
                                     "2021-01-02")]))
    # simulate a legacy table archived past the pin: drop the savepoint
    # instant before archiving, then put it back
    from hudi_0_12_0_my_spark import timeline as tl
    path = t2.timeline.path(tl.Instant(sp2, tl.SAVEPOINT, tl.COMPLETED))
    import json
    md = t2.timeline.metadata(tl.Instant(sp2, tl.SAVEPOINT, tl.COMPLETED))
    os.unlink(path)
    assert t2.archive(retain_active=3)["archived"] > 0
    with open(path, "w") as f:
        json.dump(md, f)
    with pytest.raises(ValueError, match="already archived"):
        t2.restore(sp2)


def test_mor_delta_only_upsert_writes_no_empty_base_files(spark, mor):
    """r7 optimization contract: an all-updates MOR upsert commits ONLY
    delta files (no empty base write job ran), an all-inserts upsert
    commits ONLY base files, and both stay readable/mergeable."""
    mor.bulk_insert(make_rows(spark, BATCH1))
    i1 = mor.upsert(make_rows(spark, [(1, "a2", 11.0, 200, "2021-01-01")]))
    md = mor.timeline.metadata(
        [x for x in mor.timeline.completed_write_instants()
         if x.time == i1][0])
    kinds = {st.get("kind", "base")
             for sts in md["partition_to_write_stats"].values()
             for st in sts}
    assert kinds == {"delta"}           # no empty base stage ran
    i2 = mor.upsert(make_rows(spark, [(9, "z", 90.0, 100, "2021-01-02")]))
    md2 = mor.timeline.metadata(
        [x for x in mor.timeline.completed_write_instants()
         if x.time == i2][0])
    kinds2 = {st.get("kind", "base")
              for sts in md2["partition_to_write_stats"].values()
              for st in sts}
    assert kinds2 == {"base"}           # no empty delta stage ran
    got = {(r.id, r.name, r.price) for r in mor.snapshot().collect()}
    assert got == {(1, "a2", 11.0), (2, "b", 20.0), (3, "c", 30.0),
                   (9, "z", 90.0)}
