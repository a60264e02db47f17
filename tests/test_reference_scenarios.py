"""Reference functional-test scenarios replayed through the option compat
layer (TestCOWDataSource.scala / TestMORDataSource.scala shapes — same option
strings, same expected states)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hudi_0_12_0_my_spark.compat import read_hudi, write_hudi

OPTS = {
    "hoodie.table.name": "ref_scen",
    "hoodie.datasource.write.recordkey.field": "id",
    "hoodie.datasource.write.precombine.field": "ts",
    "hoodie.datasource.write.partitionpath.field": "part",
}


def _df(spark, rows):
    return spark.createDataFrame(rows, "id string, part string, ts long, v int")


def test_drop_insert_dup(spark, tmp_table_dir):
    """TestCOWDataSource.testDropInsertDup: second INSERT with
    hoodie.datasource.write.insert.drop.duplicates=true keeps only the
    new-key rows; the incremental pull from commit 1 sees exactly those."""
    ins1 = _df(spark, [(f"k{i}", "p1", 1, i) for i in range(10)])
    t = write_hudi(ins1, tmp_table_dir, {
        **OPTS, "hoodie.datasource.write.operation": "insert"})
    t0 = t.latest_instant()
    dups = [(f"k{i}", "p1", 2, 100 + i) for i in range(9)]
    new = [("n1", "p1", 2, 201), ("n2", "p1", 2, 202)]
    write_hudi(_df(spark, dups + new), tmp_table_dir, {
        **OPTS, "hoodie.datasource.write.operation": "insert",
        "hoodie.datasource.write.insert.drop.duplicates": "true"})
    snap = read_hudi(spark, tmp_table_dir)
    assert snap.count() == 12                       # 10 + 2 new unique keys
    # dup rows were dropped, not upserted: k0's value is the original
    assert snap.filter("id = 'k0'").head().v == 0
    inc = read_hudi(spark, tmp_table_dir, {
        "hoodie.datasource.query.type": "incremental",
        "hoodie.datasource.read.begin.instanttime": t0})
    assert {r.id for r in inc.collect()} == {"n1", "n2"}


def test_no_precombine_upsert(spark, tmp_table_dir):
    """TestCOWDataSource.testNoPrecombine: without a precombine field the
    write still succeeds and the later batch wins (commit-order latest)."""
    opts = {k: v for k, v in OPTS.items()
            if k != "hoodie.datasource.write.precombine.field"}
    write_hudi(_df(spark, [("a", "p1", 1, 1)]), tmp_table_dir, {
        **opts, "hoodie.datasource.write.operation": "bulk_insert"})
    write_hudi(_df(spark, [("a", "p1", 1, 2)]), tmp_table_dir, {
        **opts, "hoodie.datasource.write.operation": "upsert"})
    got = read_hudi(spark, tmp_table_dir).collect()
    assert len(got) == 1 and got[0].v == 2


def test_hoodie_is_deleted_column(spark, tmp_table_dir):
    """testHoodieIsDeletedCOW: rows upserted with _hoodie_is_deleted=true
    disappear from the snapshot."""
    write_hudi(_df(spark, [("a", "p1", 1, 1), ("b", "p1", 1, 2)]),
               tmp_table_dir,
               {**OPTS, "hoodie.datasource.write.operation": "bulk_insert"})
    tomb = (_df(spark, [("a", "p1", 2, 0)])
            .withColumn("_hoodie_is_deleted", F.lit(True)))
    write_hudi(tomb, tmp_table_dir,
               {**OPTS, "hoodie.datasource.write.operation": "upsert"})
    assert [r.id for r in read_hudi(spark, tmp_table_dir).collect()] == ["b"]


def test_insert_overwrite_disjoint_partitions(spark, tmp_table_dir):
    """testOverWriteModeUseReplaceActionOnDisJointPartitions: overwriting
    with rows for p2 only replaces p2; p1 rows survive untouched."""
    write_hudi(_df(spark, [("a", "p1", 1, 1), ("b", "p2", 1, 2)]),
               tmp_table_dir,
               {**OPTS, "hoodie.datasource.write.operation": "bulk_insert"})
    write_hudi(_df(spark, [("c", "p2", 2, 3)]), tmp_table_dir,
               {**OPTS,
                "hoodie.datasource.write.operation": "insert_overwrite"})
    got = {(r.id, r.part) for r in read_hudi(spark, tmp_table_dir).collect()}
    assert got == {("a", "p1"), ("c", "p2")}


def test_mor_drop_insert_dup_base_located_semantics(spark, tmp_table_dir):
    """Reference parity on MOR + simple (non-global) index: the index tags
    against latest BASE files only (HoodieSimpleIndex.fetchRecordLocations),
    so a key tombstoned in a delta file still counts as existing — its
    drop.duplicates re-insert is dropped and the key stays deleted."""
    opts = {**OPTS,
            "hoodie.datasource.write.table.type": "MERGE_ON_READ"}
    write_hudi(_df(spark, [("a", "p1", 1, 1), ("b", "p1", 1, 2)]),
               tmp_table_dir,
               {**opts, "hoodie.datasource.write.operation": "bulk_insert"})
    write_hudi(_df(spark, [("a", "p1", 2, 0)]), tmp_table_dir,
               {**opts, "hoodie.datasource.write.operation": "delete"})
    write_hudi(_df(spark, [("a", "p1", 3, 9), ("b", "p1", 3, 99)]),
               tmp_table_dir,
               {**opts, "hoodie.datasource.write.operation": "insert",
                "hoodie.datasource.write.insert.drop.duplicates": "true"})
    got = {(r.id, r.v) for r in read_hudi(spark, tmp_table_dir).collect()}
    assert got == {("b", 2)}


def test_mor_global_drop_insert_dup_tombstone_aware(spark, tmp_table_dir):
    """With the GLOBAL index the engine's location scan subtracts delta
    tombstone winners (writer._shadow_deleted_keys), so the deleted key's
    re-insert survives drop.duplicates while b's duplicate is dropped."""
    opts = {**OPTS,
            "hoodie.datasource.write.table.type": "MERGE_ON_READ",
            "hoodie.index.type": "GLOBAL_SIMPLE"}
    write_hudi(_df(spark, [("a", "p1", 1, 1), ("b", "p1", 1, 2)]),
               tmp_table_dir,
               {**opts, "hoodie.datasource.write.operation": "bulk_insert"})
    write_hudi(_df(spark, [("a", "p1", 2, 0)]), tmp_table_dir,
               {**opts, "hoodie.datasource.write.operation": "delete"})
    write_hudi(_df(spark, [("a", "p1", 3, 9), ("b", "p1", 3, 99)]),
               tmp_table_dir,
               {**opts, "hoodie.datasource.write.operation": "insert",
                "hoodie.datasource.write.insert.drop.duplicates": "true"})
    got = {(r.id, r.v) for r in read_hudi(spark, tmp_table_dir).collect()}
    assert got == {("a", 9), ("b", 2)}


def test_mor_precombine_ordering_with_ordered_deletes(spark, tmp_table_dir):
    """TestMORDataSource.testPreCombineFiledForReadMOR, nonpartitioned +
    DefaultHoodieRecordPayload: stale versions never overwrite, and a
    DELETE whose ordering value is older than the stored row is obsolete."""
    opts = {
        "hoodie.table.name": "ordered",
        "hoodie.datasource.write.table.type": "MERGE_ON_READ",
        "hoodie.datasource.write.recordkey.field": "id",
        "hoodie.datasource.write.precombine.field": "version",
        "hoodie.datasource.write.partitionpath.field": "",
        "hoodie.datasource.write.keygenerator.class":
            "org.apache.hudi.keygen.NonpartitionedKeyGenerator",
        "hoodie.datasource.write.payload.class":
            "org.apache.hudi.common.model.DefaultHoodieRecordPayload",
        "hoodie.datasource.write.operation": "upsert",
    }

    def write(id_, name, value, version, deleted):
        df = (spark.createDataFrame(
                [(id_, name, value, version)],
                "id int, name string, value int, version int")
              .withColumn("_hoodie_is_deleted", F.lit(deleted)))
        write_hudi(df, tmp_table_dir, opts)

    def check(value, version):
        rows = read_hudi(spark, tmp_table_dir) \
            .select("value", "version").collect()
        assert [(r.value, r.version) for r in rows] == [(value, version)]

    write(1, "a0", 10, 100, False); check(10, 100)
    write(1, "a0", 12, 99, False);  check(10, 100)   # stale version ignored
    write(1, "a0", 12, 101, False); check(12, 101)   # newer wins
    write(1, "a0", 14, 98, False);  check(12, 101)   # stale again
    write(1, "a0", 16, 97, True);   check(12, 101)   # obsolete DELETE ignored
    write(1, "a0", 18, 96, False);  check(12, 101)   # still pinned
    write(1, "a0", 20, 102, True)                    # current DELETE wins
    assert read_hudi(spark, tmp_table_dir).count() == 0


def test_partition_urlencode_escapes_hostile_values(spark, tmp_table_dir):
    """hoodie.datasource.write.partitionpath.urlencode
    (PartitionPathEncodeUtils.escapePathName): partition VALUES containing
    '/', ':', '%', '=' etc. are %XX-escaped so they cannot explode into
    nested directories or unlistable paths; round-trip reads return the
    original column values untouched."""
    import os

    from hudi_0_12_0_my_spark import Engine
    eng = Engine(spark)
    t = eng.create_table(tmp_table_dir, record_key_fields=["id"],
                         precombine_field="seq", partition_field="cat",
                         partition_urlencode=True)
    rows = [(1, "a/b", 1.0, 1), (2, "x:y=z", 2.0, 1), (3, "p%q", 3.0, 1),
            (4, "plain", 4.0, 1)]
    t.bulk_insert(spark.createDataFrame(
        rows, "id long, cat string, val double, seq long"))
    dirs = {d for d in os.listdir(tmp_table_dir) if not d.startswith(".")}
    assert dirs == {"a%2Fb", "x%3Ay%3Dz", "p%25q", "plain"}

    got = {(r.id, r.cat, r.val) for r in t.snapshot().collect()}
    assert got == {(i, c, v) for i, c, v, _ in rows}
    # upserts tag into the escaped partitions (no duplicate rows)
    t.upsert(spark.createDataFrame([(1, "a/b", 10.0, 2)],
                                   "id long, cat string, val double, seq long"))
    got = {(r.id, r.val) for r in t.snapshot().collect()}
    assert got == {(1, 10.0), (2, 2.0), (3, 3.0), (4, 4.0)}
    # option-string route reaches the same config
    from hudi_0_12_0_my_spark.compat import options_to_config
    kw = options_to_config(
        {"hoodie.datasource.write.partitionpath.urlencode": "true"})
    assert kw["partition_urlencode"] is True
