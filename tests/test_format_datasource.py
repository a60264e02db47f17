"""spark.read.format("hudi") — batch Python Data Source (datasource.py).

The format's standalone timeline fold + executor-side arrow merge must see
exactly what the library reader sees, across both table types and all four
query types, including replacecommits and schema evolution; payloads the
worker cannot replay refuse loudly.
"""

import pytest

from pyspark.sql import functions as F

from hudi_0_12_0_my_spark import Engine

S = "id long, grp string, v long, seq long"


def _rows(df):
    return sorted((r.id, r.grp, r.v) for r in df.select("id", "grp", "v")
                  .collect())


def _slices(parts):
    """Flatten planner output to file slices: since the r8 sizing change
    small tables pack into shared read tasks too, so tests that count
    pruned/kept SLICES must look inside _PackedPartitions."""
    from hudi_0_12_0_my_spark.datasource import _PackedPartition
    return [s for p in parts
            for s in (p.slices if isinstance(p, _PackedPartition) else [p])]


@pytest.mark.parametrize("tt", ["cow", "mor"])
def test_format_equals_library_reader(spark, tmp_path, tt):
    eng = Engine(spark)          # registers format("hudi")
    base = str(tmp_path / tt)
    t = eng.create_table(base, record_key_fields=["id"],
                         precombine_field="seq", partition_field="grp",
                         table_type=tt)
    t.bulk_insert(spark.createDataFrame(
        [(i, "ab"[i % 2], i, 1) for i in range(20)], S))
    first = t.timeline.latest_completed_write().time
    t.upsert(spark.createDataFrame(
        [(i, "ab"[i % 2], 100 + i, 2) for i in range(0, 20, 3)], S))
    t.delete(where=F.col("id") == 4)
    if tt == "mor":
        t.compact()
        t.upsert(spark.createDataFrame([(1, "b", 999, 3)], S))

    fmt = spark.read.format("hudi").load(base)
    assert _rows(fmt) == _rows(t.snapshot())
    # meta columns are part of the format's schema (reference parity)
    assert fmt.select("_hoodie_record_key", "_hoodie_commit_time") \
              .filter("_hoodie_record_key IS NULL").count() == 0

    ro = spark.read.format("hudi") \
        .option("hoodie.datasource.query.type", "read_optimized").load(base)
    assert _rows(ro) == _rows(t.read_optimized())

    tt_df = spark.read.format("hudi").option("as.of.instant", first) \
        .load(base)
    assert _rows(tt_df) == _rows(t.time_travel(first))

    inc = (spark.read.format("hudi")
           .option("hoodie.datasource.query.type", "incremental")
           .option("hoodie.datasource.read.begin.instanttime", first)
           .load(base))
    assert _rows(inc) == _rows(t.incremental(first))


def test_format_sees_through_clustering_and_evolution(spark, tmp_path):
    eng = Engine(spark)
    base = str(tmp_path / "cl")
    t = eng.create_table(base, record_key_fields=["id"],
                         precombine_field="seq", keygen="nonpartitioned")
    for s in range(3):   # several small files so clustering has work
        t.insert(spark.createDataFrame(
            [(10 * s + i, "g", 10 * s + i, 1) for i in range(10)], S))
    t.cluster(sort_cols=["id"])
    # replacecommit: old groups retired, new sorted file live
    assert _rows(spark.read.format("hudi").load(base)) == _rows(t.snapshot())
    # additive evolution: new column -> old files surface NULLs
    t.upsert(spark.createDataFrame([(0, "g", 0, 2, "x")],
                                   S + ", extra string"))
    got = {r.id: r.extra for r in spark.read.format("hudi").load(base)
           .select("id", "extra").collect()}
    want = {r.id: r.extra for r in t.snapshot()
            .select("id", "extra").collect()}
    assert got == want and got[0] == "x" and got[1] is None


@pytest.mark.parametrize("tt", ["cow", "mor"])
def test_format_replays_rename_evolution(spark, tmp_path, tt):
    """Files written before an ALTER TABLE RENAME (even a chained one,
    v -> val -> value) must surface their values under the CURRENT name
    through format('hudi') — equal to the library reader, never NULLs.
    Covers the merge path (MOR delta with the new name on a base with the
    old), the merge-free streaming path, and incremental."""
    eng = Engine(spark)
    base = str(tmp_path / f"ren{tt}")
    t = eng.create_table(base, record_key_fields=["id"],
                         precombine_field="seq", keygen="nonpartitioned",
                         table_type=tt, small_file_limit_bytes=0)
    t.insert(spark.createDataFrame(
        [(i, "g", 10 + i, 1) for i in range(6)], S))      # physical: v
    first = t.timeline.latest_completed_write().time
    t.rename_column("v", "val")
    t.upsert(spark.createDataFrame(
        [(0, "g", 100, 2)], "id long, grp string, val long, seq long"))
    t.rename_column("val", "value")
    t.insert(spark.createDataFrame(
        [(50, "g", 500, 1)], "id long, grp string, value long, seq long"))

    def vals(df):
        return sorted((r.id, r.value)
                      for r in df.select("id", "value").collect())

    fmt = spark.read.format("hudi").load(base)
    assert vals(fmt) == vals(t.snapshot())
    # pre-rename rows carry their values, not NULLs
    got = dict(vals(fmt))
    assert got[1] == 11 and got[0] == 100 and got[50] == 500
    assert None not in got.values()
    inc = (spark.read.format("hudi")
           .option("hoodie.datasource.query.type", "incremental")
           .option("hoodie.datasource.read.begin.instanttime", first)
           .load(base))
    assert vals(inc) == vals(t.incremental(first))
    # stats pruning consults pre-rename physical stats (same logical col)
    from hudi_0_12_0_my_spark.datasource import HudiBatchReader
    rd = HudiBatchReader(fmt.schema, {"path": base})
    rd._stat_preds = [("value", "ge", 1000)]
    assert rd._stats_exclude({"v": {"min": 10, "max": 15}}) is True
    assert rd._stats_exclude({"v": {"min": 10, "max": 2000}}) is False


def test_format_error_paths(spark, tmp_path):
    eng = Engine(spark)
    base = str(tmp_path / "pp")
    t = eng.create_table(base, record_key_fields=["id"],
                         precombine_field="seq", keygen="nonpartitioned",
                         payload="partial_update")
    t.insert(spark.createDataFrame([(1, "g", 1, 1)], S))
    # column-merge payloads can't be replayed executor-side: loud refusal
    with pytest.raises(Exception, match="library API"):
        spark.read.format("hudi").load(base).collect()
    base2 = str(tmp_path / "ok")
    t2 = eng.create_table(base2, record_key_fields=["id"],
                          precombine_field="seq", keygen="nonpartitioned")
    t2.insert(spark.createDataFrame([(1, "g", 1, 1)], S))
    with pytest.raises(Exception, match="query.type"):
        spark.read.format("hudi") \
            .option("hoodie.datasource.query.type", "bogus") \
            .load(base2).collect()


def test_format_write_quickstart_roundtrip(spark, tmp_path):
    """The reference quickstart's write-then-read lines verbatim
    (HoodieSparkSqlWriter.scala:68): mode('overwrite') first write with
    the default operation (upsert degenerating to insert on a fresh
    table), then read back through BOTH the format and the library —
    and the library can upsert the format-created table."""
    eng = Engine(spark)
    base = str(tmp_path / "qs")
    df = spark.createDataFrame(
        [(i, "ab"[i % 2], float(i), 1) for i in range(20)],
        "id long, grp string, val double, seq long")
    (df.write.format("hudi")
       .option("hoodie.datasource.write.recordkey.field", "id")
       .option("hoodie.datasource.write.partitionpath.field", "grp")
       .option("hoodie.datasource.write.precombine.field", "seq")
       .option("hoodie.table.name", "qs")
       .mode("overwrite").save(base))
    fmt = spark.read.format("hudi").load(base)
    t = eng.load_table(base)
    got = sorted((r.id, r.grp, r.val) for r in
                 fmt.select("id", "grp", "val").collect())
    assert got == sorted((r.id, r.grp, r.val) for r in
                         t.snapshot().select("id", "grp", "val").collect())
    assert len(got) == 20
    # meta columns are real (key = str(id), partition path = grp value)
    m = fmt.filter("id = 7").select("_hoodie_record_key",
                                    "_hoodie_partition_path").collect()[0]
    assert m[0] == "7" and m[1] == "b"

    # append-mode insert lands a second commit
    (spark.createDataFrame([(100, "c", 1.0, 1)],
                           "id long, grp string, val double, seq long")
     .write.format("hudi")
     .option("hoodie.datasource.write.operation", "insert")
     .mode("append").save(base))
    t = eng.load_table(base)
    assert t.snapshot().count() == 21
    # full interop: the LIBRARY writer upserts the format-created table
    t.upsert(spark.createDataFrame(
        [(0, "a", 999.0, 2)], "id long, grp string, val double, seq long"))
    assert t.snapshot().filter("id = 0").collect()[0].val == 999.0
    assert spark.read.format("hudi").load(base) \
        .filter("id = 0").collect()[0].val == 999.0

    # mode('overwrite') on the now-nonempty table = insert_overwrite_table
    (spark.createDataFrame([(500, "z", 5.0, 1)],
                           "id long, grp string, val double, seq long")
     .write.format("hudi").mode("overwrite").save(base))
    assert {r.id for r in eng.load_table(base).snapshot().collect()} == {500}
    assert spark.read.format("hudi").load(base).count() == 1


def test_format_write_mor_table(spark, tmp_path):
    """format writes on a MOR table land as deltacommit base files (the
    library's insert action shape): library MOR snapshot, read_optimized,
    compaction, and a later library upsert all work on the
    format-created table."""
    eng = Engine(spark)
    base = str(tmp_path / "fmor")
    df = spark.createDataFrame(
        [(i, "ab"[i % 2], float(i), 1) for i in range(10)],
        "id long, grp string, val double, seq long")
    (df.write.format("hudi")
       .option("hoodie.datasource.write.recordkey.field", "id")
       .option("hoodie.datasource.write.partitionpath.field", "grp")
       .option("hoodie.datasource.write.precombine.field", "seq")
       .option("hoodie.datasource.write.storage.type",    # withAlternatives
               "MERGE_ON_READ")
       .mode("overwrite").save(base))
    t = eng.load_table(base)
    assert t.cfg.table_type == "mor"
    assert t.snapshot().count() == 10
    t.upsert(spark.createDataFrame(
        [(0, "a", 99.0, 2)], "id long, grp string, val double, seq long"))
    assert t.snapshot().filter("id = 0").collect()[0].val == 99.0
    assert t.read_optimized().filter("id = 0").collect()[0].val == 0.0
    t.compact()
    assert t.read_optimized().filter("id = 0").collect()[0].val == 99.0
    assert spark.read.format("hudi").load(base) \
        .filter("id = 0").collect()[0].val == 99.0


def test_format_write_refusals(spark, tmp_path):
    """Everything that needs tag/merge/service machinery refuses loudly
    with the HudiWriteBuilder pointer — never a wrong write."""
    eng = Engine(spark)
    df = spark.createDataFrame([(1, "a", 1.0, 1)],
                               "id long, grp string, val double, seq long")
    # upsert against existing data
    base = str(tmp_path / "ref1")
    t = eng.create_table(base, record_key_fields=["id"],
                         precombine_field="seq", keygen="nonpartitioned")
    t.insert(spark.createDataFrame([(5, "g", 5.0, 1)],
                                   "id long, grp string, val double, seq long"))
    with pytest.raises(Exception, match="HudiWriteBuilder"):
        df.write.format("hudi").mode("append").save(base)
    # delete operation
    with pytest.raises(Exception, match="HudiWriteBuilder"):
        (df.write.format("hudi")
         .option("hoodie.datasource.write.operation", "delete")
         .mode("append").save(base))
    # bucket-index table
    base2 = str(tmp_path / "ref2")
    eng.create_table(base2, record_key_fields=["id"],
                     precombine_field="seq", keygen="nonpartitioned",
                     index_type="bucket", num_buckets=4)
    with pytest.raises(Exception, match="HudiWriteBuilder"):
        (df.write.format("hudi")
         .option("hoodie.datasource.write.operation", "insert")
         .mode("append").save(base2))
    # new table without a record key option
    with pytest.raises(Exception, match="recordkey"):
        df.write.format("hudi").mode("overwrite") \
            .save(str(tmp_path / "ref3"))
    # registered-type mismatch refuses instead of silently casting
    with pytest.raises(Exception, match="registered schema"):
        (spark.createDataFrame([(9, "g", 9, 1)],
                               "id long, grp string, val long, seq long")
         .write.format("hudi")
         .option("hoodie.datasource.write.operation", "insert")
         .mode("append").save(base))


def test_format_write_abort_and_orphan_invisibility(spark, tmp_path):
    """The write path's crash-safety model: staged-but-uncommitted files
    are invisible to every reader (visibility is commit-manifest-only),
    abort() removes them, and only commit() publishes rows."""
    import os

    import pyarrow as pa

    from hudi_0_12_0_my_spark.datasource import HudiFormatWriter

    eng = Engine(spark)
    base = str(tmp_path / "ab")
    t = eng.create_table(base, record_key_fields=["id"],
                         precombine_field="seq", keygen="nonpartitioned")
    t.insert(spark.createDataFrame([(1, "g", 1, 1)], S))
    n0 = t.snapshot().count()
    schema = spark.createDataFrame([(2, "g", 2, 1)], S).schema
    opts = {"path": base, "hoodie.datasource.write.operation": "insert"}

    w = HudiFormatWriter(schema, opts, False)
    msg = w.write(iter([pa.RecordBatch.from_pydict(
        {"id": [2], "grp": ["g"], "v": [2], "seq": [1]})]))
    assert msg.files
    paths = [os.path.join(base, f["path"]) for f in msg.files]
    assert all(os.path.exists(p) for p in paths)
    # staged but uncommitted: invisible to the library AND format readers
    assert t.snapshot().count() == n0
    assert spark.read.format("hudi").load(base).count() == n0
    w.abort([msg])
    assert not any(os.path.exists(p) for p in paths)

    w2 = HudiFormatWriter(schema, opts, False)
    msg2 = w2.write(iter([pa.RecordBatch.from_pydict(
        {"id": [3], "grp": ["g"], "v": [3], "seq": [1]})]))
    w2.commit([msg2])
    assert eng.load_table(base).snapshot().count() == n0 + 1
    assert spark.read.format("hudi").load(base).count() == n0 + 1


def test_format_pushed_filters_prune_files_safely(spark, tmp_path):
    """Stats pruning through pushFilters: delta-free files whose min/max
    exclude the predicate are skipped at planning; files WITH deltas are
    never pruned (a delta can exceed the base range / carry the newer
    version), and results always equal the library reader's filtered
    snapshot because Spark re-applies every filter row-level."""
    from hudi_0_12_0_my_spark.datasource import HudiBatchReader
    from pyspark.sql import datasource as dsf

    eng = Engine(spark)
    base = str(tmp_path / "pf")
    t = eng.create_table(base, record_key_fields=["id"],
                         precombine_field="seq", partition_field="grp",
                         table_type="mor", small_file_limit_bytes=0)
    # two disjoint-range file groups per partition
    t.insert(spark.createDataFrame(
        [(i, "ab"[i % 2], i, 1) for i in range(0, 20)], S))
    t.insert(spark.createDataFrame(
        [(i, "ab"[i % 2], i, 1) for i in range(1000, 1020)], S))
    # delta on ONE low-range group moves a key into the high range
    t.upsert(spark.createDataFrame([(0, "a", 5000, 2)], S))

    fmt = spark.read.format("hudi").load(base).filter("v >= 1000")
    lib = t.snapshot().filter("v >= 1000")
    assert sorted((r.id, r.v) for r in fmt.select("id", "v").collect()) \
        == sorted((r.id, r.v) for r in lib.select("id", "v").collect())
    # the moved key (v=5000, in a low-range base + delta) is present:
    assert (0, 5000) in {(r.id, r.v) for r in fmt.select("id", "v")
                         .collect()}

    # white-box: planner prunes delta-free low-range files only
    rd = HudiBatchReader(
        spark.read.format("hudi").load(base).schema,
        {"path": base})
    all_parts = [p for p in _slices(rd.partitions()) if p.base]
    rd.pushFilters([dsf.GreaterThanOrEqual(("v",), 1000)])
    kept = [p for p in _slices(rd.partitions()) if p.base]
    assert len(kept) < len(all_parts)            # something was pruned
    # delta-bearing slices are NEVER pruned: every partition that had
    # deltas in the unfiltered plan is still present after pushFilters
    with_deltas_all = {(p.base, tuple(p.deltas))
                       for p in all_parts if p.deltas}
    with_deltas_kept = {(p.base, tuple(p.deltas))
                        for p in kept if p.deltas}
    assert with_deltas_all and with_deltas_all == with_deltas_kept
    # and the stats helper itself proves exclusion on a miss-range file
    assert rd._stats_exclude({"v": {"min": 0, "max": 19}}) is True


def test_format_pushed_filters_null_and_mixed_values_are_safe(spark, tmp_path):
    """pushFilters must never fail the read at planning (pruning is only an
    optimization): NULL EqualTo values, NULL-bearing and mixed-type In
    value lists are skipped per-filter, not raised."""
    from hudi_0_12_0_my_spark.datasource import HudiBatchReader
    from pyspark.sql import datasource as dsf

    eng = Engine(spark)
    base = str(tmp_path / "nulls")
    t = eng.create_table(base, record_key_fields=["id"],
                         precombine_field="seq", keygen="nonpartitioned")
    t.insert(spark.createDataFrame([(i, "g", i, 1) for i in range(5)], S))
    rd = HudiBatchReader(spark.read.format("hudi").load(base).schema,
                         {"path": base})
    rd.pushFilters([dsf.EqualTo(("v",), None),
                    dsf.In(("v",), (None, 1)),
                    dsf.In(("v",), ("a", 2)),       # mixed-type min/max
                    dsf.GreaterThan(("v",), None)])
    parts = rd.partitions()                          # planning still works
    assert parts
    # and the whole-read path agrees with the library under a real filter
    got = sorted(r.id for r in spark.read.format("hudi").load(base)
                 .filter("v >= 2").select("id").collect())
    assert got == [2, 3, 4]


def test_format_incremental_mirrors_library_on_rewrites_and_replaces(
        spark, tmp_path):
    """The two resurrection bugs: (1) a row inserted in-window then deleted
    in-window on COW lives only in the OLDER in-range base (the delete
    rewrote the base without it) — only the NEWEST in-range base per group
    may be scanned; (2) rows in groups retired by an in-window
    delete_partition replacecommit must not reappear from the group's
    in-range files (reader.incremental's replaced-set / newest-base rules)."""
    eng = Engine(spark)
    base = str(tmp_path / "incsem")
    t = eng.create_table(base, record_key_fields=["id"],
                         precombine_field="seq", partition_field="grp")
    t.bulk_insert(spark.createDataFrame(
        [(i, "ab"[i % 2], i, 1) for i in range(10)], S))
    begin = t.timeline.latest_completed_write().time
    # in-window: insert fresh rows into both partitions...
    t.upsert(spark.createDataFrame(
        [(100 + i, "ab"[i % 2], 100 + i, 2) for i in range(6)], S))
    # ...then delete two of them (COW rewrite drops the rows from the base)
    t.delete(where=F.col("id").isin(100, 101))
    # ...and retire partition 'b' wholesale (replacecommit)
    t.delete_partition("b")

    fmt = (spark.read.format("hudi")
           .option("hoodie.datasource.query.type", "incremental")
           .option("hoodie.datasource.read.begin.instanttime", begin)
           .load(base))
    lib = t.incremental(begin)
    assert _rows(fmt) == _rows(lib)
    ids = {r.id for r in fmt.select("id").collect()}
    assert 100 not in ids and 101 not in ids      # no resurrection
    assert not any(i % 2 == 1 for i in ids if i >= 100)  # partition b gone


def test_format_incremental_cleaned_file_falls_back_to_snapshot(
        spark, tmp_path):
    """A cleaned in-range file must trigger the snapshot-as-of-end +
    commit-window fallback (reader.py:356-374) — never a silently short
    file-list result."""
    eng = Engine(spark)
    base = str(tmp_path / "incclean")
    t = eng.create_table(base, record_key_fields=["id"],
                         precombine_field="seq", keygen="nonpartitioned",
                         cleaner_retain_commits=1)
    t.bulk_insert(spark.createDataFrame(
        [(i, "g", i, 1) for i in range(10)], S))
    commits = [t.timeline.latest_completed_write().time]
    t.upsert(spark.createDataFrame(
        [(i, "g", 100 + i, 2) for i in range(0, 10, 2)], S))
    commits.append(t.timeline.latest_completed_write().time)
    t.upsert(spark.createDataFrame(
        [(i, "g", 200 + i, 3) for i in range(0, 10, 2)], S))
    commits.append(t.timeline.latest_completed_write().time)
    t.clean()                       # removes the middle file version
    fmt = (spark.read.format("hudi")
           .option("hoodie.datasource.query.type", "incremental")
           .option("hoodie.datasource.read.begin.instanttime", commits[0])
           .option("hoodie.datasource.read.end.instanttime", commits[1])
           .load(base))
    lib = t.incremental(begin=commits[0], end=commits[1])
    assert _rows(fmt) == _rows(lib)


def test_format_read_missing_planned_file_raises(spark, tmp_path):
    """A planned file that vanishes before execution (concurrent
    clean/rollback) raises loudly — silent skipping would return a short
    result."""
    import os

    from hudi_0_12_0_my_spark.datasource import HudiBatchReader

    eng = Engine(spark)
    base = str(tmp_path / "gone")
    t = eng.create_table(base, record_key_fields=["id"],
                         precombine_field="seq", keygen="nonpartitioned")
    t.insert(spark.createDataFrame([(i, "g", i, 1) for i in range(5)], S))
    rd = HudiBatchReader(spark.read.format("hudi").load(base).schema,
                         {"path": base})
    parts = [p for p in _slices(rd.partitions()) if p.base]
    os.remove(parts[0].base)
    with pytest.raises(FileNotFoundError, match="disappeared"):
        list(rd.read(parts[0]))


def test_format_bootstrap_base_with_deltas_refuses(spark, tmp_path):
    """A deltacommit attached to a METADATA_ONLY bootstrap slice cannot be
    merged executor-side (bootstrap bases carry no meta columns; each NULL
    key row would become its own group) — loud refusal, not double rows."""
    df = spark.createDataFrame(
        [(i, float(i), "2024-01-01") for i in range(10)],
        "id long, val double, ts string")
    src = str(tmp_path / "legacy")
    df.write.parquet(src)
    eng = Engine(spark)
    t = eng.bootstrap(str(tmp_path / "bootmor"), src, mode="METADATA_ONLY",
                      record_key_fields=["id"], precombine_field="ts",
                      table_type="mor")
    t.upsert(spark.createDataFrame([(1, 999.0, "2024-02-01")],
                                   "id long, val double, ts string"))
    with pytest.raises(Exception, match="library API"):
        spark.read.format("hudi").load(t.base_path).collect()
    # and an incremental window over the bootstrap commit refuses too
    with pytest.raises(Exception, match="library API|Table.incremental"):
        (spark.read.format("hudi")
         .option("hoodie.datasource.query.type", "incremental")
         .load(t.base_path).collect())


def test_format_xxhash64_matches_spark(spark):
    """The planner-side XXH64 must equal Spark's xxhash64 (seed 42) byte
    for byte — it addresses bucket file groups, so a mismatch means
    silently pruned rows. Takes the session fixture so it runs standalone
    (pytest -k xxhash / xdist), not only after a session-creating test."""
    from hudi_0_12_0_my_spark.datasource import _xxhash64
    samples = ["", "a", "5", "123", "hello world", "x" * 7, "y" * 8,
               "z" * 31, "w" * 32, "q" * 33, "long-string-" * 10,
               "1000042", "f1:v1,f2:v2", "é中文", "0", "-17"]
    df = spark.createDataFrame([(s,) for s in samples], "s string")
    import pyspark.sql.functions as Fn
    for r in df.select("s", Fn.xxhash64("s").alias("h"),
                       Fn.pmod(Fn.xxhash64("s"), Fn.lit(8)).alias("b")) \
               .collect():
        assert _xxhash64(r.s.encode("utf-8")) == r.h
        assert _xxhash64(r.s.encode("utf-8")) % 8 == r.b


def test_format_bucket_point_lookup_prunes_to_one_group(spark, tmp_path):
    """EqualTo on a simple-bucket table's record-key field addresses the
    bucket planner-side (pmod(xxhash64(key), n), BucketIdentifier.java):
    exactly the addressed bucket's file groups survive planning, and the
    values equal the library path."""
    from hudi_0_12_0_my_spark.datasource import HudiBatchReader, _bucket_of
    from pyspark.sql import datasource as dsf

    eng = Engine(spark)
    base = str(tmp_path / "bkt")
    t = eng.create_table(base, record_key_fields=["id"],
                         precombine_field="seq", keygen="nonpartitioned",
                         index_type="bucket", num_buckets=8)
    t.insert(spark.createDataFrame(
        [(i, "g", i, 1) for i in range(64)], S))
    rd = HudiBatchReader(spark.read.format("hudi").load(base).schema,
                         {"path": base})
    all_parts = [p for p in _slices(rd.partitions()) if p.base]
    assert len(all_parts) > 1
    rd.pushFilters([dsf.EqualTo(("id",), 7)])
    kept = [p for p in _slices(rd.partitions()) if p.base]
    assert len(kept) == 1
    want = "%08d" % _bucket_of("7", 8)
    import os
    assert os.path.basename(kept[0].base).startswith(want)
    # black-box equality with the library reader
    got = sorted((r.id, r.v) for r in spark.read.format("hudi").load(base)
                 .filter("id = 7").select("id", "v").collect())
    lib = sorted((r.id, r.v) for r in t.snapshot().filter("id = 7")
                 .select("id", "v").collect())
    assert got == lib == [(7, 7)]
    # In-lists address the union of buckets
    rd.pushFilters([dsf.In(("id",), (7, 13))])
    kept_in = [p for p in _slices(rd.partitions()) if p.base]
    assert 1 <= len(kept_in) <= 2
    # non-addressable shapes (float value) never bucket-address — only
    # regular min/max stats pruning may still apply
    rd.pushFilters([dsf.EqualTo(("id",), 7.5)])
    assert rd._buckets_wanted is None


def test_format_shadowed_keygen_disables_pruning(spark, tmp_path):
    """keygen.register() shadowing a builtin name stores keys the
    standalone planner cannot reproduce: the write-time
    identity_record_key flag must gate OFF bucket point-lookup pruning
    (the name heuristic would prune the file group that actually holds
    the key — silent row loss), and partition pruning likewise. Results
    stay correct because pruning is simply skipped."""
    from hudi_0_12_0_my_spark import keygen
    from hudi_0_12_0_my_spark.datasource import HudiBatchReader, _read_cfg
    from pyspark.sql import datasource as dsf

    eng = Engine(spark)
    base = str(tmp_path / "shadow")
    keygen.register(
        "custom", lambda cfg: (F.col("id") + 1000).cast("string"), None)
    try:
        t = eng.create_table(base, record_key_fields=["id"],
                             precombine_field="seq", keygen="custom",
                             index_type="bucket", num_buckets=8)
        t.insert(spark.createDataFrame(
            [(i, "g", i, 1) for i in range(32)], S))
        assert _read_cfg(base)["identity_record_key"] is False
        rd = HudiBatchReader(spark.read.format("hudi").load(base).schema,
                             {"path": base})
        assert rd._bucket_addressable is False
        rd.pushFilters([dsf.EqualTo(("id",), 7)])
        # no BUCKET addressing happened (min/max stats pruning on the
        # business column is still exact and allowed)
        assert rd._buckets_wanted is None
        got = sorted(r.id for r in spark.read.format("hudi").load(base)
                     .filter("id = 7").select("id").collect())
        assert got == [7]
    finally:
        keygen._CUSTOM_KEYGENS.pop("custom", None)
    # the builtin 'custom' name WITHOUT a shadow still records identity
    base2 = str(tmp_path / "noshadow")
    t2 = eng.create_table(base2, record_key_fields=["id"],
                          precombine_field="seq", keygen="simple",
                          partition_field="grp")
    t2.insert(spark.createDataFrame([(1, "a", 1, 1)], S))
    cfg2 = _read_cfg(base2)
    assert cfg2["identity_record_key"] is True
    assert cfg2["identity_partition_source"] is True


def test_format_scan_projects_only_needed_columns(spark, tmp_path):
    """Files written before a DROP COLUMN carry the dropped column; the
    scan must not pay its IO — pyarrow is asked only for the extended
    plan columns that exist in each file."""
    import pyarrow.parquet as pq

    from hudi_0_12_0_my_spark.datasource import HudiBatchReader

    eng = Engine(spark)
    base = str(tmp_path / "proj")
    t = eng.create_table(base, record_key_fields=["id"],
                         precombine_field="seq", keygen="nonpartitioned")
    t.insert(spark.createDataFrame(
        [(i, "g", i, 1, f"blob{i}") for i in range(10)],
        S + ", extra string"))
    t.drop_column("extra")
    rd = HudiBatchReader(spark.read.format("hudi").load(base).schema,
                         {"path": base})
    parts = [p for p in _slices(rd.partitions()) if p.base]
    # the physical file still carries the dropped column...
    assert "extra" in pq.ParquetFile(parts[0].base).schema_arrow.names
    rows = [b for p in parts for b in rd.read(p)]
    assert rows
    # ...but the scan never requested it
    assert "extra" not in rd._last_columns
    assert set(rd._last_columns) <= set(rd.extended.fieldNames())
    # and the full read equals the library's post-drop snapshot
    assert _rows(spark.read.format("hudi").load(base)) == _rows(t.snapshot())


def test_format_partition_pruning_from_pushed_filters(spark, tmp_path):
    """EqualTo/In on a value-style partition source column prunes whole
    partitions at the planner (path == str(value), keygen
    partition_path_expr) — results still equal the library's filtered
    snapshot because Spark re-applies every filter row-level."""
    from hudi_0_12_0_my_spark.datasource import HudiBatchReader
    from pyspark.sql import datasource as dsf

    eng = Engine(spark)
    base = str(tmp_path / "ppr")
    t = eng.create_table(base, record_key_fields=["id"],
                         precombine_field="seq", partition_field="grp")
    t.insert(spark.createDataFrame(
        [(i, "abc"[i % 3], i, 1) for i in range(30)], S))
    rd = HudiBatchReader(spark.read.format("hudi").load(base).schema,
                         {"path": base})
    all_parts = [p for p in _slices(rd.partitions()) if p.base]
    rd.pushFilters([dsf.EqualTo(("grp",), "a")])
    kept = [p for p in _slices(rd.partitions()) if p.base]
    assert 0 < len(kept) < len(all_parts)
    rd.pushFilters([dsf.In(("grp",), ("a", "c"))])
    kept2 = [p for p in _slices(rd.partitions()) if p.base]
    assert len(kept) < len(kept2) < len(all_parts)
    got = sorted(r.id for r in spark.read.format("hudi").load(base)
                 .filter("grp = 'a'").select("id").collect())
    lib = sorted(r.id for r in t.snapshot().filter("grp = 'a'")
                 .select("id").collect())
    assert got == lib and got
    # hive-style paths address with the k=v prefix
    base2 = str(tmp_path / "pprh")
    t2 = eng.create_table(base2, record_key_fields=["id"],
                          precombine_field="seq", partition_field="grp",
                          hive_style_partitioning=True)
    t2.insert(spark.createDataFrame(
        [(i, "ab"[i % 2], i, 1) for i in range(10)], S))
    rd2 = HudiBatchReader(spark.read.format("hudi").load(base2).schema,
                          {"path": base2})
    rd2.pushFilters([dsf.EqualTo(("grp",), "a")])
    assert rd2._parts_wanted == {"grp=a"}
    got2 = sorted(r.id for r in spark.read.format("hudi").load(base2)
                  .filter("grp = 'a'").select("id").collect())
    assert got2 == sorted(r.id for r in t2.snapshot().filter("grp = 'a'")
                          .select("id").collect())
    # GLOBAL index tables never partition-prune (an update routed to the
    # key's original partition can leave value != storage partition)
    base3 = str(tmp_path / "pprg")
    t3 = eng.create_table(base3, record_key_fields=["id"],
                          precombine_field="seq", partition_field="grp",
                          global_index=True)
    t3.insert(spark.createDataFrame([(1, "a", 1, 1)], S))
    rd3 = HudiBatchReader(spark.read.format("hudi").load(base3).schema,
                          {"path": base3})
    rd3.pushFilters([dsf.EqualTo(("grp",), "a")])
    assert rd3._parts_wanted is None


def test_format_hides_pending_rollback_target(spark, tmp_path):
    """A write commit targeted by a PENDING rollback plan is dead (its
    files may be half-deleted): the format fold must exclude it, exactly
    like the library's fsview/_write_history (reader.py:207,
    fsview.py:95)."""
    import json
    import os

    eng = Engine(spark)
    base = str(tmp_path / "prb")
    t = eng.create_table(base, record_key_fields=["id"],
                         precombine_field="seq", keygen="nonpartitioned")
    t.insert(spark.createDataFrame([(i, "g", i, 1) for i in range(5)], S))
    t.upsert(spark.createDataFrame([(1, "g", 999, 2)], S))
    victim = t.timeline.latest_completed_write().time
    tdir = os.path.join(base, ".hoodie", "timeline")
    with open(os.path.join(tdir, f"{victim}z.rollback.requested"),
              "w") as fh:
        json.dump({"rolled_back_instant": victim}, fh)
    lib = t.snapshot()
    fmt = spark.read.format("hudi").load(base)
    assert _rows(fmt) == _rows(lib)
    # the upsert is hidden on both paths
    assert {r.v for r in fmt.filter("id = 1").select("v").collect()} == {1}


def test_format_dedups_crash_mid_archival_instant(spark, tmp_path):
    """An instant present in BOTH the archive batch and the active dir
    (crash between batch write and active delete) must count once — the
    library dedups by (time, action) (reader.py:210); without the fold's
    dedup, incremental reads double every row the instant wrote."""
    import json
    import os

    eng = Engine(spark)
    base = str(tmp_path / "arch")
    t = eng.create_table(base, record_key_fields=["id"],
                         precombine_field="seq", keygen="nonpartitioned")
    for s in range(6):
        t.upsert(spark.createDataFrame(
            [(i, "g", 100 * s + i, s + 1) for i in range(4)], S))
    commits = [i.time for i in t.timeline.completed_write_instants()]
    assert t.archive(retain_active=2)["archived"] > 0
    # resurrect one archived instant's active file (simulated crash)
    adir = os.path.join(base, ".hoodie", "archived")
    batch = json.load(open(os.path.join(adir, sorted(os.listdir(adir))[0])))
    e = next(x for x in batch if x.get("action") in
             ("commit", "deltacommit", "replacecommit"))
    tdir = os.path.join(base, ".hoodie", "timeline")
    with open(os.path.join(tdir, f"{e['time']}.{e['action']}"), "w") as fh:
        json.dump(e.get("metadata") or {}, fh)
    fmt_inc = (spark.read.format("hudi")
               .option("hoodie.datasource.query.type", "incremental")
               .load(base))
    lib_inc = t.incremental()
    assert _rows(fmt_inc) == _rows(lib_inc)
    assert fmt_inc.count() == fmt_inc.select("id").distinct().count()
    assert _rows(spark.read.format("hudi").load(base)) == _rows(t.snapshot())


def test_format_meta_partition_path_filter_prunes(spark, tmp_path):
    """A filter on _hoodie_partition_path itself prunes exactly (the meta
    column IS the fold key) — valid for every index type, including
    global index where business-column pruning is disabled."""
    from hudi_0_12_0_my_spark.datasource import HudiBatchReader
    from pyspark.sql import datasource as dsf

    eng = Engine(spark)
    base = str(tmp_path / "mpp")
    t = eng.create_table(base, record_key_fields=["id"],
                         precombine_field="seq", partition_field="grp",
                         global_index=True)
    t.insert(spark.createDataFrame(
        [(i, "abc"[i % 3], i, 1) for i in range(30)], S))
    rd = HudiBatchReader(spark.read.format("hudi").load(base).schema,
                         {"path": base})
    all_parts = [p for p in _slices(rd.partitions()) if p.base]
    rd.pushFilters([dsf.EqualTo(("_hoodie_partition_path",), "b")])
    kept = [p for p in _slices(rd.partitions()) if p.base]
    assert 0 < len(kept) < len(all_parts)
    got = sorted(r.id for r in spark.read.format("hudi").load(base)
                 .filter("_hoodie_partition_path = 'b'")
                 .select("id").collect())
    lib = sorted(r.id for r in t.snapshot(keep_meta=True)
                 .filter("_hoodie_partition_path = 'b'")
                 .select("id").collect())
    assert got == lib and got


def test_format_scan_packs_slices_into_shared_tasks(spark, tmp_path):
    """r7 optimization contract: above the parallelism floor the planner
    bins file slices into shared read tasks (split-target bytes, LPT
    assignment) — results identical, slice merge semantics preserved
    inside the task, floor/target tunable via options."""
    from hudi_0_12_0_my_spark.datasource import (HudiBatchReader,
                                                 _PackedPartition,
                                                 _SlicePartition)

    eng = Engine(spark)
    base = str(tmp_path / "pack")
    t = eng.create_table(base, record_key_fields=["id"],
                         precombine_field="seq", partition_field="grp",
                         table_type="mor")
    # 12 partitions -> 12 slices; add deltas so some slices merge
    t.bulk_insert(spark.createDataFrame(
        [(i, f"g{i % 12}", i, 1) for i in range(60)], S))
    t.upsert(spark.createDataFrame(
        [(i, f"g{i % 12}", 1000 + i, 2) for i in range(0, 60, 5)], S))
    sch = spark.read.format("hudi").load(base).schema
    rd = HudiBatchReader(sch, {"path": base,
                               "hoodie.datasource.read.min.partitions": "4"})
    parts = rd.partitions()
    assert 0 < len(parts) <= 4
    assert all(isinstance(p, _PackedPartition) for p in parts)
    assert sum(len(p.slices) for p in parts) == 12
    # LPT kept merge slices intact (each inner element is a full slice)
    assert all(isinstance(s, _SlicePartition)
               for p in parts for s in p.slices)
    rows = sorted((r["id"], r["v"]) for p in parts for b in rd.read(p)
                  for r in b.to_pylist())
    assert rows == sorted((i, 1000 + i) if i % 5 == 0 else (i, i)
                          for i in range(60))
    assert rows == sorted((r.id, r.v)
                          for r in t.snapshot().select("id", "v").collect())
    # floor above slice count -> identity (plain slices, no packing)
    rd2 = HudiBatchReader(sch, {"path": base,
                                "hoodie.datasource.read.min.partitions":
                                "64"})
    assert all(isinstance(p, _SlicePartition) for p in rd2.partitions())


def test_format_writer_emits_configured_codec(spark, tmp_path):
    """r7 optimization contract: base files are zstd by default (both the
    library writer and the format('hudi') arrow writer), overridable per
    table via parquet_codec."""
    import glob

    import pyarrow.parquet as pq

    eng = Engine(spark)
    lib = str(tmp_path / "lib")
    t = eng.create_table(lib, record_key_fields=["id"],
                         precombine_field="seq", keygen="nonpartitioned")
    t.bulk_insert(spark.createDataFrame([(1, "a", 1, 1)], S))
    f = glob.glob(lib + "/*.parquet")[0]
    assert pq.ParquetFile(f).metadata.row_group(0).column(0) \
        .compression == "ZSTD"
    snappy = str(tmp_path / "snap")
    t2 = eng.create_table(snappy, record_key_fields=["id"],
                          precombine_field="seq", keygen="nonpartitioned",
                          parquet_codec="snappy")
    t2.bulk_insert(spark.createDataFrame([(1, "a", 1, 1)], S))
    f2 = glob.glob(snappy + "/*.parquet")[0]
    assert pq.ParquetFile(f2).metadata.row_group(0).column(0) \
        .compression == "SNAPPY"
    fmt = str(tmp_path / "fmtw")
    (spark.createDataFrame([(1, "a", 1, 1)], S).write.format("hudi")
     .option("hoodie.datasource.write.recordkey.field", "id")
     .option("hoodie.datasource.write.precombine.field", "seq")
     .mode("overwrite").save(fmt))
    f3 = glob.glob(fmt + "/**/*.parquet", recursive=True)[0]
    assert pq.ParquetFile(f3).metadata.row_group(0).column(0) \
        .compression == "ZSTD"
