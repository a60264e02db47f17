"""Tests: bootstrap adoption, bucket index, ingestion sources/transformers."""

import pytest
from pyspark.sql import functions as F

from hudi_0_12_0_my_spark import Engine
from hudi_0_12_0_my_spark.sources import (chain_transformers,
                                          flatten_transformer, read_source,
                                          sql_query_transformer)


@pytest.fixture()
def plain_parquet(spark, tmp_path):
    """Hive-style partitioned plain parquet dataset (no meta columns)."""
    df = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b", float(i), f"2024-01-{(i % 9) + 1:02d}")
         for i in range(40)],
        "id long, grp string, val double, ts string")
    out = str(tmp_path / "legacy")
    df.write.partitionBy("grp").parquet(out)
    return out, df


def test_bootstrap_metadata_only(spark, tmp_path, plain_parquet):
    src, df = plain_parquet
    eng = Engine(spark)
    t = eng.bootstrap(str(tmp_path / "boot"), src, mode="METADATA_ONLY",
                      record_key_fields=["id"], precombine_field="ts")
    # adoption is manifest-only: no data files under the table dir
    import os
    data_files = [f for _r, _d, fs in os.walk(str(tmp_path / "boot"))
                  for f in fs if f.endswith(".parquet")]
    assert data_files == []
    snap = t.snapshot()
    assert snap.count() == 40
    # meta reconstruction: keys + partition paths synthesized at read
    km = t.snapshot(keep_meta=True)
    assert km.filter(F.col("_hoodie_record_key").isNull()).count() == 0
    assert {r[0] for r in km.select("_hoodie_partition_path").distinct().collect()} \
        == {"grp=a", "grp=b"}


def test_bootstrap_then_upsert(spark, tmp_path, plain_parquet):
    src, df = plain_parquet
    eng = Engine(spark)
    # hive-style partitioning makes incoming rows derive the same `grp=x`
    # paths the bootstrapped directory layout produced
    t = eng.bootstrap(str(tmp_path / "boot2"), src, mode="METADATA_ONLY",
                      record_key_fields=["id"], precombine_field="ts",
                      partition_field="grp", hive_style_partitioning=True)
    mut = spark.createDataFrame([(0, "a", 1000.0, "2024-02-01"),
                                 (100, "a", 7.0, "2024-02-01")],
                                "id long, grp string, val double, ts string")
    t.upsert(mut)
    snap = {r.id: r.val for r in t.snapshot().select("id", "val").collect()}
    assert snap[0] == 1000.0          # updated bootstrapped row, not duplicated
    assert snap[100] == 7.0           # new insert
    assert len(snap) == 41
    # incremental after bootstrap sees only the upsert commit
    commits = [i.time for i in t.timeline.completed_write_instants()]
    inc = t.incremental(begin=commits[0])
    assert {r.id for r in inc.collect()} == {0, 100}


def test_bootstrap_full_record(spark, tmp_path, plain_parquet):
    src, df = plain_parquet
    eng = Engine(spark)
    t = eng.bootstrap(str(tmp_path / "boot3"), src, mode="FULL_RECORD",
                      record_key_fields=["id"], precombine_field="ts",
                      partition_field="grp")
    assert t.snapshot().count() == 40
    km = t.snapshot(keep_meta=True)
    assert km.filter(F.col("_hoodie_commit_time").isNull()).count() == 0


@pytest.mark.parametrize("table_type", ["cow", "mor"])
def test_bucket_index_upsert(spark, tmp_path, table_type):
    eng = Engine(spark)
    t = eng.create_table(str(tmp_path / f"bk_{table_type}"),
                         record_key_fields=["id"], precombine_field="seq",
                         partition_field="grp", table_type=table_type,
                         index_type="bucket", num_buckets=4)
    df = spark.createDataFrame(
        [(i, "x" if i < 50 else "y", float(i), 1) for i in range(100)],
        "id long, grp string, val double, seq long")
    t.upsert(df)
    assert t.snapshot().count() == 100
    # file ids are deterministic bucket ids
    km = t.snapshot(keep_meta=True)
    # fileId = 8-char bucket prefix + generation suffix (bucketIdFromFileId)
    fids = {r[0].split("_")[0] for r in km.select("_hoodie_file_name").collect()}
    assert {f[:8] for f in fids} <= {f"{i:08d}" for i in range(4)}

    # second upsert: updates collapse into the same buckets, no dup keys
    t.upsert(df.withColumn("val", F.col("val") + 1000).withColumn("seq", F.lit(2)))
    snap = t.snapshot()
    assert snap.count() == 100
    assert snap.agg(F.min("val")).collect()[0][0] == 1000.0
    # delete through the bucket path
    t.delete(where="id < 10")
    assert t.snapshot().count() == 90


def test_bucket_index_mor_compaction(spark, tmp_path):
    eng = Engine(spark)
    t = eng.create_table(str(tmp_path / "bkc"), record_key_fields=["id"],
                         precombine_field="seq", table_type="mor",
                         index_type="bucket", num_buckets=2)
    df = spark.createDataFrame([(i, float(i), 1) for i in range(20)],
                               "id long, val double, seq long")
    t.upsert(df)
    t.upsert(df.withColumn("val", F.col("val") * 10).withColumn("seq", F.lit(2)))
    assert t.compact() is not None
    snap = {r.id: r.val for r in t.snapshot().collect()}
    assert snap[3] == 30.0 and len(snap) == 20


def test_read_source_formats(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string")
    pq_dir, js_dir, csv_dir = (str(tmp_path / d) for d in ("p", "j", "c"))
    df.write.parquet(pq_dir)
    df.write.json(js_dir)
    df.write.option("header", True).csv(csv_dir)
    assert read_source(spark, "parquet", pq_dir).count() == 2
    assert read_source(spark, "json", js_dir, schema="id long, s string").count() == 2
    got = read_source(spark, "csv", csv_dir, schema="id long, s string",
                      options={"header": "true"})
    assert {r.id for r in got.collect()} == {1, 2}
    assert read_source(spark, "sql", sql="SELECT 42 AS x").collect()[0].x == 42
    with pytest.raises(ValueError, match="unknown source"):
        read_source(spark, "bogus")


def test_hudi_incremental_source(spark, tmp_path):
    eng = Engine(spark)
    t = eng.create_table(str(tmp_path / "inc_src"), name="inc_src",
                         record_key_fields=["id"], precombine_field="seq")
    t.bulk_insert(spark.createDataFrame([(1, 1)], "id long, seq long"))
    t.upsert(spark.createDataFrame([(2, 1)], "id long, seq long"))
    commits = [i.time for i in t.timeline.completed_write_instants()]
    got = read_source(spark, "hudi_incremental", engine=eng, table="inc_src",
                      begin=commits[0])
    assert [r.id for r in got.collect()] == [2]


def test_transformers(spark):
    df = spark.createDataFrame(
        [(1, ("alice", (30, "nyc")), 5.0)],
        "id long, person struct<name:string, info:struct<age:int, city:string>>, score double")
    flat = flatten_transformer()(df)
    assert set(flat.columns) == {"id", "person_name", "person_info_age",
                                 "person_info_city", "score"}
    assert flat.collect()[0].person_info_city == "nyc"

    tf = sql_query_transformer("SELECT id, score * 2 AS score FROM <SRC>")
    assert tf(df).collect()[0].score == 10.0

    chained = chain_transformers(
        flatten_transformer(),
        sql_query_transformer("SELECT id, person_name FROM <SRC> WHERE id = 1"))
    assert chained(df).collect()[0].person_name == "alice"


def test_insert_validate_duplicates(spark, tmp_path):
    eng = Engine(spark)
    t = eng.create_table(str(tmp_path / "vd"), record_key_fields=["id"],
                         precombine_field="seq")
    df = spark.createDataFrame([(1, 1.0, 1), (2, 2.0, 1)],
                               "id long, val double, seq long")
    t.insert(df)
    with pytest.raises(ValueError, match="duplicate record keys"):
        t.insert(df, validate_duplicates=True)  # same keys again
    new = spark.createDataFrame([(3, 3.0, 1)], "id long, val double, seq long")
    t.insert(new, validate_duplicates=True)     # disjoint keys pass
    assert t.snapshot().count() == 3


def test_s3_events_incr_source(spark, tmp_path):
    """S3EventsHoodieIncrSource flow with file:// paths standing in for s3://:
    event rows land in a hudi metadata table; the source incrementally pulls
    them, filters keys, and loads the referenced files."""
    from hudi_0_12_0_my_spark.sources import s3_events_incr_source

    data_a = str(tmp_path / "lake" / "a.parquet")
    data_b = str(tmp_path / "lake" / "b.parquet")
    spark.createDataFrame([(1, "a")], "id long, s string").write.parquet(data_a)
    spark.createDataFrame([(2, "b")], "id long, s string").write.parquet(data_b)

    def ev_rows(*paths, size=100):
        # bucket name empty -> file:// + "" + "/" + key = file:///abs/path
        return spark.createDataFrame(
            [(p, {"bucket": {"name": ""}, "object": {"key": p.lstrip("/"),
                                                     "size": size}})
             for p in paths],
            "eid string, s3 struct<bucket:struct<name:string>,"
            "object:struct<key:string,size:long>>")

    eng = Engine(spark)
    t = eng.create_table(str(tmp_path / "s3meta"), record_key_fields=["eid"],
                         precombine_field="eid")
    t.bulk_insert(ev_rows(data_a))
    c1 = t.timeline.completed_write_instants()[-1].time
    t.upsert(ev_rows(data_b))

    # full snapshot pull: both files
    df, ckpt = s3_events_incr_source(spark, eng, t, fs_prefix="file")
    assert {r.id for r in df.collect()} == {1, 2}
    assert ckpt == t.timeline.completed_write_instants()[-1].time
    # incremental from c1: only the b.parquet event
    df2, _ = s3_events_incr_source(spark, eng, t, begin=c1, fs_prefix="file")
    assert [r.id for r in df2.collect()] == [2]
    # key filters
    df3, _ = s3_events_incr_source(
        spark, eng, t, fs_prefix="file",
        ignore_key_substring="b.parquet")
    assert [r.id for r in df3.collect()] == [1]
    # zero-size events are dropped (reference filter s3.object.size > 0)
    t.upsert(ev_rows(str(tmp_path / "lake" / "ghost.parquet"), size=0))
    df4, _ = s3_events_incr_source(spark, eng, t, fs_prefix="file",
                                   check_exists=True)
    assert {r.id for r in df4.collect()} == {1, 2}


def test_hive_incr_pull_source(spark, tmp_path):
    from hudi_0_12_0_my_spark.sources import hive_incr_pull_source

    root = str(tmp_path / "incr_root")
    for commit, vals in (("20240101000000", [(1,)]), ("20240102000000", [(2,)]),
                         ("20240103000000", [(3,)])):
        spark.createDataFrame(vals, "id long").write.parquet(f"{root}/{commit}")
    # first pull: earliest commit
    df, ck = hive_incr_pull_source(spark, root)
    assert [r.id for r in df.collect()] == [1] and ck == "20240101000000"
    # next pull: strictly-greater commit, one at a time (commit causality)
    df2, ck2 = hive_incr_pull_source(spark, root, last_checkpoint=ck)
    assert [r.id for r in df2.collect()] == [2] and ck2 == "20240102000000"
    # caught up after the last one
    df3, ck3 = hive_incr_pull_source(spark, root, last_checkpoint="20240103000000")
    assert df3 is None and ck3 == "20240103000000"


def test_bootstrap_detected_after_archival(spark, tmp_path):
    """Archival moves the bootstrap commit off the active timeline early in
    the table's life; bootstrap meta reconstruction must keep working (NULL
    record keys would break MOR delta-key joins and resurrect tombstoned
    bootstrap rows under time travel — DAG sweep, mor/simple/boot s203)."""
    import os
    df = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b", float(i), i)
         for i in range(40)], "id long, grp string, val double, seq long")
    src = str(tmp_path / "legacy")
    for g in ("a", "b"):
        df.filter(F.col("grp") == g).coalesce(1) \
          .write.parquet(os.path.join(src, g))
    eng = Engine(spark)
    t = eng.bootstrap(str(tmp_path / "boot"), src, mode="METADATA_ONLY",
                      record_key_fields=["id"], precombine_field="seq",
                      partition_field="grp", table_type="mor")
    # build up a timeline, then archive the bootstrap commit away
    for k in range(4):
        t.upsert(spark.createDataFrame(
            [(100 + 10 * k + j, "a", 1.0 * k, 50 + k) for j in range(3)],
            "id long, grp string, val double, seq long"))
    t.delete(where="id in (0, 2)")          # tombstones bootstrap-file rows
    tt_instant = t.timeline.completed_write_instants()[-1].time
    t.upsert(spark.createDataFrame([(500, "b", 9.9, 99)],
                                   "id long, grp string, val double, seq long"))
    t.archive(retain_active=2)
    from hudi_0_12_0_my_spark.reader import bootstrap_instant
    assert bootstrap_instant(t.timeline) is not None   # served from archive
    km = t.snapshot(keep_meta=True)
    assert km.filter(F.col("_hoodie_record_key").isNull()).count() == 0
    ids = {r.id for r in t.snapshot().select("id").collect()}
    assert 0 not in ids and 2 not in ids and 4 in ids
    tt_ids = {r.id for r in t.time_travel(tt_instant).select("id").collect()}
    assert 0 not in tt_ids and 2 not in tt_ids and 500 not in tt_ids


def test_bootstrap_skips_hoodie_tree_and_refuses_hfile(spark, tmp_path):
    """A bootstrap source that is itself a Hudi table: its .hoodie tree
    (timeline + metadata-table partitions, parquet or HFILE) must never be
    adopted as data; HFile DATA files are refused with the migration
    message (HoodieFileFormat.HFILE — decision documented in bootstrap.py:
    metadata HFiles are derivable, data HFiles need an external rewrite)."""
    import pytest
    src = tmp_path / "src"
    (src / "p=1").mkdir(parents=True)
    spark.createDataFrame([(1, 10.0)], "id long, v double") \
        .coalesce(1).write.mode("overwrite").parquet(str(src / "p=1" / "d"))
    # flatten: one real parquet data file under the partition dir
    import glob, shutil, os
    f = glob.glob(str(src / "p=1" / "d" / "*.parquet"))[0]
    shutil.move(f, str(src / "p=1" / "data.parquet"))
    shutil.rmtree(str(src / "p=1" / "d"))
    meta_dir = src / ".hoodie" / "metadata" / "column_stats"
    meta_dir.mkdir(parents=True)
    (meta_dir / "stats.hfile").write_bytes(b"HFILEBLOCK")   # would poison
    (meta_dir / "stats.parquet").write_bytes(b"not-a-real-parquet")
    eng = Engine(spark)
    t = eng.bootstrap(str(tmp_path / "tbl"), str(src),
                      record_key_fields=["id"])
    got = t.snapshot().select("id", "v").collect()
    assert [(r.id, r.v) for r in got] == [(1, 10.0)]        # only real data
    # an HFile BASE file outside .hoodie refuses loudly
    (src / "p=1" / "base.hfile").write_bytes(b"HFILEBLOCK")
    with pytest.raises(NotImplementedError, match="Migration"):
        eng.bootstrap(str(tmp_path / "tbl2"), str(src),
                      record_key_fields=["id"])
