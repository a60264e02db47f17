"""Hudi option-string compatibility layer (compat.py).

A reference user's df.write.format("hudi").option("hoodie...", ...) call
sites must run unchanged through write_hudi/read_hudi
(DataSourceOptions.scala:52-246 keys)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hudi_0_12_0_my_spark import compat
from hudi_0_12_0_my_spark.compat import (HudiReadBuilder, HudiWriteBuilder,
                                         options_to_config, read_hudi,
                                         write_hudi)


def _rows(spark, vals):
    return spark.createDataFrame(vals, "id string, part string, ts long, v int")


WRITE_OPTS = {
    "hoodie.table.name": "compat_tbl",
    "hoodie.datasource.write.recordkey.field": "id",
    "hoodie.datasource.write.precombine.field": "ts",
    "hoodie.datasource.write.partitionpath.field": "part",
    "hoodie.datasource.write.table.type": "COPY_ON_WRITE",
}


def test_options_to_config_mappings():
    kw = options_to_config({
        **WRITE_OPTS,
        "hoodie.datasource.write.table.type": "MERGE_ON_READ",
        "hoodie.datasource.write.payload.class":
            "org.apache.hudi.common.model.DefaultHoodieRecordPayload",
        "hoodie.datasource.write.keygenerator.class":
            "org.apache.hudi.keygen.ComplexKeyGenerator",
        "hoodie.datasource.write.hive_style_partitioning": "true",
        "hoodie.index.type": "GLOBAL_BLOOM",
        "hoodie.cleaner.commits.retained": "7",
    })
    assert kw["name"] == "compat_tbl"
    assert kw["table_type"] == "mor"
    assert kw["record_key_fields"] == ["id"]
    assert kw["precombine_field"] == "ts"
    assert kw["partition_field"] == "part"
    assert kw["payload"] == "default"
    assert kw["keygen"] == "complex"
    assert kw["hive_style_partitioning"] is True
    assert kw["bloom_index_enabled"] and kw["global_index"]
    assert kw["cleaner_retain_commits"] == 7


def test_options_to_config_bucket_and_timestamp():
    kw = options_to_config({
        "hoodie.index.type": "BUCKET",
        "hoodie.index.bucket.engine": "CONSISTENT_HASHING",
        "hoodie.bucket.index.num.buckets": "16",
        "hoodie.datasource.write.keygenerator.class":
            "TimestampBasedKeyGenerator",
        "hoodie.deltastreamer.keygen.timebased.timestamp.type":
            "EPOCHMILLISECONDS",
        "hoodie.deltastreamer.keygen.timebased.output.dateformat":
            "yyyy/MM/dd",
    })
    assert kw["index_type"] == "bucket_consistent"
    assert kw["num_buckets"] == 16
    assert kw["keygen"] == "timestamp"
    assert kw["keygen_timestamp_unit"] == "epochms"
    assert kw["keygen_output_format"] == "yyyy/MM/dd"


def test_options_to_config_rejects_unknown():
    with pytest.raises(ValueError):
        options_to_config({"hoodie.index.type": "HBASE"})
    with pytest.raises(ValueError):
        options_to_config({"hoodie.datasource.write.payload.class": "NoSuch"})


def test_write_upsert_then_read_snapshot(spark, tmp_table_dir):
    df = _rows(spark, [("a", "p1", 1, 10), ("b", "p2", 1, 20)])
    write_hudi(df, tmp_table_dir, {**WRITE_OPTS,
               "hoodie.datasource.write.operation": "bulk_insert"})
    up = _rows(spark, [("a", "p1", 2, 11), ("c", "p1", 1, 30)])
    write_hudi(up, tmp_table_dir, {**WRITE_OPTS,
               "hoodie.datasource.write.operation": "upsert"})
    got = {(r.id, r.v) for r in
           read_hudi(spark, tmp_table_dir).collect()}
    assert got == {("a", 11), ("b", 20), ("c", 30)}


def test_incremental_and_time_travel_options(spark, tmp_table_dir):
    t = write_hudi(_rows(spark, [("a", "p1", 1, 10)]), tmp_table_dir,
                   {**WRITE_OPTS,
                    "hoodie.datasource.write.operation": "bulk_insert"})
    t0 = t.latest_instant()
    write_hudi(_rows(spark, [("b", "p1", 1, 20)]), tmp_table_dir,
               {**WRITE_OPTS, "hoodie.datasource.write.operation": "upsert"})
    inc = read_hudi(spark, tmp_table_dir, {
        "hoodie.datasource.query.type": "incremental",
        "hoodie.datasource.read.begin.instanttime": t0})
    assert [r.id for r in inc.collect()] == ["b"]
    tt = read_hudi(spark, tmp_table_dir, {"as.of.instant": t0})
    assert [r.id for r in tt.collect()] == ["a"]


def test_delete_and_delete_partition_ops(spark, tmp_table_dir):
    write_hudi(_rows(spark, [("a", "p1", 1, 10), ("b", "p2", 1, 20),
                             ("c", "p2", 1, 30)]), tmp_table_dir,
               {**WRITE_OPTS,
                "hoodie.datasource.write.operation": "bulk_insert"})
    write_hudi(_rows(spark, [("a", "p1", 2, 0)]), tmp_table_dir,
               {**WRITE_OPTS, "hoodie.datasource.write.operation": "delete"})
    write_hudi(_rows(spark, [("c", "p2", 2, 0)]), tmp_table_dir,
               {**WRITE_OPTS,
                "hoodie.datasource.write.operation": "delete_partition"})
    got = {r.id for r in read_hudi(spark, tmp_table_dir).collect()}
    assert got == set()  # a deleted, p2 dropped


def test_insert_overwrite_table_and_mode_overwrite(spark, tmp_table_dir):
    write_hudi(_rows(spark, [("a", "p1", 1, 10)]), tmp_table_dir,
               {**WRITE_OPTS,
                "hoodie.datasource.write.operation": "bulk_insert"})
    (HudiWriteBuilder(_rows(spark, [("z", "p9", 1, 99)]))
        .options(**WRITE_OPTS).mode("overwrite").save(tmp_table_dir))
    got = {r.id for r in (HudiReadBuilder(spark)
                          .option("hoodie.datasource.query.type", "snapshot")
                          .load(tmp_table_dir).collect())}
    assert got == {"z"}


def test_mor_read_optimized_option(spark, tmp_table_dir):
    opts = {**WRITE_OPTS,
            "hoodie.datasource.write.table.type": "MERGE_ON_READ"}
    write_hudi(_rows(spark, [("a", "p1", 1, 10)]), tmp_table_dir,
               {**opts, "hoodie.datasource.write.operation": "bulk_insert"})
    write_hudi(_rows(spark, [("a", "p1", 2, 11)]), tmp_table_dir,
               {**opts, "hoodie.datasource.write.operation": "upsert"})
    ro = read_hudi(spark, tmp_table_dir,
                   {"hoodie.datasource.query.type": "read_optimized"})
    rt = read_hudi(spark, tmp_table_dir)
    assert [r.v for r in ro.collect()] == [10]    # base only
    assert [r.v for r in rt.collect()] == [11]    # merged


def test_cdc_incremental_format(spark, tmp_table_dir):
    t = write_hudi(_rows(spark, [("a", "p1", 1, 10)]), tmp_table_dir,
                   {**WRITE_OPTS,
                    "hoodie.datasource.write.operation": "bulk_insert"})
    t0 = t.latest_instant()
    write_hudi(_rows(spark, [("a", "p1", 2, 11)]), tmp_table_dir,
               {**WRITE_OPTS, "hoodie.datasource.write.operation": "upsert"})
    cdc = read_hudi(spark, tmp_table_dir, {
        "hoodie.datasource.query.type": "incremental",
        "hoodie.datasource.query.incremental.format": "cdc",
        "hoodie.datasource.read.begin.instanttime": t0})
    ops = {r["op"] for r in cdc.collect()}
    assert ops == {"u"}


def test_hoodie_properties_mirror(spark, tmp_table_dir):
    """Table creation writes a reference-format .hoodie/hoodie.properties
    alongside the canonical JSON config (HoodieTableConfig key names)."""
    import os
    write_hudi(_rows(spark, [("a", "p1", 1, 10)]), tmp_table_dir, {
        **WRITE_OPTS,
        "hoodie.datasource.write.table.type": "MERGE_ON_READ",
        "hoodie.datasource.write.operation": "bulk_insert"})
    p = os.path.join(tmp_table_dir, ".hoodie", "hoodie.properties")
    props = dict(l.strip().split("=", 1) for l in open(p)
                 if "=" in l and not l.startswith("#"))
    assert props["hoodie.table.name"] == "compat_tbl"
    assert props["hoodie.table.type"] == "MERGE_ON_READ"
    assert props["hoodie.table.recordkey.fields"] == "id"
    assert props["hoodie.table.precombine.field"] == "ts"
    assert props["hoodie.table.partition.fields"] == "part"


def test_mode_ignore_and_errorifexists(spark, tmp_table_dir):
    """SaveMode.Ignore is a no-op on an existing table; errorifexists
    raises like 'error'."""
    write_hudi(_rows(spark, [("a", "p1", 1, 10)]), tmp_table_dir, {
        **WRITE_OPTS, "hoodie.datasource.write.operation": "bulk_insert"})
    write_hudi(_rows(spark, [("b", "p1", 1, 20)]), tmp_table_dir,
               WRITE_OPTS, mode="ignore")
    assert read_hudi(spark, tmp_table_dir).count() == 1    # untouched
    with pytest.raises(FileExistsError):
        write_hudi(_rows(spark, [("c", "p1", 1, 30)]), tmp_table_dir,
                   WRITE_OPTS, mode="errorifexists")


def test_mode_overwrite_honors_partition_scoped_operation(spark,
                                                          tmp_table_dir):
    """operation=insert_overwrite + mode=overwrite must stay partition-
    scoped: p1 survives an overwrite that only carries p2 rows."""
    write_hudi(_rows(spark, [("a", "p1", 1, 10), ("b", "p2", 1, 20)]),
               tmp_table_dir,
               {**WRITE_OPTS, "hoodie.datasource.write.operation": "bulk_insert"})
    write_hudi(_rows(spark, [("c", "p2", 2, 30)]), tmp_table_dir,
               {**WRITE_OPTS,
                "hoodie.datasource.write.operation": "insert_overwrite"},
               mode="overwrite")
    got = {(r.id, r.part) for r in read_hudi(spark, tmp_table_dir).collect()}
    assert got == {("a", "p1"), ("c", "p2")}


def test_nonglobal_delete_requires_partition_column(spark, tmp_table_dir):
    """Key-only delete frames are rejected on non-global tables instead of
    silently tombstoning the key in every partition."""
    write_hudi(_rows(spark, [("a", "p1", 1, 10), ("a", "p2", 1, 20)]),
               tmp_table_dir,
               {**WRITE_OPTS, "hoodie.datasource.write.operation": "bulk_insert"})
    keys_only = spark.createDataFrame([("a",)], "id string")
    with pytest.raises(ValueError, match="partition source column"):
        write_hudi(keys_only, tmp_table_dir, {
            **WRITE_OPTS, "hoodie.datasource.write.operation": "delete"})


def test_bucket_index_drop_insert_dup(spark, tmp_table_dir):
    """INSERT_DROP_DUPS on a bucket-index table: the duplicate is dropped
    (not upserted) and the new key lands in its bucket."""
    opts = {**WRITE_OPTS, "hoodie.index.type": "BUCKET",
            "hoodie.bucket.index.num.buckets": "4"}
    write_hudi(_rows(spark, [("a", "p1", 1, 10)]), tmp_table_dir, {
        **opts, "hoodie.datasource.write.operation": "insert"})
    write_hudi(_rows(spark, [("a", "p1", 2, 99), ("b", "p1", 2, 20)]),
               tmp_table_dir,
               {**opts, "hoodie.datasource.write.operation": "insert",
                "hoodie.datasource.write.insert.drop.duplicates": "true"})
    got = {(r.id, r.v) for r in read_hudi(spark, tmp_table_dir).collect()}
    assert got == {("a", 10), ("b", 20)}


def test_empty_payload_class_deletes_keys(spark, tmp_table_dir):
    """EmptyHoodieRecordPayload resolves every record to empty (reference
    EmptyHoodieRecordPayload.java: combineAndGetUpdateValue/getInsertValue
    return Option.empty), so an upsert with that payload class DELETES the
    matched keys — it must not degrade to a normal overwrite upsert."""
    write_hudi(_rows(spark, [("a", "p1", 1, 10), ("b", "p1", 1, 20),
                             ("c", "p2", 1, 30)]),
               tmp_table_dir,
               {**WRITE_OPTS, "hoodie.datasource.write.operation": "insert"})
    # upsert two existing keys + one absent key with the empty payload:
    # existing keys vanish, the absent key must NOT be inserted
    write_hudi(_rows(spark, [("a", "p1", 2, 99), ("c", "p2", 2, 99),
                             ("zz", "p1", 2, 99)]),
               tmp_table_dir,
               {**WRITE_OPTS,
                "hoodie.datasource.write.payload.class":
                    "org.apache.hudi.common.model.EmptyHoodieRecordPayload"})
    got = {(r.id, r.v) for r in read_hudi(spark, tmp_table_dir).collect()}
    assert got == {("b", 20)}
