"""bloom_filters metadata partition + async indexing action.

Reference spec: MetadataPartitionType.java:24-27, HoodieBloomIndex.java:89-161
(probe after key-range pruning), RunIndexActionExecutor.java (async build).
"""

import os

import pytest
from pyspark.sql import functions as F

from hudi_0_12_0_my_spark import Engine, bloom
from hudi_0_12_0_my_spark import timeline as tl


def _mk(spark, path, **kw):
    eng = Engine(spark)
    kw.setdefault("record_key_fields", ["id"])
    kw.setdefault("precombine_field", "seq")
    return eng, eng.create_table(str(path), **kw)


def _keys_df(spark, ids):
    return spark.createDataFrame([(f"k{i:05d}", float(i), 1) for i in ids],
                                 "id string, val double, seq long")


def test_build_probe_no_false_negatives(spark):
    keys = spark.createDataFrame(
        [("p", "f1.parquet", f"k{i:05d}") for i in range(500)],
        "partition string, file_name string, key string")
    bl = bloom.build_blooms(keys, bits_per_key=10, num_hashes=5)
    row = bl.collect()[0]
    assert row["num_bits"] % 64 == 0 and row["num_bits"] >= 500 * 10
    assert len(row["bitset"]) == row["num_bits"] // 64
    # every inserted key must pass the probe (bloom guarantees no false negs)
    probe = (keys.withColumnRenamed("key", "__bk")
             .join(bl.select(F.col("num_bits").alias("__bm"),
                             F.col("bitset").alias("__bs"))))
    assert probe.filter(F.expr(bloom.probe_sql(5))).count() == 500
    # absent keys are (mostly) rejected: <5% false-positive rate at 10 bpk
    absent = spark.createDataFrame([(f"x{i:05d}",) for i in range(500)],
                                   "__bk string")
    fp = (absent.join(bl.select(F.col("num_bits").alias("__bm"),
                                F.col("bitset").alias("__bs")))
          .filter(F.expr(bloom.probe_sql(5))).count())
    assert fp < 25


def test_bloom_prunes_files_key_ranges_cannot(spark, tmp_path):
    """Even ids only: an odd-id probe lies INSIDE every file's key range, so
    range pruning keeps the file — only the bitset can reject it."""
    eng, t = _mk(spark, tmp_path / "bp", bloom_index_enabled=True,
                 target_file_bytes=256 * 1024)
    t.bulk_insert(_keys_df(spark, range(0, 8000, 2)))
    view = t.view()
    all_files = view.live_base_files()
    assert len(all_files) >= 4
    assert os.path.isdir(bloom.bloom_dir(t.base_path))
    # absent keys, inside the key ranges
    probe = t.writer.prepare(_keys_df(spark, range(1001, 1021, 2)),
                             "29000101000000000")
    cand = t.writer._candidate_base_files(view, t.partitions(), probe)
    t.cfg.bloom_index_enabled = False
    cand_range_only = t.writer._candidate_base_files(view, t.partitions(), probe)
    t.cfg.bloom_index_enabled = True
    assert len(cand) < len(cand_range_only)
    assert set(cand) <= set(cand_range_only)
    # present keys: the probe must keep their files (no false negatives)
    present = t.writer.prepare(_keys_df(spark, range(1000, 1020, 2)),
                               "29000101000000001")
    cand_p = t.writer._candidate_base_files(view, t.partitions(), present)
    assert cand_p


def test_upsert_correct_with_bloom(spark, tmp_path):
    eng, t = _mk(spark, tmp_path / "up", bloom_index_enabled=True,
                 target_file_bytes=256 * 1024)
    t.bulk_insert(_keys_df(spark, range(0, 2000, 2)))
    mixed = spark.createDataFrame(
        [(f"k{i:05d}", -1.0, 2) for i in [100, 101, 500, 501]],
        "id string, val double, seq long")
    t.upsert(mixed)
    snap = t.snapshot()
    assert snap.count() == 1000 + 2          # 2 odd ids are new inserts
    assert snap.filter("val = -1.0").count() == 4
    # new files from the upsert got bitsets too (commit-time maintenance)
    bl = bloom.load_blooms(spark, t.base_path, t.cfg.bloom_num_hashes)
    live = {os.path.basename(p) for p in t.view().live_base_files()}
    indexed = {r[0] for r in bl.select("file_name").collect()}
    assert live <= indexed


def test_run_index_backfills_and_commits_indexing(spark, tmp_path):
    eng, t = _mk(spark, tmp_path / "ri", target_file_bytes=256 * 1024)
    t.bulk_insert(_keys_df(spark, range(0, 3000, 2)))
    assert not os.path.isdir(bloom.bloom_dir(t.base_path))
    out = eng.call("run_index", path=t.base_path).collect()[0]
    assert out["files_indexed"] == len(t.view().live_base_files())
    t = t.reload()
    assert t.cfg.bloom_index_enabled
    acts = [i.action for i in t.timeline.completed()]
    assert tl.INDEXING in acts
    # idempotent: nothing left to index
    again = eng.call("run_index", path=t.base_path).collect()[0]
    assert again["files_indexed"] == 0
    # partition listing reports it
    parts = {r["partition"]: r for r in
             eng.call("show_metadata_table_partitions",
                      path=t.base_path).collect()}
    assert parts["bloom_filters"]["enabled"]
    assert parts["bloom_filters"]["entries"] == out["files_indexed"]


def test_sql_create_show_drop_bloom_index(spark, tmp_path):
    eng, t = _mk(spark, tmp_path / "sq", target_file_bytes=256 * 1024)
    eng.register_table("bloomt", t.base_path)
    t.bulk_insert(_keys_df(spark, range(0, 1000, 2)))
    out = eng.sql("CREATE INDEX bidx ON bloomt USING bloom_filters (id)")
    assert out.collect()[0]["files_indexed"] >= 1
    rows = eng.sql("SHOW INDEXES ON bloomt").collect()
    assert any(r["index_type"] == "bloom_filters" for r in rows)
    eng.sql("DROP INDEX bidx ON bloomt")
    t = t.reload()
    assert not t.cfg.bloom_index_enabled
    assert not os.path.isdir(bloom.bloom_dir(t.base_path))


def test_compaction_output_gets_blooms(spark, tmp_path):
    eng, t = _mk(spark, tmp_path / "cp", table_type="mor",
                 bloom_index_enabled=True, target_file_bytes=256 * 1024)
    t.bulk_insert(_keys_df(spark, range(0, 1000, 2)))
    t.upsert(spark.createDataFrame([(f"k{i:05d}", -2.0, 3) for i in (0, 2, 4)],
                                   "id string, val double, seq long"))
    t.compact()
    bl = bloom.load_blooms(spark, t.base_path, t.cfg.bloom_num_hashes)
    live = {os.path.basename(p) for p in t.view().live_base_files()}
    indexed = {r[0] for r in bl.select("file_name").collect()}
    assert live <= indexed
