"""ORC base-file format (cfg.base_format, HoodieFileFormat.java ORC)."""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F

from hudi_0_12_0_my_spark import Engine


def _rows(spark, vals):
    return spark.createDataFrame(vals, "id long, v double, ts long, dt string")


def test_cow_orc_lifecycle(spark, tmp_path):
    eng = Engine(spark)
    t = eng.create_table(str(tmp_path / "orc_cow"), record_key_fields=["id"],
                         precombine_field="ts", partition_field="dt",
                         base_format="orc")
    t.bulk_insert(_rows(spark, [(1, 1.0, 1, "a"), (2, 2.0, 1, "a"),
                                (3, 3.0, 1, "b")]))
    i1 = t.latest_instant()
    t.upsert(_rows(spark, [(2, 22.0, 2, "a"), (4, 4.0, 2, "b")]))
    # files on disk really are ORC; no parquet base files exist
    files = glob.glob(str(tmp_path / "orc_cow") + "/**/*.*", recursive=True)
    assert any(f.endswith(".orc") for f in files)
    assert not any(f.endswith(".parquet") and "/.hoodie/" not in f
                   for f in files)
    got = {(r.id, r.v) for r in t.snapshot().collect()}
    assert got == {(1, 1.0), (2, 22.0), (3, 3.0), (4, 4.0)}
    inc = {r.id for r in t.incremental(begin=i1).collect()}
    assert inc == {2, 4}
    # key-range pruned point lookup works off the ORC-derived stats
    assert {r.id for r in t.snapshot(filters=(F.col("id") == 3)).collect()} \
        == {3}
    # commit metadata carries real stats from the ORC files
    md = t.timeline.metadata(t.timeline.latest_completed_write())
    sts = [s for sl in md["partition_to_write_stats"].values() for s in sl]
    assert all(s["records"] > 0 for s in sts)
    ks = [s["col_stats"]["_hoodie_record_key"] for s in sts]
    assert all(k["min"] is not None and k["max"] is not None for k in ks)


def test_mor_orc_base_parquet_delta_compaction(spark, tmp_path):
    """MOR with ORC bases: deltas stay parquet (the reference's log format
    is independent of the base format), snapshot merges across formats, and
    compaction writes a new ORC base."""
    eng = Engine(spark)
    t = eng.create_table(str(tmp_path / "orc_mor"), record_key_fields=["id"],
                         precombine_field="ts", table_type="mor",
                         base_format="orc")
    t.bulk_insert(_rows(spark, [(1, 1.0, 1, "a"), (2, 2.0, 1, "a")]))
    t.upsert(_rows(spark, [(1, 11.0, 2, "a")]))
    files = glob.glob(str(tmp_path / "orc_mor") + "/**/*.*", recursive=True)
    assert any(f.endswith(".delta.parquet") for f in files)
    assert any(f.endswith(".orc") for f in files)
    assert {(r.id, r.v) for r in t.snapshot().collect()} == {(1, 11.0),
                                                             (2, 2.0)}
    ins = t.compact(strategy="unbounded")
    assert ins is not None
    new_base = [f for f in glob.glob(str(tmp_path / "orc_mor") + "/**/*.orc",
                                     recursive=True) if ins in f]
    assert new_base
    assert {(r.id, r.v) for r in t.read_optimized().collect()} == {
        (1, 11.0), (2, 2.0)}


def test_base_format_validation(spark, tmp_path):
    eng = Engine(spark)
    t = eng.create_table(str(tmp_path / "bad"), record_key_fields=["id"],
                         base_format="hfile")
    with pytest.raises(ValueError, match="unsupported base_format"):
        t.bulk_insert(_rows(spark, [(1, 1.0, 1, "a")]))
