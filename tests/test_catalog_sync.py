"""Spark-catalog meta sync (sync.py, hive-sync-lite vs HiveSyncTool.java)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

from hudi_0_12_0_my_spark import Engine
from hudi_0_12_0_my_spark.sync import SparkCatalogSync


def _rows(spark, vals):
    return spark.createDataFrame(vals, "id long, v long, dt string")


def test_catalog_sync_incremental_partitions(spark, tmp_path):
    """First sync creates the catalog surface with all partitions; later
    syncs discover ONLY partitions added since the last synced instant (from
    commit metadata, not storage listing); spark.sql against the synced name
    sees rows of the new partition; a no-change re-sync is a no-op."""
    eng = Engine(spark)
    t = eng.create_table(str(tmp_path / "cs"), name="cs_src",
                         record_key_fields=["id"], precombine_field="v",
                         partition_field="dt")
    t.bulk_insert(_rows(spark, [(1, 1, "2024-01-01"), (2, 1, "2024-01-02")]))
    s = SparkCatalogSync(t, sync_db="lake", sync_table="cs_synced")
    r1 = s.sync()
    assert r1["created"] and set(r1["new_partitions"]) == {"2024-01-01",
                                                          "2024-01-02"}
    assert spark.sql("SELECT count(*) n FROM lake_cs_synced").first().n == 2
    # session-level sync stays session-level: no half-created database
    # (ADVICE r3 — db-qualified access is HiveMetastoreSync's job)
    assert not [d.name for d in spark.catalog.listDatabases()
                if d.name == "lake"]

    # upsert into a NEW partition -> only it is reported; SQL sees its rows
    t.upsert(_rows(spark, [(3, 1, "2024-02-01")]))
    r2 = s.sync()
    assert not r2["created"] and r2["new_partitions"] == ["2024-02-01"]
    got = spark.sql("SELECT id FROM lake_cs_synced WHERE dt = '2024-02-01'")
    assert [r.id for r in got.collect()] == [3]

    # update WITHIN an existing partition -> data refreshes, no new partition
    t.upsert(_rows(spark, [(1, 9, "2024-01-01")]))
    r3 = s.sync()
    assert r3["new_partitions"] == []
    assert spark.sql("SELECT v FROM lake_cs_synced WHERE id = 1").first().v == 9

    # already current -> no-op
    assert s.sync()["new_partitions"] == [] and s.sync()["synced_instant"] == r3["synced_instant"]


def test_stream_ingest_hive_sync_config(spark, tmp_path):
    """The fork's per-table hive_sync_config block wires catalog sync into
    the streaming sink: after the stream drains, spark.sql against the
    synced name sees every ingested partition."""
    import json, os

    from hudi_0_12_0_my_spark.streaming import (TableStreamConfig,
                                                start_table_stream)
    src = str(tmp_path / "in")
    os.makedirs(src)
    with open(os.path.join(src, "b0.json"), "w") as fh:
        for k, dt in [(1, "2024-01-01"), (2, "2024-01-02")]:
            fh.write(json.dumps({"id": k, "v": 1, "dt": dt, "op": "I"}) + "\n")
    cfg = TableStreamConfig(
        name="hs_tbl", base_path=str(tmp_path / "hs_tbl"),
        fields=[{"name": "id", "type": "bigint"},
                {"name": "v", "type": "bigint"},
                {"name": "dt", "type": "varchar"}],
        record_key_fields=["id"], precombine_field="v",
        partition_field="dt",
        source={"format": "json-files", "path": src,
                "schema": "value string"},
        hive_sync_config={"sync_db": "lakehs", "sync_table": "hs_synced",
                          "metastore_uris": "thrift://ignored:9083"})
    eng = Engine(spark)
    q = start_table_stream(eng, cfg, str(tmp_path / "ckpt"),
                           trigger={"availableNow": True})
    q.awaitTermination(120)
    got = {(r.id, r.dt) for r in
           spark.sql("SELECT id, dt FROM lakehs_hs_synced").collect()}
    assert got == {(1, "2024-01-01"), (2, "2024-01-02")}


HIVE_DRIVE = r'''
import os, sys
sys.path.insert(0, sys.argv[2])
wh = sys.argv[1]

def build():
    from pyspark.sql import SparkSession
    return (SparkSession.builder.master("local[2]")
            .config("spark.sql.warehouse.dir", os.path.join(wh, "warehouse"))
            .config("javax.jdo.option.ConnectionURL",
                    "jdbc:derby:;databaseName=%s;create=true"
                    % os.path.join(wh, "metastore"))
            .config("spark.sql.shuffle.partitions", "4")
            .config("spark.ui.enabled", "false")
            .enableHiveSupport().getOrCreate())

spark = build()
from pyspark.sql import Row
from hudi_0_12_0_my_spark import Engine
from hudi_0_12_0_my_spark.sync import HiveMetastoreSync, make_post_commit_sync

eng = Engine(spark)
t = eng.create_table(os.path.join(wh, "tbl"), name="hs",
                     record_key_fields=["id"], precombine_field="ts",
                     partition_field="dt")
t.bulk_insert(spark.createDataFrame([
    Row(id=1, name="a", ts=1, dt="2021-01-01"),
    Row(id=2, name="b", ts=1, dt="2021-01-02")]))
s = HiveMetastoreSync(t, sync_db="lake", sync_table="hs")
r1 = s.sync()
assert r1["created"] and r1["new_partitions"] == ["2021-01-01", "2021-01-02"], r1
r2 = s.sync()                                    # idempotent no-op
assert not r2["created"] and r2["new_partitions"] == [], r2

# post-commit hook: upserts sync WITHOUT explicit sync() calls
t.on_commit(make_post_commit_sync(t, {"sync_db": "lake", "sync_table": "hs"}))
t.upsert(spark.createDataFrame([Row(id=3, name="c", ts=2, dt="2021-01-03")]))
t.add_column("note", "string")                   # schema evolution rides along
t.upsert(spark.createDataFrame([
    Row(id=4, name="d", ts=2, dt="2021-01-04", note="x")]))
parts = sorted(r[0] for r in spark.sql("SHOW PARTITIONS lake.hs").collect())
assert parts == ["dt=2021-01-01", "dt=2021-01-02",
                 "dt=2021-01-03", "dt=2021-01-04"], parts
spark.stop()

# SECOND Hive-enabled session: sees table/schema/partitions, no engine API
spark2 = build()
parts2 = sorted(r[0] for r in spark2.sql("SHOW PARTITIONS lake.hs").collect())
assert parts2 == parts, parts2
cols = [f.name for f in spark2.table("lake.hs").schema.fields]
assert "note" in cols and "dt" in cols, cols
props = {r[0]: r[1] for r in
         spark2.sql("SHOW TBLPROPERTIES lake.hs").collect()}
assert props.get("last_commit_time_synced"), props
print("HIVE SYNC OK")
'''


def test_hive_metastore_sync_second_session(tmp_path):
    """VERDICT r3 item 4: real HMS sync via enableHiveSupport() (embedded
    derby). Runs in a subprocess because the shared test session is not
    Hive-enabled and spark.sql.catalogImplementation is fixed per JVM.
    Asserts HiveSyncTool semantics: create-if-absent, incremental partition
    add via post-commit hook, ADD COLUMNS schema update,
    last_commit_time_synced TBLPROPERTIES — all visible to a SECOND
    Hive-enabled session with no engine API call."""
    import subprocess
    import sys
    script = tmp_path / "hive_drive.py"
    script.write_text(HIVE_DRIVE)
    out = subprocess.run(
        [sys.executable, str(script), str(tmp_path / "wh"), REPO],
        capture_output=True, text=True, timeout=600, cwd=str(tmp_path))
    assert out.returncode == 0, out.stdout[-3000:] + out.stderr[-3000:]
    assert "HIVE SYNC OK" in out.stdout


def test_hive_sync_refuses_plain_session(spark, tmp_path):
    """Clear error instead of silent session-catalog writes when the
    session has no Hive support."""
    from pyspark.sql import Row
    from hudi_0_12_0_my_spark import Engine
    from hudi_0_12_0_my_spark.sync import HiveMetastoreSync, HiveSyncError
    t = Engine(spark).create_table(str(tmp_path / "t"), name="hsx",
                                   record_key_fields=["id"],
                                   precombine_field="ts",
                                   partition_field="dt")
    t.bulk_insert(spark.createDataFrame([Row(id=1, ts=1, dt="d1")]))
    with pytest.raises(HiveSyncError, match="Hive-enabled"):
        HiveMetastoreSync(t).sync()
