"""Spark-catalog meta sync (sync.py, hive-sync-lite vs HiveSyncTool.java)."""

from __future__ import annotations

from pyspark.sql import functions as F

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
    assert [d.name for d in spark.catalog.listDatabases() if d.name == "lake"]

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
