"""Incremental rollup maintenance (derived.py) vs full recompute."""

from __future__ import annotations

from pyspark.sql import functions as F

from hudi_0_12_0_my_spark import Engine
from hudi_0_12_0_my_spark.derived import rollup_checkpoint, sync_rollup

SCHEMA = "id string, grp string, v long"


def _expected(t):
    return {(r.grp, float(r.sum_v), r.n_rows) for r in
            t.snapshot().groupBy("grp")
            .agg(F.sum(F.col("v").cast("double")).alias("sum_v"),
                 F.count(F.lit(1)).alias("n_rows")).collect()}


def _got(dst):
    return {(r.grp, float(r.sum_v), r.n_rows)
            for r in dst.snapshot().collect()}


def test_sync_rollup_matches_full_recompute(spark, tmp_path):
    eng = Engine(spark)
    src = eng.create_table(str(tmp_path / "src"), record_key_fields=["id"],
                           partition_field="grp")
    dst = eng.create_table(str(tmp_path / "dst"), record_key_fields=["grp"],
                           keygen="nonpartitioned")

    src.bulk_insert(spark.createDataFrame(
        [("a", "g1", 10), ("b", "g1", 20), ("c", "g2", 5)], SCHEMA))
    ck1 = sync_rollup(src, dst, ["grp"], {"sum_v": "v"})
    assert ck1 == rollup_checkpoint(dst)
    assert _got(dst) == _expected(src) == {("g1", 30.0, 2), ("g2", 5.0, 1)}

    # update in place + insert a new group; then move b between groups the
    # non-global way (delete old partition copy, insert into the new one)
    src.upsert(spark.createDataFrame(
        [("a", "g1", 11), ("d", "g3", 7)], SCHEMA))
    src.delete(where=(F.col("id") == "b") & (F.col("grp") == "g1"))
    src.upsert(spark.createDataFrame([("b", "g2", 20)], SCHEMA))
    assert sync_rollup(src, dst, ["grp"], {"sum_v": "v"}) > ck1
    assert _got(dst) == _expected(src) == {
        ("g1", 11.0, 1), ("g2", 25.0, 2), ("g3", 7.0, 1)}

    # delete the last row of g3: its rollup group is tombstoned
    src.delete(where=F.col("id") == "d")
    sync_rollup(src, dst, ["grp"], {"sum_v": "v"})
    assert _got(dst) == _expected(src) == {("g1", 11.0, 1), ("g2", 25.0, 2)}

    # already current -> no-op
    assert sync_rollup(src, dst, ["grp"], {"sum_v": "v"}) is None


def test_sync_rollup_steps_equal_one_shot(spark, tmp_path):
    """Syncing after every commit lands on the same state as one final
    full-snapshot rollup of a fresh destination."""
    eng = Engine(spark)
    src = eng.create_table(str(tmp_path / "src2"), record_key_fields=["id"],
                           partition_field="grp")
    stepped = eng.create_table(str(tmp_path / "stepped"),
                               record_key_fields=["grp"],
                               keygen="nonpartitioned")
    oneshot = eng.create_table(str(tmp_path / "oneshot"),
                               record_key_fields=["grp"],
                               keygen="nonpartitioned")
    batches = [
        [("a", "g1", 1), ("b", "g2", 2)],
        [("a", "g2", 3), ("c", "g1", 4)],
        [("b", "g2", 9), ("d", "g4", 1)],
    ]
    for rows in batches:
        src.upsert(spark.createDataFrame(rows, SCHEMA))
        sync_rollup(src, stepped, ["grp"], {"sum_v": "v"})
    sync_rollup(src, oneshot, ["grp"], {"sum_v": "v"})
    assert _got(stepped) == _got(oneshot) == _expected(src)


def test_scd2_history_intervals(spark, tmp_path):
    """Versions open on insert/update, close at the successor's commit;
    a delete closes without opening; a re-insert opens a fresh interval."""
    eng = Engine(spark)
    t = eng.create_table(str(tmp_path / "scd"), record_key_fields=["id"],
                         partition_field="grp")
    from hudi_0_12_0_my_spark.derived import scd2_history
    t.bulk_insert(spark.createDataFrame(
        [("a", "g1", 1), ("b", "g1", 2)], SCHEMA))
    t.upsert(spark.createDataFrame([("a", "g1", 10)], SCHEMA))
    t.delete(where=F.col("id") == "b")
    t.upsert(spark.createDataFrame([("b", "g1", 20)], SCHEMA))
    c = [i.time for i in t.timeline.completed_write_instants()]
    h = {(r.id, r.v): (r.valid_from, r.valid_to) for r in
         scd2_history(t, ["id"], ["v"]).collect()}
    assert h[("a", 1)] == (c[0], c[1])
    assert h[("a", 10)] == (c[1], None)
    assert h[("b", 2)] == (c[0], c[2])        # closed by the delete
    assert h[("b", 20)] == (c[3], None)       # re-insert opens fresh
    assert len(h) == 4
