"""Read-side CDC diff (reader.incremental_cdc) + write-key validation."""

import pytest
from pyspark.sql import functions as F

from hudi_0_12_0_my_spark import Engine


SCHEMA = "id long, grp string, val double, seq long"


def _rows(spark, data):
    return spark.createDataFrame(data, SCHEMA)


def _collect_ops(cdc):
    out = {}
    for r in cdc.collect():
        out[int(r["_hoodie_record_key"])] = (
            r.op,
            r.before["val"] if r.before else None,
            r.after["val"] if r.after else None)
    return out


@pytest.mark.parametrize("table_type", ["cow", "mor"])
def test_cdc_classifies_iud_and_suppresses_noops(spark, tmp_path, table_type):
    eng = Engine(spark)
    t = eng.create_table(str(tmp_path / table_type),
                         record_key_fields=["id"], precombine_field="seq",
                         partition_field="grp", table_type=table_type)
    t.bulk_insert(_rows(spark, [(i, "a" if i % 2 else "b", float(i), 1)
                                for i in range(1, 11)]))
    c0 = t.timeline.completed_write_instants()[-1].time
    t.upsert(_rows(spark, [
        (100, "a", 1.0, 2),                 # i
        (3, "a", 103.0, 2), (6, "b", 106.0, 2),   # u
        (7, "a", 7.0, 1),                   # identical re-upsert -> no row
    ]))
    t.delete(t.snapshot().filter("id = 4"))
    got = _collect_ops(t.incremental_cdc(begin=c0))
    assert got == {100: ("i", None, 1.0),
                   3: ("u", 3.0, 103.0), 6: ("u", 6.0, 106.0),
                   4: ("d", 4.0, None)}


def test_cdc_full_range_is_all_inserts(spark, tmp_path):
    eng = Engine(spark)
    t = eng.create_table(str(tmp_path / "t"), record_key_fields=["id"],
                         precombine_field="seq", partition_field="grp")
    t.bulk_insert(_rows(spark, [(1, "a", 1.0, 1), (2, "b", 2.0, 1)]))
    t.upsert(_rows(spark, [(1, "a", 9.0, 2)]))
    cdc = t.incremental_cdc()
    assert cdc.filter("op != 'i'").count() == 0
    assert cdc.count() == 2


def test_cdc_bounded_end_sees_intermediate_state(spark, tmp_path):
    eng = Engine(spark)
    t = eng.create_table(str(tmp_path / "t"), record_key_fields=["id"],
                         precombine_field="seq", partition_field="grp")
    t.bulk_insert(_rows(spark, [(1, "a", 1.0, 1)]))
    c0 = t.timeline.completed_write_instants()[-1].time
    t.upsert(_rows(spark, [(1, "a", 5.0, 2)]))
    c1 = t.timeline.completed_write_instants()[-1].time
    t.upsert(_rows(spark, [(1, "a", 9.0, 3)]))
    got = _collect_ops(t.incremental_cdc(begin=c0, end=c1))
    assert got == {1: ("u", 1.0, 5.0)}      # later commit invisible


def test_cdc_refuses_begin_older_than_retention(spark, tmp_path):
    """Cleaning drops pre-boundary slices from the manifest: a diff from an
    unreconstructable begin must raise, not report the table as inserts."""
    eng = Engine(spark)
    t = eng.create_table(str(tmp_path / "c"), record_key_fields=["id"],
                         precombine_field="seq", partition_field="grp",
                         cleaner_retain_commits=1)
    t.bulk_insert(_rows(spark, [(1, "a", 1.0, 1), (2, "a", 2.0, 1)]))
    c0 = t.timeline.completed_write_instants()[-1].time
    for s in range(2, 6):
        t.upsert(_rows(spark, [(1, "a", float(s), s)]))
    assert t.clean()["removed"] > 0
    with pytest.raises(ValueError, match="no longer reconstructable"):
        t.incremental_cdc(begin=c0)
    # a begin at/after the retained boundary still works
    boundary = t.timeline.completed_write_instants()[-1].time
    t.upsert(_rows(spark, [(2, "a", 20.0, 9)]))
    got = _collect_ops(t.incremental_cdc(begin=boundary))
    assert got == {2: ("u", 2.0, 20.0)}


def test_cdc_global_index_partition_move_is_update(spark, tmp_path):
    """With a global index a key moving partitions is ONE entity: the diff
    joins on the record key alone and reports u, not d+i."""
    eng = Engine(spark)
    t = eng.create_table(str(tmp_path / "g"), record_key_fields=["id"],
                         precombine_field="seq", partition_field="grp",
                         global_index=True)
    t.bulk_insert(_rows(spark, [(1, "a", 1.0, 1), (2, "a", 2.0, 1)]))
    c0 = t.timeline.completed_write_instants()[-1].time
    t.upsert(_rows(spark, [(1, "b", 10.0, 2)]))     # a -> b move
    got = _collect_ops(t.incremental_cdc(begin=c0))
    assert got == {1: ("u", 1.0, 10.0)}


def test_null_record_key_fails_the_write(spark, tmp_path):
    """A null/empty record key must fail the write (HoodieKeyException) —
    a silently-accepted null key row joins nothing and could never be
    updated or deleted again. The failed attempt's debris heals lazily."""
    eng = Engine(spark)
    t = eng.create_table(str(tmp_path / "nk"), record_key_fields=["id"],
                         precombine_field="seq", partition_field="grp")
    t.bulk_insert(_rows(spark, [(1, "a", 1.0, 1)]))
    with pytest.raises(Exception, match="HoodieKeyException"):
        t.upsert(spark.createDataFrame([(None, "a", 9.0, 2)], SCHEMA))
    assert t.snapshot().count() == 1          # state intact
    t.upsert(_rows(spark, [(2, "a", 2.0, 1)]))
    assert t.timeline.pending() == []         # debris healed
    assert t.snapshot().count() == 2


def test_cdc_ignores_compaction_rewrites(spark, tmp_path):
    """A compaction between begin and end rewrites whole file groups with
    identical values — the value-compare diff must emit only the one real
    update, no phantom rows for rewritten bystanders."""
    eng = Engine(spark)
    t = eng.create_table(str(tmp_path / "mc"), record_key_fields=["id"],
                         precombine_field="seq", partition_field="grp",
                         table_type="mor")
    t.bulk_insert(_rows(spark, [(i, "a", float(i), 1) for i in range(10)]))
    c0 = t.timeline.completed_write_instants()[-1].time
    t.upsert(_rows(spark, [(3, "a", 33.0, 2)]))
    t.compact()
    got = _collect_ops(t.incremental_cdc(begin=c0))
    assert got == {3: ("u", 3.0, 33.0)}


def test_narrowed_cdc_and_contributions_fold_equivalence(spark, tmp_path):
    """r7 optimization contracts: (1) incremental_cdc(columns=[...]) keeps
    i/d rows, drops u-rows whose changes lie outside the subset, and its
    narrowed fold equals the full diff's fold over the same columns;
    (2) incremental_contributions' signed multiset folds to the same
    deltas as the signed per-key diff — the linear-fold identity the
    derived-table maintainers now rely on."""
    eng = Engine(spark)
    t = eng.create_table(str(tmp_path / "nar"), record_key_fields=["id"],
                         precombine_field="seq", partition_field="grp")
    t.bulk_insert(_rows(spark, [(i, "a" if i % 2 else "b",
                                 float(i), 1) for i in range(20)]))
    c0 = t.timeline.completed_write_instants()[-1].time
    t.upsert(_rows(spark, [(3, "a", 33.0, 2),      # val change
                           (4, "b", 4.0, 2),       # seq-only change
                           (21, "a", 21.0, 1)]))   # insert
    t.delete(where="id = 5")
    full = t.incremental_cdc(begin=c0)
    nar = t.incremental_cdc(begin=c0, columns=["val"])
    # seq-only change (id=4) visible in the full diff, absent narrowed
    assert 4 in _collect_ops(full) and 4 not in _collect_ops(nar)
    assert _collect_ops(nar) == {3: ("u", 3.0, 33.0),
                                 21: ("i", None, 21.0),
                                 5: ("d", 5.0, None)}
    # linear-fold identity: sum of signed val deltas agrees three ways
    def fold_cdc(cdc):
        minus = cdc.filter(F.col("op").isin("u", "d")) \
            .agg(F.sum("before.val")).collect()[0][0] or 0.0
        plus = cdc.filter(F.col("op").isin("i", "u")) \
            .agg(F.sum("after.val")).collect()[0][0] or 0.0
        return plus - minus
    contrib = t.incremental_contributions(c0, columns=["val"])
    folded = contrib.agg(
        F.sum(F.col("_sign") * F.col("val"))).collect()[0][0]
    assert abs(fold_cdc(full) - fold_cdc(nar)) < 1e-9
    assert abs(folded - fold_cdc(full)) < 1e-9
    # unknown column refuses loudly on both APIs
    with pytest.raises(ValueError, match="not business columns"):
        t.incremental_cdc(begin=c0, columns=["nope"])
    with pytest.raises(ValueError, match="not business columns"):
        t.incremental_contributions(c0, columns=["nope"])
