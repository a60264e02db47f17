"""Consistent-hashing bucket index: assignment, split/merge, crash safety.

Reference semantics: HoodieSparkConsistentBucketIndex.java +
ConsistentBucketIdentifier.java (split/merge of hash ranges).
"""

import pytest
from pyspark.sql import functions as F

from hudi_0_12_0_my_spark import Engine
from hudi_0_12_0_my_spark import buckets as bk


def _mk(spark, path, n=60, **kw):
    eng = Engine(spark)
    kw.setdefault("index_type", "bucket_consistent")
    kw.setdefault("num_buckets", 4)
    t = eng.create_table(str(path), record_key_fields=["id"],
                         precombine_field="seq", partition_field="grp", **kw)
    df = spark.createDataFrame(
        [(i, "a" if i % 2 else "b", float(i), 1) for i in range(n)],
        "id long, grp string, val double, seq long")
    t.bulk_insert(df)
    return eng, t, df


def _expected(df_rows, mutations):
    exp = {(r.id, r.grp): r.val for r in df_rows}
    exp.update(mutations)
    return exp


def _snap_dict(t):
    return {(r.id, r.grp): r.val for r in t.snapshot().collect()}


def test_cow_upsert_and_ring_assignment(spark, tmp_path):
    eng, t, df = _mk(spark, tmp_path / "cb")
    t.upsert(df.filter("id < 10").withColumn("val", F.col("val") + 100)
               .withColumn("seq", F.lit(2)))
    exp = _expected(df.collect(), {(i, "a" if i % 2 else "b"): i + 100.0
                                   for i in range(10)})
    assert _snap_dict(t) == exp
    # every partition got a ring; assignment is deterministic per key
    rings = bk.all_rings(t.base_path)
    assert set(rings) == {"a", "b"}
    assert all(len(r["nodes"]) == 4 for r in rings.values())
    # no duplicate keys across file groups
    n = t.snapshot().count()
    assert n == t.snapshot().select("id", "grp").distinct().count() == 60


def test_split_preserves_data_and_routes_new_writes(spark, tmp_path):
    eng, t, df = _mk(spark, tmp_path / "cb2")
    before = _snap_dict(t)
    instant = t.resize_buckets(split_above=1)   # every bucket is "oversized"
    assert instant is not None
    assert _snap_dict(t) == before
    rings = bk.all_rings(t.base_path)
    assert all(len(r["nodes"]) == 8 for r in rings.values())   # 4 -> 8
    # subsequent upsert lands in the child buckets without duplicating keys
    t = t.reload()
    t.upsert(df.withColumn("val", F.col("val") * 10).withColumn("seq", F.lit(3)))
    snap = t.snapshot()
    assert snap.count() == 60
    assert _snap_dict(t) == {(r.id, r.grp): r.val * 10 for r in df.collect()}
    # resize shows up as a clustering operation
    ops = eng.load_table(t.base_path)
    shows = eng.call("show_clustering", path=t.base_path).collect()
    assert any(r.state == "completed" for r in shows)


def test_merge_shrinks_ring(spark, tmp_path):
    eng, t, df = _mk(spark, tmp_path / "cb3")
    t.resize_buckets(split_above=1)
    before = _snap_dict(t)
    # everything is tiny -> adjacent buckets merge pairwise
    instant = t.reload().resize_buckets(split_above=1 << 40,
                                        merge_below=1 << 40)
    assert instant is not None
    rings = bk.all_rings(t.base_path)
    assert all(len(r["nodes"]) == 4 for r in rings.values())   # 8 -> 4
    assert _snap_dict(t.reload()) == before


def test_mor_consistent_bucket(spark, tmp_path):
    eng, t, df = _mk(spark, tmp_path / "cbm", table_type="mor")
    t.upsert(df.withColumn("val", F.col("val") + 1).withColumn("seq", F.lit(2)))
    assert _snap_dict(t) == {(r.id, r.grp): r.val + 1 for r in df.collect()}
    # logs compact into the same ring file groups
    assert t.compact() is not None
    t = t.reload()
    assert _snap_dict(t) == {(r.id, r.grp): r.val + 1 for r in df.collect()}
    # split after compaction still preserves rows
    t.resize_buckets(split_above=1)
    assert _snap_dict(t.reload()) == {(r.id, r.grp): r.val + 1
                                      for r in df.collect()}


@pytest.mark.parametrize("index_type", ["bucket", "bucket_consistent"])
def test_insert_overwrite_then_upsert(spark, tmp_path, index_type):
    """Regression: a bucket write after insert_overwrite must not land inside
    the replaced (dead) file groups."""
    eng, t, df = _mk(spark, tmp_path / f"ov_{index_type}", index_type=index_type)
    t.insert_overwrite(df.withColumn("val", F.lit(0.0)))
    t = t.reload()
    assert t.snapshot().count() == 60
    assert set(_snap_dict(t).values()) == {0.0}
    t.upsert(df.filter("id < 6").withColumn("val", F.lit(5.0))
               .withColumn("seq", F.lit(2)))
    t = t.reload()
    snap = _snap_dict(t)
    assert t.snapshot().count() == 60
    assert all(snap[(i, "a" if i % 2 else "b")] == 5.0 for i in range(6))


def test_rollback_restores_ring(spark, tmp_path):
    eng, t, df = _mk(spark, tmp_path / "cbr")
    nodes_before = {p: r["nodes"] for p, r in bk.all_rings(t.base_path).items()}
    instant = t.resize_buckets(split_above=1)
    assert instant is not None
    t = t.reload()
    t.rollback(instant)
    nodes_after = {p: r["nodes"] for p, r in bk.all_rings(t.base_path).items()}
    assert nodes_after == nodes_before
    assert _snap_dict(t.reload()) == {(r.id, r.grp): r.val for r in df.collect()}


def test_bucket_read_pruning_point_lookup(spark, tmp_path):
    """Equality on the record key pins the pmod bucket: a point lookup
    scans ONE file group (file id prefix == bucket) instead of all
    num_buckets, and every key remains reachable through the pruned path."""
    from hudi_0_12_0_my_spark import Engine
    eng = Engine(spark)
    t = eng.create_table(str(tmp_path / "bp"), record_key_fields=["id"],
                         precombine_field="seq", partition_field="grp",
                         index_type="bucket", num_buckets=8)
    df = spark.createDataFrame(
        [(i, "a" if i % 2 else "b", float(i), 1) for i in range(64)],
        "id long, grp string, val double, seq long")
    t.upsert(df)
    full = t.snapshot()
    point = t.snapshot(filters="id = 5")
    assert len(point.inputFiles()) == 1
    assert len(full.inputFiles()) == 16          # 8 buckets x 2 partitions
    assert [r.id for r in point.collect()] == [5]
    for i in (0, 31, 63):                        # no key lost to pruning
        assert [r.id for r in
                t.snapshot(filters=f"id = {i}").collect()] == [i]
    inq = t.snapshot(filters="id in (3, 9)")
    assert {r.id for r in inq.collect()} == {3, 9}
    assert len(inq.inputFiles()) <= 4            # <= 2 buckets x 2 parts


def test_mor_bucket_read_pruning_with_deltas(spark, tmp_path):
    """MOR point lookup on a bucket table prunes base AND delta files to
    the key's group (hash pins the group for every version); min/max stats
    pruning additionally applies to delta-free groups only."""
    from hudi_0_12_0_my_spark import Engine
    eng = Engine(spark)
    t = eng.create_table(str(tmp_path / "mbp"), record_key_fields=["id"],
                         precombine_field="seq", partition_field="grp",
                         index_type="bucket", num_buckets=8,
                         table_type="mor")
    df = spark.createDataFrame(
        [(i, "a", float(i), 1) for i in range(64)],
        "id long, grp string, val double, seq long")
    t.upsert(df)                                   # bases
    t.upsert(spark.createDataFrame([(5, "a", 55.0, 2)],
                                   "id long, grp string, val double, seq long"))
    point = t.snapshot(filters="id = 5")
    assert [(r.id, r.val) for r in point.collect()] == [(5, 55.0)]
    # one group's base + its delta, not 8 groups
    assert len(point.inputFiles()) <= 2
    other = t.snapshot(filters="id = 6")           # clean group, no delta
    assert [(r.id, r.val) for r in other.collect()] == [(6, 6.0)]
    assert len(other.inputFiles()) == 1
