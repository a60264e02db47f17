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


def test_format_write_points_at_compat_builder(spark, tmp_path):
    Engine(spark)
    df = spark.createDataFrame([(1, "a")], "id long, v string")
    with pytest.raises(Exception, match="HudiWriteBuilder"):
        df.write.format("hudi").mode("append").save(str(tmp_path / "w"))


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
    all_parts = [p for p in rd.partitions() if p.base]
    rd.pushFilters([dsf.GreaterThanOrEqual(("v",), 1000)])
    kept = [p for p in rd.partitions() if p.base]
    assert len(kept) < len(all_parts)            # something was pruned
    assert all(p.deltas or not rd._stats_exclude({"v": {"min": 0, "max": 19}})
               is False for p in kept)           # sanity on the helper
    # every kept-with-delta partition survived regardless of stats
    assert any(p.deltas for p in kept)
