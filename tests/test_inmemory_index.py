"""In-memory (testing) index — HoodieInMemoryHashIndex parity (SURVEY §2.4).

Reference: hudi-client/hudi-client-common/src/main/java/org/apache/hudi/
index/inmemory/HoodieInMemoryHashIndex.java — a process-wide hash map
key -> file group, updated on write, used for tagging instead of any file
scan."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from hudi_0_12_0_my_spark import Engine  # noqa: E402
from hudi_0_12_0_my_spark import writer as writermod  # noqa: E402


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, val double, seq long")


def test_inmemory_index_tags_without_file_scan(spark, tmp_path):
    eng = Engine(spark)
    t = eng.create_table(str(tmp_path / "im"), record_key_fields=["id"],
                         precombine_field="seq", index_type="inmemory")
    t.bulk_insert(_df(spark, [(i, float(i), 1) for i in range(100)]))
    idx = writermod._INMEMORY_INDEX[t.base_path]
    assert len(idx) == 100
    # the tag source is the map, not a parquet scan
    loc = t.writer._location_df(t.view(), t.partitions())
    assert loc is not None and not loc.inputFiles()
    # updates tag to their group, new keys insert, map follows
    t.upsert(_df(spark, [(5, -5.0, 2), (200, -200.0, 2)]))
    snap = {r.id: r.val for r in t.snapshot().collect()}
    assert snap[5] == -5.0 and snap[200] == -200.0 and len(snap) == 101
    assert len(writermod._INMEMORY_INDEX[t.base_path]) == 101
    # update landed in the SAME file group the map pointed at
    assert idx[("", "5")] == idx[("", "6")]


def test_inmemory_index_survives_table_reload(spark, tmp_path):
    eng = Engine(spark)
    t = eng.create_table(str(tmp_path / "im2"), record_key_fields=["id"],
                         precombine_field="seq", index_type="inmemory")
    t.upsert(_df(spark, [(1, 1.0, 1)]))
    t2 = t.reload()
    t2.upsert(_df(spark, [(1, 9.0, 2), (2, 2.0, 1)]))
    snap = {r.id: r.val for r in t2.snapshot().collect()}
    assert snap == {1: 9.0, 2: 2.0}
