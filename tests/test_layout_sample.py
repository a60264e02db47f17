"""Sample-boundary curve keys (layout.py with_curve_key boundary_mode=sample
vs SpaceCurveSortingHelper.orderDataFrameBySamplingValues)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window, functions as F

from hudi_0_12_0_my_spark.services.layout import with_curve_key


def _skewed(spark, n=4000, seed=7):
    """99% of `a` in [0, 100), 1% heavy tail up to ~1e9; b uniform."""
    df = spark.range(n).withColumn(
        "r", F.pmod(F.xxhash64(F.col("id") + seed), 1000))
    a = F.when(F.col("r") < 990, F.pmod(F.xxhash64("id"), 100)) \
         .otherwise(F.pmod(F.xxhash64("id"), F.lit(1_000_000_000)))
    b = F.pmod(F.xxhash64(F.col("id") * 31), 10_000)
    return df.select(F.col("id"),
                     F.abs(a).cast("double").alias("a"),
                     F.abs(b).cast("double").alias("b"))


def _files_touched(df_with_key, nfiles, lo, hi):
    """Simulate clustering: order by __curve_key into nfiles buckets, then
    count buckets whose [min_a, max_a] stripe overlaps the filter — the
    file-level min/max pruning a scan would do."""
    w = Window.orderBy("__curve_key")
    buck = df_with_key.withColumn("__f", F.ntile(nfiles).over(w))
    stats = buck.groupBy("__f").agg(F.min("a").alias("mn"),
                                    F.max("a").alias("mx"))
    return stats.filter((F.col("mx") >= lo) & (F.col("mn") <= hi)).count()


@pytest.mark.parametrize("strategy", ["zorder", "hilbert"])
def test_sample_boundaries_prune_skewed_at_least_as_well(spark, strategy):
    df = _skewed(spark)
    minmax = with_curve_key(df, ["a", "b"], strategy=strategy,
                            boundary_mode="minmax")
    sample = with_curve_key(df, ["a", "b"], strategy=strategy,
                            boundary_mode="sample")
    # both preserve rows and attach a key
    assert minmax.count() == sample.count() == df.count()
    nfiles = 16
    touched_minmax = _files_touched(minmax, nfiles, 10, 20)
    touched_sample = _files_touched(sample, nfiles, 10, 20)
    # min/max scaling collapses 99% of `a` into bucket 0 (range dominated by
    # the tail), so nearly every file stripe spans the dense region; sample
    # boundaries rank by quantile and must prune at least as well
    assert touched_sample <= touched_minmax
    assert touched_sample < nfiles        # and it actually prunes something


def test_sample_mode_edge_cases(spark):
    # constant numeric column + string column + nulls
    df = spark.createDataFrame(
        [(1, 5.0, "x", 1.0), (2, 5.0, "y", None), (3, 5.0, "z", 9.0)],
        "id long, c double, s string, v double")
    out = with_curve_key(df, ["c", "s", "v"], strategy="zorder",
                         boundary_mode="sample")
    assert out.count() == 3 and "__curve_key" in out.columns
    assert [c for c in out.columns if c.startswith("__q_")] == []
    with pytest.raises(ValueError, match="boundary_mode"):
        with_curve_key(df, ["c"], boundary_mode="nope")


def test_clustering_with_sample_boundaries(spark, tmp_path):
    """run_clustering(layout='zorder', boundary_mode='sample') preserves rows
    and commits a replacecommit (the DDL/gate behavior stays green)."""
    from hudi_0_12_0_my_spark import Engine
    eng = Engine(spark)
    t = eng.create_table(str(tmp_path / "cl"), record_key_fields=["id"],
                         precombine_field="v")
    import random
    random.seed(3)
    rows = [(i, float(random.choice([random.uniform(0, 10),
                                     random.uniform(0, 1e9)])),
             float(i)) for i in range(500)]
    t.bulk_insert(spark.createDataFrame(rows, "id long, a double, v double"))
    before = {r.id for r in t.snapshot().collect()}
    ins = t.cluster(sort_cols=["a", "v"], layout="zorder",
                    boundary_mode="sample")
    assert ins is not None
    assert {r.id for r in t.snapshot().collect()} == before
