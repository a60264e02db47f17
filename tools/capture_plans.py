"""Capture .explain('formatted') plans for the r7-touched query paths.

Builds the same fixture shapes as bench.py and writes
plans/r07/<name>_<suffix>.txt for each requested query. The derived-sync
plans are the steady-state delta-fold DataFrames (what the timed bench
step evaluates); the format plans are the Python Data Source scans.

Usage: python tools/capture_plans.py <suffix> [name ...]
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
ROOT = "/tmp/spark_graft_plans"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "plans", "r07")


def main() -> None:
    suffix = sys.argv[1]
    wanted = set(sys.argv[2:])
    os.makedirs(OUT, exist_ok=True)

    from pyspark.sql import SparkSession, Window, functions as F

    spark = (SparkSession.builder.master(f"local[{CPUS}]")
             .appName("spark-graft-plans")
             .config("spark.sql.shuffle.partitions", CPUS)
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory", "8g")
             .config("spark.sql.session.timeZone", "UTC")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    from hudi_0_12_0_my_spark import Engine
    from hudi_0_12_0_my_spark import meta
    from hudi_0_12_0_my_spark.derived import (_signed_cdc, sync_join_rollup,
                                              sync_rollup, _join_rollup_dim_leg,
                                              join_rollup_checkpoint,
                                              rollup_checkpoint)

    eng = Engine(spark)
    li = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
    od = spark.read.parquet(os.path.join(SF_DIR, "orders.parquet"))
    w = Window.partitionBy("l_orderkey", "l_linenumber").orderBy(
        F.desc("l_shipdate"), F.desc("l_quantity"), F.desc("l_extendedprice"),
        F.desc("l_suppkey"), F.desc("l_partkey"))
    base = li.withColumn("_rn", F.row_number().over(w)).filter("_rn = 1").drop("_rn")
    base.persist().count()

    shutil.rmtree(ROOT, ignore_errors=True)
    t = eng.create_table(os.path.join(ROOT, "lineitem"),
                         record_key_fields=["l_orderkey", "l_linenumber"],
                         precombine_field="l_shipdate",
                         partition_field="l_shipdate",
                         partition_style="timestamp",
                         keygen_output_format="yyyy-MM")
    t.bulk_insert(base)
    mut = (base.filter(F.col("l_orderkey") % 10 == 0)
           .withColumn("l_quantity", F.col("l_quantity") + 1000.0))
    t.upsert(mut)
    commits = [i.time for i in t.timeline.completed_write_instants()]

    def dump(name, df):
        if wanted and name not in wanted:
            return
        p = os.path.join(OUT, f"{name}_{suffix}.txt")
        with open(p, "w") as f:
            f.write(df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode
                .fromString("formatted")))
        print("wrote", p)

    # --- rollup_sync steady-state delta fold (what the bench step times)
    gcols = ["l_returnflag", "l_linestatus"]
    sum_cols = {"sum_qty": "l_quantity"}
    measures = list(dict.fromkeys(sum_cols.values()))
    try:
        contrib = t.reader.incremental_contributions(
            commits[0], commits[-1], gcols + measures)
    except AttributeError:
        contrib = _signed_cdc(t.incremental_cdc(commits[0], commits[-1]),
                              gcols + measures) \
            .withColumnRenamed("_sign", "_sign")
    deltas = contrib.groupBy(*gcols).agg(
        *[F.sum(F.col("_sign") * F.col(s).cast("double")).alias(o)
          for o, s in sum_cols.items()],
        F.sum("_sign").cast("bigint").alias("n_rows"))
    dump("rollup_sync", deltas)

    # --- join_rollup_sync steady-state two-leg fold
    jdim = eng.create_table(os.path.join(ROOT, "orders_dim"),
                            record_key_fields=["o_orderkey"],
                            precombine_field="o_orderdate",
                            keygen="nonpartitioned")
    jdim.bulk_insert(od)
    jdim.upsert(od.filter(F.col("o_orderkey") % 7 == 0)
                .withColumn("o_orderpriority", F.lit("9-RECLASS")))
    dcommits = [i.time for i in jdim.timeline.completed_write_instants()]
    jg, jm = ["o_orderpriority"], ["l_extendedprice"]
    try:
        d_f = (t.reader.incremental_contributions(
            commits[0], commits[-1], ["l_orderkey"] + jm)
            .withColumnRenamed("_sign", "_w"))
    except AttributeError:
        d_f = _signed_cdc(t.incremental_cdc(commits[0], commits[-1]),
                          ["l_orderkey"] + jm).withColumnRenamed("_sign", "_w")
    leg_f = (d_f.join(jdim.snapshot().select("o_orderkey", *jg),
                      F.col("l_orderkey") == F.col("o_orderkey"), "inner")
             .select("_w", *jg, *jm))
    try:
        d_d = _signed_cdc(
            jdim.incremental_cdc(dcommits[0], dcommits[-1],
                                 columns=["o_orderkey"] + jg),
            ["o_orderkey"] + jg).withColumnRenamed("_sign", "_w")
    except TypeError:
        d_d = _signed_cdc(jdim.incremental_cdc(dcommits[0], dcommits[-1]),
                          ["o_orderkey"] + jg).withColumnRenamed("_sign", "_w")
    leg_d = _join_rollup_dim_leg(t.time_travel(commits[0]), d_d,
                                 "l_orderkey", "o_orderkey", jg, jm,
                                 prune=True)
    contrib2 = leg_f.unionByName(leg_d)
    deltas2 = contrib2.groupBy(*jg).agg(
        F.sum(F.col("_w") * F.col("l_extendedprice").cast("double"))
        .alias("sum_price"),
        F.sum("_w").cast("bigint").alias("n_rows"))
    dump("join_rollup_sync", deltas2)

    # --- incremental_cdc itself (the bench incremental_cdc step)
    dump("incremental_cdc", t.incremental_cdc(begin=commits[0]))

    # --- format('hudi') snapshot scan
    dff = (spark.read.format("hudi").load(t.base_path)
           .agg(F.sum("l_quantity")))
    dump("format_snapshot_cow", dff)


if __name__ == "__main__":
    main()
