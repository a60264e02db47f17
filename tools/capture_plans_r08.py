"""Capture .explain('formatted') plans for the r8-touched query paths.

Writes plans/r08/<name>_{before,after}.txt. "Before" shapes are produced
from the SAME tree by disabling the r8 optimization through its own gate
(env/cap/prune toggles), so each pair isolates exactly the plan change:

- upsert_merged: the COW upsert's merged-write DataFrame.
  before = SPARK_GRAFT_UPSERT_BROADCAST_BYTES=0 (two-probe split + window)
  after  = broadcast-join resolution (one scan, no window)
- join_rollup_dim_leg_highchurn: the dD leg ABOVE the In-list key cap.
  before = prune=False (the pre-r8 above-cap behavior: unpruned scan)
  after  = the [min,max] range prune (cap monkeypatched below the delta)
- format_snapshot_cow: the Python Data Source scan (plus a partition-count
  note, since packing is planner-side and invisible in explain()).

Usage: python tools/capture_plans_r08.py
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
ROOT = "/tmp/spark_graft_plans_r08"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "plans", "r08")


def main() -> None:
    os.makedirs(OUT, exist_ok=True)

    from pyspark.sql import SparkSession, Window, functions as F

    spark = (SparkSession.builder.master(f"local[{CPUS}]")
             .appName("spark-graft-plans-r08")
             .config("spark.sql.shuffle.partitions", CPUS)
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory", "8g")
             .config("spark.sql.session.timeZone", "UTC")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    from hudi_0_12_0_my_spark import Engine
    from hudi_0_12_0_my_spark import meta, payloads
    import hudi_0_12_0_my_spark.derived as dv

    eng = Engine(spark)
    li = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
    w = Window.partitionBy("l_orderkey", "l_linenumber").orderBy(
        F.desc("l_shipdate"), F.desc("l_quantity"), F.desc("l_extendedprice"),
        F.desc("l_suppkey"), F.desc("l_partkey"))
    base = li.withColumn("_rn", F.row_number().over(w)) \
        .filter("_rn = 1").drop("_rn")
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

    def dump(name, df):
        p = os.path.join(OUT, f"{name}.txt")
        with open(p, "w") as f:
            f.write(df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode
                .fromString("formatted")))
        print("wrote", p)

    # ---- upsert merged-write DataFrame, split vs join resolution.
    # Replays upsert() up to `merged` without committing.
    def build_merged():
        cfg, spec = t.cfg, payloads.get(t.cfg.payload)
        wr = t.writer
        instant = "99999999999999"
        incoming = payloads.precombine(wr.prepare(mut, instant), cfg, spec)
        incoming.persist()
        view = t.view()
        band_rows = (incoming.groupBy(meta.PARTITION_PATH)
                     .agg(F.min(meta.RECORD_KEY).alias("kmin"),
                          F.max(meta.RECORD_KEY).alias("kmax")).collect())
        partitions = [r[0] for r in band_rows]
        bands = {r[0]: (r[1], r[2]) for r in band_rows}
        loc = wr._location_df(view, partitions, incoming, bands=bands)
        loc = loc.withColumnRenamed("__loc_pp", meta.PARTITION_PATH)
        tagged = incoming.join(
            loc, on=[meta.RECORD_KEY, meta.PARTITION_PATH], how="left")
        updates = (tagged.filter(F.col("__loc_fid").isNotNull())
                   .withColumn(meta.TARGET_FILE_ID, F.col("__loc_fid"))
                   .drop("__loc_fid", "__loc_pp"))
        n_upd = updates.count()
        upd_groups = {(r[0], r[1]) for r in updates.select(
            meta.PARTITION_PATH, meta.TARGET_FILE_ID).distinct().collect()}
        from hudi_0_12_0_my_spark.writer import (base_read_schema,
                                                 read_files)
        old_paths = [view.abs(s.base_file.path)
                     for g, s in view.live_slices()
                     if (g.partition, g.file_id) in upd_groups]
        old = read_files(spark, old_paths, base_read_schema(cfg), cfg)
        old = old.withColumn(meta.TARGET_FILE_ID, meta.file_id_from_name())
        jr = wr._resolve_by_broadcast_join(old, updates, spec, n_upd)
        if jr is not None:
            return jr
        on = [meta.PARTITION_PATH, meta.RECORD_KEY]
        ukeys = updates.select(*on).distinct()
        untouched = old.join(ukeys, on=on, how="left_anti")
        contested = old.join(ukeys, on=on, how="left_semi")
        return (payloads.resolve(
            contested.unionByName(updates, allowMissingColumns=True),
            cfg, spec, drop_deletes=True)
            .unionByName(untouched, allowMissingColumns=True))

    os.environ["SPARK_GRAFT_UPSERT_BROADCAST_BYTES"] = "0"
    dump("upsert_merged_before", build_merged())
    os.environ.pop("SPARK_GRAFT_UPSERT_BROADCAST_BYTES")
    dump("upsert_merged_after", build_merged())

    # ---- dim leg above the key cap: unpruned vs range prune
    od = spark.read.parquet(os.path.join(SF_DIR, "orders.parquet"))
    jdim = eng.create_table(os.path.join(ROOT, "orders_dim"),
                            record_key_fields=["o_orderkey"],
                            precombine_field="o_orderdate",
                            keygen="nonpartitioned")
    jdim.bulk_insert(od)
    jdim.upsert(od.filter(F.col("o_orderkey") % 7 == 0)
                .withColumn("o_orderpriority", F.lit("9-RECLASS")))
    dcommits = [i.time for i in jdim.timeline.completed_write_instants()]
    d_d = dv._signed_cdc(
        jdim.incremental_cdc(dcommits[0], dcommits[-1],
                             columns=["o_orderkey", "o_orderpriority"]),
        ["o_orderkey", "o_orderpriority"]).withColumnRenamed("_sign", "_w")
    d_d.persist().count()
    leg_before = dv._join_rollup_dim_leg(
        t.snapshot(), d_d, "l_orderkey", "o_orderkey",
        ["o_orderpriority"], ["l_extendedprice"], prune=False)
    dump("join_rollup_dim_leg_highchurn_before", leg_before)
    cap = dv._DIM_LEG_PRUNE_MAX_KEYS
    dv._DIM_LEG_PRUNE_MAX_KEYS = 1     # force the above-cap branch
    try:
        leg_after = dv._join_rollup_dim_leg(
            t.snapshot(), d_d, "l_orderkey", "o_orderkey",
            ["o_orderpriority"], ["l_extendedprice"], prune=True)
        dump("join_rollup_dim_leg_highchurn_after", leg_after)
    finally:
        dv._DIM_LEG_PRUNE_MAX_KEYS = cap
    d_d.unpersist()

    # ---- format scan plan + partition-count note
    t.upsert(mut)        # match the bench table shape (bulk + upsert)
    fdf = (spark.read.format("hudi").load(t.base_path)
           .agg(F.sum("l_quantity")))
    dump("format_snapshot_cow_after", fdf)
    from hudi_0_12_0_my_spark.datasource import HudiBatchReader
    sch = spark.read.format("hudi").load(t.base_path).schema
    rd = HudiBatchReader(sch, {"path": t.base_path})
    parts = rd.partitions()
    slices = sum(len(getattr(p, "slices", [p])) for p in parts)
    with open(os.path.join(OUT, "format_snapshot_cow_partitions.txt"),
              "w") as f:
        f.write(f"slices={slices} read_tasks={len(parts)} "
                f"(r7 packer would plan max(floor=32, bytes/128MB) tasks; "
                f"sizes from manifest write stats, no per-file stat)\n")
    print("wrote partition-count note")


if __name__ == "__main__":
    main()
