"""Per-step diagnostic profiler for the bench workloads (r7 optimization).

Runs a chosen subset of bench.py's steps in the same fixture shapes, each
wrapped in cProfile, and reports for every step:
  - wall seconds
  - driver-side Python time split: py4j socket wait (JVM jobs running) vs
    own-repo Python functions (timeline folds, footer stats, file moves...)
  - top own-repo functions by cumulative time

This is a diagnostic tool only — bench.py remains the driver contract.

Usage:
    python tools/profile_bench.py upsert_10pct join_rollup_sync
    python tools/profile_bench.py --list
    python tools/profile_bench.py --explain-dir plans/r07 format_snapshot_cow
"""

from __future__ import annotations

import argparse
import cProfile
import io
import os
import pstats
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
ROOT = "/tmp/spark_graft_profile"


def _report(name: str, wall: float, pr: cProfile.Profile) -> None:
    st = pstats.Stats(pr)
    total_py = 0.0
    py4j_wait = 0.0
    own: list[tuple[float, str]] = []
    for (fn, line, func), (cc, nc, tt, ct, callers) in st.stats.items():
        total_py += tt
        if "py4j" in fn and func in ("recv", "recv_into", "readline", "read"):
            py4j_wait += tt
        if "/repo/" in fn and "/tools/" not in fn:
            own.append((ct, f"{os.path.basename(fn)}:{line} {func} "
                            f"(ncalls={nc}, tot={tt:.3f}, cum={ct:.3f})"))
    # socket waits live in socket.recv_into via py4j; catch those too
    for (fn, line, func), (cc, nc, tt, ct, callers) in st.stats.items():
        if func == "recv_into" or (fn == "~" and "recv" in str(func)):
            py4j_wait += tt
    own.sort(reverse=True)
    print(f"\n=== {name}: wall={wall:.3f}s  (profiled python tottime="
          f"{total_py:.2f}s, of which socket/py4j wait={py4j_wait:.2f}s)")
    seen = set()
    shown = 0
    for ct, desc in own:
        key = desc.split(" (")[0]
        if key in seen:
            continue
        seen.add(key)
        print(f"    {desc}")
        shown += 1
        if shown >= 18:
            break


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("steps", nargs="*")
    ap.add_argument("--list", action="store_true")
    ap.add_argument("--explain-dir", default=None,
                    help="write <step>.txt explain('formatted') for steps "
                         "that expose a DataFrame")
    ap.add_argument("--no-profile", action="store_true",
                    help="time only (no cProfile overhead)")
    ap.add_argument("--repeat", type=int, default=1)
    args = ap.parse_args()

    from pyspark.sql import SparkSession, Window, functions as F

    spark = (SparkSession.builder.master(f"local[{CPUS}]")
             .appName("spark-graft-profile")
             .config("spark.sql.shuffle.partitions", CPUS)
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory",
                     os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
             .config("spark.sql.session.timeZone", "UTC")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    from hudi_0_12_0_my_spark import Engine
    from hudi_0_12_0_my_spark.operators import (cosine_topk,
                                                minhash_lsh_pairs,
                                                simhash_near_dup_pairs)

    eng = Engine(spark)

    li = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
    w = Window.partitionBy("l_orderkey", "l_linenumber").orderBy(
        F.desc("l_shipdate"), F.desc("l_quantity"), F.desc("l_extendedprice"),
        F.desc("l_suppkey"), F.desc("l_partkey"))
    base = li.withColumn("_rn", F.row_number().over(w)).filter("_rn = 1").drop("_rn")
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    ev = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
    od = spark.read.parquet(os.path.join(SF_DIR, "orders.parquet"))

    state: dict = {}

    def fresh_table(**kw):
        path = kw.pop("path")
        shutil.rmtree(path, ignore_errors=True)
        return eng.create_table(path, **kw)

    def cow_table():
        if "cow" not in state:
            t = fresh_table(path=os.path.join(ROOT, "lineitem"),
                            record_key_fields=["l_orderkey", "l_linenumber"],
                            precombine_field="l_shipdate",
                            partition_field="l_shipdate",
                            partition_style="timestamp",
                            keygen_output_format="yyyy-MM")
            t.bulk_insert(base)
            state["cow"] = t
        return state["cow"]

    def mor_table():
        if "mor" not in state:
            m = fresh_table(path=os.path.join(ROOT, "lineitem_mor"),
                            record_key_fields=["l_orderkey", "l_linenumber"],
                            precombine_field="l_shipdate",
                            partition_field="l_shipdate",
                            partition_style="timestamp",
                            keygen_output_format="yyyy-MM",
                            table_type="mor")
            m.bulk_insert(base)
            state["mor"] = m
        return state["mor"]

    def mut():
        return (base.filter(F.col("l_orderkey") % 10 == 0)
                .withColumn("l_quantity", F.col("l_quantity") + 1000.0))

    # ----------------------------------------------------------- step defs
    def s_bulk_insert():
        t = fresh_table(path=os.path.join(ROOT, "li_bi"),
                        record_key_fields=["l_orderkey", "l_linenumber"],
                        precombine_field="l_shipdate",
                        partition_field="l_shipdate",
                        partition_style="timestamp",
                        keygen_output_format="yyyy-MM")
        return lambda: t.bulk_insert(base)

    def s_upsert_10pct():
        t = cow_table()
        m = mut()
        return lambda: t.upsert(m)

    def s_merge_small_source():
        t = cow_table()
        msrc = (base.filter(F.col("l_orderkey") % 1000 == 0)
                .select(F.col("l_orderkey").alias("ok"),
                        F.col("l_linenumber").alias("ln"))
                .withColumn("nq", F.lit(5.0)))
        return lambda: t.merge(
            msrc, on="t.l_orderkey = s.ok and t.l_linenumber = s.ln",
            when_matched_update={"l_quantity": "s.nq"},
            when_not_matched_insert=None)

    def s_rollup_sync():
        from hudi_0_12_0_my_spark.derived import sync_rollup
        t = cow_table()
        t.upsert(mut())
        commits = [i.time for i in t.timeline.completed_write_instants()]
        roll = fresh_table(path=os.path.join(ROOT, "lineitem_rollup"),
                           record_key_fields=["l_returnflag", "l_linestatus"],
                           keygen="nonpartitioned")
        sync_rollup(t, roll, ["l_returnflag", "l_linestatus"],
                    {"sum_qty": "l_quantity"}, end=commits[-2])
        return lambda: sync_rollup(t, roll,
                                   ["l_returnflag", "l_linestatus"],
                                   {"sum_qty": "l_quantity"})

    def s_join_rollup_sync():
        from hudi_0_12_0_my_spark.derived import sync_join_rollup
        t = cow_table()
        commits = [i.time for i in t.timeline.completed_write_instants()]
        jdim = fresh_table(path=os.path.join(ROOT, "orders_dim"),
                           record_key_fields=["o_orderkey"],
                           precombine_field="o_orderdate",
                           keygen="nonpartitioned")
        jdim.bulk_insert(od)
        jdst = fresh_table(path=os.path.join(ROOT, "join_rollup"),
                           record_key_fields=["o_orderpriority"],
                           keygen="nonpartitioned")
        jargs = (t, jdim, jdst, "l_orderkey", "o_orderkey",
                 ["o_orderpriority"], {"sum_price": "l_extendedprice"})
        sync_join_rollup(*jargs, end_fact=commits[0])
        jdim.upsert(od.filter(F.col("o_orderkey") % 7 == 0)
                    .withColumn("o_orderpriority", F.lit("9-RECLASS")))
        return lambda: sync_join_rollup(*jargs)

    def s_mor_upsert_10pct():
        m = mor_table()
        mm = mut()
        return lambda: m.upsert(mm)

    def s_mor_compaction():
        m = mor_table()
        m.upsert(mut())
        return lambda: m.compact()

    def s_mor_snapshot_merge():
        m = mor_table()
        m.upsert(mut())
        return lambda: m.snapshot().agg(F.sum("l_quantity")).collect()

    def s_format_snapshot_cow():
        t = cow_table()
        return lambda: (spark.read.format("hudi").load(t.base_path)
                        .agg(F.sum("l_quantity")).collect())

    def s_format_snapshot_mor():
        m = mor_table()
        m.upsert(mut())
        return lambda: (spark.read.format("hudi").load(m.base_path)
                        .agg(F.sum("l_quantity")).collect())

    def s_format_write_insert():
        def run():
            (od.write.format("hudi")
             .option("hoodie.datasource.write.recordkey.field", "o_orderkey")
             .option("hoodie.datasource.write.partitionpath.field",
                     "o_orderpriority")
             .option("hoodie.datasource.write.precombine.field", "o_orderdate")
             .mode("overwrite").save(os.path.join(ROOT, "fmt_write")))
        return run

    def s_minhash_lsh():
        return lambda: minhash_lsh_pairs(docs, num_hashes=32, bands=8,
                                         jaccard_threshold=0.4).count()

    def s_simhash():
        return lambda: simhash_near_dup_pairs(docs, max_hamming=6).count()

    def s_dup_clusters():
        from hudi_0_12_0_my_spark.operators import dup_clusters
        return lambda: dup_clusters(
            minhash_lsh_pairs(docs, num_hashes=32, bands=8,
                              jaccard_threshold=0.4)).count()

    def s_curate():
        from hudi_0_12_0_my_spark.operators import curate
        return lambda: curate(docs, min_quality=0.3, dedup="exact",
                              sample_fraction=0.5).count()

    def s_dsir_select():
        from hudi_0_12_0_my_spark.operators import dsir_sample
        return lambda: dsir_sample(docs, docs.filter("lang = 'en'"), 0.3,
                                   num_buckets=8192).count()

    def s_sketches():
        from hudi_0_12_0_my_spark.operators import (heavy_hitters,
                                                    hll_distinct,
                                                    pmi_top_pairs)

        def run():
            heavy_hitters(ev, "user_id", depth=4, width=256, k=20).count()
            hll_distinct(ev, "user_id", group_cols=["event_type"], p=8).count()
            pmi_top_pairs(docs, window=3, k=25, min_count=10).count()
        return run

    def s_user_analytics():
        from hudi_0_12_0_my_spark.operators import (ab_test_stats,
                                                    basket_pairs,
                                                    count_anomalies,
                                                    rfm_segments,
                                                    stickiness)

        def run():
            rfm_segments(ev, n_tiles=5).count()
            count_anomalies(ev, z=2.5, min_days=3).count()
            basket_pairs(li, buckets=50, k=25).count()
            ab_test_stats(ev).count()
            stickiness(ev).count()
        return run

    def s_ivf_index_sync_search():
        from hudi_0_12_0_my_spark.derived import (ivf_index_search,
                                                  sync_ivf_index)

        def run():
            src = fresh_table(path=os.path.join(ROOT, "ivf_src"),
                              record_key_fields=["vec_id"],
                              precombine_field="label",
                              keygen="nonpartitioned")
            vidx = fresh_table(path=os.path.join(ROOT, "ivf_idx"),
                               record_key_fields=["vec_id"],
                               partition_field="cell")
            src.bulk_insert(emb)
            sync_ivf_index(src, vidx, num_cells=8)
            ivf_index_search(vidx, emb.filter("vec_id < 10"), k=10,
                             nprobe=2).count()
        return run

    def s_incremental_cdc():
        t = cow_table()
        t.upsert(mut())
        commits = [i.time for i in t.timeline.completed_write_instants()]
        return lambda: t.incremental_cdc(begin=commits[0]).count()

    def s_repetition_stats():
        from hudi_0_12_0_my_spark.operators import with_repetition_stats
        return lambda: (with_repetition_stats(docs)
                        .agg(F.sum("dup_line_frac"),
                             F.sum("top_bigram_char_frac"),
                             F.sum("mean_word_len")).collect())

    def s_index_dedup():
        from hudi_0_12_0_my_spark.operators import (dedup_against_index,
                                                    minhash_index_rows)

        def run():
            idx = minhash_index_rows(docs.filter("doc_id % 5 != 0")).persist()
            idx.count()
            dedup_against_index(docs.filter("doc_id % 5 = 0"), idx,
                                jaccard_threshold=0.4).count()
            idx.unpersist()
        return run

    def s_journey_ops():
        from hudi_0_12_0_my_spark.operators import (event_transitions,
                                                    funnel_stats, top_paths)

        def run():
            funnel_stats(ev, ["view", "click", "purchase"]).count()
            top_paths(ev, n_steps=5, k=20).count()
            event_transitions(ev).count()
        return run

    def s_lm_score():
        from hudi_0_12_0_my_spark.operators import lm_log_prob
        return lambda: lm_log_prob(docs, order=2).count()

    def s_emb_kmeans():
        from hudi_0_12_0_my_spark.operators import kmeans_assign
        return lambda: kmeans_assign(emb, k=8, iters=2).count()

    def s_quantized_topk():
        from hudi_0_12_0_my_spark.operators import quantized_cosine_topk
        return lambda: quantized_cosine_topk(emb, emb.filter("vec_id < 10"),
                                             k=10).count()

    steps = {k[2:]: v for k, v in list(locals().items())
             if k.startswith("s_") and callable(v)}

    if args.list or not args.steps:
        print("available:", " ".join(sorted(steps)))
        return

    base.persist().count()
    shutil.rmtree(ROOT, ignore_errors=True)

    for name in args.steps:
        if name not in steps:
            print(f"unknown step {name}; --list to see choices")
            continue
        fn = steps[name]()   # setup outside the timer
        for rep in range(args.repeat):
            spark.sparkContext.setJobDescription(f"profile:{name}#{rep}")
            if args.no_profile:
                t0 = time.perf_counter()
                fn()
                wall = time.perf_counter() - t0
                print(f"=== {name}#{rep}: wall={wall:.3f}s")
            else:
                pr = cProfile.Profile()
                t0 = time.perf_counter()
                pr.enable()
                fn()
                pr.disable()
                wall = time.perf_counter() - t0
                _report(f"{name}#{rep}", wall, pr)
            spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
