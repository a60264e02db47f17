"""Benchmark harness: headline workloads at $SPARK_GRAFT_SF_DIR (default sf0.1).

Workloads mirror BASELINE.md: lineitem bulk_insert, upsert of the mutated 10%
slice, Q6-shaped snapshot agg, incremental pull of the last commit — plus the
relational and LLM-pipeline headliners. Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
BENCH_ROOT = "/tmp/spark_graft_bench"


def main() -> None:
    from pyspark.sql import SparkSession, Window, functions as F

    spark = (SparkSession.builder.master(f"local[{CPUS}]")
             .appName("spark-graft-bench")
             .config("spark.sql.shuffle.partitions", CPUS)
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
             .config("spark.sql.session.timeZone", "UTC")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    from hudi_0_12_0_my_spark import Engine
    from hudi_0_12_0_my_spark.operators import (cosine_topk,
                                                minhash_lsh_pairs,
                                                simhash_near_dup_pairs)

    eng = Engine(spark)
    timings: dict[str, float] = {}

    def step(name):
        class _T:
            def __enter__(self):
                self.t0 = time.perf_counter()
                return self

            def __exit__(self, *a):
                timings[name] = round(time.perf_counter() - self.t0, 3)
        return _T()

    li = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
    w = Window.partitionBy("l_orderkey", "l_linenumber").orderBy(
        F.desc("l_shipdate"), F.desc("l_quantity"), F.desc("l_extendedprice"),
        F.desc("l_suppkey"), F.desc("l_partkey"))
    base = li.withColumn("_rn", F.row_number().over(w)).filter("_rn = 1").drop("_rn")
    base.persist().count()   # fixture prep (dedupe) excluded from timings

    shutil.rmtree(BENCH_ROOT, ignore_errors=True)
    t = eng.create_table(
        os.path.join(BENCH_ROOT, "lineitem"),
        record_key_fields=["l_orderkey", "l_linenumber"],
        precombine_field="l_shipdate", partition_field="l_shipdate",
        partition_style="timestamp", keygen_output_format="yyyy-MM")

    with step("bulk_insert"):
        t.bulk_insert(base)

    mut = (base.filter(F.col("l_orderkey") % 10 == 0)
               .withColumn("l_quantity", F.col("l_quantity") + 1000.0))
    with step("upsert_10pct"):
        t.upsert(mut)

    with step("snapshot_q6"):
        (t.snapshot(filters="l_shipdate >= '1996-01-01' and l_shipdate < '1997-01-01'")
         .filter(F.col("l_discount").between(0.05, 0.07) & (F.col("l_quantity") < 24))
         .agg(F.sum(F.col("l_extendedprice") * F.col("l_discount"))).collect())

    commits = [i.time for i in t.timeline.completed_write_instants()]
    with step("incremental_pull"):
        t.incremental(begin=commits[-2]).count()

    # MERGE with a 0.1% source: inner/anti + key-range pruned target scan —
    # must NOT behave like a full-table rewrite plan
    msrc = (base.filter(F.col("l_orderkey") % 1000 == 0)
            .select(F.col("l_orderkey").alias("ok"),
                    F.col("l_linenumber").alias("ln"))
            .withColumn("nq", F.lit(5.0)))
    with step("merge_small_source"):
        t.merge(msrc, on="t.l_orderkey = s.ok and t.l_linenumber = s.ln",
                when_matched_update={"l_quantity": "s.nq"},
                when_not_matched_insert=None)

    with step("incremental_cdc"):           # touched-partition diff, i/u/d
        t.incremental_cdc(begin=commits[0]).count()

    # derived pipeline: first sync folds the snapshot, second folds only the
    # merge commit's CDC diff — the second number is the steady-state cost
    from hudi_0_12_0_my_spark.derived import sync_rollup
    roll = eng.create_table(
        os.path.join(BENCH_ROOT, "lineitem_rollup"),
        record_key_fields=["l_returnflag", "l_linestatus"],
        keygen="nonpartitioned")
    sync_rollup(t, roll, ["l_returnflag", "l_linestatus"],
                {"sum_qty": "l_quantity"}, end=commits[-1])
    with step("rollup_sync"):
        sync_rollup(t, roll, ["l_returnflag", "l_linestatus"],
                    {"sum_qty": "l_quantity"})

    # two-source JOIN-view IVM: first sync (full join) outside the timer;
    # the timed number is a steady-state dual-delta fold (fact CDC diff +
    # dim reclass diff through the delta-join identity)
    from hudi_0_12_0_my_spark.derived import sync_join_rollup
    od = spark.read.parquet(os.path.join(SF_DIR, "orders.parquet"))
    jdim = eng.create_table(
        os.path.join(BENCH_ROOT, "orders_dim"),
        record_key_fields=["o_orderkey"], precombine_field="o_orderdate",
        keygen="nonpartitioned")
    jdim.bulk_insert(od)
    jdst = eng.create_table(
        os.path.join(BENCH_ROOT, "join_rollup"),
        record_key_fields=["o_orderpriority"], keygen="nonpartitioned")
    jargs = (t, jdim, jdst, "l_orderkey", "o_orderkey",
             ["o_orderpriority"], {"sum_price": "l_extendedprice"})
    sync_join_rollup(*jargs, end_fact=commits[0])
    jdim.upsert(od.filter(F.col("o_orderkey") % 7 == 0)
                .withColumn("o_orderpriority", F.lit("9-RECLASS")))
    with step("join_rollup_sync"):
        sync_join_rollup(*jargs)

    m = eng.create_table(
        os.path.join(BENCH_ROOT, "lineitem_mor"),
        record_key_fields=["l_orderkey", "l_linenumber"],
        precombine_field="l_shipdate", partition_field="l_shipdate",
        partition_style="timestamp", keygen_output_format="yyyy-MM",
        table_type="mor")
    m.bulk_insert(base)
    with step("mor_upsert_10pct"):          # delta-file append, no rewrite
        m.upsert(mut)
    with step("mor_snapshot_merge"):        # base+delta window merge read
        m.snapshot().agg(F.sum("l_quantity")).collect()
    # compat path: the registered Python Data Source (datasource.py) —
    # zero-import reads must have regression visibility too, priced
    # against the library JVM path above
    with step("format_snapshot_cow"):       # pyarrow scan, stream batches
        (spark.read.format("hudi").load(t.base_path)
         .agg(F.sum("l_quantity")).collect())
    with step("format_snapshot_mor"):       # executor-side arrow merge
        (spark.read.format("hudi").load(m.base_path)
         .agg(F.sum("l_quantity")).collect())
    with step("mor_compaction"):
        m.compact()
    with step("format_write_insert"):       # Python Data Source writer:
        # per-task parquet + driver-side commit fold (the quickstart
        # write line, datasource.HudiFormatWriter)
        (od.write.format("hudi")
         .option("hoodie.datasource.write.recordkey.field", "o_orderkey")
         .option("hoodie.datasource.write.partitionpath.field",
                 "o_orderpriority")
         .option("hoodie.datasource.write.precombine.field", "o_orderdate")
         .mode("overwrite").save(os.path.join(BENCH_ROOT, "fmt_write")))

    orders = spark.read.parquet(os.path.join(SF_DIR, "orders.parquet"))
    cust = spark.read.parquet(os.path.join(SF_DIR, "customer.parquet"))
    with step("q1_pricing"):
        (li.filter(F.col("l_shipdate") <= "2000-09-02")
         .groupBy("l_returnflag", "l_linestatus")
         .agg(F.count("*"), F.sum("l_quantity"), F.sum("l_extendedprice"),
              F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
              F.avg("l_discount")).collect())

    with step("q3_top10"):
        (li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
         .join(F.broadcast(cust.filter(F.col("c_mktsegment") == "BUILDING")),
               F.col("o_custkey") == F.col("c_custkey"))
         .filter((F.col("o_orderdate") < "1998-03-15")
                 & (F.col("l_shipdate") > "1998-03-15"))
         .groupBy("o_orderkey", "o_orderdate")
         .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
              .alias("revenue"))
         .orderBy(F.desc("revenue"), F.asc("o_orderkey")).limit(10).collect())

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    with step("minhash_lsh"):
        minhash_lsh_pairs(docs, num_hashes=32, bands=8,
                          jaccard_threshold=0.4).count()

    with step("simhash"):                   # map-only signatures (no explode)
        simhash_near_dup_pairs(docs, max_hamming=6).count()

    with step("dup_clusters"):              # LSH pairs -> alternating-star CC
        from hudi_0_12_0_my_spark.operators import dup_clusters
        dup_clusters(minhash_lsh_pairs(docs, num_hashes=32, bands=8,
                                       jaccard_threshold=0.4)).count()

    with step("repetition_stats"):          # map-only Gopher signals
        from hudi_0_12_0_my_spark.operators import with_repetition_stats
        (with_repetition_stats(docs)
         .agg(F.sum("dup_line_frac"), F.sum("top_bigram_char_frac"),
              F.sum("mean_word_len")).collect())

    with step("curate"):                    # scrub->normalize->quality->
        from hudi_0_12_0_my_spark.operators import curate   # dedup->sample
        curate(docs, min_quality=0.3, dedup="exact",
               sample_fraction=0.5).count()

    with step("chunk_pack"):                # chunking + packing, map-heavy
        from hudi_0_12_0_my_spark.operators import (chunk_documents,
                                                    pack_sequences)
        chunk_documents(docs, max_tokens=64, overlap=8).count()
        pack_sequences(docs, token_budget=512).count()

    with step("bm25"):                      # one stats agg + map-only scoring
        from hudi_0_12_0_my_spark.operators import bm25_topk
        bm25_topk(docs, "the data model", k=20).count()

    with step("decontaminate"):             # broadcast n-gram semi-join
        from hudi_0_12_0_my_spark.operators import contaminated_ids
        contaminated_ids(docs.filter("doc_id % 97 != 0"),
                         docs.filter("doc_id % 97 = 0"), n=4).count()

    with step("dsir_select"):               # hashed-gram bucket models,
        from hudi_0_12_0_my_spark.operators import dsir_sample   # broadcast
        dsir_sample(docs, docs.filter("lang = 'en'"), 0.3,       # ratio join
                    num_buckets=8192).count()

    with step("url_curate"):                # regex normalize + domain dedup
        from hudi_0_12_0_my_spark.operators import curate_urls
        u = docs.withColumn("url", F.concat_ws(
            "", F.lit("https://www."), F.col("source"),
            (F.col("doc_id") % 5).cast("string"), F.lit(".com/p/"),
            (F.col("doc_id") % 997).cast("string")))
        curate_urls(u, blocklist=["src00.com"]).count()

    with step("index_dedup"):               # persisted-LSH batch dedup
        from hudi_0_12_0_my_spark.operators import (dedup_against_index,
                                                    minhash_index_rows)
        idx = minhash_index_rows(docs.filter("doc_id % 5 != 0")).persist()
        idx.count()                          # index build (corpus signature)
        dedup_against_index(docs.filter("doc_id % 5 = 0"), idx,
                            jaccard_threshold=0.4).count()
        idx.unpersist()

    with step("sessionize"):                # one shuffle on user_id
        from hudi_0_12_0_my_spark.operators import session_stats
        ev = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
        session_stats(ev, gap_seconds=86400, value_col="value").count()

    with step("journey_ops"):               # funnel cascade + top paths +
        # Markov transitions: each ONE user-keyed shuffle, state capped
        from hudi_0_12_0_my_spark.operators import (event_transitions,
                                                    funnel_stats, top_paths)
        funnel_stats(ev, ["view", "click", "purchase"]).count()
        top_paths(ev, n_steps=5, k=20).count()
        event_transitions(ev).count()

    with step("interval_join"):             # bucketed range join, no NLJ
        from hudi_0_12_0_my_spark.operators import interval_join
        bands = spark.range(60).select(
            F.col("id").alias("band_id"), (F.col("id") * 8.0).alias("lo"),
            (F.col("id") * 8.0 + 12.0).alias("hi"))
        interval_join(ev.select("event_id", "value"), bands,
                      left_point="value", right_start="lo", right_end="hi",
                      bucket_width=8.0).count()

    with step("asof_join"):                 # union+window point-in-time fill
        from hudi_0_12_0_my_spark.operators import asof_join
        asof_join(ev.filter("event_id % 20 != 0").select("event_id", "user_id", "ts"),
                  ev.filter("event_id % 20 = 0").select(
                      "user_id", "ts", F.col("value").alias("status")),
                  "user_id").count()

    with step("lm_score"):                  # one count shuffle + gram join
        from hudi_0_12_0_my_spark.operators import lm_log_prob
        lm_log_prob(docs, order=2).count()

    with step("segment_dedup"):             # segment-hash winner + reassembly
        from hudi_0_12_0_my_spark.operators import segment_dedup
        segment_dedup(docs, window=20).count()

    with step("substring_dedup"):           # overlapping-window ExactSubstr
        from hudi_0_12_0_my_spark.operators import exact_substring_dedup
        exact_substring_dedup(docs, k=20).count()

    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    with step("emb_topk"):
        cosine_topk(emb, emb.filter("vec_id < 10"), k=10).count()

    with step("emb_kmeans"):                # 2 Lloyd rounds, k=8
        from hudi_0_12_0_my_spark.operators import kmeans_assign
        kmeans_assign(emb, k=8, iters=2).count()

    with step("quantized_topk"):            # int8 codes, integer dots
        from hudi_0_12_0_my_spark.operators import quantized_cosine_topk
        quantized_cosine_topk(emb, emb.filter("vec_id < 10"), k=10).count()

    with step("quota_cap"):                 # broadcast 2-phase domain caps
        from hudi_0_12_0_my_spark.operators import quota_cap
        quota_cap(docs, "source", cap=20, score_col="n_chars").count()

    with step("hybrid_rrf"):                # BM25 + dense RRF fusion
        from hudi_0_12_0_my_spark.operators import (bm25_topk, rrf_fuse)
        lex = (bm25_topk(docs, "the data model", k=20)
               .select("doc_id",
                       F.row_number().over(
                           Window.orderBy(F.desc("bm25"), F.asc("doc_id")))
                       .alias("rank")))
        dense = (cosine_topk(emb, emb.filter("vec_id = 0"), k=20)
                 .select(F.col("neighbor_id").alias("doc_id"), "rank"))
        rrf_fuse([lex, dense], k=60, top=20).count()

    with step("sketches"):                  # CMS heavy hitters + HLL + PMI
        from hudi_0_12_0_my_spark.operators import (heavy_hitters,
                                                    hll_distinct,
                                                    pmi_top_pairs)
        heavy_hitters(ev, "user_id", depth=4, width=256, k=20).count()
        hll_distinct(ev, "user_id", group_cols=["event_type"], p=8).count()
        pmi_top_pairs(docs, window=3, k=25, min_count=10).count()

    with step("web_curation"):              # boilerplate drop + Gopher rules
        from hudi_0_12_0_my_spark.operators import (boilerplate_filter,
                                                    with_gopher_quality)
        boilerplate_filter(docs, min_docs=2, window=20).count()
        with_gopher_quality(docs, min_words=40,
                            min_stop_hits=1).filter("pass_gopher").count()

    with step("user_analytics"):            # RFM + anomaly + basket lift
        from hudi_0_12_0_my_spark.operators import (ab_test_stats,
                                                    basket_pairs,
                                                    count_anomalies,
                                                    rfm_segments,
                                                    stickiness)
        rfm_segments(ev, n_tiles=5).count()
        count_anomalies(ev, z=2.5, min_days=3).count()
        basket_pairs(li, buckets=50, k=25).count()
        ab_test_stats(ev).count()
        stickiness(ev).count()

    with step("ivf_index_sync_search"):     # stream-maintained vector index
        from hudi_0_12_0_my_spark.derived import (ivf_index_search,
                                                  sync_ivf_index)
        src = eng.create_table(os.path.join(BENCH_ROOT, "ivf_src"),
                               record_key_fields=["vec_id"],
                               precombine_field="label",
                               keygen="nonpartitioned")
        vidx = eng.create_table(os.path.join(BENCH_ROOT, "ivf_idx"),
                                record_key_fields=["vec_id"],
                                partition_field="cell")
        src.bulk_insert(emb)
        sync_ivf_index(src, vidx, num_cells=8)
        ivf_index_search(vidx, emb.filter("vec_id < 10"), k=10,
                         nprobe=2).count()

    sf_name = os.path.basename(SF_DIR.rstrip("/"))
    try:
        sf = float(sf_name.replace("sf", ""))
    except ValueError:
        sf = None
    total = round(sum(timings.values()), 3)
    print(json.dumps({"metric": "spark_graft_bench_total", "value": total,
                      "unit": "sec", "queries": timings, "sf": sf}))


if __name__ == "__main__":
    main()
