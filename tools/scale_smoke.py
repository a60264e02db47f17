"""sf1 scale smoke for the shuffle-sensitive LLM operators (VERDICT r3 #7).

sf0.1 cannot see super-linear regressions, so this opt-in tier scales the
corpus tables 10x (documents 5k -> 50k, embeddings 2k -> 20k) and times the
six most shuffle-sensitive operators at both tiers, reporting sf1/sf0.1
wall-clock ratios. Data grows 10x, so a scale-safe operator should land
well under ~12x (per-row work + one extra log factor); a quadratic one
shows 50-100x.

The sf1 tier is DERIVED deterministically from the driver's sf0.1 parquet
(never hand-synthesized semantics): replica r of a document keeps its token
multiset but deterministically reorders words by xxhash64(word, pos, r), so
replicas are NOT near-duplicates of each other and LSH bucket densities
stay realistic instead of collapsing into 10-deep duplicate stacks;
replica r of an embedding adds a small per-dimension deterministic offset.
Fixture build is cached at /tmp/spark_graft_sf1 and excluded from timings.

Usage:  python tools/scale_smoke.py [--rebuild]
Prints one JSON line {"op": {"sf0.1": s, "sf1": s, "ratio": r}, ...}.

--sf10 runs the SECOND decade (r5 VERDICT item 5): the headline dedup/ANN
trio (minhash_lsh, containment_lsh, dsir_select) at sf10 (500k docs,
derived from sf1 by a length-preserving per-replica vocabulary rename —
see build_sf10's docstring for why reorder-again and fixed-width renames
are both wrong). One 10x step can hide a super-linear knee that only
bends at the next decade; two decades bound the 100 TB extrapolation.
Needs SPARK_GRAFT_DRIVER_MEM=32g (local-mode single heap) and scales
shuffle partitions with the tier (cpus*8 at sf10).
Prints {"op": {"sf1": s, "sf10": s, "ratio": r}, ...}.

--sf10-write runs the WRITE-path decade (r6 VERDICT item 5): bulk_insert
+ 10% upsert + compaction + incremental pull on the replicated lineitem
tier (sf1 ~6M rows -> sf10 ~60M), same memory/partition scaling.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF01 = "/root/testdata/sf0.1"
SF1 = "/tmp/spark_graft_sf1"
SF10 = "/tmp/spark_graft_sf10"
BENCH_ROOT = "/tmp/spark_graft_scale_smoke"
REPLICAS = 10


def build_sf1(spark) -> None:
    from pyspark.sql import functions as F

    docs = spark.read.parquet(os.path.join(SF01, "documents.parquet"))
    rep = spark.range(REPLICAS).select(F.col("id").alias("_r"))
    exploded = (docs.crossJoin(rep)
                .select((F.col("doc_id") * REPLICAS + F.col("_r"))
                        .alias("doc_id"),
                        "_r", "text", "lang", "source", "n_chars"))
    # deterministic per-replica word reorder: hash-sort the token array
    # (replica 0 keeps the original order — the sf0.1 rows survive verbatim)
    shuffled = F.array_join(
        F.expr("transform(array_sort(transform(split(text, ' '), (w, i) -> "
               "struct(xxhash64(w, i, _r) as h, w as w))), s -> s.w)"), " ")
    out = exploded.select(
        "doc_id",
        F.when(F.col("_r") == 0, F.col("text")).otherwise(shuffled)
        .alias("text"),
        "lang", "source", "n_chars")
    out.repartition(32).write.mode("overwrite").parquet(
        os.path.join(SF1, "documents.parquet"))

    emb = spark.read.parquet(os.path.join(SF01, "embeddings.parquet"))
    eout = (emb.crossJoin(rep)
            .select((F.col("vec_id") * REPLICAS + F.col("_r"))
                    .alias("vec_id"),
                    F.expr("transform(embedding, (x, i) -> cast(x + "
                           "((_r * 31 + i) % 13 - 6) * 0.01 as float))")
                    .alias("embedding"),
                    "label"))
    eout.repartition(32).write.mode("overwrite").parquet(
        os.path.join(SF1, "embeddings.parquet"))

    # events: replicate users (user_id*R+r) so per-user state stays constant
    # while the corpus and the user population both grow 10x
    ev = spark.read.parquet(os.path.join(SF01, "events.parquet"))
    evout = (ev.crossJoin(rep)
             .select((F.col("event_id") * REPLICAS + F.col("_r"))
                     .alias("event_id"), "ts",
                     (F.col("user_id") * REPLICAS + F.col("_r"))
                     .alias("user_id"), "event_type", "value", "props"))
    evout.repartition(32).write.mode("overwrite").parquet(
        os.path.join(SF1, "events.parquet"))

    # lineitem: replicate orders (basket contents preserved per replica)
    li = spark.read.parquet(os.path.join(SF01, "lineitem.parquet"))
    liout = (li.crossJoin(rep)
             .withColumn("l_orderkey",
                         F.col("l_orderkey") * REPLICAS + F.col("_r"))
             .drop("_r"))
    liout.repartition(32).write.mode("overwrite").parquet(
        os.path.join(SF1, "lineitem.parquet"))


def build_sf10(spark) -> None:
    """Second replica decade, derived from sf1 with CONSTANT duplicate
    density (the property a real 10x corpus has: new data is mostly new
    content). Word-REORDER — the sf1 recipe — is not enough here: minhash
    shingles CHARACTERS, and reordering words preserves most 5-char
    shingles, so every base doc would become a 100-deep near-dup clique
    and the TRUE pair output would grow ~100x per decade — a fixture
    artifact (quadratic in clique depth), not an operator property, and
    exactly the density collapse the sf1 fixture was designed to avoid.
    Instead EVERY replica hash-RENAMES every word — a per-replica
    vocabulary, so replicas share almost no shingles with each other or
    with sf1, while docs WITHIN a replica keep their relative near-dup
    structure (same word->token map). No replica carries sf1 verbatim
    (the r6 fixture kept replica 0 as-is, which layered duplicates on
    the sf1 rows and inflated pair output 38x for 10x data — a fixture
    artifact the wall-ratio story had to footnote away; with all-renamed
    replicas, output growth is ~linear and the ratio stands on its own).
    The rename is LENGTH-PRESERVING and takes the LOW-ORDER base-36
    digits of the word's hash (token = right(conv(hash, 10, 36), len)).
    Three rejected variants, all measured: (1) fixed-width hex inflated
    every stopword from ~3 chars to 16, multiplying shared-shingle mass
    between UNRELATED docs ~100x (204M pairs where ~2M are expected);
    (2) length-preserving hex PREFIXES collide distinct short words (16
    symbols; 6.87M pairs where ~1.8M expected); (3) length-preserving
    base-36 PREFIXES are even worse (9.4M pairs) because conv()'s
    LEADING digit is not uniform — every 64-bit value renders 12-13
    base-36 digits starting with '1'-'3', so 1-char words get ~3
    effective slots. Low-order digits are uniform over the full 36-way
    alphabet, so the short-word collision rate stays near sf1's,
    duplicate density per doc stays ~sf1-level, and pair output growth
    is ~linear.

    Also derives a 10x lineitem tier for the write-path decade
    (run_write_tier)."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(os.path.join(SF1, "documents.parquet"))
    rep = spark.range(REPLICAS).select(F.col("id").alias("_r"))
    exploded = (docs.crossJoin(rep)
                .select((F.col("doc_id") * REPLICAS + F.col("_r"))
                        .alias("doc_id"),
                        "_r", "text", "lang", "source", "n_chars"))
    renamed = F.array_join(
        F.expr("transform(split(text, ' '), w -> right(lower(concat("
               "conv(xxhash64(w, _r), 10, 36), "
               "conv(xxhash64(w, _r + 500), 10, 36))), "
               "greatest(length(w), 1)))"),
        " ")
    out = exploded.select("doc_id", renamed.alias("text"),
                          "lang", "source", "n_chars")
    out.repartition(64).write.mode("overwrite").parquet(
        os.path.join(SF10, "documents.parquet"))

    li = spark.read.parquet(os.path.join(SF1, "lineitem.parquet"))
    liout = (li.crossJoin(rep)
             .withColumn("l_orderkey",
                         F.col("l_orderkey") * REPLICAS + F.col("_r"))
             .drop("_r"))
    liout.repartition(128).write.mode("overwrite").parquet(
        os.path.join(SF10, "lineitem.parquet"))


def run_trio(spark, sf_dir: str, shuffle_partitions: int | None = None) -> dict:
    """The headline dedup/selection trio only — the operators whose
    shuffle volume is corpus-shaped (band buckets / hashed grams), i.e.
    the ones a second decade could expose.

    ``shuffle_partitions``: partition count must scale WITH the data — a
    10x corpus on a fixed count makes every sort partition 10x bigger and
    OOMs the per-task sorter long before the heap is actually exhausted
    (observed: sf10 on 32 partitions dies in the containment verify sort
    even at 32g). This is exactly the knob a real cluster job tunes; AQE
    coalesces the excess at the small tier."""
    from pyspark.sql import functions as F  # noqa: F401

    from hudi_0_12_0_my_spark.operators import (dsir_sample,
                                                minhash_lsh_pairs,
                                                ngram_containment_pairs_lsh)

    if shuffle_partitions:
        spark.conf.set("spark.sql.shuffle.partitions",
                       str(shuffle_partitions))
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    docs.persist().count()
    t: dict = {}

    def step(name):
        class _T:
            def __enter__(self):
                self.t0 = time.perf_counter()

            def __exit__(self, *a):
                t[name] = round(time.perf_counter() - self.t0, 3)
        return _T()

    with step("minhash_lsh"):
        # max_bucket_size is the documented mega-bucket cap (the same
        # production recipe the containment step uses): the hex-token
        # fixture's common words collapse whole replicas into single band
        # buckets (top bucket ~21k members at sf10), and an uncapped
        # bucket's pair array is quadratic in its size. Applied at BOTH
        # tiers so the ratio compares like with like.
        minhash_lsh_pairs(docs, num_hashes=32, bands=8,
                          jaccard_threshold=0.4,
                          max_bucket_size=1000).count()
    with step("containment_lsh"):
        ngram_containment_pairs_lsh(docs, n=3, threshold=0.5,
                                    num_hashes=32, bands=8,
                                    max_bucket_size=1000).count()
    with step("dsir_select"):
        dsir_sample(docs, docs.filter("lang = 'en'"), 0.3,
                    num_buckets=8192).count()
    docs.unpersist()
    return t


def run_write_tier(spark, eng, sf_dir: str, tag: str,
                   shuffle_partitions: int | None = None) -> dict:
    """Write-path decade (VERDICT r6 item 5): the table-format write
    lifecycle a 100 TB ingest actually runs — bulk_insert, a 10% upsert
    (tag + MOR delta append), compaction, and the incremental pull of the
    upsert window — timed per tier on the replicated lineitem. Data grows
    10x per tier; a scale-safe write path should land well under ~12x
    per step (per-row work + a log factor for the tag join sort)."""
    import shutil

    from pyspark.sql import functions as F

    if shuffle_partitions:
        spark.conf.set("spark.sql.shuffle.partitions",
                       str(shuffle_partitions))
    li = (spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
          .dropDuplicates(["l_orderkey", "l_linenumber"]))
    li.persist().count()
    root = os.path.join(BENCH_ROOT, tag + "_write")
    shutil.rmtree(root, ignore_errors=True)
    t: dict = {}

    def step(name):
        class _T:
            def __enter__(self):
                self.t0 = time.perf_counter()

            def __exit__(self, *a):
                t[name] = round(time.perf_counter() - self.t0, 3)
        return _T()

    tbl = eng.create_table(os.path.join(root, "t"),
                           record_key_fields=["l_orderkey", "l_linenumber"],
                           precombine_field="l_shipdate", table_type="mor",
                           keygen="nonpartitioned")
    with step("bulk_insert"):
        tbl.bulk_insert(li)
    begin = tbl.timeline.latest_completed_write().time
    mut = (li.filter("l_orderkey % 10 = 0")
           .withColumn("l_quantity", F.col("l_quantity") + 1))
    with step("upsert_10pct"):
        tbl.upsert(mut)
    with step("compaction"):
        tbl.compact()
    with step("incremental_pull"):
        tbl.incremental(begin).count()
    li.unpersist()
    shutil.rmtree(root, ignore_errors=True)
    return t


def run_tier(spark, eng, sf_dir: str, tag: str) -> dict:
    import shutil

    from pyspark.sql import functions as F

    from hudi_0_12_0_my_spark.derived import (ivf_index_search,
                                              sync_ivf_index,
                                              sync_join_rollup)
    from hudi_0_12_0_my_spark.operators import (basket_pairs,
                                                boilerplate_filter,
                                                count_anomalies, curate,
                                                dsir_sample, dup_clusters,
                                                exact_substring_dedup,
                                                identity_clusters,
                                                minhash_lsh_pairs,
                                                ngram_containment_pairs,
                                                ngram_containment_pairs_lsh,
                                                pmi_top_pairs, rfm_segments,
                                                triangle_counts)
    from hudi_0_12_0_my_spark.operators.profile import _basket_counts

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    docs.persist().count()
    emb.persist().count()
    t: dict = {}

    def step(name):
        class _T:
            def __enter__(self):
                self.t0 = time.perf_counter()

            def __exit__(self, *a):
                t[name] = round(time.perf_counter() - self.t0, 3)
        return _T()

    with step("minhash_lsh"):
        minhash_lsh_pairs(docs, num_hashes=32, bands=8,
                          jaccard_threshold=0.4).count()
    with step("dup_clusters"):
        dup_clusters(minhash_lsh_pairs(docs, num_hashes=32, bands=8,
                                       jaccard_threshold=0.4)).count()
    with step("substring_dedup"):
        exact_substring_dedup(docs, k=20).count()
    with step("dsir_select"):
        dsir_sample(docs, docs.filter("lang = 'en'"), 0.3,
                    num_buckets=8192).count()
    with step("curate"):
        curate(docs, min_quality=0.3, dedup="exact",
               sample_fraction=0.5).count()
    with step("pmi_pairs"):           # pair fan-out shuffle + unigram joins
        pmi_top_pairs(docs, window=3, k=25, min_count=10).count()
    with step("containment"):         # inverted-index self-join
        ngram_containment_pairs(docs, n=3, threshold=0.5).count()
    with step("containment_lsh"):      # candidates-first composition
        # the sf1 fixture's word-reordered replicas are near-identical in
        # char-shingle space (every base doc becomes a 10-clique), so use
        # the production recipe for duplicate-heavy corpora: r=4 bands
        # (same collision regime the minhash_lsh step runs) + a bucket cap
        # — mega-buckets are exact-dup territory, not containment's job
        ngram_containment_pairs_lsh(docs, n=3, threshold=0.5,
                                    num_hashes=32, bands=8,
                                    max_bucket_size=1000).count()
    with step("boilerplate"):          # corpus-frequency anti-join
        boilerplate_filter(docs, min_docs=2, window=20).count()
    with step("anomalies"):            # (user, day) shuffle + user windows
        ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        count_anomalies(ev, z=2.5, min_days=3).count()
    with step("basket_pairs"):         # basket sets + pair-count shuffle
        li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
        basket_pairs(li, buckets=50, k=25).count()
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    ev.persist().count()
    with step("rfm_exact"):            # global ntile: the documented hazard
        rfm_segments(ev, mode="exact").count()
    with step("rfm_approx"):           # histogram tiles: must stay ~flat
        rfm_segments(ev, mode="approx").count()
    with step("identity_clusters"):    # recurring edges + CC
        identity_clusters(
            ev, device_expr="CAST(get_json_object(props, '$.k') AS BIGINT)",
            min_occurrences=4).count()
    ev.unpersist()
    with step("triangle_counts"):      # oriented triad join over edges
        c_ab, _, _ = _basket_counts(li, "l_orderkey", "l_partkey", 50)
        edges = (c_ab.filter(F.col("n_orders") >= 100)
                 .select(F.col("item_a").alias("id_a"),
                         F.col("item_b").alias("id_b")))
        triangle_counts(edges).count()
    # join-IVM: setup (tables + full first sync) outside the timer; the
    # timed step is the INCREMENTAL sync after a 10% fact delta + one dim
    # group move — the per-sync cost a deployment actually pays
    root = os.path.join(BENCH_ROOT, tag + "_jr")
    shutil.rmtree(root, ignore_errors=True)
    part = spark.read.parquet(os.path.join(SF01, "part.parquet")) \
        .select("p_partkey", "p_brand")   # dims stay slowly-changing: same size both tiers
    fct = eng.create_table(os.path.join(root, "fact"),
                           record_key_fields=["l_orderkey", "l_linenumber"],
                           precombine_field="l_extendedprice",
                           keygen="nonpartitioned")
    dmt = eng.create_table(os.path.join(root, "dim"),
                           record_key_fields=["p_partkey"],
                           keygen="nonpartitioned")
    jdst = eng.create_table(os.path.join(root, "view"),
                            record_key_fields=["p_brand"],
                            keygen="nonpartitioned")
    li_d = li.dropDuplicates(["l_orderkey", "l_linenumber"])
    fct.bulk_insert(li_d)
    dmt.bulk_insert(part)
    args_jr = (fct, dmt, jdst, "l_partkey", "p_partkey", ["p_brand"],
               {"sum_qty": "l_quantity"})
    sync_join_rollup(*args_jr)
    fct.upsert(li_d.filter("l_orderkey % 10 = 0")
               .withColumn("l_quantity", F.col("l_quantity") + 1))
    dmt.upsert(part.limit(1).withColumn("p_brand", F.lit("Brand#XX")))
    with step("join_rollup_sync"):
        sync_join_rollup(*args_jr)
    with step("ivf_index_sync_search"):
        root = os.path.join(BENCH_ROOT, tag)
        shutil.rmtree(root, ignore_errors=True)
        src = eng.create_table(os.path.join(root, "src"),
                               record_key_fields=["vec_id"],
                               precombine_field="label",
                               keygen="nonpartitioned")
        vidx = eng.create_table(os.path.join(root, "idx"),
                                record_key_fields=["vec_id"],
                                partition_field="cell")
        src.bulk_insert(emb)
        sync_ivf_index(src, vidx, num_cells=8)
        ivf_index_search(vidx, emb.filter(f"vec_id < {10 * REPLICAS}"),
                         k=10, nprobe=2).count()
    docs.unpersist()
    emb.unpersist()
    return t


def main() -> None:
    from pyspark.sql import SparkSession

    from hudi_0_12_0_my_spark import Engine

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .appName("scale-smoke")
             .config("spark.sql.shuffle.partitions", cpus)
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory",
                     os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
             .config("spark.sql.session.timeZone", "UTC").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    if "--rebuild" in sys.argv or not os.path.exists(
            os.path.join(SF1, "lineitem.parquet")):
        build_sf1(spark)
    if "--sf10" in sys.argv or "--sf10-write" in sys.argv:
        if "--rebuild" in sys.argv or not os.path.exists(
                os.path.join(SF10, "lineitem.parquet")):
            build_sf10(spark)
        cpus_n = int(cpus)
        if "--sf10-write" in sys.argv:
            eng = Engine(spark)
            run_write_tier(spark, eng, SF01, "w_warm", cpus_n)  # JIT warmup
            mid = run_write_tier(spark, eng, SF1, "w_sf1", cpus_n)
            big = run_write_tier(spark, eng, SF10, "w_sf10", cpus_n * 8)
        else:
            run_trio(spark, SF1, cpus_n)     # discard: JIT/codegen warmup
            mid = run_trio(spark, SF1, cpus_n)
            big = run_trio(spark, SF10, cpus_n * 8)
        out = {op: {"sf1": mid[op], "sf10": big[op],
                    "ratio": round(big[op] / max(mid[op], 1e-9), 2)}
               for op in mid}
        print(json.dumps(out))
        return
    eng = Engine(spark)
    run_tier(spark, eng, SF01, "warm")   # discard: JIT/codegen warmup
    small = run_tier(spark, eng, SF01, "sf01")
    big = run_tier(spark, eng, SF1, "sf1")
    out = {op: {"sf0.1": small[op], "sf1": big[op],
                "ratio": round(big[op] / max(small[op], 1e-9), 2)}
           for op in small}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
