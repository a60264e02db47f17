"""Materialize a FULL-bench sf1 fixture dir (opt-in scaling tier, r8).

bench.py already reads its data dir from $SPARK_GRAFT_SF_DIR and its core
count from $SPARK_GRAFT_CPUS — at sf0.1 (~600k rows) per-step wall is
dominated by fixed job-launch/planning cost, so the driver's 8-vs-32-core
ratio reads ~1 everywhere (r7 VERDICT scaling block). This tool derives a
10x tier with every table the bench touches, so

    python tools/gen_sf_bench.py
    SPARK_GRAFT_SF_DIR=/tmp/spark_graft_sf1_bench SPARK_GRAFT_CPUS=32 python bench.py
    SPARK_GRAFT_SF_DIR=/tmp/spark_graft_sf1_bench SPARK_GRAFT_CPUS=8  python bench.py

is a valid scaling measurement under the unchanged bench contract (same
env vars, same one-line JSON; the default sf0.1 run is untouched).

Derivation is DETERMINISTIC from the driver's sf0.1 parquet, reusing the
scale_smoke recipes (documents word-reorder per replica so LSH bucket
densities stay realistic; embeddings per-dimension offsets; events/users
and lineitem/orders/customer replicated with key = key*R + r so every
bench join — l_orderkey=o_orderkey, o_custkey=c_custkey — stays
referentially consistent per replica and per-key multiplicities match
sf0.1's).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF01 = os.environ.get("SPARK_GRAFT_SRC_SF_DIR", "/root/testdata/sf0.1")
OUT = os.environ.get("SPARK_GRAFT_SF1_BENCH_DIR", "/tmp/spark_graft_sf1_bench")
REPLICAS = 10


def main() -> None:
    from pyspark.sql import SparkSession, functions as F

    spark = (SparkSession.builder.master("local[32]")
             .appName("gen-sf-bench")
             .config("spark.sql.shuffle.partitions", "64")
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory",
                     os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
             .config("spark.sql.session.timeZone", "UTC")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    rep = spark.range(REPLICAS).select(F.col("id").alias("_r"))

    def src(name):
        return spark.read.parquet(os.path.join(SF01, f"{name}.parquet"))

    def write(df, name, n=32):
        df.repartition(n).write.mode("overwrite").parquet(
            os.path.join(OUT, f"{name}.parquet"))
        print("wrote", name)

    # documents: per-replica deterministic word reorder (replica 0 verbatim)
    docs = src("documents")
    exploded = (docs.crossJoin(rep)
                .select((F.col("doc_id") * REPLICAS + F.col("_r"))
                        .alias("doc_id"),
                        "_r", "text", "lang", "source", "n_chars"))
    shuffled = F.array_join(
        F.expr("transform(array_sort(transform(split(text, ' '), (w, i) -> "
               "struct(xxhash64(w, i, _r) as h, w as w))), s -> s.w)"), " ")
    write(exploded.select(
        "doc_id",
        F.when(F.col("_r") == 0, F.col("text")).otherwise(shuffled)
        .alias("text"), "lang", "source", "n_chars"), "documents")

    # embeddings: small deterministic per-dimension offsets per replica
    emb = src("embeddings")
    write(emb.crossJoin(rep)
          .select((F.col("vec_id") * REPLICAS + F.col("_r")).alias("vec_id"),
                  F.expr("transform(embedding, (x, i) -> cast(x + "
                         "((_r * 31 + i) % 13 - 6) * 0.01 as float))")
                  .alias("embedding"), "label"), "embeddings")

    # events: replicate users so per-user state stays constant while the
    # user population grows 10x
    ev = src("events")
    write(ev.crossJoin(rep)
          .select((F.col("event_id") * REPLICAS + F.col("_r"))
                  .alias("event_id"), "ts",
                  (F.col("user_id") * REPLICAS + F.col("_r"))
                  .alias("user_id"), "event_type", "value", "props"),
          "events")

    # relational trio: keys replicated consistently so joins hold
    li = src("lineitem")
    write(li.crossJoin(rep)
          .withColumn("l_orderkey", F.col("l_orderkey") * REPLICAS
                      + F.col("_r")).drop("_r"), "lineitem", 64)
    od = src("orders")
    write(od.crossJoin(rep)
          .withColumn("o_orderkey", F.col("o_orderkey") * REPLICAS
                      + F.col("_r"))
          .withColumn("o_custkey", F.col("o_custkey") * REPLICAS
                      + F.col("_r")).drop("_r"), "orders")
    cu = src("customer")
    write(cu.crossJoin(rep)
          .withColumn("c_custkey", F.col("c_custkey") * REPLICAS
                      + F.col("_r")).drop("_r"), "customer")
    print("done:", OUT)


if __name__ == "__main__":
    main()
