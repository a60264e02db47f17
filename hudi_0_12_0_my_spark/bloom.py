"""Bloom-filter metadata partition — MetadataPartitionType.BLOOM_FILTERS.

Reference spec: hudi-common/src/main/java/org/apache/hudi/metadata/
MetadataPartitionType.java:24-27 (the ``bloom_filters`` partition),
HoodieBloomIndex.java:89-161 (tag-time probe after key-range pruning),
HoodieMetadataBloomIndexCheckFunction.java (metadata-backed bloom check),
RunIndexActionExecutor.java (async ``indexing`` action that backfills the
partition for existing files).

Spark-first design — no Avro bloom serialization, no per-row Java probe:

* One bloom per base file is ONE row ``(partition, file_name, num_bits,
  num_hashes, bitset array<bigint>, instant)`` in a plain parquet dataset
  under ``.hoodie/metadata/bloom_filters/``.
* Both BUILD and PROBE are pure Catalyst column expressions. The k bit
  positions per key come from Kirsch-Mitzenmacher double hashing
  ``pos_i = (h1 + i*h2) mod m`` over JVM-side ``xxhash64``, so neither path
  ever leaves whole-stage codegen, and the build shuffles only the written
  batch's keys (explode factor k) — never the table.
* The probe joins (incoming key × range-pruned candidate file) pairs to the
  bitset rows; the bloom side is filtered to the candidate files first, so
  Spark/AQE picks broadcast when the candidate set is small and falls back
  to a shuffle join when it is not (the 100 TB-safe default — a forced
  broadcast of thousands of MB-sized bitsets would OOM the driver).

False positives only cost an un-pruned file; false negatives are impossible
by construction (the build sets exactly the bits the probe reads).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

# second-hash salt for double hashing (any odd constant; golden-ratio prime)
_SEED = 2654435769

DIR = os.path.join(".hoodie", "metadata", "bloom_filters")


def bloom_dir(base_path: str) -> str:
    return os.path.join(base_path, DIR)


def _positions(key_col, num_bits_col, num_hashes: int) -> list:
    """k bit positions per key, Kirsch-Mitzenmacher double hashing. Both
    hashes are reduced mod m BEFORE combining so ``h1 + i*h2`` can't overflow
    a long under ANSI mode (i*h2m < k*m << 2^63); h2m is forced into
    [1, m-1] so a zero step can't collapse all k positions onto one bit.
    MUST stay formula-identical to probe_sql."""
    h1 = F.pmod(F.xxhash64(key_col), num_bits_col)
    h2 = F.pmod(F.xxhash64(key_col, F.lit(_SEED)), num_bits_col - 1) + F.lit(1)
    return [F.pmod(h1 + F.lit(i) * h2, num_bits_col) for i in range(num_hashes)]


def build_blooms(keys: DataFrame, bits_per_key: int, num_hashes: int) -> DataFrame:
    """(partition, file_name, key) -> one bitset row per file.

    Shuffle profile: one count agg (rows = batch), one explode(k) + groupBy
    (file, word) with map-side bit_or combine, one groupBy(file) assemble —
    all proportional to the WRITTEN batch, independent of table size.
    """
    sizes = (keys.groupBy("partition", "file_name")
             .agg(F.count("*").alias("__n"))
             .withColumn(
                 "num_bits",
                 F.greatest(F.lit(64),
                            (F.ceil(F.col("__n") * bits_per_key / 64) * 64))
                 .cast("long"))
             .drop("__n"))
    keyed = keys.join(F.broadcast(sizes), ["partition", "file_name"])
    pos = keyed.select(
        "partition", "file_name", "num_bits",
        F.explode(F.array(*_positions(F.col("key"), F.col("num_bits"),
                                      num_hashes))).alias("pos"))
    words = (pos.groupBy("partition", "file_name", "num_bits",
                         (F.col("pos") / 64).cast("long").alias("w"))
             .agg(F.expr("bit_or(shiftleft(cast(1 as bigint),"
                         " cast(pmod(pos, 64) as int)))").alias("bits")))
    return (words.groupBy("partition", "file_name", "num_bits")
            .agg(F.map_from_entries(
                F.collect_list(F.struct("w", "bits"))).alias("__wm"))
            .select(
                "partition", "file_name", "num_bits",
                F.lit(num_hashes).alias("num_hashes"),
                F.transform(
                    F.sequence(F.lit(0).cast("long"),
                               (F.col("num_bits") / 64 - 1).cast("long")),
                    lambda i: F.coalesce(F.try_element_at(F.col("__wm"), i),
                                         F.lit(0).cast("long"))).alias("bitset")))


def write_blooms(blooms: DataFrame, base_path: str, instant: str) -> int:
    """Append bitset rows (stamped with the building instant) to the
    ``bloom_filters`` partition. Parquet append => no rewrite of prior
    entries; files are immutable so a file_name never needs an update
    (re-index duplicates are resolved newest-wins at load)."""
    out = blooms.withColumn("instant", F.lit(instant))
    out.write.mode("append").parquet(bloom_dir(base_path))
    return out.count()


def load_blooms(spark: SparkSession, base_path: str,
                num_hashes: int) -> DataFrame | None:
    """All bloom rows, newest-wins per file, restricted to the probe's hash
    count (a row built with a different k is unreadable by a k-unrolled
    probe — its file simply stays un-bloom-pruned)."""
    d = bloom_dir(base_path)
    from .storage import get_storage
    st = get_storage(d)
    if not st.isdir(d):
        return None
    try:
        df = spark.read.parquet(d)
    except Exception:
        return None
    from pyspark.sql import Window
    w = Window.partitionBy("file_name").orderBy(F.col("instant").desc())
    return (df.filter(F.col("num_hashes") == num_hashes)
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1).drop("__rn", "instant"))


def probe_sql(num_hashes: int, key: str = "__bk", bits: str = "__bm",
              bitset: str = "__bs") -> str:
    """SQL predicate: every one of the k bits for ``key`` is set in
    ``bitset``. Generated as a SQL string because pyspark's shiftright()
    helper only takes literal shift amounts; the SQL function form takes
    columns. Catalyst CSEs the repeated hash subexpressions."""
    h1 = f"pmod(xxhash64({key}), {bits})"
    h2 = f"(pmod(xxhash64({key}, {_SEED}), {bits} - 1) + 1)"
    terms = []
    for i in range(num_hashes):
        pos = f"pmod({h1} + {i} * {h2}, {bits})"
        word = f"try_element_at({bitset}, cast({pos} div 64 as int) + 1)"
        terms.append(f"(shiftright({word}, cast(pmod({pos}, 64) as int)) & 1) = 1")
    return "(" + " AND ".join(terms) + ")"
