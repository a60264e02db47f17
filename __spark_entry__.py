"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

Determinism strategy for engine-semantics queries: the synthetic lineitem has
duplicate (l_orderkey, l_linenumber) keys, so every engine table is built from
a *deterministically deduped* base (window over a total per-key order); the
DuckDB oracle replicates the same dedupe as a CTE. Aggregates are computed as
``CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE)`` on both sides: decimal
summation is exact (order-independent), the final double cast keeps schemas
aligned.
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

TMP_ROOT = "/tmp/spark_graft_entry"

_BUILT: dict = {}   # (sf_dir, kind) -> build artifacts, reused across queries


# --------------------------------------------------------------------- utils
def _read(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{table}.parquet"))


def _dec_sum(col: str, alias: str, prec: str = "18,2"):
    return F.sum(F.col(col).cast(f"decimal({prec})")).cast("double").alias(alias)


def _n(alias: str = "n"):
    return F.count(F.lit(1)).cast("bigint").alias(alias)


def _li_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministically deduped lineitem (one row per key, total order)."""
    li = _read(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey", "l_linenumber").orderBy(
        F.desc("l_shipdate"), F.desc("l_quantity"), F.desc("l_extendedprice"),
        F.desc("l_suppkey"), F.desc("l_partkey"))
    return li.withColumn("_rn", F.row_number().over(w)).filter("_rn = 1").drop("_rn")


def _li_mut(base: DataFrame) -> DataFrame:
    return (base.filter(F.col("l_orderkey") % 10 == 0)
                .withColumn("l_quantity", F.col("l_quantity") + 1000.0))


def _root(sf_dir: str, kind: str) -> str:
    return os.path.join(TMP_ROOT, os.path.basename(sf_dir.rstrip("/")), kind)


def _fresh(path: str) -> str:
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    return path


# shared DuckDB CTE prefix replicating the engine-table build on lineitem
LI_CTES = """
base AS (
  SELECT * EXCLUDE (rn) FROM (
    SELECT *, row_number() OVER (PARTITION BY l_orderkey, l_linenumber
      ORDER BY l_shipdate DESC, l_quantity DESC, l_extendedprice DESC,
               l_suppkey DESC, l_partkey DESC) AS rn
    FROM lineitem) WHERE rn = 1),
mut AS (SELECT l_orderkey, l_linenumber, l_quantity + 1000.0 AS new_qty
        FROM base WHERE l_orderkey % 10 = 0),
cur AS (SELECT base.* REPLACE (coalesce(mut.new_qty, base.l_quantity) AS l_quantity)
        FROM base LEFT JOIN mut USING (l_orderkey, l_linenumber)),
final AS (SELECT * FROM cur WHERE l_orderkey % 100 <> 0)
"""


# key-range build: same deduped base, band upsert (q_bloom_key_range)
KR_CTES = """
base AS (
  SELECT * EXCLUDE (rn) FROM (
    SELECT *, row_number() OVER (PARTITION BY l_orderkey, l_linenumber
      ORDER BY l_shipdate DESC, l_quantity DESC, l_extendedprice DESC,
               l_suppkey DESC, l_partkey DESC) AS rn
    FROM lineitem) WHERE rn = 1),
kband AS (SELECT l_orderkey, l_linenumber, l_quantity + 5000.0 AS new_qty
          FROM base WHERE l_orderkey BETWEEN 1000 AND 1200),
kcur AS (SELECT base.* REPLACE (coalesce(kband.new_qty, base.l_quantity) AS l_quantity)
         FROM base LEFT JOIN kband USING (l_orderkey, l_linenumber))
"""


# ------------------------------------------------------------ engine builds
def _eng(spark):
    import sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from hudi_0_12_0_my_spark import Engine
    return Engine(spark)


def _build_cow(spark, sf_dir):
    """COW lineitem table: bulk_insert(base) -> upsert(mut) -> delete."""
    key = (sf_dir, "cow")
    if key not in _BUILT:
        base = _li_base(spark, sf_dir)
        t = _eng(spark).create_table(
            _fresh(_root(sf_dir, "cow")),
            record_key_fields=["l_orderkey", "l_linenumber"],
            precombine_field="l_shipdate", partition_field="l_shipdate",
            partition_style="timestamp", keygen_output_format="yyyy-MM")
        t.bulk_insert(base)
        t.upsert(_li_mut(base))
        t.delete(t.snapshot().filter(F.col("l_orderkey") % 100 == 0))
        commits = [i.time for i in t.timeline.completed_write_instants()]
        _BUILT[key] = (t, commits)
    return _BUILT[key]


def _build_mor(spark, sf_dir, compact: bool):
    kind = "mor_c" if compact else "mor"
    key = (sf_dir, kind)
    if key not in _BUILT:
        base = _li_base(spark, sf_dir)
        t = _eng(spark).create_table(
            _fresh(_root(sf_dir, kind)),
            record_key_fields=["l_orderkey", "l_linenumber"],
            precombine_field="l_shipdate", table_type="mor",
            partition_field="l_shipdate", partition_style="timestamp",
            keygen_output_format="yyyy-MM")
        t.bulk_insert(base)
        t.upsert(_li_mut(base))
        if compact:
            t.compact()
        _BUILT[key] = (t, [i.time for i in t.timeline.completed_write_instants()])
    return _BUILT[key]


def _build_orders(spark, sf_dir, kind: str, action) -> object:
    """Orders table partitioned by o_orderpriority, then one mutation op."""
    key = (sf_dir, kind)
    if key not in _BUILT:
        orders = _read(spark, sf_dir, "orders")
        t = _eng(spark).create_table(
            _fresh(_root(sf_dir, kind)),
            record_key_fields=["o_orderkey"], precombine_field="o_orderdate",
            partition_field="o_orderpriority")
        t.bulk_insert(orders)
        action(t, orders)
        _BUILT[key] = t
    return _BUILT[key]


# ------------------------------------------------------------------- queries
def q_cow_snapshot(spark, sf_dir):
    t, _ = _build_cow(spark, sf_dir)
    return (t.snapshot().groupBy("l_returnflag", "l_linestatus")
            .agg(_n(), _dec_sum("l_quantity", "sum_qty"),
                 _dec_sum("l_extendedprice", "sum_price")))


def q_cow_snapshot_orc(spark, sf_dir):
    """Same COW build with base_format='orc' (HoodieFileFormat ORC): bulk
    insert + upsert + delete over ORC base files through the same manifest,
    timeline, and key-range stats (write-side stats come from a column read
    instead of the parquet footer). The oracle is cow_snapshot's: formats
    must be result-invisible."""
    key = (sf_dir, "cow_orc")
    if key not in _BUILT:
        base = _li_base(spark, sf_dir)
        t = _eng(spark).create_table(
            _fresh(_root(sf_dir, "cow_orc")),
            record_key_fields=["l_orderkey", "l_linenumber"],
            precombine_field="l_shipdate", partition_field="l_shipdate",
            partition_style="timestamp", keygen_output_format="yyyy-MM",
            base_format="orc")
        t.bulk_insert(base)
        t.upsert(_li_mut(base))
        t.delete(t.snapshot().filter(F.col("l_orderkey") % 100 == 0))
        _BUILT[key] = t
    t = _BUILT[key]
    return (t.snapshot().groupBy("l_returnflag", "l_linestatus")
            .agg(_n(), _dec_sum("l_quantity", "sum_qty"),
                 _dec_sum("l_extendedprice", "sum_price")))


def q_cow_incremental(spark, sf_dir):
    t, commits = _build_cow(spark, sf_dir)
    inc = t.incremental(begin=commits[0], end=commits[1])
    return inc.groupBy("l_returnflag").agg(_n(), _dec_sum("l_quantity", "sum_qty"))


def q_cow_incremental_cdc(spark, sf_dir):
    """Read-side CDC diff over the whole build: upserted keys surface as
    `u` with before/after images, deleted keys as `d` with the before image
    (the state at `begin` is the bulk_insert base, so mutated-then-deleted
    keys report the BASE before image)."""
    t, commits = _build_cow(spark, sf_dir)
    cdc = t.incremental_cdc(begin=commits[0])

    def pick(f):
        return F.coalesce(F.col(f"after.{f}"), F.col(f"before.{f}"))

    return cdc.select(
        "op", pick("l_orderkey").alias("l_orderkey"),
        pick("l_linenumber").alias("l_linenumber"),
        F.col("before.l_quantity").cast("double").alias("before_qty"),
        F.col("after.l_quantity").cast("double").alias("after_qty"))


def q_cow_time_travel(spark, sf_dir):
    t, commits = _build_cow(spark, sf_dir)
    tt = t.time_travel(commits[0])
    return tt.groupBy("l_returnflag").agg(_n(), _dec_sum("l_quantity", "sum_qty"))


def q_cow_point_lookup(spark, sf_dir):
    t, _ = _build_cow(spark, sf_dir)
    # SQL-string filter feeds the column-stats file pruner before the scan
    return (t.snapshot(filters="l_orderkey >= 100 and l_orderkey <= 400")
            .select("l_orderkey", "l_linenumber",
                    F.col("l_quantity").cast("double").alias("qty")))


def q_mor_snapshot(spark, sf_dir):
    t, _ = _build_mor(spark, sf_dir, compact=False)
    return (t.snapshot().groupBy("l_returnflag", "l_linestatus")
            .agg(_n(), _dec_sum("l_quantity", "sum_qty")))


def q_format_hudi_snapshot(spark, sf_dir):
    """spark.read.format('hudi') batch COW snapshot (datasource.py, the
    reference quickstart surface: DefaultSource.scala / Python Data Source
    API): the standalone timeline fold + pyarrow read must see exactly the
    library reader's table state after bulk_insert -> upsert -> delete —
    same oracle as cow_snapshot, so any slice-selection or tombstone drift
    fails the hash."""
    t, _ = _build_cow(spark, sf_dir)
    df = spark.read.format("hudi").load(t.base_path)
    return (df.groupBy("l_returnflag", "l_linestatus")
            .agg(_n(), _dec_sum("l_quantity", "sum_qty"),
                 _dec_sum("l_extendedprice", "sum_price")))


def q_format_hudi_mor_snapshot(spark, sf_dir):
    """format('hudi') MOR snapshot: the executor-side arrow merge (sort by
    ordering fields desc + group-boundary mask) must replay the contested
    base+delta key resolution bit-for-bit — same oracle as mor_snapshot."""
    t, _ = _build_mor(spark, sf_dir, compact=False)
    df = spark.read.format("hudi").load(t.base_path)
    return (df.groupBy("l_returnflag", "l_linestatus")
            .agg(_n(), _dec_sum("l_quantity", "sum_qty")))


def q_format_hudi_incremental(spark, sf_dir):
    """format('hudi') incremental query type (datasource.py planner:
    newest-in-range-base-per-group + replaced-group exclusion, the
    reader.incremental rules): same commit window and oracle as
    cow_incremental, so any file-list or window drift fails the hash."""
    t, commits = _build_cow(spark, sf_dir)
    df = (spark.read.format("hudi")
          .option("hoodie.datasource.query.type", "incremental")
          .option("hoodie.datasource.read.begin.instanttime", commits[0])
          .option("hoodie.datasource.read.end.instanttime", commits[1])
          .load(t.base_path))
    return df.groupBy("l_returnflag").agg(_n(), _dec_sum("l_quantity", "sum_qty"))


def q_format_hudi_time_travel(spark, sf_dir):
    """format('hudi') as.of.instant time travel (datasource.py fold at
    as_of): same oracle as cow_time_travel."""
    t, commits = _build_cow(spark, sf_dir)
    df = spark.read.format("hudi").option("as.of.instant", commits[0]) \
        .load(t.base_path)
    return df.groupBy("l_returnflag").agg(_n(), _dec_sum("l_quantity", "sum_qty"))


def q_format_hudi_read_optimized(spark, sf_dir):
    """format('hudi') read_optimized query type (bases only, deltas
    ignored): same oracle as mor_read_optimized."""
    t, _ = _build_mor(spark, sf_dir, compact=False)
    df = (spark.read.format("hudi")
          .option("hoodie.datasource.query.type", "read_optimized")
          .load(t.base_path))
    return df.groupBy("l_returnflag").agg(_n(), _dec_sum("l_quantity", "sum_qty"))


def q_format_hudi_mor_incremental(spark, sf_dir):
    """format('hudi') incremental over a MOR delta window (datasource.py's
    delta-window merge branch — the trickier path: log rows resolve by
    version inside the window, no base rewrite to lean on): same commit
    window and oracle as mor_incremental."""
    t, commits = _build_mor(spark, sf_dir, compact=False)
    df = (spark.read.format("hudi")
          .option("hoodie.datasource.query.type", "incremental")
          .option("hoodie.datasource.read.begin.instanttime", commits[0])
          .option("hoodie.datasource.read.end.instanttime", commits[1])
          .load(t.base_path))
    return df.groupBy("l_returnflag").agg(_n(), _dec_sum("l_quantity",
                                                         "sum_qty"))


def q_format_hudi_write_insert(spark, sf_dir):
    """df.write.format('hudi') — the reference quickstart WRITE line
    (HoodieSparkSqlWriter.scala:68) through the Python Data Source writer
    (HudiFormatWriter: per-task parquet writes, driver-side commit fold):
    mode('overwrite') with the default operation (upsert degenerating to
    insert on the fresh table), read back through the format reader. The
    write must be lossless — oracle is insert_packing's plain aggregate
    over raw orders."""
    _eng(spark)                      # registers format("hudi")
    key = (sf_dir, "fmt_write")
    if key not in _BUILT:
        orders = _read(spark, sf_dir, "orders")
        base = _fresh(_root(sf_dir, "fmt_write"))
        (orders.write.format("hudi")
         .option("hoodie.datasource.write.recordkey.field", "o_orderkey")
         .option("hoodie.datasource.write.partitionpath.field",
                 "o_orderpriority")
         .option("hoodie.datasource.write.precombine.field", "o_orderdate")
         .option("hoodie.table.name", "fmt_write")
         .mode("overwrite").save(base))
        _BUILT[key] = base
    df = spark.read.format("hudi").load(_BUILT[key])
    return (df.groupBy("o_orderpriority")
            .agg(_n(), _dec_sum("o_totalprice", "sum_price")))


def q_mor_read_optimized(spark, sf_dir):
    t, _ = _build_mor(spark, sf_dir, compact=False)
    return (t.read_optimized().groupBy("l_returnflag")
            .agg(_n(), _dec_sum("l_quantity", "sum_qty")))


def q_mor_read_optimized_filtered(spark, sf_dir):
    """RO + filters runs the stats/bucket pruning path (always safe on RO:
    bases only by definition); result = pre-delta state under the filter."""
    t, _ = _build_mor(spark, sf_dir, compact=False)
    return (t.read_optimized(filters="l_orderkey >= 100 and l_orderkey <= 2000")
            .groupBy("l_returnflag")
            .agg(_n(), _dec_sum("l_quantity", "sum_qty")))


def q_mor_incremental(spark, sf_dir):
    t, commits = _build_mor(spark, sf_dir, compact=False)
    inc = t.incremental(begin=commits[0], end=commits[1])
    return inc.groupBy("l_returnflag").agg(_n(), _dec_sum("l_quantity", "sum_qty"))


def q_mor_compacted(spark, sf_dir):
    t, _ = _build_mor(spark, sf_dir, compact=True)
    return (t.read_optimized().groupBy("l_returnflag", "l_linestatus")
            .agg(_n(), _dec_sum("l_quantity", "sum_qty")))


def q_insert_overwrite(spark, sf_dir):
    def act(t, orders):
        urgent = (orders.filter(F.col("o_orderpriority") == "1-URGENT")
                        .withColumn("o_totalprice", F.col("o_totalprice") * 2))
        t.insert_overwrite(urgent)
    t = _build_orders(spark, sf_dir, "ord_io", act)
    return (t.snapshot().groupBy("o_orderpriority")
            .agg(_n(), _dec_sum("o_totalprice", "sum_price")))


def q_insert_overwrite_table(spark, sf_dir):
    """INSERT OVERWRITE TABLE (whole-table replace): only the overwrite
    batch survives, every prior file group is replaced."""
    def act(t, orders):
        keep = (orders.filter(F.col("o_orderkey") % 5 == 0)
                .withColumn("o_totalprice", F.col("o_totalprice") + 1.0))
        t.insert_overwrite_table(keep)
    t = _build_orders(spark, sf_dir, "ord_iot", act)
    return (t.snapshot().groupBy("o_orderpriority")
            .agg(_n(), _dec_sum("o_totalprice", "sum_price")))


def q_bootstrap_read(spark, sf_dir):
    """METADATA_ONLY bootstrap of the plain part.parquet: no data rewrite,
    meta columns synthesized at read (BootstrapMode.java:29-34)."""
    key = (sf_dir, "boot_part")
    if key not in _BUILT:
        _BUILT[key] = _eng(spark).bootstrap(
            _fresh(_root(sf_dir, "boot_part")),
            os.path.join(sf_dir, "part.parquet"), mode="METADATA_ONLY",
            record_key_fields=["p_partkey"], precombine_field="p_retailprice")
    t = _BUILT[key]
    return (t.snapshot().groupBy("p_brand")
            .agg(_n(), _dec_sum("p_retailprice", "sum_price")))


def q_global_index_upsert(spark, sf_dir):
    """Global-index upsert whose incoming rows CHANGE the partition value:
    the update lands in the stored partition (update_partition_path=false,
    HoodieGlobalSimpleIndex) — exactly one row per key survives, where a
    partition-local index would have produced a duplicate in the new
    partition."""
    key = (sf_dir, "ord_gl")
    if key not in _BUILT:
        orders = _read(spark, sf_dir, "orders")
        t = _eng(spark).create_table(
            _fresh(_root(sf_dir, "ord_gl")),
            record_key_fields=["o_orderkey"], precombine_field="o_orderdate",
            partition_field="o_orderpriority", global_index=True)
        t.bulk_insert(orders)
        moved = (orders.filter(F.col("o_orderkey") % 7 == 0)
                 .withColumn("o_orderpriority", F.lit("1-URGENT"))
                 .withColumn("o_totalprice", F.col("o_totalprice") + 1000.0))
        t.upsert(moved)
        _BUILT[key] = t
    t = _BUILT[key]
    return (t.snapshot()
            .agg(_n(), F.count_distinct("o_orderkey").cast("bigint")
                 .alias("n_keys"), _dec_sum("o_totalprice", "sum_price")))


def q_delete_partition(spark, sf_dir):
    t = _build_orders(spark, sf_dir, "ord_dp",
                      lambda t, o: t.delete_partition(["5-LOW"]))
    return t.snapshot().groupBy("o_orderpriority").agg(_n())


def q_merge_into(spark, sf_dir):
    def act(t, orders):
        upd = orders.filter(F.col("o_orderkey") % 3 == 0)
        ins = (orders.filter(F.col("o_orderkey") % 5 == 0)
               .withColumn("o_orderkey", F.col("o_orderkey") + 10000000)
               .withColumn("o_totalprice", F.col("o_totalprice") + 5))
        t.merge(upd.unionByName(ins), on="t.o_orderkey = s.o_orderkey",
                when_matched_update={"o_totalprice": "s.o_totalprice * 2"},
                matched_update_condition="s.o_orderstatus <> 'F'",
                when_matched_delete=True,
                matched_delete_condition="s.o_orderstatus = 'F'",
                when_not_matched_insert="*")
    t = _build_orders(spark, sf_dir, "ord_mi", act)
    return (t.snapshot().groupBy("o_orderstatus")
            .agg(_n(), _dec_sum("o_totalprice", "sum_price")))


def q_update_where(spark, sf_dir):
    t = _build_orders(
        spark, sf_dir, "ord_up",
        lambda t, o: t.update(set={"o_totalprice": "o_totalprice * 1.1"},
                              where="o_orderpriority = '2-HIGH'"))
    # scale 3: updated values are 3-decimal, so the decimal cast never hits a
    # .xx5 rounding tie (Spark HALF_UP vs DuckDB half-even would diverge)
    return (t.snapshot().groupBy("o_orderpriority")
            .agg(_n(), _dec_sum("o_totalprice", "sum_price", "18,3")))


def q_delete_where(spark, sf_dir):
    t = _build_orders(
        spark, sf_dir, "ord_del",
        lambda t, o: t.delete(where="o_orderstatus = 'F' AND o_orderkey % 2 = 0"))
    return t.snapshot().groupBy("o_orderstatus").agg(_n())


def q_precommit_guard(spark, sf_dir):
    """Pre-commit validators gate every write (SparkPreCommitValidator.java:48,
    SqlQueryEqualityPreCommitValidator.java:64): an equality validator on the
    key set admits a legitimate price update but rejects a key-losing delete,
    whose staged files are aborted before the commit lands. Final state =
    bulk insert + the surviving update only; DuckDB replays exactly that."""
    key = (sf_dir, "ord_pcv")
    if key not in _BUILT:
        orders = _read(spark, sf_dir, "orders")
        t = _eng(spark).create_table(
            _fresh(_root(sf_dir, "ord_pcv")),
            record_key_fields=["o_orderkey"], precombine_field="o_orderdate",
            partition_field="o_orderpriority",
            precommit_validators=[
                {"kind": "equality",
                 "queries": "SELECT o_orderkey FROM <TABLE_NAME>"}])
        t.bulk_insert(orders)
        t.upsert(orders.filter("o_orderkey % 7 = 0")
                 .withColumn("o_totalprice", F.col("o_totalprice") + F.lit(11.0))
                 .withColumn("o_orderdate",
                             F.col("o_orderdate") + F.expr("INTERVAL 1 DAYS")))
        from hudi_0_12_0_my_spark.services.validators import (
            PreCommitValidationError)
        try:
            t.delete(where="o_orderkey % 2 = 0")
            raise AssertionError("equality validator failed to reject the "
                                 "key-losing delete")
        except PreCommitValidationError:
            pass
        _BUILT[key] = t
    t = _BUILT[key]
    return (t.snapshot().groupBy("o_orderpriority")
            .agg(_n(), _dec_sum("o_totalprice", "sum_price")))


def q_payload_event_time(spark, sf_dir):
    """DefaultHoodieRecordPayload semantics: stored survives when its ordering
    value >= incoming (DefaultHoodieRecordPayload.java:115-126)."""
    def act(t, orders):
        stale = (orders.filter(F.col("o_orderkey") % 4 == 0)
                 .withColumn("o_totalprice", F.lit(-1.0))
                 .withColumn("o_orderdate",
                             F.col("o_orderdate") - F.expr("INTERVAL 1000 DAYS")))
        fresh = (orders.filter(F.col("o_orderkey") % 4 == 1)
                 .withColumn("o_totalprice", F.col("o_totalprice") + 7777.0)
                 .withColumn("o_orderdate",
                             F.col("o_orderdate") + F.expr("INTERVAL 1000 DAYS")))
        t.upsert(stale.unionByName(fresh))
    key = (sf_dir, "ord_et")
    if key not in _BUILT:
        orders = _read(spark, sf_dir, "orders")
        t = _eng(spark).create_table(
            _fresh(_root(sf_dir, "ord_et")),
            record_key_fields=["o_orderkey"], precombine_field="o_orderdate",
            partition_field="o_orderpriority", payload="event_time")
        t.bulk_insert(orders)
        act(t, orders)
        _BUILT[key] = t
    t = _BUILT[key]
    return (t.snapshot().groupBy("o_orderpriority")
            .agg(_n(), _dec_sum("o_totalprice", "sum_price")))


def q_payload_partial_update(spark, sf_dir):
    """OverwriteNonDefaultsWithLatestAvroPayload: per column, latest non-null
    wins — null incoming columns keep the stored value."""
    key = (sf_dir, "ord_pu")
    if key not in _BUILT:
        orders = _read(spark, sf_dir, "orders")
        t = _eng(spark).create_table(
            _fresh(_root(sf_dir, "ord_pu")),
            record_key_fields=["o_orderkey"], precombine_field="o_orderdate",
            partition_field="o_orderpriority", payload="partial_update")
        t.bulk_insert(orders)
        patch = (orders.filter(F.col("o_orderkey") % 3 == 0)
                 .withColumn("o_orderstatus", F.lit("X"))
                 .withColumn("o_totalprice", F.lit(None).cast("double"))
                 .withColumn("o_orderdate",
                             F.col("o_orderdate") + F.expr("INTERVAL 1000 DAYS")))
        t.upsert(patch)
        _BUILT[key] = t
    t = _BUILT[key]
    return (t.snapshot().groupBy("o_orderstatus")
            .agg(_n(), _dec_sum("o_totalprice", "sum_price")))


def q_cdc_ops(spark, sf_dir):
    """CDC I/U/D envelope -> upsert/delete (StringToRowDataMapFunction.java:110,
    AWSDmsAvroPayload.java:95)."""
    key = (sf_dir, "ord_cdc")
    if key not in _BUILT:
        import sys
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from hudi_0_12_0_my_spark import payloads
        orders = _read(spark, sf_dir, "orders")
        t = _eng(spark).create_table(
            _fresh(_root(sf_dir, "ord_cdc")),
            record_key_fields=["o_orderkey"], precombine_field="o_orderdate",
            partition_field="o_orderpriority")
        t.bulk_insert(orders)
        upd = (orders.filter(F.col("o_orderkey") % 5 == 0)
               .withColumn("o_totalprice", F.col("o_totalprice") * 3)
               .withColumn("op", F.lit("U")))
        dele = (orders.filter((F.col("o_orderkey") % 5 != 0)
                              & (F.col("o_orderkey") % 7 == 0))
                .withColumn("op", F.lit("D")))
        ins = (orders.filter(F.col("o_orderkey") % 11 == 0)
               .withColumn("o_orderkey", F.col("o_orderkey") + 20000000)
               .withColumn("op", F.lit("I")))
        batch = upd.unionByName(dele).unionByName(ins)
        t.upsert(payloads.apply_cdc_ops(batch))
        _BUILT[key] = t
    t = _BUILT[key]
    return (t.snapshot().groupBy("o_orderpriority")
            .agg(_n(), _dec_sum("o_totalprice", "sum_price")))


def q_clustering_zorder(spark, sf_dir):
    """Z-order clustering is layout-only: results must be identical to the
    pre-clustering table (SparkSortAndSizeExecutionStrategy + z-order keys)."""
    key = (sf_dir, "li_zorder")
    if key not in _BUILT:
        base = _li_base(spark, sf_dir)
        t = _eng(spark).create_table(
            _fresh(_root(sf_dir, "li_zorder")),
            record_key_fields=["l_orderkey", "l_linenumber"],
            precombine_field="l_shipdate", partition_field="l_shipdate",
            partition_style="timestamp", keygen_output_format="yyyy")
        t.bulk_insert(base)
        t.cluster(sort_cols=["l_partkey", "l_suppkey"], layout="zorder")
        _BUILT[key] = t
    t = _BUILT[key]
    return (t.snapshot().groupBy("l_returnflag")
            .agg(_n(), _dec_sum("l_quantity", "sum_qty"),
                 _dec_sum("l_extendedprice", "sum_price")))


def q_cleaning(spark, sf_dir):
    """KEEP_LATEST_FILE_VERSIONS cleaning removes obsolete slices without
    changing query results (CleanPlanner.java:74)."""
    key = (sf_dir, "li_clean")
    if key not in _BUILT:
        base = _li_base(spark, sf_dir)
        t = _eng(spark).create_table(
            _fresh(_root(sf_dir, "li_clean")),
            record_key_fields=["l_orderkey", "l_linenumber"],
            precombine_field="l_shipdate", partition_field="l_shipdate",
            partition_style="timestamp", keygen_output_format="yyyy")
        t.bulk_insert(base)
        t.upsert(_li_mut(base))
        t.clean(policy="KEEP_LATEST_FILE_VERSIONS", retain=1)
        _BUILT[key] = t
    t = _BUILT[key]
    return (t.snapshot().groupBy("l_returnflag")
            .agg(_n(), _dec_sum("l_quantity", "sum_qty")))


def q_rollback(spark, sf_dir):
    """Rollback of the latest commit restores the previous snapshot
    (rollback/ MarkerBasedRollbackStrategy)."""
    key = (sf_dir, "li_rb")
    if key not in _BUILT:
        base = _li_base(spark, sf_dir)
        t = _eng(spark).create_table(
            _fresh(_root(sf_dir, "li_rb")),
            record_key_fields=["l_orderkey", "l_linenumber"],
            precombine_field="l_shipdate", partition_field="l_shipdate",
            partition_style="timestamp", keygen_output_format="yyyy")
        t.bulk_insert(base)
        t.upsert(_li_mut(base))
        t.rollback(t.latest_instant())
        _BUILT[key] = t
    t = _BUILT[key]
    return (t.snapshot().groupBy("l_returnflag")
            .agg(_n(), _dec_sum("l_quantity", "sum_qty")))


def q_savepoint_restore(spark, sf_dir):
    """Savepoint + restore pins and recovers a past table state
    (savepoint/ + restore/ RestoreActionExecutor)."""
    key = (sf_dir, "li_sp")
    if key not in _BUILT:
        base = _li_base(spark, sf_dir)
        t = _eng(spark).create_table(
            _fresh(_root(sf_dir, "li_sp")),
            record_key_fields=["l_orderkey", "l_linenumber"],
            precombine_field="l_shipdate", partition_field="l_shipdate",
            partition_style="timestamp", keygen_output_format="yyyy")
        t.bulk_insert(base)
        sp = t.savepoint()
        t.upsert(_li_mut(base))
        t.upsert(_li_mut(base).withColumn("l_quantity",
                                          F.col("l_quantity") + 5))
        t.restore(sp)
        _BUILT[key] = t
    t = _BUILT[key]
    return (t.snapshot().groupBy("l_returnflag")
            .agg(_n(), _dec_sum("l_quantity", "sum_qty")))


def q_bucket_index(spark, sf_dir):
    """Bucket-index table (hash(key) -> fixed file group, no tagging join):
    same results as the simple-index path."""
    key = (sf_dir, "li_bucket")
    if key not in _BUILT:
        base = _li_base(spark, sf_dir)
        t = _eng(spark).create_table(
            _fresh(_root(sf_dir, "li_bucket")),
            record_key_fields=["l_orderkey", "l_linenumber"],
            precombine_field="l_shipdate", partition_field="l_shipdate",
            partition_style="timestamp", keygen_output_format="yyyy",
            index_type="bucket", num_buckets=8)
        t.upsert(base)
        t.upsert(_li_mut(base))
        _BUILT[key] = t
    t = _BUILT[key]
    return (t.snapshot().groupBy("l_returnflag", "l_linestatus")
            .agg(_n(), _dec_sum("l_quantity", "sum_qty")))


def q_bucket_point_lookup(spark, sf_dir):
    """Point lookups on a single-key bucket table: the =/IN predicate pins
    the pmod bucket so only matching file groups are scanned (the read-side
    counterpart of bucket routing; verified by plan tests — this gate
    checks the pruned path returns exactly the right rows)."""
    key = (sf_dir, "ord_bucket")
    if key not in _BUILT:
        orders = _read(spark, sf_dir, "orders")
        w = Window.partitionBy("o_orderkey").orderBy(
            F.desc("o_orderdate"), F.desc("o_totalprice"), F.desc("o_custkey"))
        ded = orders.withColumn("_rn", F.row_number().over(w)) \
                    .filter("_rn = 1").drop("_rn")
        t = _eng(spark).create_table(
            _fresh(_root(sf_dir, "ord_bucket")),
            record_key_fields=["o_orderkey"], precombine_field="o_orderdate",
            partition_field="o_orderpriority",
            index_type="bucket", num_buckets=8)
        t.upsert(ded)
        _BUILT[key] = t
    t = _BUILT[key]
    return (t.snapshot(filters="o_orderkey in (7, 32, 4357)")
            .select("o_orderkey", "o_custkey",
                    F.col("o_totalprice").cast("double").alias("price")))


def q_bucket_consistent(spark, sf_dir):
    """Consistent-hashing bucket index: upsert -> split every bucket ->
    upsert again; snapshot must equal the simple-index result."""
    key = (sf_dir, "li_bucket_ch")
    if key not in _BUILT:
        base = _li_base(spark, sf_dir)
        t = _eng(spark).create_table(
            _fresh(_root(sf_dir, "li_bucket_ch")),
            record_key_fields=["l_orderkey", "l_linenumber"],
            precombine_field="l_shipdate", partition_field="l_shipdate",
            partition_style="timestamp", keygen_output_format="yyyy",
            index_type="bucket_consistent", num_buckets=4)
        t.upsert(base)
        t.resize_buckets(split_above=1)      # 4 -> 8 nodes per partition
        t = t.reload()
        t.upsert(_li_mut(base))
        _BUILT[key] = t
    t = _BUILT[key]
    return (t.snapshot().groupBy("l_returnflag", "l_linestatus")
            .agg(_n(), _dec_sum("l_quantity", "sum_qty")))


def q_clustering_hilbert(spark, sf_dir):
    """Hilbert-curve clustering, same layout-only invariant as z-order
    (HilbertCurveUtils.java:29, SpaceCurveSortingHelper.java:64)."""
    key = (sf_dir, "li_hilbert")
    if key not in _BUILT:
        base = _li_base(spark, sf_dir)
        t = _eng(spark).create_table(
            _fresh(_root(sf_dir, "li_hilbert")),
            record_key_fields=["l_orderkey", "l_linenumber"],
            precombine_field="l_shipdate", partition_field="l_shipdate",
            partition_style="timestamp", keygen_output_format="yyyy")
        t.bulk_insert(base)
        t.cluster(sort_cols=["l_partkey", "l_suppkey"], layout="hilbert")
        _BUILT[key] = t
    t = _BUILT[key]
    return (t.snapshot().groupBy("l_linestatus")
            .agg(_n(), _dec_sum("l_extendedprice", "sum_price")))


def q_insert_packing(spark, sf_dir):
    """Three sequential INSERTs (no index lookup; small-file bin packing,
    UpsertPartitioner.java:94-178) — final state = all rows."""
    key = (sf_dir, "ord_ins")
    if key not in _BUILT:
        orders = _read(spark, sf_dir, "orders")
        t = _eng(spark).create_table(
            _fresh(_root(sf_dir, "ord_ins")),
            record_key_fields=["o_orderkey"], precombine_field="o_orderdate",
            partition_field="o_orderpriority")
        for i in range(3):
            t.insert(orders.filter(F.col("o_orderkey") % 3 == i))
        _BUILT[key] = t
    t = _BUILT[key]
    return (t.snapshot().groupBy("o_orderpriority")
            .agg(_n(), _dec_sum("o_totalprice", "sum_price")))


def q_schema_evolution(spark, sf_dir):
    """ALTER TABLE add + rename with mixed-era files
    (AlterHoodieTableAddColumnsCommand / ChangeColumnCommand, TableChanges
    rename actions): files written before the rename surface their values
    under the new name; the added column backfills null. Oracle replays the
    same mutations relationally."""
    key = (sf_dir, "part_evo")
    if key not in _BUILT:
        part = _read(spark, sf_dir, "part")
        t = _eng(spark).create_table(
            _fresh(_root(sf_dir, "part_evo")),
            record_key_fields=["p_partkey"], precombine_field="p_size")
        t.bulk_insert(part)
        t.add_column("note", "string")
        t.rename_column("p_retailprice", "price")
        mut = (part.filter(F.col("p_partkey") % 10 == 0)
               .select(F.col("p_partkey"), F.col("p_name"), F.col("p_brand"),
                       F.col("p_type"), F.col("p_size"),
                       (F.col("p_retailprice") * 2).alias("price"),
                       F.lit("adjusted").alias("note")))
        t.upsert(mut)
        _BUILT[key] = t
    t = _BUILT[key]
    return (t.snapshot().groupBy("p_brand")
            .agg(_n(), _dec_sum("price", "sum_price"),
                 F.count("note").cast("bigint").alias("n_notes")))


def q_schema_evolution_widen(spark, sf_dir):
    """ALTER TABLE CHANGE COLUMN type widen with mixed-era files
    (AlterHoodieTableChangeColumnCommand.scala:37-94): era-1 files store
    p_size as int32, the DDL widens the registered type to bigint WITHOUT
    rewriting data, era-2 rows land with values beyond the int32 range.
    One snapshot aggregates both eras; the oracle replays the mutation
    relationally on the wide type."""
    key = (sf_dir, "part_widen")
    if key not in _BUILT:
        part = _read(spark, sf_dir, "part")
        eng = _eng(spark)
        t = eng.create_table(
            _fresh(_root(sf_dir, "part_widen")), name="part_widen",
            record_key_fields=["p_partkey"], precombine_field="p_retailprice")
        t.bulk_insert(part.select("p_partkey", "p_brand",
                                  F.col("p_size").cast("int").alias("p_size"),
                                  "p_retailprice"))
        eng.sql("ALTER TABLE part_widen CHANGE COLUMN p_size p_size BIGINT")
        mut = (part.filter(F.col("p_partkey") % 7 == 0)
               .select("p_partkey", "p_brand",
                       (F.col("p_size").cast("bigint")
                        + F.lit(5_000_000_000)).alias("p_size"),
                       "p_retailprice"))
        t.upsert(mut)
        _BUILT[key] = t
    t = _BUILT[key]
    return (t.snapshot().groupBy("p_brand")
            .agg(_n(), F.sum("p_size").cast("bigint").alias("sum_size")))


def q_schema_evolution_drop(spark, sf_dir):
    """ALTER TABLE DROP COLUMN + column reorder with mixed-era files
    (TableChanges.java delete / ColumnPositionChange actions): era-1 files
    physically carry p_type; the DDL drops it registry-only (no rewrite —
    reads stop projecting the column, parquet prunes it at the footer), a
    reorder moves p_brand FIRST, and an era-2 writer still sending p_type
    lands after the drop with those values discarded (Avro projection
    semantics). The snapshot must expose no p_type on either era; the
    oracle replays the surviving mutation relationally."""
    key = (sf_dir, "part_drop")
    if key not in _BUILT:
        part = _read(spark, sf_dir, "part")
        eng = _eng(spark)
        t = eng.create_table(
            _fresh(_root(sf_dir, "part_drop")), name="part_drop",
            record_key_fields=["p_partkey"], precombine_field="p_retailprice")
        t.bulk_insert(part.select("p_partkey", "p_brand", "p_type",
                                  "p_size", "p_retailprice"))
        eng.sql("ALTER TABLE part_drop DROP COLUMN p_type")
        eng.sql("ALTER TABLE part_drop ALTER COLUMN p_brand FIRST")
        mut = (part.filter(F.col("p_partkey") % 6 == 0)
               .select("p_partkey", "p_brand", "p_type",
                       (F.col("p_size") + 100).alias("p_size"),
                       "p_retailprice"))
        t.reload().upsert(mut)
        _BUILT[key] = t
    t = _BUILT[key]
    snap = t.snapshot()
    if "p_type" in snap.columns:
        raise AssertionError("dropped column p_type resurfaced in snapshot")
    if snap.columns[0] != "p_brand":
        raise AssertionError("reorder: p_brand is not the first column")
    return (snap.groupBy("p_brand")
            .agg(_n(), F.sum("p_size").cast("bigint").alias("sum_size")))


def q_truncate_insert(spark, sf_dir):
    """TRUNCATE TABLE (TruncateHoodieTableCommand -> whole-table
    replacecommit) then re-insert: only the post-truncate rows survive."""
    key = (sf_dir, "supp_trunc")
    if key not in _BUILT:
        supp = _read(spark, sf_dir, "supplier")
        eng = _eng(spark)
        t = eng.create_table(
            _fresh(_root(sf_dir, "supp_trunc")), name="supp_trunc",
            record_key_fields=["s_suppkey"], precombine_field="s_nationkey")
        t.insert(supp)
        eng.sql("TRUNCATE TABLE supp_trunc")
        t.insert(supp.filter(F.col("s_suppkey") % 2 == 0))
        _BUILT[key] = t
    t = _BUILT[key]
    return (t.snapshot().groupBy("s_nationkey")
            .agg(_n(), _dec_sum("s_acctbal", "sum_bal")))


def q_archived_timeline_read(spark, sf_dir):
    """Archival (HoodieTimelineArchiver): after folding old instants into a
    manifest checkpoint, snapshot reads still serve the exact final state
    (the ADVICE-r1 bug class: a checkpoint folded past its boundary served
    rolled-back slices). Four upserts + archive(retain_active=2), state
    oracle-checked."""
    key = (sf_dir, "nat_arch")
    if key not in _BUILT:
        nation = _read(spark, sf_dir, "nation")
        t = _eng(spark).create_table(
            _fresh(_root(sf_dir, "nat_arch")),
            record_key_fields=["n_nationkey"], precombine_field="n_regionkey")
        t.bulk_insert(nation)
        for i in range(1, 5):
            mut = (t.snapshot().filter(F.col("n_regionkey") == i % 5)
                   .withColumn("n_name", F.concat(F.col("n_name"), F.lit("+"))))
            t.upsert(mut)
        t.archive(retain_active=2)
        _BUILT[key] = t.reload()
    t = _BUILT[key]
    return t.snapshot().select("n_nationkey", "n_name", "n_regionkey")


def q_change_feed_batch(spark, sf_dir):
    """Batch change-feed via the Python Data Source
    (spark.read.format('hudi_stream')): RAW change rows of commits after the
    bulk insert. A row rewritten unchanged by a later commit keeps its
    original commit time and so appears once per surviving file — the feed
    contract is raw per-file rows; the query dedupes on (key, commit_time)
    to land on the exact upserted set, which the oracle replays."""
    from hudi_0_12_0_my_spark.streaming import register_stream_source
    t, commits = _build_cow(spark, sf_dir)
    register_stream_source(spark)
    df = (spark.read.format("hudi_stream")
          .option("path", t.base_path)
          .option("begininstant", commits[0]).load())
    return (df.dropDuplicates(["l_orderkey", "l_linenumber",
                               "_hoodie_commit_time"])
            .groupBy("l_returnflag")
            .agg(_n(), _dec_sum("l_quantity", "sum_qty")))


def q_streaming_cdc_ingest(spark, sf_dir):
    """Fork-parity, oracle-exact: JSON-lines CDC events (I/U/D ops + seq
    precombine) streamed through the config-driven ingest
    (HoodieFlinkStreamerWithApollo / StringToRowDataMapFunction semantics,
    availableNow trigger) into a table; the snapshot must equal the folded
    CDC state. Inserts for every order, +1000 updates for keys % 5 == 0,
    deletes for keys % 7 == 0 (disjoint from updates)."""
    key = (sf_dir, "stream_cdc")
    if key not in _BUILT:
        import json as _json
        from hudi_0_12_0_my_spark.streaming.ingest import (
            TableStreamConfig, start_table_stream)
        orders = _read(spark, sf_dir, "orders").select(
            "o_orderkey", "o_totalprice", "o_orderpriority").collect()
        root = _fresh(_root(sf_dir, "stream_cdc"))
        src = os.path.join(root, "in")
        os.makedirs(src)
        with open(os.path.join(src, "b1.json"), "w") as fh:
            for r in orders:
                fh.write(_json.dumps(
                    {"o_orderkey": r.o_orderkey,
                     "o_totalprice": r.o_totalprice,
                     "o_orderpriority": r.o_orderpriority,
                     "seq": 1, "op": "I"}) + "\n")
        with open(os.path.join(src, "b2.json"), "w") as fh:
            for r in orders:
                if r.o_orderkey % 5 == 0:
                    fh.write(_json.dumps(
                        {"o_orderkey": r.o_orderkey,
                         "o_totalprice": r.o_totalprice + 1000.0,
                         "o_orderpriority": r.o_orderpriority,
                         "seq": 2, "op": "U"}) + "\n")
                elif r.o_orderkey % 7 == 0:
                    fh.write(_json.dumps(
                        {"o_orderkey": r.o_orderkey, "seq": 2,
                         "op": "D"}) + "\n")
        eng = _eng(spark)
        tc = TableStreamConfig(
            name="stream_cdc", base_path=os.path.join(root, "tbl"),
            fields=[{"name": "o_orderkey", "type": "bigint"},
                    {"name": "o_totalprice", "type": "double"},
                    {"name": "o_orderpriority", "type": "string"},
                    {"name": "seq", "type": "int"}],
            record_key_fields=["o_orderkey"], precombine_field="seq",
            source={"format": "json-files", "path": src})
        q = start_table_stream(eng, tc, os.path.join(root, "ck"),
                               trigger={"availableNow": True})
        q.awaitTermination(180)
        _BUILT[key] = eng.load_table(tc.base_path)
    t = _BUILT[key]
    return (t.snapshot().groupBy("o_orderpriority")
            .agg(_n(), _dec_sum("o_totalprice", "sum_price")))


# ---- relational queries over raw parquet (Catalyst does the work)
def q_q1_pricing(spark, sf_dir):
    li = _read(spark, sf_dir, "lineitem")
    # scale 4: price(2dp) * (1-discount)(2dp) is an exact 4-decimal value, so
    # the double->decimal cast is tie-free in both engines
    disc_price = (F.col("l_extendedprice") * (1 - F.col("l_discount"))) \
        .cast("decimal(18,4)")
    return (li.filter(F.col("l_shipdate") <= "2000-09-02")
            .groupBy("l_returnflag", "l_linestatus")
            .agg(_n("count_order"), _dec_sum("l_quantity", "sum_qty"),
                 _dec_sum("l_extendedprice", "sum_base_price"),
                 F.sum(disc_price).cast("double").alias("sum_disc_price")))


def q_q6_revenue(spark, sf_dir):
    li = _read(spark, sf_dir, "lineitem")
    rev = (F.col("l_extendedprice") * F.col("l_discount")).cast("decimal(18,4)")
    return (li.filter((F.col("l_shipdate") >= "1996-01-01")
                      & (F.col("l_shipdate") < "1997-01-01")
                      & F.col("l_discount").between(0.05, 0.07)
                      & (F.col("l_quantity") < 24))
            .agg(F.sum(rev).cast("double").alias("revenue"), _n()))


def q_q12_shipmode(spark, sf_dir):
    """TPC-H Q12 shape (adapted to the synthetic schema, which has no
    shipmode/commitdate): late-shipped lines bucketed by order priority."""
    li = _read(spark, sf_dir, "lineitem")
    orders = _read(spark, sf_dir, "orders")
    hi = F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1) \
        .otherwise(0).cast("long")
    lo = F.when(~F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1) \
        .otherwise(0).cast("long")
    return (li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
            .filter((F.col("l_shipdate") >= "1996-01-01")
                    & (F.col("l_shipdate") < "1997-01-01")
                    & (F.col("l_shipdate") > F.col("o_orderdate")))
            .groupBy("l_returnflag")
            .agg(F.sum(hi).alias("high_line_count"),
                 F.sum(lo).alias("low_line_count")))


def q_q14_promo(spark, sf_dir):
    """TPC-H Q14 shape: promo revenue share; part side broadcast."""
    li = _read(spark, sf_dir, "lineitem")
    part = _read(spark, sf_dir, "part")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))) \
        .cast("decimal(18,4)")
    promo = F.when(F.col("p_type").startswith("PROMO"), rev) \
        .otherwise(F.lit(0).cast("decimal(18,4)"))
    return (li.filter((F.col("l_shipdate") >= "1996-01-01")
                      & (F.col("l_shipdate") < "1996-07-01"))
            .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
            .agg(F.sum(promo).cast("double").alias("promo_revenue"),
                 F.sum(rev).cast("double").alias("total_revenue"), _n()))


def q_q3_top10(spark, sf_dir):
    cust = _read(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _read(spark, sf_dir, "orders")
    li = _read(spark, sf_dir, "lineitem")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
    return (li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
            .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
            .filter((F.col("o_orderdate") < "1998-03-15")
                    & (F.col("l_shipdate") > "1998-03-15"))
            .groupBy("o_orderkey", "o_orderdate")
            .agg(F.sum(rev).cast("double").alias("revenue"))
            .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
            .limit(10))


def q_q5_nation_volume(spark, sf_dir):
    nation = _read(spark, sf_dir, "nation")
    cust = _read(spark, sf_dir, "customer")
    supp = _read(spark, sf_dir, "supplier")
    orders = _read(spark, sf_dir, "orders")
    li = _read(spark, sf_dir, "lineitem")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
    return (li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
            .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
            .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
            .filter(F.col("c_nationkey") == F.col("s_nationkey"))
            .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
            .groupBy("n_name")
            .agg(F.sum(rev).cast("double").alias("revenue"), _n()))


def q_q4_order_priority(spark, sf_dir):
    """TPC-H Q4 shape (synthetic schema has no commitdate, so "late" =
    shipped after the order date): orders placed in 1996Q3 with at least one
    late line, counted per priority. EXISTS becomes a left-semi join, so the
    orders side is never duplicated and only (l_orderkey, l_shipdate) is
    scanned from lineitem."""
    orders = _read(spark, sf_dir, "orders")
    li = _read(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = orders.filter((F.col("o_orderdate") >= "1996-07-01")
                      & (F.col("o_orderdate") < "1996-10-01"))
    j = o.join(li, (F.col("l_orderkey") == F.col("o_orderkey"))
               & (F.col("l_shipdate") > F.col("o_orderdate")), "left_semi")
    return j.groupBy("o_orderpriority").agg(_n("order_count"))


def q_q7_volume(spark, sf_dir):
    """TPC-H Q7: bilateral shipping volume between two nations by year.
    All dimension sides broadcast; lineitem never shuffles before the agg."""
    nation = _read(spark, sf_dir, "nation")
    supp = _read(spark, sf_dir, "supplier")
    cust = _read(spark, sf_dir, "customer")
    orders = _read(spark, sf_dir, "orders")
    li = _read(spark, sf_dir, "lineitem")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
    n1 = nation.select(F.col("n_nationkey").alias("s_nk"),
                       F.col("n_name").alias("supp_nation"))
    n2 = nation.select(F.col("n_nationkey").alias("c_nk"),
                       F.col("n_name").alias("cust_nation"))
    return (li.filter((F.col("l_shipdate") >= "1996-01-01")
                      & (F.col("l_shipdate") < "1998-01-01"))
            .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
            .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
            .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
            .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
            .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
            .filter(((F.col("supp_nation") == "NATION_1")
                     & (F.col("cust_nation") == "NATION_2"))
                    | ((F.col("supp_nation") == "NATION_2")
                       & (F.col("cust_nation") == "NATION_1")))
            .groupBy("supp_nation", "cust_nation",
                     F.year("l_shipdate").cast("int").alias("l_year"))
            .agg(F.sum(rev).cast("double").alias("revenue"), _n()))


def q_q8_market_share(spark, sf_dir):
    """TPC-H Q8: NATION_3's share of ECONOMY-part volume sold into ASIA.
    The share division runs over two exact decimal sums cast to double, so
    both engines compute bit-identical quotients."""
    nation = _read(spark, sf_dir, "nation")
    region = _read(spark, sf_dir, "region")
    part = _read(spark, sf_dir, "part")
    supp = _read(spark, sf_dir, "supplier")
    cust = _read(spark, sf_dir, "customer")
    orders = _read(spark, sf_dir, "orders")
    li = _read(spark, sf_dir, "lineitem")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
    n1 = nation.select(F.col("n_nationkey").alias("s_nk"),
                       F.col("n_name").alias("supp_nation"))
    n2 = nation.select(F.col("n_nationkey").alias("c_nk"),
                       F.col("n_regionkey").alias("c_rk"))
    an = (li.join(F.broadcast(part.filter(F.col("p_type") == "ECONOMY")),
                  F.col("l_partkey") == F.col("p_partkey"))
          .join(orders.filter((F.col("o_orderdate") >= "1996-01-01")
                              & (F.col("o_orderdate") < "1998-01-01")),
                F.col("l_orderkey") == F.col("o_orderkey"))
          .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
          .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
          .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
          .join(F.broadcast(region.filter(F.col("r_name") == "ASIA")),
                F.col("c_rk") == F.col("r_regionkey"))
          .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
          .select(F.year("o_orderdate").cast("int").alias("o_year"),
                  rev.alias("rev"), "supp_nation"))
    nat = F.when(F.col("supp_nation") == "NATION_3", F.col("rev")) \
        .otherwise(F.lit(0).cast("decimal(18,4)"))
    out = (an.groupBy("o_year")
           .agg(F.sum(nat).cast("double").alias("nat_rev"),
                F.sum("rev").cast("double").alias("total_rev")))
    return out.withColumn("mkt_share", F.col("nat_rev") / F.col("total_rev"))


def q_q10_returned(spark, sf_dir):
    """TPC-H Q10: top-20 customers by returned-item revenue in 1996Q1.
    Decimal-exact revenue ordering with c_custkey tie-break keeps the limit
    boundary deterministic across engines."""
    nation = _read(spark, sf_dir, "nation")
    cust = _read(spark, sf_dir, "customer")
    orders = _read(spark, sf_dir, "orders")
    li = _read(spark, sf_dir, "lineitem")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
    return (li.filter(F.col("l_returnflag") == "R")
            .join(orders.filter((F.col("o_orderdate") >= "1996-01-01")
                                & (F.col("o_orderdate") < "1996-04-01")),
                  F.col("l_orderkey") == F.col("o_orderkey"))
            .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
            .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
            .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
            .agg(F.sum(rev).alias("rev_dec"))
            .orderBy(F.desc("rev_dec"), F.asc("c_custkey")).limit(20)
            .select("c_custkey", "c_name", "c_acctbal", "n_name",
                    F.col("rev_dec").cast("double").alias("revenue")))


def q_q13_custdist(spark, sf_dir):
    """TPC-H Q13: distribution of per-customer order counts, excluding
    urgent orders via the join condition (so zero-order customers survive
    the LEFT join into the c_count=0 bucket)."""
    cust = _read(spark, sf_dir, "customer")
    orders = _read(spark, sf_dir, "orders")
    per = (cust.join(orders,
                     (F.col("c_custkey") == F.col("o_custkey"))
                     & (F.col("o_orderpriority") != "1-URGENT"), "left")
           .groupBy("c_custkey")
           .agg(F.count("o_orderkey").cast("bigint").alias("c_count")))
    return per.groupBy("c_count").agg(_n("custdist"))


def q_q15_top_supplier(spark, sf_dir):
    """TPC-H Q15: supplier(s) with the maximum quarterly revenue. The max
    comparison happens on exact decimal sums (no double ties), matching the
    reference view+subquery formulation."""
    supp = _read(spark, sf_dir, "supplier")
    li = _read(spark, sf_dir, "lineitem")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
    r0 = (li.filter((F.col("l_shipdate") >= "1996-01-01")
                    & (F.col("l_shipdate") < "1996-04-01"))
          .groupBy("l_suppkey").agg(F.sum(rev).alias("total_dec")))
    mx = r0.agg(F.max("total_dec").alias("mx"))
    return (r0.join(F.broadcast(mx), F.col("total_dec") == F.col("mx"))
            .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
            .select("s_suppkey", "s_name",
                    F.col("total_dec").cast("double").alias("total_revenue")))


def q_q17_small_qty(spark, sf_dir):
    """TPC-H Q17: revenue lost to small-quantity orders for one brand. The
    correlated avg-quantity subquery becomes a per-part aggregate joined
    back; the 20%-of-avg comparison is algebraically cleared of division
    (5*cnt*qty < sum) so both engines evaluate the same IEEE products."""
    part = _read(spark, sf_dir, "part")
    li = _read(spark, sf_dir, "lineitem")
    pa = (li.groupBy(F.col("l_partkey").alias("pk"))
          .agg(_n("cnt"), _dec_sum("l_quantity", "sum_qty")))
    return (li.join(F.broadcast(part.filter(F.col("p_brand") == "Brand#23")),
                    F.col("p_partkey") == F.col("l_partkey"))
            .join(pa, F.col("pk") == F.col("l_partkey"))
            .filter(F.lit(5.0) * F.col("cnt") * F.col("l_quantity")
                    < F.col("sum_qty"))
            .agg((F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
                  .cast("double") / 7.0).alias("avg_yearly"), _n()))


def q_q18_large_orders(spark, sf_dir):
    """TPC-H Q18: orders whose total quantity exceeds 250, with customer
    context; top-100 by exact decimal quantity, o_orderkey tie-break."""
    cust = _read(spark, sf_dir, "customer")
    orders = _read(spark, sf_dir, "orders")
    li = _read(spark, sf_dir, "lineitem")
    big = (li.groupBy("l_orderkey")
           .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("sq"))
           .filter(F.col("sq") > 250))
    return (big.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
            .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
            .orderBy(F.desc("sq"), F.asc("o_orderkey")).limit(100)
            .select("c_custkey", "c_name", "o_orderkey", "o_orderdate",
                    "o_totalprice", F.col("sq").cast("double").alias("sum_qty")))


def q_q19_discounted(spark, sf_dir):
    """TPC-H Q19: three (brand, size, quantity) OR-branches over a broadcast
    part join — Catalyst pushes the disjunction below the aggregate."""
    part = _read(spark, sf_dir, "part")
    li = _read(spark, sf_dir, "lineitem")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
    cond = (((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5)
             & F.col("l_quantity").between(1, 11))
            | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10)
               & F.col("l_quantity").between(10, 20))
            | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 15)
               & F.col("l_quantity").between(20, 30)))
    return (li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
            .filter(cond)
            .agg(F.sum(rev).cast("double").alias("revenue"), _n()))


def q_q22_sales_opportunity(spark, sf_dir):
    """TPC-H Q22 shape (no phone column: market segments stand in for
    country codes, and "no orders" becomes "no urgent orders" since every
    synthetic customer has orders): above-average-balance customers without
    urgent orders, per segment. The avg comparison is cleared of division
    (acctbal*cnt > sum) for cross-engine determinism."""
    cust = _read(spark, sf_dir, "customer")
    orders = _read(spark, sf_dir, "orders")
    pos = cust.filter((F.col("c_acctbal") > 0.0)
                      & F.col("c_mktsegment").isin("AUTOMOBILE", "MACHINERY",
                                                   "FURNITURE"))
    st = pos.agg(_n("cnt"), _dec_sum("c_acctbal", "tot"))
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT") \
        .select("o_custkey")
    return (pos.crossJoin(F.broadcast(st))
            .filter(F.col("c_acctbal") * F.col("cnt") > F.col("tot"))
            .join(urgent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
            .groupBy("c_mktsegment")
            .agg(_n("numcust"), _dec_sum("c_acctbal", "totacctbal")))


def q_q2_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 shape (no partsupp table: lineitem offers stand in for
    partsupp rows, min l_extendedprice for min ps_supplycost): for each
    STANDARD mid-size part, the EUROPE supplier(s) offering it cheapest.
    The correlated min subquery becomes a per-part aggregate joined back on
    exact decimal equality; top-100 by balance with key tie-breaks."""
    region = _read(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    nation = _read(spark, sf_dir, "nation")
    supp = _read(spark, sf_dir, "supplier")
    part = _read(spark, sf_dir, "part")
    li = _read(spark, sf_dir, "lineitem")
    eur = (supp.join(F.broadcast(nation.join(region, F.col("n_regionkey")
                                             == F.col("r_regionkey"))),
                     F.col("s_nationkey") == F.col("n_nationkey")))
    parts = part.filter(F.col("p_size").between(10, 20)
                        & (F.col("p_type") == "STANDARD"))
    offers = (li.join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
              .join(F.broadcast(eur.select("s_suppkey", "s_name", "s_acctbal")),
                    F.col("l_suppkey") == F.col("s_suppkey"))
              .groupBy("p_partkey", "p_brand", "s_suppkey", "s_name", "s_acctbal")
              .agg(F.min(F.col("l_extendedprice").cast("decimal(18,2)"))
                   .alias("cost_dec")))
    mins = offers.groupBy(F.col("p_partkey").alias("mk")) \
        .agg(F.min("cost_dec").alias("min_cost"))
    return (offers.join(mins, (F.col("p_partkey") == F.col("mk"))
                        & (F.col("cost_dec") == F.col("min_cost")))
            .select("s_acctbal", "s_name", "p_partkey", "p_brand", "s_suppkey",
                    F.col("cost_dec").cast("double").alias("min_cost"))
            .orderBy(F.desc("s_acctbal"), F.asc("p_partkey"), F.asc("s_suppkey"))
            .limit(100))


def q_q9_product_profit(spark, sf_dir):
    """TPC-H Q9 shape (no partsupp: supply cost modeled as 60% of retail
    price per unit): profit by supplier nation and order year. Both cost
    and revenue are true <=4-decimal values, so the double->decimal casts
    are tie-free in both engines; the 0.6 product keeps one left-assoc
    double expression on both sides."""
    nation = _read(spark, sf_dir, "nation")
    supp = _read(spark, sf_dir, "supplier")
    part = _read(spark, sf_dir, "part").filter(F.col("p_name").contains("red"))
    orders = _read(spark, sf_dir, "orders")
    li = _read(spark, sf_dir, "lineitem")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))) \
        .cast("decimal(18,4)")
    cost = (F.lit(0.6) * F.col("p_retailprice") * F.col("l_quantity")) \
        .cast("decimal(18,4)")
    return (li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
            .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
            .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
            .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
            .groupBy(F.col("n_name").alias("nation"),
                     F.year("o_orderdate").cast("int").alias("o_year"))
            .agg(F.sum(rev - cost).cast("double").alias("sum_profit"), _n()))


def q_q11_important_stock(spark, sf_dir):
    """TPC-H Q11 shape (no partsupp: per-part shipped value from one
    nation's suppliers stands in for stock value): parts whose value exceeds
    0.1% of the nation's total, division cleared (value*1000 > total) on
    exact decimals; scalar subquery = broadcast cross join."""
    nation = _read(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    supp = _read(spark, sf_dir, "supplier")
    li = _read(spark, sf_dir, "lineitem")
    nsupp = supp.join(F.broadcast(nation),
                      F.col("s_nationkey") == F.col("n_nationkey"))
    vals = (li.join(F.broadcast(nsupp.select("s_suppkey")),
                    F.col("l_suppkey") == F.col("s_suppkey"))
            .groupBy("l_partkey")
            .agg(F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
                 .alias("val_dec")))
    tot = vals.agg(F.sum("val_dec").alias("tot_dec"))
    return (vals.crossJoin(F.broadcast(tot))
            .filter(F.col("val_dec") * 1000 > F.col("tot_dec"))
            .select("l_partkey", F.col("val_dec").cast("double").alias("value")))


def q_q16_supplier_cnt(spark, sf_dir):
    """TPC-H Q16 shape (no partsupp: lineitem supplies; the complaints
    NOT-IN subquery becomes negative-balance suppliers): distinct supplier
    count per surviving (brand, type, size) combination."""
    supp = _read(spark, sf_dir, "supplier")
    part = _read(spark, sf_dir, "part")
    li = _read(spark, sf_dir, "lineitem")
    excl = supp.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    parts = part.filter((F.col("p_brand") != "Brand#45")
                        & ~F.col("p_type").startswith("MEDIUM")
                        & F.col("p_size").isin(1, 4, 9, 14, 19, 24, 29, 34))
    return (li.join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
            .join(F.broadcast(excl), F.col("l_suppkey") == F.col("s_suppkey"),
                  "left_anti")
            .groupBy("p_brand", "p_type", "p_size")
            .agg(F.countDistinct("l_suppkey").alias("supplier_cnt")))


def q_q20_excess_shipments(spark, sf_dir):
    """TPC-H Q20 shape (no partsupp availqty: a supplier has "excess" stock
    of a red part when over half of all its shipments of that part happened
    in 1996): the correlated half-of-sum threshold folds into ONE
    conditional aggregate per (supplier, part) — no second scan — then a
    distinct-supplier semi-join chain into one nation's suppliers."""
    nation = _read(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_1")
    supp = _read(spark, sf_dir, "supplier")
    part = _read(spark, sf_dir, "part").filter(F.col("p_name").contains("red"))
    li = _read(spark, sf_dir, "lineitem")
    in96 = (F.col("l_shipdate") >= "1996-01-01") \
        & (F.col("l_shipdate") < "1997-01-01")
    qty = F.col("l_quantity").cast("decimal(18,2)")
    pairs = (li.join(F.broadcast(part.select("p_partkey")),
                     F.col("l_partkey") == F.col("p_partkey"))
             .groupBy("l_suppkey", "l_partkey")
             .agg(F.sum(qty).alias("q_all"),
                  F.sum(F.when(in96, qty).otherwise(
                      F.lit(0).cast("decimal(18,2)"))).alias("q_96")))
    ex = pairs.filter(F.col("q_96") * 2 > F.col("q_all")) \
        .select("l_suppkey").distinct()
    return (supp.join(F.broadcast(nation),
                      F.col("s_nationkey") == F.col("n_nationkey"))
            .join(ex, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
            .select("s_name", "s_acctbal"))


def q_q21_waiting_suppliers(spark, sf_dir):
    """TPC-H Q21 shape (no commit/receipt dates: "late" = shipped more than
    90 days after the order date): suppliers who were the SOLE late shipper
    in a multi-supplier finalized order. The EXISTS / NOT-EXISTS pair folds
    into one per-order aggregate (distinct suppliers, distinct late
    suppliers, min late supplier) — one shuffle on orderkey instead of the
    reference's three self-joins of lineitem."""
    supp = _read(spark, sf_dir, "supplier")
    orders = _read(spark, sf_dir, "orders") \
        .filter(F.col("o_orderstatus") == "F")
    li = _read(spark, sf_dir, "lineitem")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    per_order = (li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
                 .groupBy("l_orderkey")
                 .agg(F.countDistinct("l_suppkey").alias("ns"),
                      F.countDistinct(F.when(late, F.col("l_suppkey")))
                      .alias("nl"),
                      F.min(F.when(late, F.col("l_suppkey"))).alias("late_supp")))
    return (per_order.filter((F.col("ns") > 1) & (F.col("nl") == 1))
            .groupBy("late_supp").agg(_n("numwait"))
            .join(F.broadcast(supp), F.col("late_supp") == F.col("s_suppkey"))
            .select("s_name", "numwait")
            .orderBy(F.desc("numwait"), F.asc("s_name")).limit(100))


def _read_events(spark, sf_dir):
    """events.parquet stores TIMESTAMP(NANOS). Newer Spark (4.1+) reads it
    natively as timestamp_ntz (floor-truncated to micros — the same
    truncation DuckDB applies going ns -> its native us timestamps); older
    readers reject nanos unless the legacy nanos-as-long conf is set, which
    yields a bigint column we convert by hand. Branch on the actual dtype so
    both behaviors produce identical micro-precision timestamps."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = _read(spark, sf_dir, "events")
    if dict(ev.dtypes)["ts"] == "bigint":
        ev = ev.withColumn(
            "ts", F.timestamp_micros((F.col("ts") / 1000).cast("long")))
    return ev


def q_events_hourly(spark, sf_dir):
    ev = _read_events(spark, sf_dir)
    return (ev.groupBy(F.date_trunc("hour", "ts").alias("hour"), "event_type")
            .agg(_n(), _dec_sum("value", "sum_value", "18,4")))


def q_events_latest_per_user(spark, sf_dir):
    ev = _read_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (ev.withColumn("_rn", F.row_number().over(w)).filter("_rn = 1")
            .select("user_id", "event_id", "event_type",
                    F.col("value").cast("double").alias("value")))


# ---- LLM-pipeline operators (SURVEY.md §2.11)
def q_docs_exact_dedup(spark, sf_dir):
    from hudi_0_12_0_my_spark.operators import exact_dedup
    docs = _read(spark, sf_dir, "documents")
    kept = exact_dedup(docs)
    return kept.agg(_n("n_kept"),
                    F.sum("dup_count").cast("bigint").alias("n_total"))


def q_docs_token_stats(spark, sf_dir):
    from hudi_0_12_0_my_spark.operators import with_token_stats
    docs = with_token_stats(_read(spark, sf_dir, "documents"))
    return (docs.groupBy("lang")
            .agg(_n(), F.sum("n_tokens").cast("bigint").alias("sum_tokens"),
                 F.sum("n_bpe_tokens").cast("bigint").alias("sum_bpe"),
                 F.sum("n_chars_actual").cast("bigint").alias("sum_chars")))


def q_docs_quality(spark, sf_dir):
    from hudi_0_12_0_my_spark.operators import with_quality_score
    docs = with_quality_score(_read(spark, sf_dir, "documents"))
    return (docs.filter(F.col("doc_id") < 100)
            .select("doc_id", F.col("n_punct").cast("bigint").alias("n_punct"),
                    "quality_score"))


def q_docs_repetition(spark, sf_dir):
    """Gopher-style repetition/format signals, row-level oracle (floats are
    computed identically: integer counts ratioed then rounded to 6)."""
    from hudi_0_12_0_my_spark.operators import with_repetition_stats
    docs = with_repetition_stats(_read(spark, sf_dir, "documents"))
    return docs.select(
        "doc_id", F.col("n_lines").cast("bigint").alias("n_lines"),
        "dup_line_frac", "dup_line_char_frac", "top_bigram_char_frac",
        "bullet_line_frac", "ellipsis_line_frac", "alpha_word_frac",
        "mean_word_len")


def q_mor_incremental_cdc(spark, sf_dir):
    """CDC diff over the MOR build: the new side resolves base+delta, so
    the before/after images exercise the log-merge path."""
    t, commits = _build_mor(spark, sf_dir, compact=False)
    cdc = t.incremental_cdc(begin=commits[0])

    def pick(f):
        return F.coalesce(F.col(f"after.{f}"), F.col(f"before.{f}"))

    return cdc.select(
        "op", pick("l_orderkey").alias("l_orderkey"),
        pick("l_linenumber").alias("l_linenumber"),
        F.col("before.l_quantity").cast("double").alias("before_qty"),
        F.col("after.l_quantity").cast("double").alias("after_qty"))


def q_events_funnel(spark, sf_dir):
    from hudi_0_12_0_my_spark.operators import funnel_stats
    ev = _read(spark, sf_dir, "events")
    return funnel_stats(ev, ["view", "click", "purchase"])


def q_docs_curate(spark, sf_dir):
    """End-to-end curation composition (scrub -> normalize -> quality
    filter -> exact dedup -> deterministic 50% sample) — the full pipeline
    replayed as one DuckDB query."""
    from hudi_0_12_0_my_spark.operators import curate
    docs = _read(spark, sf_dir, "documents")
    out = curate(docs, min_quality=0.3, dedup="exact", sample_fraction=0.5)
    return out.select("doc_id", "lang", "quality_score")


def q_docs_chunks(spark, sf_dir):
    from hudi_0_12_0_my_spark.operators import chunk_documents
    docs = _read(spark, sf_dir, "documents")
    return chunk_documents(docs, max_tokens=64, overlap=8)


def q_docs_pack(spark, sf_dir):
    from hudi_0_12_0_my_spark.operators import pack_sequences
    docs = _read(spark, sf_dir, "documents")
    return pack_sequences(docs, token_budget=512)


def q_docs_top_ngrams(spark, sf_dir):
    from hudi_0_12_0_my_spark.operators import top_ngrams
    docs = _read(spark, sf_dir, "documents")
    return top_ngrams(docs, n=2, k=20)


def q_docs_fingerprint(spark, sf_dir):
    from hudi_0_12_0_my_spark.operators import with_fingerprint
    docs = with_fingerprint(_read(spark, sf_dir, "documents"))
    return docs.agg(F.count_distinct("fingerprint").cast("bigint")
                    .alias("n_distinct"), _n())


def q_docs_substring_dedup(spark, sf_dir):
    """ExactSubstr dedup (Lee et al. 2022) at 8-token granularity
    (operators/dedup.py exact_substring_dedup): every 8-token span that
    occurs more than once corpus-wide is cut from all but its first
    occurrence; overlapping windows catch duplicated passages regardless of
    alignment (unlike the non-overlapping segment_dedup). The oracle
    replays the overlapping-window enumeration, first-occurrence ranking
    and token-coverage union exactly."""
    from hudi_0_12_0_my_spark.operators import exact_substring_dedup
    docs = _read(spark, sf_dir, "documents")
    return exact_substring_dedup(docs, k=8).select(
        "doc_id", "text_dedup", "n_tokens", "n_removed")


def q_docs_segment_dedup(spark, sf_dir):
    """C4-style sub-document exact dedup at 20-token window granularity
    (operators/dedup.py segment_dedup): distinct segments keep their first
    corpus-wide occurrence, documents reassemble from survivors."""
    from hudi_0_12_0_my_spark.operators import segment_dedup
    docs = _read(spark, sf_dir, "documents")
    return segment_dedup(docs, window=20).select(
        "doc_id", "text_dedup", "n_segments", "n_kept")


def q_events_asof_join(spark, sf_dir):
    """Point-in-time join (operators/temporal.py asof_join): every event
    picks up the latest status row (every-20th event) at or before its
    timestamp. Oracle: DuckDB's native ASOF LEFT JOIN."""
    from hudi_0_12_0_my_spark.operators import asof_join
    ev = _read_events(spark, sf_dir)
    right = (ev.filter("event_id % 20 = 0")
             .select("user_id", "ts", F.col("value").alias("status")))
    left = ev.filter("event_id % 20 != 0") \
             .select("event_id", "user_id", "ts")
    j = asof_join(left, right, "user_id")
    return j.select("event_id",
                    F.round("r_status", 6).alias("status"),
                    F.col("r_ts").alias("status_ts"))


def q_events_resample(spark, sf_dir):
    """Time-series regularization (operators/temporal.py resample): per-user
    hourly grid from first to last observation, forward-filling the latest
    value at or before each grid point (gap-fill + LOCF). The (user_id, ts)
    pre-aggregation makes the fill deterministic on both engines. Oracle:
    per-key generate_series spine + DuckDB native ASOF LEFT JOIN."""
    from hudi_0_12_0_my_spark.operators import resample
    ev = _read_events(spark, sf_dir).filter("user_id % 25 = 0")
    series = ev.groupBy("user_id", "ts").agg(F.max("value").alias("value"))
    r = resample(series, "user_id", ts="ts", step="1 hour", trunc="hour",
                 values=["value"])
    return r.select("user_id", F.col("ts").alias("grid_ts"),
                    F.round("r_value", 6).alias("last_value"),
                    F.col("r_ts").alias("obs_ts"))


def q_orders_rollup(spark, sf_dir):
    """GROUP BY ROLLUP over orders (§2.10: Catalyst-delegated relational
    surface): subtotal rows carry NULL group keys identically in Spark and
    DuckDB."""
    o = _read(spark, sf_dir, "orders")
    return (o.rollup("o_orderstatus", "o_orderpriority")
            .agg(_n(), _dec_sum("o_totalprice", "sum_price")))


def q_orders_pivot(spark, sf_dir):
    """Pivot (conditional aggregation): order counts per priority pivoted
    across the three status values. Spark's pivot() compiles to the same
    first(CASE WHEN) plan DuckDB's conditional aggregate oracle states."""
    o = _read(spark, sf_dir, "orders")
    return (o.groupBy("o_orderpriority")
            .pivot("o_orderstatus", ["P", "O", "F"])
            .agg(F.count(F.lit(1)))
            .select("o_orderpriority",
                    *[F.coalesce(F.col(s), F.lit(0)).cast("bigint")
                      .alias(f"n_{s.lower()}") for s in ("P", "O", "F")]))


def q_events_window_funcs(spark, sf_dir):
    """Analytic window functions per user timeline: lag, running decimal
    sum, and dense ordinal — deterministic (ts, event_id) ordering."""
    from pyspark.sql import Window
    ev = _read_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    return ev.select(
        "event_id", "user_id",
        F.round(F.lag("value").over(w), 6).alias("prev_value"),
        F.sum(F.col("value").cast("decimal(18,4)"))
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("double").alias("run_sum"),
        F.row_number().over(w).cast("bigint").alias("seq_no"))


def q_orders_setops(spark, sf_dir):
    """Set operators: customers with both finalized AND open orders, minus
    those with any pending order (INTERSECT + EXCEPT, distinct semantics)."""
    o = _read(spark, sf_dir, "orders")
    f = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    op = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    p = o.filter(F.col("o_orderstatus") == "P").select("o_custkey")
    return f.intersect(op).exceptAll(p.distinct())


def q_events_interval_join(spark, sf_dir):
    """Bucketed point-in-interval join (operators/joins.py interval_join):
    events fall into 60 OVERLAPPING value bands [i*8, i*8+12) — each point
    can match 0-2 bands, so this is a real range join, not a bucketing
    groupBy. Spark would plan the raw predicate as BroadcastNestedLoopJoin;
    the operator turns it into one equi-shuffle on the bucket id. Oracle:
    DuckDB's native inequality join."""
    from hudi_0_12_0_my_spark.operators import interval_join
    ev = _read_events(spark, sf_dir).select("event_id", "value")
    bands = spark.range(60).select(
        F.col("id").alias("band_id"),
        (F.col("id") * 8.0).alias("lo"),
        (F.col("id") * 8.0 + 12.0).alias("hi"))
    j = interval_join(ev, bands, left_point="value", right_start="lo",
                      right_end="hi", bucket_width=8.0)
    return (j.groupBy("band_id")
            .agg(_n(), _dec_sum("value", "sum_value", "18,4")))


def q_events_salted_join(spark, sf_dir):
    """Skew-salted equi-join (operators/joins.py salted_join): events join a
    5-row event_type dimension — the worst-case hot-key layout (2k rows per
    key at sf0.01, 20M at 100 TB). Salting spreads each key over 8 sub-keys;
    the result set is identical to the plain join, which is exactly what the
    oracle checks."""
    from hudi_0_12_0_my_spark.operators import salted_join
    ev = _read_events(spark, sf_dir).select("event_id", "event_type", "value")
    dim = (ev.select("event_type").distinct()
           .withColumn("type_len", F.length("event_type").cast("int")))
    j = salted_join(ev, dim, "event_type", salts=8)
    return (j.groupBy("event_type", "type_len")
            .agg(_n(), _dec_sum("value", "sum_value", "18,4")))


def q_scd2_history(spark, sf_dir):
    """SCD2 history from the change feed (derived.scd2_history): every key
    version with its validity interval. Instants are projected to their
    commit ordinal (1..3) so the oracle can state intervals without knowing
    wall-clock instants: v1 closes at the upsert for mutated keys, the
    mutated version closes at the delete for %100 keys."""
    from hudi_0_12_0_my_spark.derived import scd2_history
    t, commits = _build_cow(spark, sf_dir)
    h = scd2_history(t, ["l_orderkey", "l_linenumber"], ["l_quantity"])

    def idx(col):
        e = F.lit(None).cast("int")
        for i, c in reversed(list(enumerate(commits, start=1))):
            e = F.when(F.col(col) == c, i).otherwise(e)
        return e

    return h.select("l_orderkey", "l_linenumber",
                    F.col("l_quantity").cast("double").alias("qty"),
                    idx("valid_from").alias("from_idx"),
                    idx("valid_to").alias("to_idx"))


def q_orders_profile(spark, sf_dir):
    """Column profiling (operators/profile.py): exact per-column counts /
    nulls / distincts / extremes of the orders table in ONE wide aggregate
    pass."""
    from hudi_0_12_0_my_spark.operators import profile
    orders = _read(spark, sf_dir, "orders")
    return profile(orders, ["o_orderkey", "o_custkey", "o_totalprice",
                            "o_orderpriority"])


def q_rollup_incremental(spark, sf_dir):
    """Incremental materialized-view maintenance (derived.py sync_rollup):
    a returnflag/linestatus rollup of the COW lineitem table kept current by
    folding the CDC diff after each commit (full snapshot on first sync,
    +after/-before deltas afterwards, zero-count groups tombstoned). The
    result must equal a from-scratch aggregate of the final state."""
    from hudi_0_12_0_my_spark.derived import sync_rollup
    t, commits = _build_cow(spark, sf_dir)
    key = (sf_dir, "rollup")
    if key not in _BUILT:
        dst = _eng(spark).create_table(
            _fresh(_root(sf_dir, "rollup")),
            record_key_fields=["l_returnflag", "l_linestatus"],
            keygen="nonpartitioned")
        for end in commits:          # one sync per source commit
            sync_rollup(t, dst, ["l_returnflag", "l_linestatus"],
                        {"sum_qty": "l_quantity",
                         "sum_price": "l_extendedprice"}, end=end)
        _BUILT[key] = (dst, commits)
    dst, _ = _BUILT[key]
    return dst.snapshot().select(
        "l_returnflag", "l_linestatus",
        F.round("sum_qty", 2).alias("sum_qty"),
        F.round("sum_price", 2).alias("sum_price"), "n_rows")


def q_cms_sketch_sync(spark, sf_dir):
    """Incrementally maintained Count-Min sketch (derived.py
    sync_cms_sketch): a CMS of lineitem order keys kept current across the
    COW table's bulk_insert -> upsert -> delete history by folding the CDC
    diff into the cells (+after/-before; cell-wise addition IS CMS merge).
    The oracle rebuilds the sketch from scratch over the FINAL table state
    — incremental fold must equal batch recompute bit-for-bit, including
    update self-cancellation (l_orderkey unchanged by the upsert) and
    delete debits."""
    from hudi_0_12_0_my_spark.derived import sync_cms_sketch
    t, commits = _build_cow(spark, sf_dir)
    key = (sf_dir, "cms_sketch")
    if key not in _BUILT:
        dst = _eng(spark).create_table(
            _fresh(_root(sf_dir, "cms_sketch")),
            record_key_fields=["d", "bucket"], keygen="nonpartitioned")
        for end in commits:          # one sync per source commit
            sync_cms_sketch(t, dst, "l_orderkey", depth=4, width=64,
                            hash_fn="portable_md5", end=end)
        _BUILT[key] = dst
    return _BUILT[key].snapshot().select("d", "bucket", "cnt")


def q_hll_sketch_sync(spark, sf_dir):
    """Incrementally maintained HLL register table (derived.py
    sync_hll_sketch) over the COW lineitem history: the upsert commit folds
    monotonically (max of registers — l_orderkey unchanged, so before/after
    contributions coincide), the delete commit trips the retraction
    detector and recomputes (a max is not invertible). Oracle rebuilds the
    registers from the FINAL state — either path must land exactly there,
    including tombstoned silent buckets."""
    from hudi_0_12_0_my_spark.derived import sync_hll_sketch
    t, commits = _build_cow(spark, sf_dir)
    key = (sf_dir, "hll_sketch")
    if key not in _BUILT:
        dst = _eng(spark).create_table(
            _fresh(_root(sf_dir, "hll_sketch")),
            record_key_fields=["bucket"], keygen="nonpartitioned")
        for end in commits:          # one sync per source commit
            sync_hll_sketch(t, dst, "l_orderkey", p=6,
                            hash_fn="portable_md5", seed=7, end=end)
        _BUILT[key] = dst
    return _BUILT[key].snapshot().select("bucket", "reg")


def q_events_value_quantiles(spark, sf_dir):
    """Histogram-sketch quantiles (operators/sketches.py
    histogram_quantiles): p50/p90/p99 of event value per event_type from a
    100-bin fixed-width histogram — integer cell counts, then exactly three
    IEEE float ops (target rank, in-bin fraction, interpolation), so DuckDB
    replays the estimates bit-for-bit. The quantile member of the sketch
    trio (CMS frequency / HLL cardinality / histogram distribution)."""
    from hudi_0_12_0_my_spark.operators import histogram_quantiles
    ev = _read_events(spark, sf_dir)
    return histogram_quantiles(ev, "value", [0.5, 0.9, 0.99],
                               lo=0.0, hi=500.0, bins=100,
                               group_cols=["event_type"])


def q_events_cohorts(spark, sf_dir):
    """Weekly cohort retention matrix (operators/sessions.py
    cohort_retention): users bucketed by first-activity week, distinct
    active users per (cohort, week offset)."""
    from hudi_0_12_0_my_spark.operators import cohort_retention
    ev = _read_events(spark, sf_dir)
    return cohort_retention(ev, period="week").select(
        "cohort", "period_offset", "n_users", "retention")


def q_events_top_paths(spark, sf_dir):
    """Top-20 user journey paths (operators/sessions.py top_paths): each
    user's first 5 event types in (ts, event_id) order join into a path;
    paths rank by user count. Deterministic tie-break (count desc, path
    asc) on both engines."""
    from hudi_0_12_0_my_spark.operators import top_paths
    ev = _read_events(spark, sf_dir)
    return top_paths(ev, n_steps=5, k=20).select(
        "path", "n_users", "path_len")


def q_events_transitions(spark, sf_dir):
    """First-order Markov event transition matrix (operators/sessions.py
    event_transitions): per-user consecutive (src -> dst) pairs in
    (ts, event_id) order, with row-normalized probabilities."""
    from hudi_0_12_0_my_spark.operators import event_transitions
    ev = _read_events(spark, sf_dir)
    return event_transitions(ev).select("src", "dst", "n", "p")


_CLS_WEIGHTS = {"spark": 1.0, "vector": 0.8, "query": 0.5,
                "slow": -1.2, "big": -0.4, "the": -0.1}


def q_docs_quality_classifier(spark, sf_dir):
    """fastText-style linear quality scoring with a fixed literal model
    (operators/lm.py linear_text_score): sigmoid of the token-weight mean,
    replayed exactly in SQL."""
    from hudi_0_12_0_my_spark.operators import linear_text_score
    docs = _read(spark, sf_dir, "documents")
    # the operator keeps empty docs (score = sigmoid(bias)); the SQL oracle's
    # token CTE can't see them, so the gate query scopes to non-empty text
    docs = docs.filter(F.length(F.trim(F.col("text"))) > 0)
    return (linear_text_score(docs, _CLS_WEIGHTS, bias=0.1)
            .select("doc_id", "score"))


def q_docs_tfidf(spark, sf_dir):
    """Per-document top-5 tf-idf keywords (operators/lm.py tfidf_keywords),
    deterministic rank with term tie-break; restricted to 30 docs so the
    gate result stays small while the full corpus trains the idf."""
    from hudi_0_12_0_my_spark.operators import tfidf_keywords
    docs = _read(spark, sf_dir, "documents")
    return (tfidf_keywords(docs, k=5).filter("doc_id < 30")
            .select("doc_id", "rank", "term", "tfidf"))


def q_docs_lm_unigram(spark, sf_dir):
    """Corpus-trained unigram LM average log-prob per doc (operators/lm.py);
    pseudo-perplexity quality signal. Exact oracle: same tokenization +
    MLE counts in SQL, both sides rounded to 6."""
    from hudi_0_12_0_my_spark.operators import lm_log_prob
    docs = _read(spark, sf_dir, "documents")
    scored = lm_log_prob(docs, order=1)
    return (scored.orderBy(F.asc("lm_logprob"), F.asc("doc_id")).limit(20)
            .select("doc_id", "lm_logprob"))


def q_docs_lm_bigram(spark, sf_dir):
    """Bigram conditional LM score (context totals derived from pair
    counts, single corpus pass)."""
    from hudi_0_12_0_my_spark.operators import lm_log_prob
    docs = _read(spark, sf_dir, "documents")
    scored = lm_log_prob(docs, order=2)
    return (scored.orderBy(F.asc("lm_logprob"), F.asc("doc_id")).limit(20)
            .select("doc_id", "lm_logprob"))


def q_emb_lsh_topk(spark, sf_dir):
    """Hyperplane-LSH ANN through the full banding + re-rank plumbing. The
    gate runs the degenerate exact config (num_bits=0 -> every vector lands
    in the single band bucket, candidates = all, re-rank = brute force) so a
    brute-force SQL oracle verifies the join/re-rank/top-k machinery —
    the same trick emb_near_dup uses with num_cells=1. Banded recall at
    real configs is probabilistic and pytest-checked against brute force."""
    from hudi_0_12_0_my_spark.operators import lsh_cosine_topk
    emb = _read(spark, sf_dir, "embeddings")
    res = lsh_cosine_topk(emb, emb.filter("vec_id < 5"), dim=64, k=10,
                          num_bits=0, bands=1)
    return res.select("query_id", "neighbor_id",
                      F.col("rank").cast("int").alias("rank"))


def q_emb_topk(spark, sf_dir):
    from hudi_0_12_0_my_spark.operators import cosine_topk
    emb = _read(spark, sf_dir, "embeddings")
    res = cosine_topk(emb, emb.filter("vec_id < 5"), k=10)
    return res.select("query_id", "neighbor_id", F.col("rank").cast("int").alias("rank"))


def q_emb_mmr_rerank(spark, sf_dir):
    """MMR diverse re-ranking (operators/similarity.py mmr_rerank,
    Carbonell'98): top-20 retrieval then 5 greedy picks per query at
    lambda=0.7. The oracle UNROLLS the greedy loop into one CTE block per
    step (argmax of 0.7*rel - 0.3*max-sim-to-selected, ties to lowest id)
    — rank-exact; scores are rank-only like the other cosine gates (FP
    fold order differs across engines)."""
    from hudi_0_12_0_my_spark.operators import mmr_rerank
    emb = _read(spark, sf_dir, "embeddings")
    res = mmr_rerank(emb, emb.filter(F.col("vec_id") < 3), k=5,
                     fetch_k=20, lambda_=0.7)
    return res.select("query_id", "neighbor_id", "rank")


def _mmr_oracle(k: int = 5, fetch_k: int = 20, lam: float = 0.7) -> str:
    head = f"""
WITH e AS (SELECT vec_id, embedding FROM embeddings),
q AS (SELECT vec_id AS qid, embedding AS qe FROM e WHERE vec_id < 3),
rels AS (SELECT qid, vec_id AS nid,
                list_cosine_similarity(qe, embedding) AS rel
         FROM e, q WHERE vec_id <> qid),
c AS (SELECT qid, nid, rel FROM
       (SELECT qid, nid, rel,
               row_number() OVER (PARTITION BY qid
                                  ORDER BY rel DESC, nid) AS rr
        FROM rels) WHERE rr <= {fetch_k}),
sim AS (SELECT a.qid, a.nid AS ia, b.nid AS ib,
               list_cosine_similarity(ea.embedding, eb.embedding) AS s
        FROM c a JOIN c b ON a.qid = b.qid AND a.nid < b.nid
        JOIN e ea ON ea.vec_id = a.nid
        JOIN e eb ON eb.vec_id = b.nid),
p1 AS (SELECT qid, nid,
              row_number() OVER (PARTITION BY qid
                                 ORDER BY rel DESC, nid) AS r
       FROM c),
s1 AS (SELECT qid, nid AS pick FROM p1 WHERE r = 1),
sel1 AS (SELECT qid, [pick] AS picks FROM s1)"""
    steps = []
    for i in range(2, k + 1):
        steps.append(f""",
p{i} AS (
  SELECT c.qid, c.nid, c.rel,
         coalesce(max(CASE
           WHEN s.ia = c.nid AND list_contains(l.picks, s.ib) THEN s.s
           WHEN s.ib = c.nid AND list_contains(l.picks, s.ia) THEN s.s
         END), 0.0) AS red
  FROM c JOIN sel{i - 1} l ON l.qid = c.qid
  LEFT JOIN sim s ON s.qid = c.qid AND (s.ia = c.nid OR s.ib = c.nid)
  WHERE NOT list_contains(l.picks, c.nid)
  GROUP BY c.qid, c.nid, c.rel),
s{i} AS (SELECT qid, nid AS pick FROM
          (SELECT qid, nid,
                  row_number() OVER (PARTITION BY qid
                    ORDER BY {lam} * rel - (1.0 - {lam}) * red DESC,
                             nid) AS r
           FROM p{i}) WHERE r = 1),
sel{i} AS (SELECT l.qid, list_append(l.picks, s.pick) AS picks
           FROM sel{i - 1} l JOIN s{i} s USING (qid))""")
    tail = "\nUNION ALL\n".join(
        f"SELECT qid AS query_id, pick AS neighbor_id, "
        f"CAST({i} AS INT) AS rank FROM s{i}" for i in range(1, k + 1))
    return head + "".join(steps) + "\n" + tail


def q_docs_curation_pipeline(spark, sf_dir):
    """End-to-end curation composition over the NEW r3 operators:
    RefinedWeb segment filter -> ExactSubstr dedup (k=8) -> deterministic
    shard plan, summarized per shard. Exercises the operators CHAINED
    (each consumes the previous one's rewritten text), the way a real
    export pipeline runs them; the oracle replays the full chain."""
    from hudi_0_12_0_my_spark.operators import (exact_substring_dedup,
                                                segment_filter, shard_plan)
    docs = _read(spark, sf_dir, "documents")
    filt = (segment_filter(docs, window=20, min_tokens=3)
            .filter(F.length("text_filtered") > 0)
            .select("doc_id", F.col("text_filtered").alias("text")))
    dd = (exact_substring_dedup(filt, k=8)
          .filter(F.length("text_dedup") > 0)
          .select("doc_id", F.col("text_dedup").alias("text")))
    sp = shard_plan(dd, n_shards=4, text_col="text")
    return (sp.groupBy("shard_id")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                 F.sum("n_tokens").cast("bigint").alias("sum_tokens"))
            .select("shard_id", "n_docs", "sum_tokens"))


def q_emb_pq_topk(spark, sf_dir):
    """Product-quantization ANN (operators/similarity.py pq_train/encode/
    topk; Jegou'11): 8 subspaces x 8 codes, one deterministic Lloyd round
    per subspace, asymmetric-distance top-10 for 5 queries. The oracle
    replays the per-subspace init/assign/recompute chain, the encoding,
    the centroid reconstruction and the ordered 64-term distance fold —
    every rank is exact."""
    from hudi_0_12_0_my_spark.operators import pq_topk, pq_train
    emb = _read(spark, sf_dir, "embeddings")
    cents = pq_train(emb, m=8, ksub=8)
    return pq_topk(emb, emb.filter(F.col("vec_id") < 5), k=10,
                   cents=cents).select(
        "query_id", "neighbor_id", "adist", "rank")


def q_emb_ivfpq_topk(spark, sf_dir):
    """IVF-PQ composition (operators/similarity.py ivfpq_topk): coarse
    cells prune the scan, PQ codes shrink it. Gate config probes ALL cells
    (nprobe = num_cells), where the result must equal plain PQ top-k
    EXACTLY — proving the cell partitioning neither loses nor duplicates
    any vector; the oracle is the full PQ chain replay."""
    from hudi_0_12_0_my_spark.operators import ivfpq_topk, pq_train
    emb = _read(spark, sf_dir, "embeddings")
    cents = pq_train(emb, m=8, ksub=8)
    return ivfpq_topk(emb, emb.filter(F.col("vec_id") < 5), k=10,
                      num_cells=8, nprobe=8, cents=cents).select(
        "query_id", "neighbor_id", "adist", "rank")


def q_emb_prototype_prune(spark, sf_dir):
    """SSL-prototypes pruning (operators/similarity.py prototype_prune):
    k-means (k=4, 2 Lloyd rounds, deterministic init), then keep only the
    hardest 70% of each cluster by distance-to-centroid. The oracle replays
    the full Lloyd chain (the emb_kmeans CTEs) plus the per-cluster
    hardness ranking and the ceil(0.7*n) cutoff."""
    from hudi_0_12_0_my_spark.operators import prototype_prune
    emb = _read(spark, sf_dir, "embeddings")
    res = prototype_prune(emb, k=4, iters=2, keep_frac=0.7)
    return res.select("vec_id",
                      F.col("cluster").cast("int").alias("cluster"),
                      F.round("dist", 6).alias("dist"), "hardness_rank")


def q_emb_kmeans(spark, sf_dir):
    """Lloyd k-means hard assignment (k=4, 2 iterations, deterministic
    lowest-id init). DuckDB replays both Lloyd rounds with CTEs — same
    init, same argmin tie-break (lowest cluster), same empty-cluster
    carry — so every cluster id is oracle-exact; dist is rounded to
    absorb float-summation association differences."""
    from hudi_0_12_0_my_spark.operators import kmeans_assign
    emb = _read(spark, sf_dir, "embeddings")
    res = kmeans_assign(emb, k=4, iters=2)
    return res.select("vec_id", F.col("cluster").cast("int").alias("cluster"),
                      F.round("dist", 6).alias("dist"))


def q_emb_quantized_topk(spark, sf_dir):
    """Int8 scalar-quantized cosine top-k. Quantization (floor(x*s+0.5),
    s=127/max|x|) and the integer dot products are exact in both engines,
    and the final double division/sqrt is IEEE-deterministic, so qcosine
    matches bit-for-bit — the whole approximate-ANN result is
    oracle-exact, not just its row count."""
    from hudi_0_12_0_my_spark.operators import quantized_cosine_topk
    emb = _read(spark, sf_dir, "embeddings")
    res = quantized_cosine_topk(emb, emb.filter("vec_id < 5"), k=10)
    return res.select("query_id", "neighbor_id",
                      F.round("qcosine", 6).alias("qcos"),
                      F.col("rank").cast("int").alias("rank"))


def q_emb_random_projection(spark, sf_dir):
    """Johnson-Lindenstrauss reduction 64 -> 16 dims with a deterministic
    Rademacher matrix derived from md5 parities (Achlioptas'01), one
    map-only pass (operators/similarity.py random_projection). DuckDB
    re-derives the identical matrix from the same md5 parities and replays
    every projected component; values rounded to 6 both sides."""
    from hudi_0_12_0_my_spark.operators import random_projection
    emb = _read(spark, sf_dir, "embeddings")
    proj = random_projection(emb, in_dim=64, out_dim=16)
    return (proj.select("vec_id",
                        F.posexplode("projected").alias("dim_idx", "val"))
            .select("vec_id", F.col("dim_idx").cast("int").alias("dim_idx"),
                    F.round("val", 6).alias("val")))


def q_emb_hard_negatives(spark, sf_dir):
    """Hard-negative mining: per query the top-k corpus rows with cosine in
    [0.15, 0.35) — informative negatives below the near-dup band
    (operators/similarity.py hard_negatives; broadcast query side, band
    filter before the rank exchange). Integer-only output, oracle-exact."""
    from hudi_0_12_0_my_spark.operators import hard_negatives
    emb = _read(spark, sf_dir, "embeddings")
    res = hard_negatives(emb, emb.filter("vec_id < 5"), k=10,
                         lo=0.15, hi=0.35)
    return res.select("query_id", "neighbor_id",
                      F.col("rank").cast("int").alias("rank"))


def q_docs_lsh_edit_verify(spark, sf_dir):
    """Generate-then-verify near-dup: portable-hash MinHash-LSH candidates
    re-checked with exact levenshtein on 200-char normalized prefixes.
    DuckDB replays the full candidate pipeline plus the same levenshtein
    verification, so both the surviving pairs and their edit similarities
    are exact."""
    from hudi_0_12_0_my_spark.operators import edit_verified_pairs
    docs = _read(spark, sf_dir, "documents")
    res = edit_verified_pairs(docs, num_hashes=32, bands=8,
                              jaccard_threshold=0.4, hash_fn="portable_md5",
                              prefix_len=200, edit_sim_threshold=0.5)
    return res.select("id_a", "id_b", "est_jaccard",
                      F.round("edit_sim", 6).alias("edit_sim"))


def q_docs_language_id(spark, sf_dir):
    from hudi_0_12_0_my_spark.operators import with_language_id
    docs = with_language_id(_read(spark, sf_dir, "documents"))
    return docs.groupBy("lang_pred").agg(_n())


def q_docs_ngram_jaccard(spark, sf_dir):
    from hudi_0_12_0_my_spark.operators import ngram_jaccard_pairs
    docs = _read(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(docs, n=3, threshold=0.8)


def q_docs_containment(spark, sf_dir):
    """Asymmetric doc-in-doc near-dup via n-gram CONTAINMENT
    (operators/dedup.py ngram_containment_pairs): |A∩B| / min(|A|,|B|) over
    distinct word 3-grams — catches embedded/quoted duplication Jaccard
    dilutes away. Oracle replays the gram sets and the inverted-index
    intersection on the raw gram strings."""
    from hudi_0_12_0_my_spark.operators import ngram_containment_pairs
    docs = _read(spark, sf_dir, "documents")
    return ngram_containment_pairs(docs, n=3, threshold=0.5)


def q_docs_containment_lsh(spark, sf_dir):
    """LSH-candidates-first containment (operators/dedup.py
    ngram_containment_pairs_lsh) — the corpus-scale generate-then-verify
    composition: MinHash band buckets generate candidates (volume set by
    band collision probability, not corpus pair density), then the SAME
    exact array_intersect verify stage the prefix path uses. On this
    corpus every qualifying pair is a near-identical duplicate (jaccard
    >= ~0.95), so the output equals brute containment exactly — same
    oracle as docs_containment. The honest recall caveat (high-containment
    / low-jaccard pairs are invisible to jaccard-driven banding) is
    documented on the operator."""
    from hudi_0_12_0_my_spark.operators import ngram_containment_pairs_lsh
    docs = _read(spark, sf_dir, "documents")
    return ngram_containment_pairs_lsh(docs, n=3, threshold=0.5)


def q_docs_containment_prefix(spark, sf_dir):
    """Prefix-filtered containment (operators/dedup.py
    ngram_containment_pairs_prefix, PPJoin pigeonhole bound): must return
    EXACTLY the brute inverted-join pairs — same oracle as
    `docs_containment`, proving the candidate pruning is lossless."""
    from hudi_0_12_0_my_spark.operators import ngram_containment_pairs_prefix
    docs = _read(spark, sf_dir, "documents")
    return ngram_containment_pairs_prefix(docs, n=3, threshold=0.5)


def q_docs_pmi_pairs(spark, sf_dir):
    """Sliding-window PMI association statistics (operators/textstats.py
    pmi_top_pairs): top-25 token pairs ranked by c_ab/(c_a*c_b) — monotone
    in PMI for a fixed corpus, so the ranking is transcendental-free and
    the oracle replays counts, the single IEEE division and the ordering
    exactly."""
    from hudi_0_12_0_my_spark.operators import pmi_top_pairs
    docs = _read(spark, sf_dir, "documents")
    return pmi_top_pairs(docs, window=3, k=25, min_count=10)


def q_events_heavy_hitters(spark, sf_dir):
    """Count-Min heavy hitters (operators/sketches.py heavy_hitters):
    depth-4 x width-64 portable-md5 sketch over event user_ids, top-20 users
    by estimated frequency. Width 64 < distinct keys forces real collisions,
    so the gate exercises the min-over-rows estimate, not a trivial exact
    count; estimates are integer cell sums the oracle replays bit-for-bit."""
    from hudi_0_12_0_my_spark.operators import heavy_hitters
    ev = _read_events(spark, sf_dir)
    return heavy_hitters(ev, "user_id", depth=4, width=64, k=20,
                         hash_fn="portable_md5")


def q_events_hll_distinct(spark, sf_dir):
    """HyperLogLog distinct users per (event_type, day)
    (operators/sketches.py hll_distinct, m=64 registers): registers are
    pure integer bit math (bucket = h mod m, rho from bin()-length of the
    remaining bits), the register fold is a scaled-integer sum, and the
    single float division is IEEE-exact — DuckDB replays the estimate to
    the last bit. Joined against the exact distinct count per group so the
    gate also witnesses estimator accuracy."""
    from hudi_0_12_0_my_spark.operators import hll_distinct
    ev = _read_events(spark, sf_dir).withColumn(
        "day", F.to_date(F.date_trunc("day", F.col("ts"))))
    est = hll_distinct(ev, "user_id", group_cols=["event_type", "day"],
                       p=6, hash_fn="portable_md5", seed=7,
                       out_col="est_users")
    exact = ev.groupBy("event_type", "day").agg(
        F.count_distinct("user_id").cast("bigint").alias("n_users"))
    return est.join(exact, ["event_type", "day"]) \
              .select("event_type", "day", "est_users", "n_users")


def q_docs_table_dedup(spark, sf_dir):
    """Composition: curation operators run over the LAKE TABLE snapshot, not
    raw parquet — documents ingested (bulk_insert), corrected (upsert), then
    exact-deduped. Proves the operator layer rides on the table format."""
    from hudi_0_12_0_my_spark.operators import exact_dedup
    key = (sf_dir, "docs_tbl")
    if key not in _BUILT:
        docs = _read(spark, sf_dir, "documents")
        t = _eng(spark).create_table(
            _fresh(_root(sf_dir, "docs_tbl")),
            record_key_fields=["doc_id"], precombine_field="n_chars",
            partition_field="lang")
        t.bulk_insert(docs)
        fix = (docs.filter(F.col("doc_id") % 10 == 0)
               .withColumn("text", F.concat(F.col("text"), F.lit(" v2")))
               .withColumn("n_chars", F.col("n_chars") + 3))
        t.upsert(fix)
        _BUILT[key] = t
    t = _BUILT[key]
    kept = exact_dedup(t.snapshot())
    return kept.agg(_n("n_kept"),
                    F.sum("dup_count").cast("bigint").alias("n_total"))


def q_docs_incremental_dedup(spark, sf_dir):
    """Incremental LSH index maintenance + batch dedup (derived.py
    sync_minhash_index / operators.dedup.dedup_against_index): the corpus
    (doc_id %5 != 0) is ingested, then corrected (%7 == 1 texts get ' v2')
    and pruned (%11 == 1 deleted) — the index follows via TWO syncs (snapshot
    fold, then CDC fold that re-signatures only changed docs). A new batch
    (%5 == 0) dedups against the index without touching corpus text. Oracle:
    DuckDB recomputes signatures over the FINAL corpus state and replays the
    banded join — byte-equal via the portable md5 hash family."""
    from hudi_0_12_0_my_spark.derived import sync_minhash_index
    from hudi_0_12_0_my_spark.operators import dedup_against_index
    key = (sf_dir, "docs_lsh_idx")
    if key not in _BUILT:
        docs = _read(spark, sf_dir, "documents")
        eng = _eng(spark)
        t = eng.create_table(
            _fresh(_root(sf_dir, "docs_lsh_idx")) + "/src",
            record_key_fields=["doc_id"], precombine_field="n_chars",
            keygen="nonpartitioned")
        idx = eng.create_table(
            os.path.join(_root(sf_dir, "docs_lsh_idx"), "idx"),
            record_key_fields=["doc_id"], keygen="nonpartitioned")
        t.bulk_insert(docs.filter(F.col("doc_id") % 5 != 0))
        sync_minhash_index(t, idx, hash_fn="portable_md5")
        t.upsert(docs.filter((F.col("doc_id") % 5 != 0)
                             & (F.col("doc_id") % 7 == 1))
                 .withColumn("text", F.concat(F.col("text"), F.lit(" v2")))
                 .withColumn("n_chars", F.col("n_chars") + 3))
        t.delete(where="doc_id % 11 = 1")
        sync_minhash_index(t, idx, hash_fn="portable_md5")
        _BUILT[key] = idx
    idx = _BUILT[key]
    batch = _read(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    return dedup_against_index(batch, idx.snapshot(),
                               jaccard_threshold=0.4,
                               hash_fn="portable_md5")


def q_emb_ivf_index_topk(spark, sf_dir):
    """Stream-maintained IVF vector index (derived.sync_ivf_index): the
    corpus (vec_id %5 != 0) is ingested, then churned (%7 == 1 vectors
    negated, %11 == 1 deleted) — the cell-partitioned index table follows
    via TWO syncs (snapshot build with frozen centroids, then a CDC fold
    that re-assigns only changed vectors, tombstoning moved/deleted rows in
    their OLD cells). Query probes all cells (nprobe == num_cells), so the
    result must equal exact cosine top-k over the FINAL corpus state —
    which is what the DuckDB oracle computes; any stale, duplicate or
    missing index row diverges."""
    from hudi_0_12_0_my_spark.derived import ivf_index_search, sync_ivf_index
    key = (sf_dir, "emb_ivf_idx")
    if key not in _BUILT:
        emb = _read(spark, sf_dir, "embeddings")
        eng = _eng(spark)
        src = eng.create_table(
            _fresh(_root(sf_dir, "emb_ivf_idx")) + "/src",
            record_key_fields=["vec_id"], precombine_field="label",
            keygen="nonpartitioned")
        idx = eng.create_table(
            os.path.join(_root(sf_dir, "emb_ivf_idx"), "idx"),
            record_key_fields=["vec_id"], partition_field="cell")
        src.bulk_insert(emb.filter(F.col("vec_id") % 5 != 0))
        sync_ivf_index(src, idx, num_cells=8)
        src.upsert(emb.filter((F.col("vec_id") % 7 == 1)
                              & (F.col("vec_id") % 5 != 0))
                   .withColumn("embedding",
                               F.transform("embedding", lambda x: -x)))
        src.delete(where="vec_id % 11 = 1")
        sync_ivf_index(src, idx, num_cells=8)
        _BUILT[key] = (src, idx)
    src, idx = _BUILT[key]
    q = src.snapshot().select("vec_id", "embedding").filter("vec_id < 5")
    return (ivf_index_search(idx, q, k=10, nprobe=8)
            .select("query_id", "neighbor_id",
                    F.col("rank").cast("int").alias("rank")))


def q_docs_decontaminate(spark, sf_dir):
    """Benchmark decontamination: docs sharing any word 4-gram with the
    simulated eval set (doc_id % 97 == 0) are flagged. The benchmark gram
    set broadcasts; the corpus side never shuffles."""
    from hudi_0_12_0_my_spark.operators import contaminated_ids
    docs = _read(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    probe = docs.filter(F.col("doc_id") % 97 != 0)
    return contaminated_ids(probe, bench, n=4)


def q_docs_segment_filter(spark, sf_dir):
    """RefinedWeb-style line-wise corrections at 20-token segment
    granularity (operators/pipeline.py segment_filter): segments with
    fewer than 3 tokens, digit/punct domination, or repeating earlier
    content within the SAME doc are dropped and the doc reassembles.
    Entirely map-only (no exchange in the plan). The oracle replays every
    rule (RE2-safe char classes) and the first-occurrence test."""
    from hudi_0_12_0_my_spark.operators import segment_filter
    docs = _read(spark, sf_dir, "documents")
    return segment_filter(docs, window=20, min_tokens=3).select(
        "doc_id", "text_filtered", "n_segments", "n_kept")


def q_docs_mixture_plan(spark, sf_dir):
    """Training-mixture token budgeting (operators/pipeline.py
    mixture_plan): per-language available tokens vs a 100k-token budget at
    fixed target shares, with the implied epoch (repeat) factor."""
    from hudi_0_12_0_my_spark.operators import mixture_plan
    docs = _read(spark, sf_dir, "documents")
    return mixture_plan(docs, "lang",
                        {"en": 0.4, "de": 0.2, "es": 0.2, "fr": 0.2},
                        target_tokens=100_000).select(
        "group", "available_tokens", "share", "assigned_tokens", "epochs")


def q_docs_bpe_pairs(spark, sf_dir):
    """BPE first-merge statistics (operators/textstats.py bpe_pair_counts,
    Sennrich'16): corpus compresses to its word vocabulary, then adjacent
    char pairs count weighted by word frequency; top-20 is the merge-rule
    candidate list. Oracle replays the vocab compression and weighting."""
    from hudi_0_12_0_my_spark.operators import bpe_pair_counts
    docs = _read(spark, sf_dir, "documents")
    return bpe_pair_counts(docs, k=20).select("rank", "pair", "occurrences")


def q_docs_shard_plan(spark, sf_dir):
    """Deterministic training-export sharding (operators/pipeline.py
    shard_plan): shard_id = portable Knuth hash mod 8, shard_pos = rank of
    (hash, id) within the shard — a reproducible global shuffle. The
    oracle re-derives the identical hash arithmetic and ranking."""
    from hudi_0_12_0_my_spark.operators import shard_plan
    docs = _read(spark, sf_dir, "documents")
    return shard_plan(docs, n_shards=8, text_col="text").select(
        "doc_id", "shard_id", "shard_pos", "n_tokens")


def q_docs_contamination_score(spark, sf_dir):
    """Graded benchmark-overlap scoring (operators/pipeline.py
    contamination_score): fraction of each doc's distinct word 4-grams that
    appear in the simulated eval set (doc_id % 97 == 0). The continuous
    variant of docs_decontaminate — the oracle recomputes the per-doc
    distinct-gram hit fractions on the raw strings."""
    from hudi_0_12_0_my_spark.operators import contamination_score
    docs = _read(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    probe = docs.filter(F.col("doc_id") % 97 != 0)
    return contamination_score(probe, bench, n=4).select(
        "doc_id", "n_grams", "n_contaminated", "contamination")


def q_emb_cluster_topics(spark, sf_dir):
    """Corpus organization end-to-end: k-means over the embeddings (2 Lloyd
    rounds, deterministic init — the emb_kmeans machinery), then label each
    cluster with its top-5 terms by cluster-level tf-idf over the joined
    document text (doc_id == vec_id in the fixtures). The oracle replays
    BOTH stages: the full Lloyd CTE chain feeding the same tokenize/count/
    idf/top-k pipeline."""
    from hudi_0_12_0_my_spark.operators import cluster_topics, kmeans_assign
    emb = _read(spark, sf_dir, "embeddings")
    docs = _read(spark, sf_dir, "documents")
    asg = kmeans_assign(emb, k=4, iters=2).select(
        F.col("vec_id").alias("doc_id"), "cluster")
    return cluster_topics(docs, asg, k=5)


def q_docs_span_decontaminate(spark, sf_dir):
    """Span-level decontamination (GPT-3/PaLM appendix recipe): only the
    20-token segments sharing a word 4-gram with the simulated eval set are
    cut; the rest of each document survives, reassembled in order. DuckDB
    replays the same segmentation, gram windows, and reassembly exactly."""
    from hudi_0_12_0_my_spark.operators import decontaminate_spans
    docs = _read(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    probe = docs.filter(F.col("doc_id") % 97 != 0)
    return decontaminate_spans(probe, bench, n=4, window=20)


def q_docs_dsir_topk(spark, sf_dir):
    """DSIR importance weighting (Xie'23 hashed n-gram variant): score every
    doc by how English-like its 1+2-gram hashed-bucket distribution is
    (target = the en slice), top-50 by weight. portable_md5 buckets +
    round(,6) make every stage — bucket counts, smoothing, log-ratio, the
    per-doc sum — bit-replayable in DuckDB."""
    from hudi_0_12_0_my_spark.operators import dsir_logweights
    docs = _read(spark, sf_dir, "documents")
    target = docs.filter(F.col("lang") == "en")
    w = dsir_logweights(docs, target, orders=(1, 2), num_buckets=4096,
                        alpha=1.0, seed=42, hash_fn="portable_md5")
    return (w.select("doc_id", F.round("dsir_logw", 6).alias("dsir_logw"))
            .orderBy(F.col("dsir_logw").desc(), F.col("doc_id")).limit(50))


def q_docs_ccnet_buckets(spark, sf_dir):
    """CCNet head/middle/tail bucketing (Wenzek'20): per-language LM-score
    terciles, low score = head. Returns per (lang, bucket) counts; the
    oracle replays the identical unigram LM, ranking, and ceil cuts."""
    from hudi_0_12_0_my_spark.operators import lm_log_prob, perplexity_buckets
    docs = _read(spark, sf_dir, "documents")
    scored = (docs.select("doc_id", "lang")
              .join(lm_log_prob(docs, order=1), "doc_id")
              .withColumn("nll", -F.col("lm_logprob")))
    b = perplexity_buckets(scored, "nll", group_col="lang", ascending=True)
    return (b.groupBy("lang", "ppl_bucket")
             .agg(F.count(F.lit(1)).alias("n_docs"),
                  F.min("doc_id").alias("min_doc"))
             .orderBy("lang", "ppl_bucket"))


def q_docs_url_curate(spark, sf_dir):
    """RefinedWeb URL curation: normalize synthetic crawl URLs, extract the
    registered domain, drop two blocklisted domains, dedup on the
    normalized URL (lowest doc_id wins). DuckDB replays the identical RE2
    regex pipeline and first-occurrence window."""
    from hudi_0_12_0_my_spark.operators import curate_urls
    docs = _read(spark, sf_dir, "documents")
    docs = docs.withColumn("url", F.concat_ws(
        "", F.lit("HTTPS://WWW."), F.col("source"),
        (F.col("doc_id") % 5).cast("string"), F.lit(".COM:443/p/"),
        (F.col("doc_id") % 13).cast("string"), F.lit("/?utm=x&id="),
        F.col("doc_id").cast("string"), F.lit("#frag")))
    out = curate_urls(docs, blocklist=["src00.com", "src31.com"])
    return (out.select("doc_id", "url_norm", "domain", "lang")
            .orderBy("doc_id"))


def q_docs_char_entropy(spark, sf_dir):
    """Character-unigram Shannon entropy as a gibberish/boilerplate signal —
    computed MAP-ONLY with array higher-order functions (no explode, no
    shuffle); DuckDB replays via char explode + groupBy, proving the
    shuffle-free HOF shape computes the identical number."""
    from hudi_0_12_0_my_spark.operators import with_char_entropy
    docs = _read(spark, sf_dir, "documents")
    return (with_char_entropy(docs).select("doc_id", "char_entropy")
            .orderBy("doc_id").limit(300))


def q_docs_weighted_sample(spark, sf_dir):
    """Efraimidis-Spirakis weighted sampling without replacement: inclusion
    odds proportional to doc length, keys deterministic from the portable
    id hash — the oracle re-derives every key and the same top-60."""
    from hudi_0_12_0_my_spark.operators import weighted_sample
    docs = _read(spark, sf_dir, "documents")
    return (weighted_sample(docs, 60, "n_chars")
            .select("doc_id", "lang", "n_chars").orderBy("doc_id"))


def q_docs_temperature_sample(spark, sf_dir):
    """Temperature-flattened language mixture (XLM-R recipe, tau=0.5):
    shares ∝ (count/N)^0.5, scarcest-group feasibility, deterministic
    portable-hash filter — DuckDB re-derives counts, flattened shares, and
    every kept id exactly."""
    from hudi_0_12_0_my_spark.operators import temperature_sample
    docs = _read(spark, sf_dir, "documents")
    return (temperature_sample(docs, "lang", tau=0.5)
            .groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"),
                                 F.min("doc_id").alias("min_doc"),
                                 F.max("doc_id").alias("max_doc"))
            .orderBy("lang"))


def q_docs_split(spark, sf_dir):
    """Deterministic 80/10/10 train/val/test split via the engine-portable
    bucket hash — DuckDB re-derives every assignment exactly, proving the
    split is reproducible cross-engine (the property randomSplit lacks)."""
    from hudi_0_12_0_my_spark.operators import split_dataset
    docs = _read(spark, sf_dir, "documents")
    return split_dataset(docs, {"train": 0.8, "val": 0.1, "test": 0.1}) \
        .select("doc_id", "lang", "split")


def q_docs_pii_scrub(spark, sf_dir):
    """PII scrubbing over text with synthetic PII spans appended (the corpus
    itself is PII-free word salad). Rules are RE2-safe so the DuckDB oracle
    applies the byte-identical regex set."""
    from hudi_0_12_0_my_spark.operators import scrub_pii
    docs = _read(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    docs = docs.withColumn("text", F.concat(
        F.col("text"), F.lit(" contact user"), F.col("doc_id").cast("string"),
        F.lit("@example.com or 555-123-4567 ssn 123-45-6789"
              " card 4111 1111 1111 1111 end")))
    return scrub_pii(docs).select("doc_id", "text")


def q_docs_sample_stratified(spark, sf_dir):
    """Per-language deterministic sampling quotas (engine-portable bucket
    hash, reproducible across runs/retries — never rand())."""
    from hudi_0_12_0_my_spark.operators import stratified_sample
    docs = _read(spark, sf_dir, "documents")
    return stratified_sample(
        docs, "lang", {"en": 0.5, "de": 0.25, "fr": 0.1, "es": 0.75},
        id_col="doc_id").select("doc_id", "lang")


def q_docs_quality_percentile(spark, sf_dir):
    """Top-30%-per-language selection by score (percentile, not an absolute
    cutoff): one window shuffle keyed by lang in exact mode; the 100 TB
    default is the approx mode whose corpus side never shuffles."""
    from hudi_0_12_0_my_spark.operators import percentile_filter
    docs = _read(spark, sf_dir, "documents")
    return (percentile_filter(docs, 0.3, "n_chars", group_col="lang")
            .select("doc_id", "lang", "n_chars"))


def q_docs_mixture_sample(spark, sf_dir):
    """Rebalance to a target language mixture (40/20/20/20): scarcest group
    binds the achievable size, the rest downsample via the engine-portable
    hash — one tiny count agg + a map-only filter."""
    from hudi_0_12_0_my_spark.operators import mixture_sample
    docs = _read(spark, sf_dir, "documents")
    return (mixture_sample(docs, "lang",
                           {"en": 0.4, "de": 0.2, "es": 0.2, "fr": 0.2})
            .select("doc_id", "lang"))


def q_events_sessionize(spark, sf_dir):
    """Gaps-and-islands sessionization (24h inactivity gap): one shuffle on
    user_id shared by the lag window, the island numbering, and the final
    per-session aggregate."""
    from hudi_0_12_0_my_spark.operators import session_stats
    ev = _read_events(spark, sf_dir)
    return session_stats(ev, gap_seconds=86400, value_col="value")


def q_emb_near_dup(spark, sf_dir):
    # num_cells=1 makes the IVF blocking exact (all-pairs), so a plain
    # cross-join DuckDB oracle verifies the cosine + pair semantics; cosine
    # itself is excluded from the output because DuckDB computes it in
    # float32 (values differ at ~1e-7; the 0.40 boundary gap is ~6e-4).
    from hudi_0_12_0_my_spark.operators import embedding_near_dup_pairs
    emb = _read(spark, sf_dir, "embeddings")
    return embedding_near_dup_pairs(emb, threshold=0.40, num_cells=1) \
        .select("id_a", "id_b")


def _build_keyrange(spark, sf_dir):
    """GLOBAL_SORT table + narrow-band upsert: exercises the key-range
    (bloom-parity) pruned tag path (writer._candidate_base_files)."""
    key = (sf_dir, "krange")
    if key not in _BUILT:
        base = _li_base(spark, sf_dir)
        t = _eng(spark).create_table(
            _fresh(_root(sf_dir, "krange")),
            record_key_fields=["l_orderkey", "l_linenumber"],
            precombine_field="l_shipdate",
            target_file_bytes=8 * 1024 * 1024)
        t.bulk_insert(base)      # key-sorted files -> tight per-file key ranges
        band = (base.filter((F.col("l_orderkey") >= 1000)
                            & (F.col("l_orderkey") <= 1200))
                .withColumn("l_quantity", F.col("l_quantity") + 5000.0))
        t.upsert(band)
        _BUILT[key] = t
    return _BUILT[key]


def q_bloom_key_range(spark, sf_dir):
    t = _build_keyrange(spark, sf_dir)
    return (t.snapshot(filters="l_orderkey >= 900 and l_orderkey <= 1300")
            .groupBy("l_returnflag")
            .agg(_n(), _dec_sum("l_quantity", "sum_qty")))


def _build_bloomidx(spark, sf_dir):
    """bloom_filters metadata partition live end-to-end: bitsets appended at
    commit time, probe prunes absent-key files at tag time
    (MetadataPartitionType.BLOOM_FILTERS, HoodieBloomIndex.java:115-132)."""
    key = (sf_dir, "bloomidx")
    if key not in _BUILT:
        orders = _read(spark, sf_dir, "orders")
        t = _eng(spark).create_table(
            _fresh(_root(sf_dir, "bloomidx")),
            record_key_fields=["o_orderkey"], precombine_field="o_totalprice",
            bloom_index_enabled=True, target_file_bytes=8 * 1024 * 1024)
        t.bulk_insert(orders)
        # mixed batch: updates (keys present -> bloom keeps their files) +
        # brand-new keys inside existing ranges (bloom prunes their files)
        upd = (orders.filter(F.col("o_orderkey") % 17 == 0)
               .withColumn("o_totalprice", F.col("o_totalprice") + 555.0))
        new = (orders.filter(F.col("o_orderkey") % 97 == 0)
               .withColumn("o_orderkey", F.col("o_orderkey") + 100000000))
        t.upsert(upd.unionByName(new))
        _BUILT[key] = t
    return _BUILT[key]


def q_bloom_filters_index(spark, sf_dir):
    t = _build_bloomidx(spark, sf_dir)
    return (t.snapshot().groupBy("o_orderpriority")
            .agg(_n(), _dec_sum("o_totalprice", "sum_price")))


def _build_inc_clean(spark, sf_dir):
    """Clean-then-incremental: the pull range's files were cleaned, forcing
    the fallback-to-full-scan path (IncrementalRelation.scala:199-254)."""
    key = (sf_dir, "inc_clean")
    if key not in _BUILT:
        orders = _read(spark, sf_dir, "orders")
        t = _eng(spark).create_table(
            _fresh(_root(sf_dir, "inc_clean")),
            record_key_fields=["o_orderkey"], precombine_field="o_orderdate",
            partition_field="o_orderpriority", cleaner_retain_commits=1)
        t.bulk_insert(orders)
        t.upsert(orders.filter(F.col("o_orderkey") % 7 == 0)
                 .withColumn("o_totalprice", F.col("o_totalprice") + 1111.0))
        t.upsert(orders.filter(F.col("o_orderkey") % 7 == 1)
                 .withColumn("o_totalprice", F.col("o_totalprice") + 2222.0))
        t.clean()
        commits = [i.time for i in t.timeline.completed_write_instants()]
        _BUILT[key] = (t, commits)
    return _BUILT[key]


def q_incremental_after_clean(spark, sf_dir):
    t, commits = _build_inc_clean(spark, sf_dir)
    inc = t.incremental(begin=commits[0], end=commits[1])
    return (inc.groupBy("o_orderpriority")
            .agg(_n(), _dec_sum("o_totalprice", "sum_price")))


def _build_custom_keygen(spark, sf_dir):
    """CustomAvroKeyGenerator two-level partition path:
    'o_orderpriority:simple,o_orderdate:timestamp' -> 'PRIO/2021'."""
    key = (sf_dir, "ckg")
    if key not in _BUILT:
        orders = _read(spark, sf_dir, "orders")
        t = _eng(spark).create_table(
            _fresh(_root(sf_dir, "ckg")),
            record_key_fields=["o_orderkey"], precombine_field="o_totalprice",
            keygen="custom",
            partition_field="o_orderpriority:simple,o_orderdate:timestamp",
            keygen_timestamp_unit="timestamp", keygen_output_format="yyyy")
        t.bulk_insert(orders)
        t.upsert(orders.filter(F.col("o_orderkey") % 13 == 0)
                 .withColumn("o_totalprice", F.col("o_totalprice") + 999.0))
        _BUILT[key] = t
    return _BUILT[key]


def _build_debezium(spark, sf_dir):
    """Out-of-order MySQL-Debezium batches (binlog file+pos ordering): newer
    binlog events applied FIRST, older ones arriving late must lose."""
    key = (sf_dir, "dbz")
    if key not in _BUILT:
        from hudi_0_12_0_my_spark.payloads import debezium_transform
        orders = _read(spark, sf_dir, "orders")

        def ev(df, fileno, pos, op):
            return debezium_transform(
                df.withColumn("_event_bin_file", F.lit(f"mysql-bin.{fileno}"))
                  .withColumn("_event_pos", F.lit(pos))
                  .withColumn("_change_operation_type", F.lit(op)))
        t = _eng(spark).create_table(
            _fresh(_root(sf_dir, "dbz")),
            record_key_fields=["o_orderkey"], precombine_field="_event_seq",
            payload="event_time", partition_field="o_orderpriority")
        t.upsert(ev(orders, "000001", 1, "r"))
        mod3 = orders.filter(F.col("o_orderkey") % 3 == 0)
        # newer events (file 000003) first ...
        t.upsert(ev(mod3.withColumn("o_totalprice", F.col("o_totalprice") * 2),
                    "000003", 5, "u"))
        # ... then the OLDER update arrives late and must not win
        t.upsert(ev(mod3.withColumn("o_totalprice", F.col("o_totalprice") + 7),
                    "000002", 9, "u"))
        # deletes via op='d'
        t.upsert(ev(orders.filter(F.col("o_orderkey") % 11 == 0), "000004", 2, "d"))
        _BUILT[key] = t
    return _BUILT[key]


def q_debezium_cdc(spark, sf_dir):
    t = _build_debezium(spark, sf_dir)
    return (t.snapshot().groupBy("o_orderpriority")
            .agg(_n(), _dec_sum("o_totalprice", "sum_price")))


def q_custom_keygen_partitions(spark, sf_dir):
    t = _build_custom_keygen(spark, sf_dir)
    return (t.snapshot()
            .groupBy("o_orderpriority",
                     F.year("o_orderdate").cast("int").alias("yr"))
            .agg(_n(), _dec_sum("o_totalprice", "sum_price")))


# ---- rows-only (no SQL-expressible oracle; driver records weaker check)
def q_docs_minhash_lsh(spark, sf_dir):
    """Full MinHash-LSH semantics (signatures -> banding -> candidate join ->
    jaccard estimate) with the engine-portable md5 hash, so DuckDB replays
    the entire pipeline exactly (the production default stays xxhash64)."""
    from hudi_0_12_0_my_spark.operators import minhash_lsh_pairs
    docs = _read(spark, sf_dir, "documents")
    return minhash_lsh_pairs(docs, num_hashes=32, bands=8,
                             jaccard_threshold=0.4, hash_fn="portable_md5")


def q_docs_dup_clusters(spark, sf_dir):
    """Transitive duplicate clusters: portable-hash MinHash-LSH pairs fed
    through alternating large-star/small-star connected components. DuckDB
    replays the pair pipeline and closes it with a recursive CTE, so the
    exact cluster memberships are oracle-checked."""
    from hudi_0_12_0_my_spark.operators import (dup_clusters,
                                                minhash_lsh_pairs)
    docs = _read(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs, num_hashes=32, bands=8,
                              jaccard_threshold=0.4, hash_fn="portable_md5")
    return dup_clusters(pairs)


def q_docs_cluster_best(spark, sf_dir):
    """Quality-aware dedup audit: n-gram-Jaccard near-dup pairs -> exact
    transitive clusters -> per cluster, the member that survives is the
    HIGHEST quality_score (ties: smallest id). DuckDB replays the pair
    pipeline, closes it with a recursive CTE, and re-ranks by the same
    quality formula — cluster picks are oracle-exact."""
    from hudi_0_12_0_my_spark.operators import (cluster_representatives,
                                                ngram_jaccard_pairs,
                                                with_quality_score)
    docs = _read(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, n=3, threshold=0.8)
    return cluster_representatives(with_quality_score(docs), pairs)


def q_docs_bm25(spark, sf_dir):
    """BM25 keyword retrieval over the corpus: one stats aggregate (N,
    avgdl, per-term df) + a map-only scoring pass + TakeOrdered top-k.
    Scores round to 6 decimals with id tie-breaks, so the top-k set and
    values are oracle-exact."""
    from hudi_0_12_0_my_spark.operators import bm25_topk
    docs = _read(spark, sf_dir, "documents")
    return bm25_topk(docs, "the data model", k=20)


def q_docs_quota_cap(spark, sf_dir):
    """Per-domain quota cap (web-corpus "no domain over N docs" rule): keep
    the 20 longest docs per source, deterministic (n_chars desc, doc_id)
    tie-break. Two-phase shape: broadcast pass-through for under-quota
    sources, window shuffle only for the over-quota slice — the oracle is
    the plain per-group row_number the composition is equivalent to."""
    from hudi_0_12_0_my_spark.operators import quota_cap
    docs = _read(spark, sf_dir, "documents")
    return (quota_cap(docs, "source", cap=20, score_col="n_chars")
            .select("doc_id", "source", "n_chars"))


def q_docs_hybrid_rrf(spark, sf_dir):
    """Hybrid retrieval: BM25 top-20 for "the data model" fused with dense
    cosine top-20 around vec_id 0 (doc_id == vec_id in the fixtures) via
    reciprocal-rank fusion (k=60). Only integer ranks enter the fusion, so
    the DuckDB oracle replays it exactly."""
    from hudi_0_12_0_my_spark.operators import bm25_topk, cosine_topk, rrf_fuse
    docs = _read(spark, sf_dir, "documents")
    emb = _read(spark, sf_dir, "embeddings")
    lex = (bm25_topk(docs, "the data model", k=20)
           .select("doc_id",
                   F.row_number().over(
                       Window.orderBy(F.desc("bm25"), F.asc("doc_id")))
                   .alias("rank")))
    dense = (cosine_topk(emb, emb.filter("vec_id = 0"), k=20)
             .select(F.col("neighbor_id").alias("doc_id"), "rank"))
    return (rrf_fuse([lex, dense], k=60, top=20)
            .select("doc_id", "rrf", "n_lists", "rank"))


def q_docs_simhash(spark, sf_dir):
    """48-bit SimHash near-dup pairs with the portable hash (60 usable hash
    bits cap it below the xxhash64 default of 64) — oracle-exact."""
    from hudi_0_12_0_my_spark.operators import simhash_near_dup_pairs
    docs = _read(spark, sf_dir, "documents")
    return simhash_near_dup_pairs(docs, max_hamming=6, bits=48,
                                  hash_fn="portable_md5")


def q_emb_ivf_topk(spark, sf_dir):
    """IVF top-k with nprobe == num_cells: every cell is probed, so the
    result is provably identical to exact top-k and the brute-force oracle
    applies — while the gate still exercises the full IVF plumbing
    (centroid sampling, cell assignment, probe selection, cell join).
    Production use sets nprobe < num_cells for the ~cells/nprobe scan cut."""
    from hudi_0_12_0_my_spark.operators import ivf_cosine_topk
    emb = _read(spark, sf_dir, "embeddings")
    res = ivf_cosine_topk(emb, emb.filter("vec_id < 5"), k=10,
                          num_cells=8, nprobe=8)
    return res.select("query_id", "neighbor_id",
                      F.col("rank").cast("int").alias("rank"))


def q_emb_semantic_dedup(spark, sf_dir):
    """SemDeDup survivors with num_cells=1: the cell blocking is exhaustive,
    so pairs == all cosine-threshold pairs and the recursive-CTE oracle is
    exact (production runs use num_cells >> 1 for the bucketed scale path)."""
    from hudi_0_12_0_my_spark.operators import semantic_dedup
    emb = _read(spark, sf_dir, "embeddings")
    kept = semantic_dedup(emb, threshold=0.40, num_cells=1)
    return kept.select("vec_id", F.col("label").cast("int").alias("label"))


def q_multimodal_features(spark, sf_dir):
    """Full-oracle multimodal features: the deterministic fake decode is a
    sha256 chain over the payload bytes (operators/multimodal.py), which
    DuckDB replays byte-for-byte (sha256 hex -> per-byte /255.0 -> REAL, the
    same float32 rounding Arrow applies). Scalar float columns keep the
    driver's pandas canonicalizer happy (arrays are unhashable)."""
    from hudi_0_12_0_my_spark.operators import (extract_features,
                                                with_media_columns)
    docs = _read(spark, sf_dir, "documents") \
        .withColumn("payload",
                    F.coalesce(F.col("text"), F.lit("")).cast("binary"))
    mm = with_media_columns(docs, "payload", "image", "image/png",
                            width=64, height=64)
    feats = extract_features(mm, dim=8)
    fcols = [F.element_at("features", i + 1).alias(f"f{i}") for i in range(8)]
    return feats.select("doc_id", "media_type",
                        F.size("features").alias("feat_dim"), *fcols)


def q_multimodal_audio_chunks(spark, sf_dir):
    """Audio chunking plan (the pre-decode explode that parallelizes one
    long recording across tasks): per-row durations derived from n_chars,
    one row per 10s window, end clamped to the duration. Pure sequence
    arithmetic — DuckDB replays every window exactly."""
    from hudi_0_12_0_my_spark.operators import (audio_chunk_plan,
                                                with_media_columns)
    docs = _read(spark, sf_dir, "documents") \
        .withColumn("payload", F.coalesce(F.col("text"), F.lit(""))
                    .cast("binary"))
    mm = with_media_columns(docs, "payload", "audio", "audio/wav",
                            duration_ms=F.col("n_chars") * 37,
                            sample_rate=16000)
    return (audio_chunk_plan(mm, chunk_ms=10_000)
            .select("doc_id", "chunk_start_ms", "chunk_end_ms"))


def q_multimodal_frame_plan(spark, sf_dir):
    """Frame-sampling plan: one row per 5s frame timestamp of each clip
    (inclusive of an exact-multiple endpoint, like the operator's
    sequence)."""
    from hudi_0_12_0_my_spark.operators import (frame_sample_plan,
                                                with_media_columns)
    docs = _read(spark, sf_dir, "documents") \
        .withColumn("payload", F.coalesce(F.col("text"), F.lit(""))
                    .cast("binary"))
    mm = with_media_columns(docs, "payload", "video", "video/mp4",
                            duration_ms=F.col("n_chars") * 37,
                            n_frames=100)
    return (frame_sample_plan(mm, every_ms=5_000)
            .select("doc_id", "frame_ts"))


def q_multimodal_phash_dedup(spark, sf_dir):
    """pHash-style banded near-dup over the binary media column
    (operators/multimodal.py phash_near_dup): 64-bit hash -> 4 bands ->
    equi-join blocking -> exact Hamming filter. The stand-in hash is
    md5(payload)[:16] (decode stub), which DuckDB replays exactly, so the
    oracle enumerates the same candidate pairs and distances. The payload
    mixes deterministic duplicate groups (doc_id%3==0 rows collapse to a
    lang:length-bucket token => identical hashes, hamming 0) with distinct
    texts (band-value birthday collisions => candidates the hamming<=8
    filter rejects), so BOTH the blocking join and the distance filter are
    non-vacuously checked (146 candidates -> 139 kept at sf0.01)."""
    from hudi_0_12_0_my_spark.operators import phash_near_dup
    docs = _read(spark, sf_dir, "documents") \
        .withColumn("media",
                    F.when(F.col("doc_id") % 3 == 0,
                           F.concat(F.col("lang"), F.lit(":"),
                                    (F.col("n_chars") % 25).cast("string")))
                     .otherwise(F.coalesce(F.col("text"), F.lit("")))
                     .cast("binary"))
    return phash_near_dup(docs, id_col="doc_id", media_col="media",
                          bands=4, max_hamming=8)


def q_docs_boilerplate(spark, sf_dir):
    """Corpus-level boilerplate removal (operators/pipeline.py
    boilerplate_filter, CCNet/Dolma-style): every 20-token segment that
    appears in >= 2 DISTINCT documents is dropped from ALL its hosts (the
    complement of docs_segment_dedup's keep-first-copy) and the survivors
    reassemble in order. At sf0.01, 53 of 1535 distinct segments are
    boilerplate, so the frequency count, the anti-join and the reassembly
    are all non-vacuously checked."""
    from hudi_0_12_0_my_spark.operators import boilerplate_filter
    docs = _read(spark, sf_dir, "documents")
    return boilerplate_filter(docs, min_docs=2, window=20).select(
        "doc_id", "text_filtered", "n_segments", "n_kept")


def q_docs_gopher_quality(spark, sf_dir):
    """Gopher quality rules (operators/textstats.py with_gopher_quality,
    Rae'21 App. A1.1): word-count bounds, mean word length, symbol-to-word
    ratio, alphabetic-word fraction and required-stop-word hits, plus the
    combined pass verdict. Bounds are tuned to the synthetic corpus so the
    verdict SPLITS it (word-count, mean-word-length and stop-hit rules all
    fire); the line-level bullet/ellipsis rules are exercised in pytest on
    newline-structured fixtures (this corpus is single-line, where they
    are identically true on both sides)."""
    from hudi_0_12_0_my_spark.operators import with_gopher_quality
    docs = _read(spark, sf_dir, "documents")
    return with_gopher_quality(docs, min_words=40, min_mean_word_len=4.2,
                               min_stop_hits=1).select(
        "doc_id", "n_words", "mean_word_len", "symbol_ratio",
        "alpha_word_frac", "stop_hits", "pass_gopher")


def q_events_rfm(spark, sf_dir):
    """RFM user segmentation (operators/sessions.py rfm_segments):
    per-user recency / frequency / exact-decimal monetary, each cut into 5
    equal-population ntile tiles with id tiebreaks, concatenated into the
    classic segment code. The oracle replays the aggregation and all three
    window cuts."""
    from hudi_0_12_0_my_spark.operators import rfm_segments
    ev = _read(spark, sf_dir, "events")
    return rfm_segments(ev, n_tiles=5).select(
        "user", "recency_days", "frequency", "monetary",
        "r_tile", "f_tile", "m_tile", "segment")


def q_events_rfm_approx(spark, sf_dir):
    """RFM segmentation, approx-tile mode (operators/sessions.py
    rfm_segments mode='approx'): tile boundaries come from the fixed-width
    histogram sketch (64 integer cells per metric, ONE map-side-combined
    shuffle each) interpolated with a fixed IEEE expression tree, then a
    MAP-ONLY assignment against literal boundary arrays — no global ntile
    sort anywhere (plan-pinned), the 100x-scale replacement for the exact
    mode. The oracle replays cells, interpolation and assignment
    bit-for-bit."""
    from hudi_0_12_0_my_spark.operators import rfm_segments
    ev = _read(spark, sf_dir, "events")
    return rfm_segments(ev, n_tiles=5, mode="approx",
                        approx_bins=64).select(
        "user", "recency_days", "frequency", "monetary",
        "r_tile", "f_tile", "m_tile", "segment")


def q_events_anomaly(spark, sf_dir):
    """Per-user daily-volume anomaly detection (operators/sessions.py
    count_anomalies): integer-exact z-test on (user, day) counts —
    (n*c - S1)^2 > z^2 * (n*S2 - S1^2) with integer sums, so the verdict
    replays bit-for-bit; the reported zscore is one sqrt + one divide on
    the same integers. z=2.5 flags 75 of ~6000 user-days at sf0.01."""
    from hudi_0_12_0_my_spark.operators import count_anomalies
    ev = _read(spark, sf_dir, "events")
    return count_anomalies(ev, z=2.5, min_days=3).select(
        "user", "day", "c", "n_days", "zscore")


def q_orders_basket_pairs(spark, sf_dir):
    """Market-basket pair mining (operators/profile.py basket_pairs):
    part classes (l_partkey % 50) co-occurring in an order, top-25 pairs
    by exact co-occurrence count with lift = n_ab*N/(n_a*n_b). The oracle
    replays the distinct-item baskets, the pair counts and the lift
    arithmetic."""
    from hudi_0_12_0_my_spark.operators import basket_pairs
    li = _read(spark, sf_dir, "lineitem")
    return basket_pairs(li, buckets=50, k=25).select(
        "item_a", "item_b", "n_orders", "lift")



def q_events_ab_test(spark, sf_dir):
    """A/B experiment readout (operators/sessions.py ab_test_stats):
    deterministic portable-hash arm split, per-event metric extracted from
    the JSON props column ($.k), pooled two-sample t over integer sums.
    The oracle replays the hash split, the JSON path and the exact t
    expression tree."""
    from hudi_0_12_0_my_spark.operators import ab_test_stats
    ev = _read(spark, sf_dir, "events")
    return ab_test_stats(ev, metric_path="$.k",
                         conversion_type="purchase").select(
        "variant", "n_users", "n_events", "n_conversions",
        "metric_sum", "metric_mean", "t_stat", "significant")


def q_events_stickiness(spark, sf_dir):
    """DAU/MAU stickiness per month (operators/sessions.py stickiness):
    integer distinct counts + one IEEE division. The oracle replays both
    distinct-count aggregations and the ratio."""
    from hudi_0_12_0_my_spark.operators import stickiness
    ev = _read(spark, sf_dir, "events")
    return stickiness(ev).select("month", "n_days", "dau_sum", "mau",
                                 "stickiness")


def q_docs_readability(spark, sf_dir):
    """Flesch reading-ease signal (operators/textstats.py
    with_readability): integer word / sentence-run / vowel-group counts
    feeding one fixed float expression. The oracle re-derives all three
    counts (including the no-vowel syllable floor) and the score."""
    from hudi_0_12_0_my_spark.operators import with_readability
    docs = _read(spark, sf_dir, "documents")
    return with_readability(docs).select(
        "doc_id", "n_words", "n_sentences", "n_syllables", "flesch")



def q_events_identity(spark, sf_dir):
    """Cross-device identity resolution (operators/graph.py
    identity_clusters): recurring (user, device) pairs (>= 4 events on the
    same pair; device = $.k from the JSON props) form a bipartite graph;
    connected components collapse users sharing a recurring device into
    one identity. 78 recurring edges over 65 users / 54 devices at sf0.01
    — a sparse multi-component graph, so the clustering is non-vacuous.
    The oracle replays the edge threshold and the transitive closure with
    a recursive CTE."""
    from hudi_0_12_0_my_spark.operators import identity_clusters
    ev = _read(spark, sf_dir, "events")
    return identity_clusters(
        ev, device_expr="CAST(get_json_object(props, '$.k') AS BIGINT)",
        min_occurrences=4).select(
        "user", "identity_id", "n_users", "n_devices")


def q_orders_basket_rules(spark, sf_dir):
    """Directed association rules (operators/profile.py basket_rules):
    both directions of every co-occurring part-class pair with
    confidence = n_both/n_antecedent and lift, top-25 by support. The
    oracle replays the shared basket statistics and both divisions."""
    from hudi_0_12_0_my_spark.operators import basket_rules
    li = _read(spark, sf_dir, "lineitem")
    return basket_rules(li, buckets=50, k=25).select(
        "antecedent", "consequent", "n_both", "confidence", "lift")



def q_orders_item_triangles(spark, sf_dir):
    """Triangle participation counts (operators/graph.py triangle_counts):
    the cluster-cohesion metric over a pair graph — here the part-class
    co-occurrence graph thresholded to >= 100 shared orders (160 edges,
    68 triangles at sf0.01: sparse AND triangle-bearing, so both the triad
    enumeration and the per-corner crediting are non-vacuous). The oracle
    replays the edge threshold and the oriented a<b<c triad join."""
    from hudi_0_12_0_my_spark.operators import triangle_counts
    from hudi_0_12_0_my_spark.operators.profile import _basket_counts
    li = _read(spark, sf_dir, "lineitem")
    c_ab, _, _ = _basket_counts(li, "l_orderkey", "l_partkey", 50)
    edges = (c_ab.filter(F.col("n_orders") >= 100)
             .select(F.col("item_a").alias("id_a"),
                     F.col("item_b").alias("id_b")))
    return triangle_counts(edges).select("id", "n_triangles")



def q_orders_correlation(spark, sf_dir):
    """Exact-accumulation Pearson correlations (operators/profile.py
    correlation_matrix): every sum folds in DECIMAL (order-insensitive —
    float-sum corr() is run-to-run nondeterministic under repartitioning),
    one fixed float expression per pair at the end. quantity~extendedprice
    correlates strongly, quantity~discount does not, so the statistic
    discriminates. The oracle replays the decimal sums and the identical
    expression tree."""
    from hudi_0_12_0_my_spark.operators import correlation_matrix
    li = _read(spark, sf_dir, "lineitem")
    return correlation_matrix(
        li, ["l_quantity", "l_extendedprice", "l_discount"],
        scale="decimal(19,4)").select("col_a", "col_b", "n", "r")



def q_events_forecast_baseline(spark, sf_dir):
    """Seasonal-naive forecast backtest (operators/sessions.py
    forecast_baseline): predict each (type, day) count with the count from
    7 days earlier; MAE + WAPE per type from integer error sums (23
    scored days per type at sf0.01). The oracle replays the lag self-join
    and both divisions."""
    from hudi_0_12_0_my_spark.operators import forecast_baseline
    ev = _read(spark, sf_dir, "events")
    return forecast_baseline(ev, season_days=7).select(
        "event_type", "n_days", "mae", "wape")



def q_join_rollup_incremental(spark, sf_dir):
    """Incrementally maintained JOIN view (derived.py sync_join_rollup):
    quantity/revenue per order priority over lineitem JOIN orders, kept
    current by the delta-join identity dF(x)D2 + F1(x)dD across BOTH lake
    tables' histories. Three syncs: full initial join; one window folding
    a fact delta (upsert+delete) AND a dim delta (priority reclassification
    = group moves) together; one dim-only delete window. The result must
    equal a from-scratch join rollup of both FINAL states — the oracle
    replays both mutation histories."""
    from hudi_0_12_0_my_spark.derived import sync_join_rollup
    t, commits = _build_cow(spark, sf_dir)
    key = (sf_dir, "join_rollup")
    if key not in _BUILT:
        orders = _read(spark, sf_dir, "orders")
        dim = _eng(spark).create_table(
            _fresh(_root(sf_dir, "join_dim")),
            record_key_fields=["o_orderkey"],
            precombine_field="o_orderdate", keygen="nonpartitioned")
        dim.bulk_insert(orders)
        dim.upsert(orders.filter(F.col("o_orderkey") % 7 == 0)
                   .withColumn("o_orderpriority", F.lit("9-RECLASS")))
        dim.delete(dim.snapshot().filter(F.col("o_orderkey") % 50 == 0))
        dc = [i.time for i in dim.timeline.completed_write_instants()]
        dst = _eng(spark).create_table(
            _fresh(_root(sf_dir, "join_dst")),
            record_key_fields=["o_orderpriority"], keygen="nonpartitioned")
        args = (t, dim, dst, "l_orderkey", "o_orderkey",
                ["o_orderpriority"],
                {"sum_qty": "l_quantity", "sum_price": "l_extendedprice"})
        sync_join_rollup(*args, end_fact=commits[0], end_dim=dc[0])
        sync_join_rollup(*args, end_fact=commits[2], end_dim=dc[1])
        sync_join_rollup(*args)
        _BUILT[key] = dst
    dst = _BUILT[key]
    return dst.snapshot().select(
        "o_orderpriority",
        F.round("sum_qty", 2).alias("sum_qty"),
        F.round("sum_price", 2).alias("sum_price"), "n_rows")



# ------------------------------------------------------------------ contract
def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_cow_snapshot(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _sample_priority_order({
        # engine semantics (SURVEY.md §2.1, §2.2, §2.3)
        "cow_snapshot": q_cow_snapshot,
        "cow_snapshot_orc": q_cow_snapshot_orc,
        "cow_incremental": q_cow_incremental,
        "cow_incremental_cdc": q_cow_incremental_cdc,
        "mor_incremental_cdc": q_mor_incremental_cdc,
        "events_funnel": q_events_funnel,
        "cow_time_travel": q_cow_time_travel,
        "cow_point_lookup": q_cow_point_lookup,
        "mor_snapshot": q_mor_snapshot,
        "format_hudi_snapshot": q_format_hudi_snapshot,
        "format_hudi_mor_snapshot": q_format_hudi_mor_snapshot,
        "format_hudi_incremental": q_format_hudi_incremental,
        "format_hudi_time_travel": q_format_hudi_time_travel,
        "format_hudi_read_optimized": q_format_hudi_read_optimized,
        "format_hudi_mor_incremental": q_format_hudi_mor_incremental,
        "format_hudi_write_insert": q_format_hudi_write_insert,
        "mor_read_optimized": q_mor_read_optimized,
        "mor_read_optimized_filtered": q_mor_read_optimized_filtered,
        "mor_incremental": q_mor_incremental,
        "mor_compacted": q_mor_compacted,
        "insert_overwrite": q_insert_overwrite,
        "insert_overwrite_table": q_insert_overwrite_table,
        "bootstrap_read": q_bootstrap_read,
        "global_index_upsert": q_global_index_upsert,
        "delete_partition": q_delete_partition,
        "merge_into": q_merge_into,
        "update_where": q_update_where,
        "delete_where": q_delete_where,
        "precommit_guard": q_precommit_guard,
        "payload_event_time": q_payload_event_time,
        "payload_partial_update": q_payload_partial_update,
        "cdc_ops": q_cdc_ops,
        "clustering_zorder": q_clustering_zorder,
        "clustering_hilbert": q_clustering_hilbert,
        "insert_packing": q_insert_packing,
        "schema_evolution": q_schema_evolution,
        "schema_evolution_widen": q_schema_evolution_widen,
        "schema_evolution_drop": q_schema_evolution_drop,
        "truncate_insert": q_truncate_insert,
        "archived_timeline_read": q_archived_timeline_read,
        "streaming_cdc_ingest": q_streaming_cdc_ingest,
        "change_feed_batch": q_change_feed_batch,
        "cleaning": q_cleaning,
        "rollback": q_rollback,
        "savepoint_restore": q_savepoint_restore,
        "bucket_index": q_bucket_index,
        "bucket_consistent": q_bucket_consistent,
        "bucket_point_lookup": q_bucket_point_lookup,
        "bloom_key_range": q_bloom_key_range,
        "bloom_filters_index": q_bloom_filters_index,
        "incremental_after_clean": q_incremental_after_clean,
        "custom_keygen_partitions": q_custom_keygen_partitions,
        "debezium_cdc": q_debezium_cdc,
        # relational over raw parquet (§2.10: delegated to Catalyst)
        "q1_pricing": q_q1_pricing,
        "q6_revenue": q_q6_revenue,
        "q3_top10": q_q3_top10,
        "q5_nation_volume": q_q5_nation_volume,
        "q4_order_priority": q_q4_order_priority,
        "q7_volume": q_q7_volume,
        "q8_market_share": q_q8_market_share,
        "q10_returned": q_q10_returned,
        "q13_custdist": q_q13_custdist,
        "q15_top_supplier": q_q15_top_supplier,
        "q17_small_qty": q_q17_small_qty,
        "q18_large_orders": q_q18_large_orders,
        "q19_discounted": q_q19_discounted,
        "q22_sales_opportunity": q_q22_sales_opportunity,
        "q12_shipmode": q_q12_shipmode,
        "q14_promo": q_q14_promo,
        "q2_min_cost_supplier": q_q2_min_cost_supplier,
        "q9_product_profit": q_q9_product_profit,
        "q11_important_stock": q_q11_important_stock,
        "q16_supplier_cnt": q_q16_supplier_cnt,
        "q20_excess_shipments": q_q20_excess_shipments,
        "q21_waiting_suppliers": q_q21_waiting_suppliers,
        "events_hourly": q_events_hourly,
        "events_latest_per_user": q_events_latest_per_user,
        # LLM-pipeline operators (§2.11)
        "docs_exact_dedup": q_docs_exact_dedup,
        "docs_token_stats": q_docs_token_stats,
        "docs_quality": q_docs_quality,
        "docs_repetition": q_docs_repetition,
        "docs_curate": q_docs_curate,
        "docs_chunks": q_docs_chunks,
        "docs_pack": q_docs_pack,
        "docs_top_ngrams": q_docs_top_ngrams,
        "docs_fingerprint": q_docs_fingerprint,
        "docs_language_id": q_docs_language_id,
        "docs_ngram_jaccard": q_docs_ngram_jaccard,
        "docs_containment": q_docs_containment,
        "docs_containment_prefix": q_docs_containment_prefix,
        "docs_containment_lsh": q_docs_containment_lsh,
        "docs_pmi_pairs": q_docs_pmi_pairs,
        "events_heavy_hitters": q_events_heavy_hitters,
        "events_hll_distinct": q_events_hll_distinct,
        "docs_table_dedup": q_docs_table_dedup,
        "docs_incremental_dedup": q_docs_incremental_dedup,
        "emb_ivf_index_topk": q_emb_ivf_index_topk,
        "docs_decontaminate": q_docs_decontaminate,
        "docs_contamination_score": q_docs_contamination_score,
        "docs_shard_plan": q_docs_shard_plan,
        "docs_bpe_pairs": q_docs_bpe_pairs,
        "docs_segment_filter": q_docs_segment_filter,
        "docs_mixture_plan": q_docs_mixture_plan,
        "docs_span_decontaminate": q_docs_span_decontaminate,
        "docs_split": q_docs_split,
        "emb_cluster_topics": q_emb_cluster_topics,
        "docs_pii_scrub": q_docs_pii_scrub,
        "docs_sample_stratified": q_docs_sample_stratified,
        "docs_quality_percentile": q_docs_quality_percentile,
        "docs_segment_dedup": q_docs_segment_dedup,
        "docs_substring_dedup": q_docs_substring_dedup,
        "docs_tfidf": q_docs_tfidf,
        "docs_quality_classifier": q_docs_quality_classifier,
        "docs_lm_unigram": q_docs_lm_unigram,
        "docs_lm_bigram": q_docs_lm_bigram,
        "docs_mixture_sample": q_docs_mixture_sample,
        "docs_quota_cap": q_docs_quota_cap,
        "docs_hybrid_rrf": q_docs_hybrid_rrf,
        "events_sessionize": q_events_sessionize,
        "events_cohorts": q_events_cohorts,
        "events_top_paths": q_events_top_paths,
        "events_transitions": q_events_transitions,
        "rollup_incremental": q_rollup_incremental,
        "cms_sketch_sync": q_cms_sketch_sync,
        "hll_sketch_sync": q_hll_sketch_sync,
        "events_value_quantiles": q_events_value_quantiles,
        "orders_profile": q_orders_profile,
        "scd2_history": q_scd2_history,
        "events_asof_join": q_events_asof_join,
        "events_resample": q_events_resample,
        "events_interval_join": q_events_interval_join,
        "events_salted_join": q_events_salted_join,
        "orders_rollup": q_orders_rollup,
        "orders_pivot": q_orders_pivot,
        "events_window_funcs": q_events_window_funcs,
        "orders_setops": q_orders_setops,
        "emb_topk": q_emb_topk,
        "emb_kmeans": q_emb_kmeans,
        "emb_prototype_prune": q_emb_prototype_prune,
        "emb_pq_topk": q_emb_pq_topk,
        "emb_ivfpq_topk": q_emb_ivfpq_topk,
        "docs_curation_pipeline": q_docs_curation_pipeline,
        "emb_mmr_rerank": q_emb_mmr_rerank,
        "emb_quantized_topk": q_emb_quantized_topk,
        "emb_random_projection": q_emb_random_projection,
        "emb_hard_negatives": q_emb_hard_negatives,
        "docs_lsh_edit_verify": q_docs_lsh_edit_verify,
        "emb_near_dup": q_emb_near_dup,
        "emb_semantic_dedup": q_emb_semantic_dedup,
        # historically rows-only; every entry below now has an exact
        # oracle too (the dict order is just registration history)
        "docs_minhash_lsh": q_docs_minhash_lsh,
        "docs_dup_clusters": q_docs_dup_clusters,
        "docs_cluster_best": q_docs_cluster_best,
        "docs_bm25": q_docs_bm25,
        "docs_simhash": q_docs_simhash,
        "emb_ivf_topk": q_emb_ivf_topk,
        "emb_lsh_topk": q_emb_lsh_topk,
        "multimodal_features": q_multimodal_features,
        "multimodal_audio_chunks": q_multimodal_audio_chunks,
        "multimodal_frame_plan": q_multimodal_frame_plan,
        "multimodal_phash_dedup": q_multimodal_phash_dedup,
        "docs_dsir_topk": q_docs_dsir_topk,
        "docs_ccnet_buckets": q_docs_ccnet_buckets,
        "docs_url_curate": q_docs_url_curate,
        "docs_char_entropy": q_docs_char_entropy,
        "docs_weighted_sample": q_docs_weighted_sample,
        "docs_temperature_sample": q_docs_temperature_sample,
        "docs_boilerplate": q_docs_boilerplate,
        "docs_gopher_quality": q_docs_gopher_quality,
        "events_rfm": q_events_rfm,
        "events_rfm_approx": q_events_rfm_approx,
        "events_anomaly": q_events_anomaly,
        "orders_basket_pairs": q_orders_basket_pairs,
        "events_ab_test": q_events_ab_test,
        "events_stickiness": q_events_stickiness,
        "docs_readability": q_docs_readability,
        "events_identity": q_events_identity,
        "orders_basket_rules": q_orders_basket_rules,
        "orders_item_triangles": q_orders_item_triangles,
        "orders_correlation": q_orders_correlation,
        "events_forecast_baseline": q_events_forecast_baseline,
        "join_rollup_incremental": q_join_rollup_incremental,
    })


def _last_green_round() -> dict:
    """gate -> newest round whose official CORRECTNESS_r<N>.json row is
    fully green (rows+schema+hash). The driver samples a PREFIX of the
    queries() dict when it can't afford the full suite, so ordering is the
    sampling policy."""
    import glob
    import json as _json
    import re

    out: dict = {}
    here = os.path.dirname(os.path.abspath(__file__))
    for path in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        m = re.search(r"_r(\d+)", os.path.basename(path))
        rnd = int(m.group(1)) if m else 0
        try:
            with open(path) as fh:
                data = _json.load(fh)
        except (OSError, ValueError):
            continue
        for k, v in (data or {}).items():
            if isinstance(v, dict) and v.get("rows_match") \
                    and v.get("schema_match") and v.get("hash_match"):
                out[k] = max(out.get(k, 0), rnd)
    return out


def _sample_priority_order(q: dict) -> dict:
    """Oldest-official-green-first rotation (r5 VERDICT item 8): gates with
    NO green official row yet come first (new this round / historically
    red), then gates whose last green row is stalest — so the driver's
    prefix sample re-confirms the whole trail over rounds instead of
    re-hitting the same head. Cheap insurance against silent drift."""
    greens = _last_green_round()
    order = sorted(q, key=lambda k: (greens.get(k, -1), k))
    return {k: q[k] for k in order}


def oracle_sql() -> dict[str, str]:
    out = {
        "cow_snapshot": f"""
WITH {LI_CTES}
SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM final GROUP BY 1, 2""",
        # ORC base files must be result-invisible: identical oracle
        "cow_snapshot_orc": f"""
WITH {LI_CTES}
SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM final GROUP BY 1, 2""",
        "cow_incremental": f"""
WITH {LI_CTES}
SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM cur WHERE EXISTS (SELECT 1 FROM mut m
  WHERE m.l_orderkey = cur.l_orderkey AND m.l_linenumber = cur.l_linenumber)
GROUP BY 1""",
        "cow_incremental_cdc": f"""
WITH {LI_CTES}
SELECT 'u' AS op, l_orderkey, l_linenumber,
       CAST(l_quantity AS DOUBLE) AS before_qty,
       CAST(l_quantity + 1000.0 AS DOUBLE) AS after_qty
FROM base WHERE l_orderkey % 10 = 0 AND l_orderkey % 100 <> 0
UNION ALL
SELECT 'd', l_orderkey, l_linenumber,
       CAST(l_quantity AS DOUBLE), CAST(NULL AS DOUBLE)
FROM base WHERE l_orderkey % 100 = 0""",
        # MOR build has no delete commit: every mutated key surfaces as u
        "mor_incremental_cdc": f"""
WITH {LI_CTES}
SELECT 'u' AS op, l_orderkey, l_linenumber,
       CAST(l_quantity AS DOUBLE) AS before_qty,
       CAST(l_quantity + 1000.0 AS DOUBLE) AS after_qty
FROM base WHERE l_orderkey % 10 = 0""",
        # cascade definition: t_k = earliest step-k event with ts > t_(k-1)
        "events_funnel": """
WITH s1 AS (SELECT user_id, min(ts) AS t FROM events
            WHERE event_type = 'view' GROUP BY 1),
s2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
       JOIN s1 ON e.user_id = s1.user_id
       WHERE e.event_type = 'click' AND e.ts > s1.t GROUP BY 1),
s3 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
       JOIN s2 ON e.user_id = s2.user_id
       WHERE e.event_type = 'purchase' AND e.ts > s2.t GROUP BY 1)
SELECT 1 AS step, 'view' AS event_type,
       CAST((SELECT count(*) FROM s1) AS BIGINT) AS users
UNION ALL
SELECT 2, 'click', CAST((SELECT count(*) FROM s2) AS BIGINT)
UNION ALL
SELECT 3, 'purchase', CAST((SELECT count(*) FROM s3) AS BIGINT)""",
        "cow_time_travel": f"""
WITH {LI_CTES}
SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM base GROUP BY 1""",
        "cow_point_lookup": f"""
WITH {LI_CTES}
SELECT l_orderkey, l_linenumber, CAST(l_quantity AS DOUBLE) AS qty
FROM final WHERE l_orderkey BETWEEN 100 AND 400""",
        "mor_snapshot": f"""
WITH {LI_CTES}
SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM cur GROUP BY 1, 2""",
        "mor_read_optimized": f"""
WITH {LI_CTES}
SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM base GROUP BY 1""",
        "mor_read_optimized_filtered": f"""
WITH {LI_CTES}
SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM base WHERE l_orderkey BETWEEN 100 AND 2000 GROUP BY 1""",
        "mor_incremental": f"""
WITH {LI_CTES}
SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM cur WHERE EXISTS (SELECT 1 FROM mut m
  WHERE m.l_orderkey = cur.l_orderkey AND m.l_linenumber = cur.l_linenumber)
GROUP BY 1""",
        "mor_compacted": f"""
WITH {LI_CTES}
SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM cur GROUP BY 1, 2""",
        "insert_overwrite": """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
       CAST(SUM(CAST(CASE WHEN o_orderpriority = '1-URGENT'
                          THEN o_totalprice * 2 ELSE o_totalprice END
                AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM orders GROUP BY 1""",
        "delete_partition": """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n
FROM orders WHERE o_orderpriority <> '5-LOW' GROUP BY 1""",
        "insert_overwrite_table": """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
       CAST(SUM(CAST(o_totalprice + 1.0 AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM orders WHERE o_orderkey % 5 = 0 GROUP BY 1""",
        "bootstrap_read": """
SELECT p_brand, CAST(count(*) AS BIGINT) AS n,
       CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM part GROUP BY 1""",
        "global_index_upsert": """
SELECT CAST(count(*) AS BIGINT) AS n,
       CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_keys,
       CAST(SUM(CAST(CASE WHEN o_orderkey % 7 = 0
                          THEN o_totalprice + 1000.0
                          ELSE o_totalprice END AS DECIMAL(18,2))) AS DOUBLE)
         AS sum_price
FROM orders""",
        "merge_into": """
WITH after_del AS (
  SELECT * FROM orders WHERE NOT (o_orderkey % 3 = 0 AND o_orderstatus = 'F')),
updated AS (
  SELECT after_del.* REPLACE (CASE WHEN o_orderkey % 3 = 0
                                   THEN o_totalprice * 2
                                   ELSE o_totalprice END AS o_totalprice)
  FROM after_del),
ins AS (
  SELECT o_orderkey + 10000000 AS o_orderkey, o_custkey, o_orderstatus,
         o_totalprice + 5 AS o_totalprice, o_orderdate, o_orderpriority
  FROM orders WHERE o_orderkey % 5 = 0),
merged AS (SELECT * FROM updated UNION ALL SELECT * FROM ins)
SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM merged GROUP BY 1""",
        "update_where": """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
       CAST(SUM(CAST(CASE WHEN o_orderpriority = '2-HIGH'
                          THEN o_totalprice * CAST(1.1 AS DOUBLE)
                          ELSE o_totalprice END
                AS DECIMAL(18,3))) AS DOUBLE) AS sum_price
FROM orders GROUP BY 1""",
        "delete_where": """
SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n
FROM orders WHERE NOT (o_orderstatus = 'F' AND o_orderkey % 2 = 0) GROUP BY 1""",
        # the rejected delete must be invisible; only the update survives
        "precommit_guard": """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
       CAST(SUM(CAST(CASE WHEN o_orderkey % 7 = 0
                          THEN o_totalprice + 11.0
                          ELSE o_totalprice END
                AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM orders GROUP BY 1""",
        "payload_event_time": """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
       CAST(SUM(CAST(CASE WHEN o_orderkey % 4 = 1
                          THEN o_totalprice + 7777.0
                          ELSE o_totalprice END
                AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM orders GROUP BY 1""",
        "payload_partial_update": """
SELECT CASE WHEN o_orderkey % 3 = 0 THEN 'X' ELSE o_orderstatus END
         AS o_orderstatus,
       CAST(count(*) AS BIGINT) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM orders GROUP BY 1""",
        "cdc_ops": """
WITH after_del AS (
  SELECT * FROM orders
  WHERE NOT (o_orderkey % 5 <> 0 AND o_orderkey % 7 = 0)),
updated AS (
  SELECT after_del.* REPLACE (CASE WHEN o_orderkey % 5 = 0
                                   THEN o_totalprice * 3
                                   ELSE o_totalprice END AS o_totalprice)
  FROM after_del),
ins AS (SELECT o_orderkey + 20000000 AS o_orderkey, o_custkey, o_orderstatus,
               o_totalprice, o_orderdate, o_orderpriority
        FROM orders WHERE o_orderkey % 11 = 0),
merged AS (SELECT * FROM updated UNION ALL SELECT * FROM ins)
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM merged GROUP BY 1""",
        "clustering_zorder": f"""
WITH {LI_CTES}
SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM base GROUP BY 1""",
        "clustering_hilbert": f"""
WITH {LI_CTES}
SELECT l_linestatus, CAST(count(*) AS BIGINT) AS n,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM base GROUP BY 1""",
        "insert_packing": """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM orders GROUP BY 1""",
        "schema_evolution": """
WITH cur AS (
  SELECT p_partkey, p_brand,
         CASE WHEN p_partkey % 10 = 0 THEN p_retailprice * 2
              ELSE p_retailprice END AS price,
         CASE WHEN p_partkey % 10 = 0 THEN 'adjusted' END AS note
  FROM part)
SELECT p_brand, CAST(count(*) AS BIGINT) AS n,
       CAST(SUM(CAST(price AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
       CAST(COUNT(note) AS BIGINT) AS n_notes
FROM cur GROUP BY 1""",
        "schema_evolution_widen": """
WITH cur AS (
  SELECT p_partkey, p_brand,
         CASE WHEN p_partkey % 7 = 0
              THEN CAST(p_size AS BIGINT) + 5000000000
              ELSE CAST(p_size AS BIGINT) END AS p_size
  FROM part)
SELECT p_brand, CAST(count(*) AS BIGINT) AS n,
       CAST(SUM(p_size) AS BIGINT) AS sum_size
FROM cur GROUP BY 1""",
        "schema_evolution_drop": """
WITH cur AS (
  SELECT p_partkey, p_brand,
         CASE WHEN p_partkey % 6 = 0 THEN p_size + 100
              ELSE p_size END AS p_size
  FROM part)
SELECT p_brand, CAST(count(*) AS BIGINT) AS n,
       CAST(SUM(p_size) AS BIGINT) AS sum_size
FROM cur GROUP BY 1""",
        "truncate_insert": """
SELECT s_nationkey, CAST(count(*) AS BIGINT) AS n,
       CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
FROM supplier WHERE s_suppkey % 2 = 0 GROUP BY 1""",
        "archived_timeline_read": """
SELECT n_nationkey,
       CASE WHEN n_regionkey IN (1, 2, 3, 4) THEN n_name || '+'
            ELSE n_name END AS n_name,
       n_regionkey
FROM nation""",
        "change_feed_batch": f"""
WITH {LI_CTES}
SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
       CAST(SUM(CAST(l_quantity + 1000.0 AS DECIMAL(18,2))) AS DOUBLE)
         AS sum_qty
FROM base WHERE l_orderkey % 10 = 0
GROUP BY 1""",
        "streaming_cdc_ingest": """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
       CAST(SUM(CAST(CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 1000.0
                          ELSE o_totalprice END AS DECIMAL(18,2))) AS DOUBLE)
         AS sum_price
FROM orders
WHERE NOT (o_orderkey % 7 = 0 AND o_orderkey % 5 <> 0)
GROUP BY 1""",
        "cleaning": f"""
WITH {LI_CTES}
SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM cur GROUP BY 1""",
        "rollback": f"""
WITH {LI_CTES}
SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM base GROUP BY 1""",
        "savepoint_restore": f"""
WITH {LI_CTES}
SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM base GROUP BY 1""",
        "bucket_index": f"""
WITH {LI_CTES}
SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM cur GROUP BY 1, 2""",
        "bucket_consistent": f"""
WITH {LI_CTES}
SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM cur GROUP BY 1, 2""",
        "bucket_point_lookup": """
WITH ded AS (
  SELECT * EXCLUDE (rn) FROM (
    SELECT *, row_number() OVER (PARTITION BY o_orderkey
      ORDER BY o_orderdate DESC, o_totalprice DESC, o_custkey DESC) AS rn
    FROM orders) WHERE rn = 1)
SELECT o_orderkey, o_custkey, CAST(o_totalprice AS DOUBLE) AS price
FROM ded WHERE o_orderkey IN (7, 32, 4357)""",
        "bloom_key_range": f"""
WITH {KR_CTES}
SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM kcur WHERE l_orderkey BETWEEN 900 AND 1300 GROUP BY 1""",
        "bloom_filters_index": """
WITH upd AS (SELECT o_orderkey, o_totalprice + 555.0 AS np
             FROM orders WHERE o_orderkey % 17 = 0),
bcur AS (SELECT orders.* REPLACE (coalesce(upd.np, o_totalprice) AS o_totalprice)
         FROM orders LEFT JOIN upd USING (o_orderkey)),
ball AS (SELECT o_orderpriority, o_totalprice FROM bcur
         UNION ALL
         SELECT o_orderpriority, o_totalprice FROM orders
         WHERE o_orderkey % 97 = 0)
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM ball GROUP BY 1""",
        "incremental_after_clean": """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
       CAST(SUM(CAST(o_totalprice + 1111.0 AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM orders WHERE o_orderkey % 7 = 0 GROUP BY 1""",
        "custom_keygen_partitions": """
SELECT o_orderpriority, CAST(EXTRACT(year FROM o_orderdate) AS INT) AS yr,
       CAST(count(*) AS BIGINT) AS n,
       CAST(SUM(CAST(CASE WHEN o_orderkey % 13 = 0
                          THEN o_totalprice + 999.0
                          ELSE o_totalprice END
                AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM orders GROUP BY 1, 2""",
        "debezium_cdc": """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
       CAST(SUM(CAST(CASE WHEN o_orderkey % 3 = 0
                          THEN o_totalprice * 2
                          ELSE o_totalprice END
                AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM orders WHERE o_orderkey % 11 <> 0 GROUP BY 1""",
        "q1_pricing": """
SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS count_order,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
         AS sum_disc_price
FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
GROUP BY 1, 2""",
        "q12_shipmode": """
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate > o_orderdate
GROUP BY 1""",
        "q14_promo": """
SELECT CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
                     THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))
                     ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) AS promo_revenue,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
         AS total_revenue,
       CAST(count(*) AS BIGINT) AS n
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1996-07-01 00:00:00'""",
        "q6_revenue": """
SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE)
         AS revenue,
       CAST(count(*) AS BIGINT) AS n
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""",
        "q3_top10": """
SELECT o_orderkey, o_orderdate,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
         AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY 1, 2 ORDER BY revenue DESC, o_orderkey ASC LIMIT 10""",
        "q5_nation_volume": """
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
         AS revenue,
       CAST(count(*) AS BIGINT) AS n
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
GROUP BY 1""",
        "q4_order_priority": """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY 1""",
        "q7_volume": """
SELECT supp_nation, cust_nation, l_year,
       CAST(SUM(rev) AS DOUBLE) AS revenue, CAST(COUNT(*) AS BIGINT) AS n
FROM (SELECT n1.n_name supp_nation, n2.n_name cust_nation,
             CAST(year(l_shipdate) AS INTEGER) l_year,
             CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)) rev
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')))
GROUP BY 1, 2, 3""",
        "q8_market_share": """
WITH an AS (SELECT CAST(year(o_orderdate) AS INTEGER) o_year,
              CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)) rev,
              n1.n_name supp_nation
            FROM lineitem
            JOIN part ON p_partkey = l_partkey
            JOIN orders ON l_orderkey = o_orderkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation n2 ON c_nationkey = n2.n_nationkey
            JOIN region ON n2.n_regionkey = r_regionkey
            JOIN nation n1 ON s_nationkey = n1.n_nationkey
            WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
              AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00')
SELECT o_year,
       CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN rev
                     ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) AS nat_rev,
       CAST(SUM(rev) AS DOUBLE) AS total_rev,
       CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN rev
                     ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
         / CAST(SUM(rev) AS DOUBLE) AS mkt_share
FROM an GROUP BY 1""",
        "q10_returned": """
SELECT c_custkey, c_name, c_acctbal, n_name, CAST(rev_dec AS DOUBLE) AS revenue
FROM (SELECT c_custkey, c_name, c_acctbal, n_name,
             SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) rev_dec
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      WHERE l_returnflag = 'R'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY 1, 2, 3, 4)
ORDER BY rev_dec DESC, c_custkey LIMIT 20""",
        "q13_custdist": """
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM (SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY 1)
GROUP BY 1""",
        "q15_top_supplier": """
WITH r0 AS (SELECT l_suppkey,
              SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) total_dec
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
            GROUP BY 1)
SELECT s_suppkey, s_name, CAST(total_dec AS DOUBLE) AS total_revenue
FROM r0 JOIN supplier ON l_suppkey = s_suppkey
WHERE total_dec = (SELECT MAX(total_dec) FROM r0)""",
        "q17_small_qty": """
WITH pa AS (SELECT l_partkey pk, CAST(COUNT(*) AS BIGINT) cnt,
              CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) sum_qty
            FROM lineitem GROUP BY 1)
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
         AS avg_yearly,
       CAST(COUNT(*) AS BIGINT) AS n
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN pa ON pk = l_partkey
WHERE p_brand = 'Brand#23' AND 5.0 * cnt * l_quantity < sum_qty""",
        "q18_large_orders": """
SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
       CAST(sq AS DOUBLE) AS sum_qty
FROM (SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) sq
      FROM lineitem GROUP BY 1
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 250) big
JOIN orders ON big.l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY sq DESC, o_orderkey LIMIT 100""",
        "q19_discounted": """
SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
         AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)""",
        "q22_sales_opportunity": """
WITH pos AS (SELECT * FROM customer
             WHERE c_acctbal > 0.0
               AND c_mktsegment IN ('AUTOMOBILE','MACHINERY','FURNITURE')),
st AS (SELECT CAST(COUNT(*) AS BIGINT) cnt,
              CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) tot
       FROM pos)
SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM pos, st
WHERE c_acctbal * cnt > tot
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderpriority = '1-URGENT')
GROUP BY 1""",
        "q2_min_cost_supplier": """
WITH eur AS (SELECT s_suppkey, s_name, s_acctbal
             FROM supplier
             JOIN nation ON s_nationkey = n_nationkey
             JOIN region ON n_regionkey = r_regionkey AND r_name = 'EUROPE'),
offers AS (SELECT p_partkey, p_brand, s_suppkey, s_name, s_acctbal,
                  MIN(CAST(l_extendedprice AS DECIMAL(18,2))) cost_dec
           FROM lineitem
           JOIN part ON l_partkey = p_partkey
                AND p_size BETWEEN 10 AND 20 AND p_type = 'STANDARD'
           JOIN eur ON l_suppkey = s_suppkey
           GROUP BY 1, 2, 3, 4, 5),
mins AS (SELECT p_partkey mk, MIN(cost_dec) min_cost FROM offers GROUP BY 1)
SELECT s_acctbal, s_name, p_partkey, p_brand, s_suppkey,
       CAST(cost_dec AS DOUBLE) AS min_cost
FROM offers JOIN mins ON p_partkey = mk AND cost_dec = mins.min_cost
ORDER BY s_acctbal DESC, p_partkey ASC, s_suppkey ASC LIMIT 100""",
        "q9_product_profit": """
SELECT n_name AS nation,
       CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))
                - CAST(0.6 * p_retailprice * l_quantity AS DECIMAL(18,4)))
            AS DOUBLE) AS sum_profit,
       CAST(COUNT(*) AS BIGINT) AS n
FROM lineitem
JOIN part ON l_partkey = p_partkey AND p_name LIKE '%red%'
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
GROUP BY 1, 2""",
        "q11_important_stock": """
WITH vals AS (SELECT l_partkey,
                SUM(CAST(l_extendedprice AS DECIMAL(18,2))) val_dec
              FROM lineitem
              JOIN supplier ON l_suppkey = s_suppkey
              JOIN nation ON s_nationkey = n_nationkey
                   AND n_name = 'NATION_3'
              GROUP BY 1)
SELECT l_partkey, CAST(val_dec AS DOUBLE) AS value
FROM vals WHERE val_dec * 1000 > (SELECT SUM(val_dec) FROM vals)""",
        "q16_supplier_cnt": """
SELECT p_brand, p_type, p_size,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#45' AND p_type NOT LIKE 'MEDIUM%'
  AND p_size IN (1, 4, 9, 14, 19, 24, 29, 34)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3""",
        "q20_excess_shipments": """
WITH pairs AS (SELECT l_suppkey, l_partkey,
                 SUM(CAST(l_quantity AS DECIMAL(18,2))) q_all,
                 SUM(CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
                           AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
                          THEN CAST(l_quantity AS DECIMAL(18,2))
                          ELSE CAST(0 AS DECIMAL(18,2)) END) q_96
               FROM lineitem
               JOIN part ON l_partkey = p_partkey AND p_name LIKE '%red%'
               GROUP BY 1, 2)
SELECT s_name, s_acctbal
FROM supplier
JOIN nation ON s_nationkey = n_nationkey AND n_name = 'NATION_1'
WHERE s_suppkey IN (SELECT l_suppkey FROM pairs WHERE q_96 * 2 > q_all)""",
        "q21_waiting_suppliers": """
WITH per_order AS (
  SELECT l_orderkey,
         COUNT(DISTINCT l_suppkey) ns,
         COUNT(DISTINCT CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
                             THEN l_suppkey END) nl,
         MIN(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
                  THEN l_suppkey END) late_supp
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey AND o_orderstatus = 'F'
  GROUP BY 1)
SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM per_order JOIN supplier ON late_supp = s_suppkey
WHERE ns > 1 AND nl = 1
GROUP BY 1 ORDER BY numwait DESC, s_name ASC LIMIT 100""",
        "events_hourly": """
SELECT date_trunc('hour', ts) AS hour, event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
FROM events GROUP BY 1, 2""",
        "events_latest_per_user": """
SELECT user_id, event_id, event_type, CAST(value AS DOUBLE) AS value
FROM (SELECT *, row_number() OVER (PARTITION BY user_id
        ORDER BY ts DESC, event_id DESC) AS rn FROM events)
WHERE rn = 1""",
        "docs_exact_dedup": """
WITH h AS (SELECT doc_id,
             md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS ch
           FROM documents),
k AS (SELECT ch, CAST(count(*) AS BIGINT) AS dup_count FROM h GROUP BY 1)
SELECT CAST(count(*) AS BIGINT) AS n_kept, CAST(SUM(dup_count) AS BIGINT) AS n_total
FROM k""",
        "docs_token_stats": """
SELECT lang, CAST(count(*) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN length(trim(text)) = 0 THEN 0
                ELSE len(string_split_regex(trim(text), '\\s+')) END) AS BIGINT)
         AS sum_tokens,
       CAST(SUM(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')))
            AS BIGINT) AS sum_bpe,
       CAST(SUM(length(text)) AS BIGINT) AS sum_chars
FROM documents GROUP BY 1""",
        "docs_quality": """
WITH q AS (
  SELECT doc_id,
    CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
         ELSE string_split_regex(trim(text), '\\s+') END AS toks,
    length(text) - length(regexp_replace(text,
        '[.,!?;:''"()\\[\\]{}-]', '', 'g')) AS n_punct,
    length(text) AS n_chars
  FROM documents WHERE doc_id < 100),
m AS (
  SELECT doc_id, n_punct,
    len(toks) AS n_tok,
    CASE WHEN len(toks) > 0 THEN
      len(list_intersect(toks, ['the','a','an','and','or','of','to','in','is',
        'are','was','be','for','on','with','as','at','by','it','this','that',
        'from'])) / CAST(22.0 AS DOUBLE)
    ELSE CAST(0.0 AS DOUBLE) END AS stop_ratio,
    CASE WHEN n_chars > 0 THEN n_punct / CAST(n_chars AS DOUBLE)
         ELSE CAST(1.0 AS DOUBLE) END AS punct_ratio
  FROM q)
SELECT doc_id, CAST(n_punct AS BIGINT) AS n_punct,
  round(CAST(0.4 AS DOUBLE) * least(n_tok / CAST(50.0 AS DOUBLE), CAST(1.0 AS DOUBLE))
      + CAST(0.3 AS DOUBLE) * (CAST(1.0 AS DOUBLE)
          - least(punct_ratio * 5, CAST(1.0 AS DOUBLE)))
      + CAST(0.3 AS DOUBLE) * least(stop_ratio * 4, CAST(1.0 AS DOUBLE)), 4)
    AS quality_score
FROM m""",
        "docs_repetition": """
WITH L AS (
  SELECT doc_id,
    list_slice(list_filter(list_transform(string_split(text, chr(10)),
        l -> trim(l)), l -> length(l) > 0), 1, 500) AS lines,
    list_slice(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
        t -> length(t) > 0), 1, 500) AS toks
  FROM documents),
G AS (
  SELECT doc_id, lines, toks,
    len(lines) AS n_lines, len(toks) AS n_tok,
    list_distinct(lines) AS dl,
    CASE WHEN len(toks) >= 2 THEN
      list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])
    ELSE CAST([] AS VARCHAR[]) END AS grams
  FROM L),
M AS (
  SELECT doc_id, lines, toks, n_lines, n_tok, dl, grams,
    list_distinct(grams) AS dg,
    coalesce(list_sum(list_transform(lines, l -> length(l))), 0) AS line_chars,
    coalesce(list_sum(list_transform(toks, t -> length(t))), 0) AS tok_chars,
    coalesce(list_sum(list_transform(dl, d ->
      CASE WHEN len(list_filter(lines, x -> x = d)) > 1
           THEN len(list_filter(lines, x -> x = d)) * length(d)
           ELSE 0 END)), 0) AS dup_chars
  FROM G),
U AS (
  SELECT *,
    list_max(list_transform(dg, g ->
      {'cnt': len(list_filter(grams, x -> x = g)), 'ln': length(g)})) AS best
  FROM M)
SELECT doc_id, CAST(n_lines AS BIGINT) AS n_lines,
  round(CASE WHEN n_lines > 0
        THEN (n_lines - len(dl)) / CAST(n_lines AS DOUBLE) ELSE 0 END, 6)
    AS dup_line_frac,
  round(CASE WHEN line_chars > 0
        THEN dup_chars / CAST(line_chars AS DOUBLE) ELSE 0 END, 6)
    AS dup_line_char_frac,
  round(CASE WHEN len(dg) > 0 AND tok_chars > 0
        THEN best.cnt * (best.ln - 1) / CAST(tok_chars AS DOUBLE) ELSE 0 END, 6)
    AS top_bigram_char_frac,
  round(CASE WHEN n_lines > 0
        THEN len(list_filter(lines, l -> regexp_matches(l, '^(-|\\*|•)')))
             / CAST(n_lines AS DOUBLE) ELSE 0 END, 6) AS bullet_line_frac,
  round(CASE WHEN n_lines > 0
        THEN len(list_filter(lines, l -> regexp_matches(l, '(\\.\\.\\.|…)$')))
             / CAST(n_lines AS DOUBLE) ELSE 0 END, 6) AS ellipsis_line_frac,
  round(CASE WHEN n_tok > 0
        THEN len(list_filter(toks, t -> regexp_matches(t, '[a-z]')))
             / CAST(n_tok AS DOUBLE) ELSE 0 END, 6) AS alpha_word_frac,
  round(CASE WHEN n_tok > 0
        THEN tok_chars / CAST(n_tok AS DOUBLE) ELSE 0 END, 6) AS mean_word_len
FROM U""",
        # full curation pipeline: scrub -> normalize -> quality>=0.3 ->
        # exact dedup (min id per content hash) -> deterministic 50% sample
        "docs_curate": """
WITH s AS (
  SELECT doc_id, lang,
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(text,
            '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
          '\\b\\d{3}-\\d{2}-\\d{4}\\b', '<SSN>', 'g'),
        '\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b', '<PHONE>', 'g'),
      '\\b\\d(?:[ -]?\\d){12,15}\\b', '<CARD>', 'g') AS text
  FROM documents),
n AS (SELECT doc_id, lang,
        trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS text FROM s),
q0 AS (
  SELECT doc_id, lang, text,
    CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
         ELSE string_split_regex(trim(text), '\\s+') END AS toks,
    length(text) - length(regexp_replace(text,
        '[.,!?;:''"()\\[\\]{}-]', '', 'g')) AS n_punct,
    length(text) AS n_chars
  FROM n),
q1 AS (
  SELECT doc_id, lang, text,
    len(toks) AS n_tok,
    CASE WHEN len(toks) > 0 THEN
      len(list_intersect(toks, ['the','a','an','and','or','of','to','in','is',
        'are','was','be','for','on','with','as','at','by','it','this','that',
        'from'])) / CAST(22.0 AS DOUBLE)
    ELSE CAST(0.0 AS DOUBLE) END AS stop_ratio,
    CASE WHEN n_chars > 0 THEN n_punct / CAST(n_chars AS DOUBLE)
         ELSE CAST(1.0 AS DOUBLE) END AS punct_ratio
  FROM q0),
q2 AS (
  SELECT doc_id, lang, text,
    round(CAST(0.4 AS DOUBLE) * least(n_tok / CAST(50.0 AS DOUBLE),
                                      CAST(1.0 AS DOUBLE))
        + CAST(0.3 AS DOUBLE) * (CAST(1.0 AS DOUBLE)
            - least(punct_ratio * 5, CAST(1.0 AS DOUBLE)))
        + CAST(0.3 AS DOUBLE) * least(stop_ratio * 4, CAST(1.0 AS DOUBLE)), 4)
      AS quality_score
  FROM q1),
f AS (SELECT * FROM q2 WHERE quality_score >= 0.3),
d AS (SELECT *, row_number() OVER (PARTITION BY md5(text)
                                   ORDER BY doc_id) AS rn FROM f)
SELECT doc_id, lang, quality_score FROM d
WHERE rn = 1
  AND ((doc_id % 1000000007) * 2654435761 + 42) % 1000000 < 500000""",
        # token-window chunking: starts at 1, 1+56, ... (step = 64-8); a
        # start opens a chunk only when it adds tokens beyond the overlap
        "docs_chunks": """
WITH t AS (SELECT doc_id,
             list_filter(string_split_regex(trim(text), '\\s+'),
                         x -> length(x) > 0) AS toks
           FROM documents),
n AS (SELECT doc_id, toks, len(toks) AS n FROM t WHERE len(toks) > 0),
s AS (SELECT doc_id, toks, n,
        unnest(list_filter(range(1, n + 1, 56),
                           s -> s = 1 OR s + 8 <= n)) AS st
      FROM n),
c AS (SELECT doc_id, st,
        CAST(row_number() OVER (PARTITION BY doc_id ORDER BY st) - 1
             AS INT) AS chunk_idx,
        list_slice(toks, st, least(st + 63, n)) AS ctoks
      FROM s)
SELECT doc_id, chunk_idx,
       CAST(len(ctoks) AS INT) AS n_chunk_tokens,
       array_to_string(ctoks, ' ') AS chunk_text
FROM c""",
        # packing = concat docs in id order, cut every 512 tokens; a doc is
        # labeled with the sequence where it starts + its offset there
        "docs_pack": """
WITH t AS (SELECT doc_id,
             len(list_filter(string_split_regex(trim(text), '\\s+'),
                             x -> length(x) > 0)) AS n_tokens
           FROM documents),
c AS (SELECT doc_id, n_tokens,
        coalesce(SUM(n_tokens) OVER (ORDER BY doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS excl
      FROM t)
SELECT doc_id, CAST(n_tokens AS INT) AS n_tokens,
       CAST(excl // 512 AS BIGINT) AS seq_id,
       CAST(excl % 512 AS BIGINT) AS start_offset
FROM c""",
        "docs_top_ngrams": """
WITH t AS (SELECT list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                              x -> length(x) > 0) AS toks
           FROM documents),
g AS (SELECT unnest(list_transform(range(1, greatest(len(toks) - 1, 0) + 1),
        i -> toks[i] || ' ' || toks[i+1])) AS ngram
      FROM t WHERE len(toks) >= 2),
c AS (SELECT ngram, CAST(count(*) AS BIGINT) AS occurrences
      FROM g GROUP BY 1),
r AS (SELECT *, row_number() OVER (ORDER BY occurrences DESC, ngram ASC)
             AS rank FROM c)
SELECT CAST(rank AS INT) AS rank, ngram, occurrences FROM r
WHERE rank <= 20""",
        "docs_fingerprint": """
SELECT CAST(count(DISTINCT trim(regexp_replace(
         regexp_replace(lower(text), '[.,!?;:''"()\\[\\]{}-]', '', 'g'),
         '\\s+', ' ', 'g'))) AS BIGINT) AS n_distinct,
       CAST(count(*) AS BIGINT) AS n
FROM documents""",
        "docs_language_id": """
WITH t AS (SELECT doc_id,
             CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
                  ELSE list_slice(string_split_regex(trim(lower(text)), '\\s+'),
                                  1, 200) END AS toks
           FROM documents),
h AS (SELECT doc_id,
  len(list_filter(toks, t -> list_contains(
    ['the','and','of','to','is','that','for','with'], t))) AS h_en,
  len(list_filter(toks, t -> list_contains(
    ['der','die','und','das','ist','nicht','mit','ein'], t))) AS h_de,
  len(list_filter(toks, t -> list_contains(
    ['le','la','les','et','est','pas','pour','une'], t))) AS h_fr,
  len(list_filter(toks, t -> list_contains(
    ['el','la','los','que','es','por','una','con'], t))) AS h_es
  FROM t)
SELECT CASE WHEN greatest(h_en, h_de, h_fr, h_es) = 0 THEN 'und'
            WHEN h_fr = greatest(h_en, h_de, h_fr, h_es) THEN 'fr'
            WHEN h_es = greatest(h_en, h_de, h_fr, h_es) THEN 'es'
            WHEN h_en = greatest(h_en, h_de, h_fr, h_es) THEN 'en'
            ELSE 'de' END AS lang_pred,
       CAST(count(*) AS BIGINT) AS n
FROM h GROUP BY 1""",
        "docs_ngram_jaccard": """
WITH d0 AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS toks
            FROM documents WHERE length(trim(text)) > 0),
d AS (SELECT doc_id,
        list_distinct(list_transform(range(1, greatest(len(toks) - 2, 0) + 1),
          i -> array_to_string(list_slice(toks, i, i + 2), ' '))) AS grams
      FROM d0),
d2 AS (SELECT doc_id, grams, len(grams) AS n_grams FROM d WHERE len(grams) > 0),
inv AS (SELECT doc_id, n_grams, unnest(grams) AS g FROM d2),
pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                 a.n_grams AS na, b.n_grams AS nb,
                 CAST(count(*) AS BIGINT) AS inter
          FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
          GROUP BY 1, 2, 3, 4)
SELECT id_a, id_b, CAST(inter AS DOUBLE) / (na + nb - inter) AS jaccard
FROM pairs WHERE CAST(inter AS DOUBLE) / (na + nb - inter) >= 0.8""",
        "docs_containment": """
WITH d0 AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS toks
            FROM documents WHERE length(trim(text)) > 0),
d AS (SELECT doc_id,
        list_distinct(list_transform(range(1, greatest(len(toks) - 2, 0) + 1),
          i -> array_to_string(list_slice(toks, i, i + 2), ' '))) AS grams
      FROM d0),
d2 AS (SELECT doc_id, grams, len(grams) AS n_grams FROM d WHERE len(grams) > 0),
inv AS (SELECT doc_id, n_grams, unnest(grams) AS g FROM d2),
pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                 a.n_grams AS na, b.n_grams AS nb,
                 CAST(count(*) AS BIGINT) AS inter
          FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
          GROUP BY 1, 2, 3, 4)
SELECT id_a, id_b, CAST(na AS BIGINT) AS na, CAST(nb AS BIGINT) AS nb,
       CAST(inter AS DOUBLE) / least(na, nb) AS containment
FROM pairs WHERE CAST(inter AS DOUBLE) / least(na, nb) >= 0.5""",
        "docs_pmi_pairs": """
WITH t AS (SELECT list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                              x -> length(x) > 0) AS toks
           FROM documents),
st AS (SELECT toks, len(toks) AS n FROM t),
p0 AS (SELECT unnest(flatten(list_transform(range(1, n - 1 + 1), i ->
         list_transform(range(i + 1, least(i + 3, n) + 1), j ->
           struct_pack(a := least(toks[i], toks[j]),
                       b := greatest(toks[i], toks[j])))))) AS p
       FROM st WHERE n >= 2),
pr AS (SELECT p.a AS tok_a, p.b AS tok_b FROM p0 WHERE p.a <> p.b),
cab AS (SELECT tok_a, tok_b, CAST(count(*) AS BIGINT) AS c_ab
        FROM pr GROUP BY 1, 2 HAVING count(*) >= 10),
uni AS (SELECT unnest(toks) AS tok FROM st),
cu AS (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM uni GROUP BY 1),
sc AS (SELECT cab.tok_a, cab.tok_b, cab.c_ab, ua.c AS c_a, ub.c AS c_b,
              CAST(cab.c_ab AS DOUBLE) / CAST(ua.c * ub.c AS DOUBLE) AS score
       FROM cab JOIN cu ua ON ua.tok = cab.tok_a
                JOIN cu ub ON ub.tok = cab.tok_b),
r AS (SELECT *, row_number() OVER (ORDER BY score DESC, c_ab DESC,
                                   tok_a ASC, tok_b ASC) AS rank FROM sc)
SELECT CAST(rank AS INT) AS rank, tok_a, tok_b, c_ab, c_a, c_b, score
FROM r WHERE rank <= 25""",
        # incremental CMS maintenance vs batch recompute: the oracle builds
        # the sketch from scratch over the FINAL table state; the engine got
        # there by folding 3 commits of CDC diffs
        "cms_sketch_sync": f"""
WITH {LI_CTES},
seeds AS (SELECT unnest([0, 1, 2, 3]) AS d),
hashed AS (SELECT s.d,
             ('0x' || substr(md5(CAST(s.d AS VARCHAR) || '|'
                                 || CAST(f.l_orderkey AS VARCHAR)), 1, 15))::BIGINT
             % 64 AS bucket
           FROM final f CROSS JOIN seeds s)
SELECT CAST(d AS INT) AS d, bucket, CAST(count(*) AS BIGINT) AS cnt
FROM hashed GROUP BY 1, 2""",
        # histogram-sketch quantiles: integer cells + three IEEE float ops
        # (target, fraction, interpolation) — bit-exact replay
        "events_value_quantiles": """
WITH e AS (SELECT event_type, value FROM events WHERE value IS NOT NULL),
c AS (SELECT event_type,
        greatest(0, least(99, CAST(floor((value - 0.0) / 5.0) AS INT))) AS bin,
        CAST(count(*) AS BIGINT) AS cnt
      FROM e GROUP BY 1, 2),
w AS (SELECT event_type, bin, cnt,
        sum(cnt) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
        sum(cnt) OVER (PARTITION BY event_type) AS n
      FROM c),
qq AS (SELECT unnest([0.5::DOUBLE, 0.9::DOUBLE, 0.99::DOUBLE]) AS q),
p AS (SELECT w.event_type, qq.q, w.bin, w.cnt, w.cum,
             qq.q * CAST(w.n AS DOUBLE) AS target
      FROM w CROSS JOIN qq
      WHERE CAST(w.cum AS DOUBLE) >= qq.q * CAST(w.n AS DOUBLE)),
f AS (SELECT event_type, q, min(bin) AS bin FROM p GROUP BY 1, 2)
SELECT f.event_type, f.q,
       round(0.0 + (CAST(f.bin AS DOUBLE)
                    + (p.target - CAST(p.cum - p.cnt AS DOUBLE))
                      / CAST(p.cnt AS DOUBLE)) * 5.0, 6) AS est
FROM f JOIN p ON p.event_type = f.event_type AND p.q = f.q
             AND p.bin = f.bin""",
        # maintained HLL registers vs batch recompute over the final state
        "hll_sketch_sync": f"""
WITH {LI_CTES},
h AS (SELECT ('0x' || substr(md5('7|' || CAST(l_orderkey AS VARCHAR)), 1, 15))::BIGINT
             AS hv
      FROM final),
b AS (SELECT hv % 64 AS bucket, (hv - (hv % 64)) // 64 AS pattern FROM h)
SELECT bucket,
       max(CASE WHEN pattern = 0 THEN 55
                ELSE least(54 - length(bin(pattern)) + 1, 55) END) AS reg
FROM b GROUP BY 1""",
        # Count-Min sketch replay: same portable-md5 seeded hashes, same
        # depth-4 x width-64 cells, estimate = min over rows of the hashed
        # cell count — integer-exact in any engine
        "events_heavy_hitters": """
WITH seeds AS (SELECT unnest([0, 1, 2, 3]) AS d),
hashed AS (SELECT s.d,
             ('0x' || substr(md5(CAST(s.d AS VARCHAR) || '|'
                                 || CAST(e.user_id AS VARCHAR)), 1, 15))::BIGINT
             % 64 AS bucket
           FROM events e CROSS JOIN seeds s),
cells AS (SELECT d, bucket, CAST(count(*) AS BIGINT) AS cnt
          FROM hashed GROUP BY 1, 2),
ks AS (SELECT DISTINCT user_id FROM events),
probe AS (SELECT k.user_id, min(c.cnt) AS est
          FROM ks k CROSS JOIN seeds s
          JOIN cells c ON c.d = s.d AND c.bucket =
            ('0x' || substr(md5(CAST(s.d AS VARCHAR) || '|'
                                || CAST(k.user_id AS VARCHAR)), 1, 15))::BIGINT
            % 64
          GROUP BY 1),
r AS (SELECT user_id, CAST(est AS BIGINT) AS est,
             row_number() OVER (ORDER BY est DESC, user_id ASC) AS rank
      FROM probe)
SELECT CAST(rank AS INT) AS rank, user_id, est FROM r WHERE rank <= 20""",
        # HyperLogLog replay: integer register derivation (bucket = h mod 64,
        # rho via bin()-length of h div 64, cap 55), scaled-integer register
        # sum, one IEEE division — bit-identical to the Spark estimate
        "events_hll_distinct": """
WITH e AS (SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
                  user_id
           FROM events),
h AS (SELECT event_type, day,
        ('0x' || substr(md5('7|' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
        AS hv
      FROM e),
b AS (SELECT event_type, day, hv % 64 AS bucket,
             (hv - (hv % 64)) // 64 AS pattern FROM h),
r AS (SELECT event_type, day, bucket,
        max(CASE WHEN pattern = 0 THEN 55
                 ELSE least(54 - length(bin(pattern)) + 1, 55) END) AS reg
      FROM b GROUP BY 1, 2, 3),
s AS (SELECT event_type, day,
        CAST(sum(1::BIGINT << (55 - reg))
             + (64 - count(*)) * (1::BIGINT << 55) AS BIGINT) AS s
      FROM r GROUP BY 1, 2),
x AS (SELECT event_type, day, CAST(count(DISTINCT user_id) AS BIGINT)
             AS n_users
      FROM e GROUP BY 1, 2)
SELECT s.event_type, s.day,
       round(CAST(0.709 AS DOUBLE) * 64 * 64
             * CAST(1::BIGINT << 55 AS DOUBLE) / CAST(s.s AS DOUBLE), 6)
       AS est_users,
       x.n_users
FROM s JOIN x ON s.event_type = x.event_type AND s.day = x.day""",
        "docs_table_dedup": """
WITH cur AS (SELECT doc_id,
               CASE WHEN doc_id % 10 = 0 THEN text || ' v2' ELSE text END AS text
             FROM documents),
h AS (SELECT doc_id,
        md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS ch
      FROM cur),
k AS (SELECT ch, CAST(count(*) AS BIGINT) AS dup_count FROM h GROUP BY 1)
SELECT CAST(count(*) AS BIGINT) AS n_kept,
       CAST(SUM(dup_count) AS BIGINT) AS n_total
FROM k""",
        # portable-md5 MinHash: DuckDB replays signatures, banding, candidate
        # join, and the jaccard estimate bit-for-bit (hash_fn="portable_md5")
        "docs_incremental_dedup": """
WITH corpus AS (SELECT doc_id,
                  CASE WHEN doc_id % 7 = 1 THEN text || ' v2' ELSE text END AS text
                FROM documents
                WHERE doc_id % 5 <> 0 AND doc_id % 11 <> 1),
batch AS (SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0),
both_sides AS (SELECT 'c' AS side, doc_id, text FROM corpus
               UNION ALL SELECT 'b', doc_id, text FROM batch),
d0 AS (SELECT side, doc_id,
         trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
       FROM both_sides),
sh AS (SELECT side, doc_id, list_distinct(list_transform(
         range(1, greatest(length(t) - 4, 1) + 1), i -> substr(t, i, 5))) AS shingles
       FROM d0),
sig AS (SELECT side, doc_id,
          [list_min(list_transform(shingles,
             s -> ('0x' || substr(md5(CAST(k AS VARCHAR) || '|' || s), 1, 15))::BIGINT))
           for k in range(0, 32)] AS sig
        FROM sh),
b AS (SELECT side, doc_id, sig, unnest(range(0, 8)) AS band FROM sig),
bk AS (SELECT side, doc_id, sig, band,
         ('0x' || substr(md5(
             CAST(sig[4*band+1] AS VARCHAR) || '|' || CAST(sig[4*band+2] AS VARCHAR)
             || '|' || CAST(sig[4*band+3] AS VARCHAR) || '|' || CAST(sig[4*band+4] AS VARCHAR)
           ), 1, 15))::BIGINT AS bucket
       FROM b),
cand AS (SELECT DISTINCT bb.doc_id AS doc_id, cc.doc_id AS match_id,
                bb.sig AS sb, cc.sig AS sc
         FROM bk bb JOIN bk cc ON bb.band = cc.band AND bb.bucket = cc.bucket
         WHERE bb.side = 'b' AND cc.side = 'c')
SELECT doc_id, match_id,
       len(list_filter(range(1, 33), i -> sb[i] = sc[i])) / 32.0 AS est_jaccard
FROM cand
WHERE len(list_filter(range(1, 33), i -> sb[i] = sc[i])) / 32.0 >= 0.4""",
        "docs_minhash_lsh": """
WITH d0 AS (SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
            FROM documents),
sh AS (SELECT doc_id, list_distinct(list_transform(
         range(1, greatest(length(t) - 4, 1) + 1), i -> substr(t, i, 5))) AS shingles
       FROM d0),
sig AS (SELECT doc_id,
          [list_min(list_transform(shingles,
             s -> ('0x' || substr(md5(CAST(k AS VARCHAR) || '|' || s), 1, 15))::BIGINT))
           for k in range(0, 32)] AS sig
        FROM sh),
b AS (SELECT doc_id, sig, unnest(range(0, 8)) AS band FROM sig),
bk AS (SELECT doc_id, sig, band,
         ('0x' || substr(md5(
             CAST(sig[4*band+1] AS VARCHAR) || '|' || CAST(sig[4*band+2] AS VARCHAR)
             || '|' || CAST(sig[4*band+3] AS VARCHAR) || '|' || CAST(sig[4*band+4] AS VARCHAR)
           ), 1, 15))::BIGINT AS bucket
       FROM b),
cand AS (SELECT DISTINCT a.doc_id AS id_a, b2.doc_id AS id_b,
                a.sig AS sa, b2.sig AS sb
         FROM bk a JOIN bk b2 ON a.band = b2.band AND a.bucket = b2.bucket
                            AND a.doc_id < b2.doc_id)
SELECT id_a, id_b,
       len(list_filter(range(1, 33), i -> sa[i] = sb[i])) / 32.0 AS est_jaccard
FROM cand
WHERE len(list_filter(range(1, 33), i -> sa[i] = sb[i])) / 32.0 >= 0.4""",
        # the minhash candidate pipeline above + exact levenshtein
        # verification on 200-char normalized prefixes
        "docs_lsh_edit_verify": """
WITH d0 AS (SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
            FROM documents),
sh AS (SELECT doc_id, list_distinct(list_transform(
         range(1, greatest(length(t) - 4, 1) + 1), i -> substr(t, i, 5))) AS shingles
       FROM d0),
sig AS (SELECT doc_id,
          [list_min(list_transform(shingles,
             s -> ('0x' || substr(md5(CAST(k AS VARCHAR) || '|' || s), 1, 15))::BIGINT))
           for k in range(0, 32)] AS sig
        FROM sh),
b AS (SELECT doc_id, sig, unnest(range(0, 8)) AS band FROM sig),
bk AS (SELECT doc_id, sig, band,
         ('0x' || substr(md5(
             CAST(sig[4*band+1] AS VARCHAR) || '|' || CAST(sig[4*band+2] AS VARCHAR)
             || '|' || CAST(sig[4*band+3] AS VARCHAR) || '|' || CAST(sig[4*band+4] AS VARCHAR)
           ), 1, 15))::BIGINT AS bucket
       FROM b),
cand AS (SELECT DISTINCT a.doc_id AS id_a, b2.doc_id AS id_b,
                a.sig AS sa, b2.sig AS sb
         FROM bk a JOIN bk b2 ON a.band = b2.band AND a.bucket = b2.bucket
                            AND a.doc_id < b2.doc_id),
pairs AS (SELECT id_a, id_b,
                 len(list_filter(range(1, 33), i -> sa[i] = sb[i])) / 32.0 AS est_jaccard
          FROM cand
          WHERE len(list_filter(range(1, 33), i -> sa[i] = sb[i])) / 32.0 >= 0.4),
t AS (SELECT doc_id, substr(t, 1, 200) AS p FROM d0),
v AS (SELECT p0.id_a, p0.id_b, p0.est_jaccard,
             1.0 - CAST(levenshtein(ta.p, tb.p) AS DOUBLE)
                 / CAST(greatest(length(ta.p), length(tb.p), 1) AS DOUBLE) AS es
      FROM pairs p0
      JOIN t ta ON ta.doc_id = p0.id_a
      JOIN t tb ON tb.doc_id = p0.id_b)
SELECT id_a, id_b, est_jaccard, round(es, 6) AS edit_sim
FROM v WHERE es >= 0.5""",
        # both Lloyd rounds replayed: deterministic lowest-id init, argmin
        # with lowest-cluster tie-break, per-position avg recompute,
        # empty-cluster carry via LEFT JOIN coalesce
        # the full Lloyd chain (same CTEs as emb_kmeans) feeding cluster-
        # level tf-idf labeling over the joined document text
        "emb_cluster_topics": """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
c0 AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cl, v
       FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 4)),
d1 AS (SELECT e.vec_id, e.v, c.cl,
              list_sum(list_transform(range(1, 65),
                i -> (e.v[i] - c.v[i]) * (e.v[i] - c.v[i]))) AS d2
       FROM e CROSS JOIN c0 c),
a1 AS (SELECT vec_id, v, cl FROM
        (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2, cl) AS rn
         FROM d1) WHERE rn = 1),
m1 AS (SELECT cl, list(m ORDER BY pos) AS v FROM
        (SELECT cl, pos, avg(x) AS m FROM
          (SELECT cl, generate_subscripts(v, 1) AS pos, unnest(v) AS x FROM a1)
         GROUP BY cl, pos) GROUP BY cl),
c1 AS (SELECT c0.cl, coalesce(m1.v, c0.v) AS v
       FROM c0 LEFT JOIN m1 ON c0.cl = m1.cl),
d2_ AS (SELECT e.vec_id, e.v, c.cl,
               list_sum(list_transform(range(1, 65),
                 i -> (e.v[i] - c.v[i]) * (e.v[i] - c.v[i]))) AS d2
        FROM e CROSS JOIN c1 c),
a2 AS (SELECT vec_id, v, cl FROM
        (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2, cl) AS rn
         FROM d2_) WHERE rn = 1),
m2 AS (SELECT cl, list(m ORDER BY pos) AS v FROM
        (SELECT cl, pos, avg(x) AS m FROM
          (SELECT cl, generate_subscripts(v, 1) AS pos, unnest(v) AS x FROM a2)
         GROUP BY cl, pos) GROUP BY cl),
c2 AS (SELECT c1.cl, coalesce(m2.v, c1.v) AS v
       FROM c1 LEFT JOIN m2 ON c1.cl = m2.cl),
dfin AS (SELECT e.vec_id, c.cl,
              list_sum(list_transform(range(1, 65),
                i -> (e.v[i] - c.v[i]) * (e.v[i] - c.v[i]))) AS d2
       FROM e CROSS JOIN c2 c),
asg AS (SELECT vec_id AS doc_id, cl AS cluster FROM
 (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2, cl) AS rn
  FROM dfin) WHERE rn = 1),
tok AS (
  SELECT a.cluster, unnest(string_split(
    regexp_replace(lower(trim(d.text)), '\\s+', ' ', 'g'), ' ')) AS term
  FROM documents d JOIN asg a USING (doc_id)
  WHERE length(trim(d.text)) > 0),
tc AS (SELECT cluster, term, CAST(count(*) AS DOUBLE) AS tf
       FROM tok GROUP BY cluster, term),
cl_tot AS (SELECT cluster, SUM(tf) AS cl FROM tc GROUP BY cluster),
dfq AS (SELECT term, CAST(count(*) AS DOUBLE) AS dfq FROM tc GROUP BY term),
n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM cl_tot),
s AS (SELECT tc.cluster, tc.term,
             round(tf / cl * ln(n / dfq), 6) AS tfidf
      FROM tc JOIN cl_tot USING (cluster) JOIN dfq USING (term) CROSS JOIN n),
r AS (SELECT *, row_number() OVER (PARTITION BY cluster
                                   ORDER BY tfidf DESC, term) AS rank
      FROM s)
SELECT cluster, CAST(rank AS INT) AS rank, term, tfidf
FROM r WHERE rank <= 5""",
        "emb_kmeans": """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
c0 AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cl, v
       FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 4)),
d1 AS (SELECT e.vec_id, e.v, c.cl,
              list_sum(list_transform(range(1, 65),
                i -> (e.v[i] - c.v[i]) * (e.v[i] - c.v[i]))) AS d2
       FROM e CROSS JOIN c0 c),
a1 AS (SELECT vec_id, v, cl FROM
        (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2, cl) AS rn
         FROM d1) WHERE rn = 1),
m1 AS (SELECT cl, list(m ORDER BY pos) AS v FROM
        (SELECT cl, pos, avg(x) AS m FROM
          (SELECT cl, generate_subscripts(v, 1) AS pos, unnest(v) AS x FROM a1)
         GROUP BY cl, pos) GROUP BY cl),
c1 AS (SELECT c0.cl, coalesce(m1.v, c0.v) AS v
       FROM c0 LEFT JOIN m1 ON c0.cl = m1.cl),
d2_ AS (SELECT e.vec_id, e.v, c.cl,
               list_sum(list_transform(range(1, 65),
                 i -> (e.v[i] - c.v[i]) * (e.v[i] - c.v[i]))) AS d2
        FROM e CROSS JOIN c1 c),
a2 AS (SELECT vec_id, v, cl FROM
        (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2, cl) AS rn
         FROM d2_) WHERE rn = 1),
m2 AS (SELECT cl, list(m ORDER BY pos) AS v FROM
        (SELECT cl, pos, avg(x) AS m FROM
          (SELECT cl, generate_subscripts(v, 1) AS pos, unnest(v) AS x FROM a2)
         GROUP BY cl, pos) GROUP BY cl),
c2 AS (SELECT c1.cl, coalesce(m2.v, c1.v) AS v
       FROM c1 LEFT JOIN m2 ON c1.cl = m2.cl),
df AS (SELECT e.vec_id, c.cl,
              list_sum(list_transform(range(1, 65),
                i -> (e.v[i] - c.v[i]) * (e.v[i] - c.v[i]))) AS d2
       FROM e CROSS JOIN c2 c)
SELECT vec_id, cl AS cluster, round(sqrt(d2), 6) AS dist FROM
 (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2, cl) AS rn
  FROM df) WHERE rn = 1""",
        "emb_mmr_rerank": _mmr_oracle(k=5, fetch_k=20, lam=0.7),
        # full chain replay: segment filter -> overlapping-window dedup ->
        # portable-hash sharding, each stage consuming the previous one's
        # rewritten text
        "docs_curation_pipeline": """
WITH sf_tok AS (
  SELECT doc_id,
         unnest(string_split(
           regexp_replace(trim(text), '\\s+', ' ', 'g'), ' ')) AS w,
         generate_subscripts(string_split(
           regexp_replace(trim(text), '\\s+', ' ', 'g'), ' '), 1) AS i
  FROM documents WHERE length(trim(text)) > 0),
sf_seg AS (
  SELECT doc_id, CAST(floor((i - 1) / 20) AS BIGINT) AS seg_idx,
         string_agg(w, ' ' ORDER BY i) AS seg
  FROM sf_tok GROUP BY doc_id, seg_idx),
sf_rules AS (
  SELECT doc_id, seg_idx, seg,
         (len(string_split(seg, ' ')) >= 3
          AND length(regexp_replace(seg, '[^0-9]', '', 'g'))
              / greatest(length(seg), 1) <= 0.5
          AND length(regexp_replace(seg, '[^!-/:-@\\[-`{-~]', '', 'g'))
              / greatest(length(seg), 1) <= 0.3
          AND row_number() OVER (PARTITION BY doc_id, seg
                                 ORDER BY seg_idx) = 1) AS ok
  FROM sf_seg),
docs2 AS (SELECT doc_id,
                 string_agg(seg, ' ' ORDER BY seg_idx) AS text
          FROM sf_rules WHERE ok GROUP BY doc_id),
sd_tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w,
         generate_subscripts(string_split(text, ' '), 1) AS i
  FROM docs2 WHERE length(text) > 0),
sd_n AS (SELECT doc_id, count(*) AS n FROM sd_tok GROUP BY 1),
sd_pos AS (SELECT doc_id, unnest(range(0, n - 8 + 1)) AS p
           FROM sd_n WHERE n >= 8),
sd_win AS (SELECT t.doc_id, p.p, string_agg(t.w, ' ' ORDER BY t.i) AS win
           FROM sd_pos p JOIN sd_tok t
             ON t.doc_id = p.doc_id AND t.i BETWEEN p.p + 1 AND p.p + 8
           GROUP BY t.doc_id, p.p),
sd_mk AS (SELECT doc_id, p, count(*) OVER (PARTITION BY win) AS c,
                 row_number() OVER (PARTITION BY win
                                    ORDER BY doc_id, p) AS r
          FROM sd_win),
sd_cov AS (SELECT doc_id, p FROM sd_mk WHERE c > 1 AND r > 1),
sd_rem AS (SELECT DISTINCT t.doc_id, t.i FROM sd_tok t
           JOIN sd_cov c ON c.doc_id = t.doc_id
                        AND t.i BETWEEN c.p + 1 AND c.p + 8),
docs3 AS (SELECT t.doc_id, count(*) AS n_tokens
          FROM sd_tok t LEFT JOIN sd_rem r
            ON r.doc_id = t.doc_id AND r.i = t.i
          WHERE r.i IS NULL GROUP BY t.doc_id),
h AS (SELECT doc_id,
             ((doc_id % 1000000007) * 2654435761 + 42) % 2147483648 AS b,
             n_tokens
      FROM docs3)
SELECT CAST(b % 4 AS INT) AS shard_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS sum_tokens
FROM h GROUP BY 1""",
        # per-subspace PQ chain: init = 8 lowest-id rows' subvectors, one
        # Lloyd round (assign argmin ties->lowest code, avg recompute,
        # empty-code carry), re-encode, reconstruct, ordered 64-term fold
        "emb_pq_topk": """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
js AS (SELECT unnest(range(8)) AS j),
sub AS (SELECT e.vec_id, js.j, list_slice(e.v, js.j * 8 + 1, js.j * 8 + 8) AS s
        FROM e CROSS JOIN js),
init AS (SELECT j,
                CAST(row_number() OVER (PARTITION BY j ORDER BY vec_id) - 1
                     AS INT) AS code,
                s AS cv
         FROM sub
         WHERE vec_id IN (SELECT vec_id FROM e ORDER BY vec_id LIMIT 8)),
d0 AS (SELECT sub.vec_id, sub.j, sub.s, init.code,
              list_sum(list_transform(range(1, 9),
                i -> (sub.s[i] - init.cv[i]) * (sub.s[i] - init.cv[i])))
                AS d2
       FROM sub JOIN init ON sub.j = init.j),
a0 AS (SELECT vec_id, j, s, code FROM
        (SELECT *, row_number() OVER (PARTITION BY vec_id, j
                                      ORDER BY d2, code) AS rn
         FROM d0) WHERE rn = 1),
m1 AS (SELECT j, code, list(mm ORDER BY pos) AS cv FROM
        (SELECT j, code, pos, avg(x) AS mm FROM
          (SELECT j, code, generate_subscripts(s, 1) AS pos, unnest(s) AS x
           FROM a0)
         GROUP BY j, code, pos) GROUP BY j, code),
c1 AS (SELECT init.j, init.code, coalesce(m1.cv, init.cv) AS cv
       FROM init LEFT JOIN m1 ON init.j = m1.j AND init.code = m1.code),
d1 AS (SELECT sub.vec_id, sub.j, c1.code,
              list_sum(list_transform(range(1, 9),
                i -> (sub.s[i] - c1.cv[i]) * (sub.s[i] - c1.cv[i]))) AS d2
       FROM sub JOIN c1 ON sub.j = c1.j),
enc AS (SELECT vec_id, j, code FROM
         (SELECT *, row_number() OVER (PARTITION BY vec_id, j
                                       ORDER BY d2, code) AS rn
          FROM d1) WHERE rn = 1),
rec AS (SELECT enc.vec_id, flatten(list(c1.cv ORDER BY enc.j)) AS recon
        FROM enc JOIN c1 ON enc.j = c1.j AND enc.code = c1.code
        GROUP BY enc.vec_id),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
d AS (SELECT q.query_id, r.vec_id AS neighbor_id,
             list_sum(list_transform(range(1, 65),
               i -> (q.qv[i] - r.recon[i]) * (q.qv[i] - r.recon[i])))
               AS adist
      FROM q CROSS JOIN rec r WHERE r.vec_id <> q.query_id)
SELECT query_id, neighbor_id, round(adist, 6) AS adist, CAST(rn AS INT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY adist, neighbor_id) AS rn
      FROM d)
WHERE rn <= 10""",
        # same Lloyd chain as emb_kmeans, plus the per-cluster hardness
        # ranking (d2 desc == dist desc, monotone) and the ceil(0.7*n) cut
        "emb_prototype_prune": """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
c0 AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cl, v
       FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 4)),
d1 AS (SELECT e.vec_id, e.v, c.cl,
              list_sum(list_transform(range(1, 65),
                i -> (e.v[i] - c.v[i]) * (e.v[i] - c.v[i]))) AS d2
       FROM e CROSS JOIN c0 c),
a1 AS (SELECT vec_id, v, cl FROM
        (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2, cl) AS rn
         FROM d1) WHERE rn = 1),
m1 AS (SELECT cl, list(m ORDER BY pos) AS v FROM
        (SELECT cl, pos, avg(x) AS m FROM
          (SELECT cl, generate_subscripts(v, 1) AS pos, unnest(v) AS x FROM a1)
         GROUP BY cl, pos) GROUP BY cl),
c1 AS (SELECT c0.cl, coalesce(m1.v, c0.v) AS v
       FROM c0 LEFT JOIN m1 ON c0.cl = m1.cl),
d2_ AS (SELECT e.vec_id, e.v, c.cl,
               list_sum(list_transform(range(1, 65),
                 i -> (e.v[i] - c.v[i]) * (e.v[i] - c.v[i]))) AS d2
        FROM e CROSS JOIN c1 c),
a2 AS (SELECT vec_id, v, cl FROM
        (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2, cl) AS rn
         FROM d2_) WHERE rn = 1),
m2 AS (SELECT cl, list(m ORDER BY pos) AS v FROM
        (SELECT cl, pos, avg(x) AS m FROM
          (SELECT cl, generate_subscripts(v, 1) AS pos, unnest(v) AS x FROM a2)
         GROUP BY cl, pos) GROUP BY cl),
c2 AS (SELECT c1.cl, coalesce(m2.v, c1.v) AS v
       FROM c1 LEFT JOIN m2 ON c1.cl = m2.cl),
df AS (SELECT e.vec_id, c.cl,
              list_sum(list_transform(range(1, 65),
                i -> (e.v[i] - c.v[i]) * (e.v[i] - c.v[i]))) AS d2
       FROM e CROSS JOIN c2 c),
fin AS (SELECT vec_id, cl AS cluster, d2 FROM
 (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2, cl) AS rn
  FROM df) WHERE rn = 1),
rk AS (SELECT vec_id, cluster, d2,
              row_number() OVER (PARTITION BY cluster
                                 ORDER BY d2 DESC, vec_id) AS r,
              count(*) OVER (PARTITION BY cluster) AS n
       FROM fin)
SELECT vec_id, cluster, round(sqrt(d2), 6) AS dist,
       CAST(r AS INT) AS hardness_rank
FROM rk WHERE r <= ceil(n * 0.7)""",
        # int8 quantization is exact in both engines (floor(x*s+0.5) on
        # IEEE doubles), integer dots exact, final division deterministic
        "emb_quantized_topk": """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
q0 AS (SELECT vec_id, v,
              127.0 / nullif(list_max(list_transform(v, x -> abs(x))), 0.0) AS s
       FROM e),
qz AS (SELECT vec_id,
              CASE WHEN s IS NULL THEN list_transform(v, x -> 0)
                   ELSE list_transform(v, x -> CAST(floor(x * s + 0.5) AS INT))
              END AS q
       FROM q0),
p AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, a.q AS qa, b.q AS qb
      FROM qz a JOIN qz b ON b.vec_id <> a.vec_id
      WHERE a.vec_id < 5),
s AS (SELECT query_id, neighbor_id,
             CAST(list_sum(list_transform(range(1, 65), i -> qa[i] * qb[i])) AS DOUBLE)
             / (sqrt(CAST(list_sum(list_transform(range(1, 65), i -> qa[i] * qa[i])) AS DOUBLE))
                * sqrt(CAST(list_sum(list_transform(range(1, 65), i -> qb[i] * qb[i])) AS DOUBLE)))
             AS qcosine
      FROM p)
SELECT query_id, neighbor_id, round(qcosine, 6) AS qcos, CAST(rn AS INT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY qcosine DESC, neighbor_id) AS rn
      FROM s)
WHERE rn <= 10""",
        # identical md5-parity Rademacher matrix re-derived in SQL
        "emb_random_projection": """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
d AS (SELECT CAST(i AS INT) AS dim_idx FROM range(0, 16) t(i)),
proj AS (SELECT vec_id, dim_idx,
    list_sum(list_transform(range(1, 65), j -> v[j] *
      (CASE WHEN ('0x'||substr(md5('rp-'||CAST(dim_idx AS VARCHAR)||'-'||
                                    CAST(j-1 AS VARCHAR)),1,15))::BIGINT % 2 = 0
            THEN 1.0 ELSE -1.0 END))) / sqrt(16.0) AS val
  FROM e, d)
SELECT vec_id, dim_idx, round(val, 6) AS val FROM proj""",
        "emb_hard_negatives": """
WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 5),
s AS (SELECT qid, vec_id AS nid, list_cosine_similarity(qe, embedding) AS c
      FROM embeddings, q WHERE vec_id <> qid),
b AS (SELECT * FROM s WHERE c >= 0.15 AND c < 0.35),
r AS (SELECT qid AS query_id, nid AS neighbor_id,
             row_number() OVER (PARTITION BY qid ORDER BY c DESC, nid ASC) AS rank
      FROM b)
SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank FROM r WHERE rank <= 10""",
        # pair pipeline replayed as above, closed transitively with a
        # recursive CTE — exact duplicate-cluster memberships
        "multimodal_features": """
WITH h AS (SELECT doc_id, sha256(coalesce(text, '')) AS hx FROM documents)
SELECT doc_id, 'image' AS media_type, CAST(8 AS INTEGER) AS feat_dim,
       CAST(('0x' || substr(hx,  1, 2))::INT / 255.0 AS REAL) AS f0,
       CAST(('0x' || substr(hx,  3, 2))::INT / 255.0 AS REAL) AS f1,
       CAST(('0x' || substr(hx,  5, 2))::INT / 255.0 AS REAL) AS f2,
       CAST(('0x' || substr(hx,  7, 2))::INT / 255.0 AS REAL) AS f3,
       CAST(('0x' || substr(hx,  9, 2))::INT / 255.0 AS REAL) AS f4,
       CAST(('0x' || substr(hx, 11, 2))::INT / 255.0 AS REAL) AS f5,
       CAST(('0x' || substr(hx, 13, 2))::INT / 255.0 AS REAL) AS f6,
       CAST(('0x' || substr(hx, 15, 2))::INT / 255.0 AS REAL) AS f7
FROM h""",
        # exact replay of phash_near_dup's md5-stand-in blocking + Hamming
        # filter: same payload derivation, same 4x16-bit band split, same
        # any-band equi-join candidates, same bit_count(xor) distance
        "multimodal_phash_dedup": """
WITH h AS (
  SELECT doc_id,
         substr(md5(CASE WHEN doc_id % 3 = 0
                         THEN lang || ':' || CAST(n_chars % 25 AS VARCHAR)
                         ELSE coalesce(text, '') END), 1, 16) AS hx
  FROM documents
), b AS (
  SELECT doc_id,
         [CAST(('0x' || substr(hx,  1, 4)) AS BIGINT),
          CAST(('0x' || substr(hx,  5, 4)) AS BIGINT),
          CAST(('0x' || substr(hx,  9, 4)) AS BIGINT),
          CAST(('0x' || substr(hx, 13, 4)) AS BIGINT)] AS bands
  FROM h
), e AS (
  SELECT doc_id, bands, generate_subscripts(bands, 1) AS band,
         unnest(bands) AS bv
  FROM b
), cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b2.doc_id AS id_b,
                  a.bands AS ba, b2.bands AS bb
  FROM e a JOIN e b2 ON a.band = b2.band AND a.bv = b2.bv
                    AND a.doc_id < b2.doc_id
), d AS (
  SELECT id_a, id_b,
         CAST(bit_count(xor(ba[1], bb[1])) + bit_count(xor(ba[2], bb[2]))
            + bit_count(xor(ba[3], bb[3])) + bit_count(xor(ba[4], bb[4]))
           AS INT) AS hamming
  FROM cand
)
SELECT id_a, id_b, hamming FROM d WHERE hamming <= 8""",
        "docs_cluster_best": """
WITH RECURSIVE d0 AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS toks
            FROM documents WHERE length(trim(text)) > 0),
d AS (SELECT doc_id,
        list_distinct(list_transform(range(1, greatest(len(toks) - 2, 0) + 1),
          i -> array_to_string(list_slice(toks, i, i + 2), ' '))) AS grams
      FROM d0),
d2 AS (SELECT doc_id, grams, len(grams) AS n_grams FROM d WHERE len(grams) > 0),
inv AS (SELECT doc_id, n_grams, unnest(grams) AS g FROM d2),
prs AS (SELECT id_a, id_b FROM (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                 a.n_grams AS na, b.n_grams AS nb,
                 CAST(count(*) AS BIGINT) AS inter
          FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
          GROUP BY 1, 2, 3, 4)
        WHERE CAST(inter AS DOUBLE) / (na + nb - inter) >= 0.8),
e AS (SELECT id_a AS u, id_b AS v FROM prs
      UNION SELECT id_b, id_a FROM prs),
reach(u, v) AS (SELECT u, v FROM e
                UNION SELECT r.u, e2.v FROM reach r JOIN e e2
                      ON r.v = e2.u AND e2.v <> r.u),
cmp AS (SELECT u AS id, least(u, min(v)) AS comp FROM reach GROUP BY u),
qt AS (SELECT doc_id,
         CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
              ELSE string_split_regex(trim(text), '\\s+') END AS toks,
         length(text) - length(regexp_replace(text,
             '[.,!?;:''"()\\[\\]{}-]', '', 'g')) AS n_punct,
         length(text) AS n_chars
       FROM documents),
qm AS (SELECT doc_id, len(toks) AS n_tok,
         CASE WHEN len(toks) > 0 THEN
           len(list_intersect(toks, ['the','a','an','and','or','of','to','in',
             'is','are','was','be','for','on','with','as','at','by','it',
             'this','that','from'])) / CAST(22.0 AS DOUBLE)
         ELSE CAST(0.0 AS DOUBLE) END AS stop_ratio,
         CASE WHEN n_chars > 0 THEN n_punct / CAST(n_chars AS DOUBLE)
              ELSE CAST(1.0 AS DOUBLE) END AS punct_ratio
       FROM qt),
qs AS (SELECT doc_id,
         round(CAST(0.4 AS DOUBLE)
                 * least(n_tok / CAST(50.0 AS DOUBLE), CAST(1.0 AS DOUBLE))
             + CAST(0.3 AS DOUBLE) * (CAST(1.0 AS DOUBLE)
                 - least(punct_ratio * 5, CAST(1.0 AS DOUBLE)))
             + CAST(0.3 AS DOUBLE)
                 * least(stop_ratio * 4, CAST(1.0 AS DOUBLE)), 4) AS q
       FROM qm),
mem AS (SELECT cmp.id, cmp.comp, qs.q,
          row_number() OVER (PARTITION BY cmp.comp
                             ORDER BY qs.q DESC, cmp.id) AS rn
        FROM cmp JOIN qs ON cmp.id = qs.doc_id)
SELECT comp, max(CASE WHEN rn = 1 THEN id END) AS rep_id,
       max(CASE WHEN rn = 1 THEN q END) AS rep_score,
       CAST(count(*) AS BIGINT) AS n_members
FROM mem GROUP BY comp""",
        "docs_bm25": """
WITH d AS (SELECT doc_id,
    CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
         ELSE string_split_regex(trim(lower(text)), '\\s+') END AS toks
  FROM documents),
t AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl,
    CAST(len(list_filter(toks, x -> x = 'the')) AS BIGINT) AS tf0,
    CAST(len(list_filter(toks, x -> x = 'data')) AS BIGINT) AS tf1,
    CAST(len(list_filter(toks, x -> x = 'model')) AS BIGINT) AS tf2
  FROM d),
st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(dl) AS BIGINT) AS sumdl,
    CAST(SUM(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df0,
    CAST(SUM(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df1,
    CAST(SUM(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df2
  FROM t)
SELECT doc_id, bm25 FROM (
  SELECT doc_id, round(
      ln(1.0 + (n - df0 + 0.5) / (df0 + 0.5)) * (tf0 * 2.2)
        / (tf0 + 1.2 * (0.25 + 0.75 * (dl / (CAST(sumdl AS DOUBLE) / CAST(n AS DOUBLE)))))
    + ln(1.0 + (n - df1 + 0.5) / (df1 + 0.5)) * (tf1 * 2.2)
        / (tf1 + 1.2 * (0.25 + 0.75 * (dl / (CAST(sumdl AS DOUBLE) / CAST(n AS DOUBLE)))))
    + ln(1.0 + (n - df2 + 0.5) / (df2 + 0.5)) * (tf2 * 2.2)
        / (tf2 + 1.2 * (0.25 + 0.75 * (dl / (CAST(sumdl AS DOUBLE) / CAST(n AS DOUBLE)))))
    , 6) AS bm25
  FROM t, st)
WHERE bm25 > 0
ORDER BY bm25 DESC, doc_id LIMIT 20""",
        "docs_quota_cap": """
SELECT doc_id, source, n_chars FROM (
  SELECT doc_id, source, n_chars,
         row_number() OVER (PARTITION BY source
                            ORDER BY n_chars DESC, doc_id) AS rn
  FROM documents) WHERE rn <= 20""",
        "docs_hybrid_rrf": """
WITH d AS (SELECT doc_id,
    CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
         ELSE string_split_regex(trim(lower(text)), '\\s+') END AS toks
  FROM documents),
t AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl,
    CAST(len(list_filter(toks, x -> x = 'the')) AS BIGINT) AS tf0,
    CAST(len(list_filter(toks, x -> x = 'data')) AS BIGINT) AS tf1,
    CAST(len(list_filter(toks, x -> x = 'model')) AS BIGINT) AS tf2
  FROM d),
st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(dl) AS BIGINT) AS sumdl,
    CAST(SUM(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df0,
    CAST(SUM(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df1,
    CAST(SUM(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df2
  FROM t),
bm AS (SELECT doc_id, bm25 FROM (
  SELECT doc_id, round(
      ln(1.0 + (n - df0 + 0.5) / (df0 + 0.5)) * (tf0 * 2.2)
        / (tf0 + 1.2 * (0.25 + 0.75 * (dl / (CAST(sumdl AS DOUBLE) / CAST(n AS DOUBLE)))))
    + ln(1.0 + (n - df1 + 0.5) / (df1 + 0.5)) * (tf1 * 2.2)
        / (tf1 + 1.2 * (0.25 + 0.75 * (dl / (CAST(sumdl AS DOUBLE) / CAST(n AS DOUBLE)))))
    + ln(1.0 + (n - df2 + 0.5) / (df2 + 0.5)) * (tf2 * 2.2)
        / (tf2 + 1.2 * (0.25 + 0.75 * (dl / (CAST(sumdl AS DOUBLE) / CAST(n AS DOUBLE)))))
    , 6) AS bm25
  FROM t, st)
  WHERE bm25 > 0 ORDER BY bm25 DESC, doc_id LIMIT 20),
lex AS (SELECT doc_id,
               row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rk FROM bm),
dense AS (SELECT doc_id, rk FROM (
  SELECT vec_id AS doc_id,
         row_number() OVER (ORDER BY c DESC, vec_id) AS rk FROM (
    SELECT vec_id, list_cosine_similarity(
        (SELECT embedding FROM embeddings WHERE vec_id = 0), embedding) AS c
    FROM embeddings WHERE vec_id <> 0)) WHERE rk <= 20),
u AS (SELECT * FROM lex UNION ALL SELECT * FROM dense),
f AS (SELECT doc_id, round(sum(1.0 / (60 + rk)), 6) AS rrf,
             CAST(count(*) AS INT) AS n_lists
      FROM u GROUP BY doc_id)
SELECT doc_id, rrf, n_lists,
       CAST(row_number() OVER (ORDER BY rrf DESC, doc_id) AS INT) AS rank
FROM f QUALIFY rank <= 20""",
        "multimodal_audio_chunks": """
WITH d AS (SELECT doc_id, CAST(n_chars * 37 AS BIGINT) AS dur
           FROM documents),
s AS (SELECT doc_id, dur,
             unnest(range(0, greatest(dur - 1, 0) + 1, 10000))
             AS chunk_start_ms
      FROM d)
SELECT doc_id, CAST(chunk_start_ms AS BIGINT) AS chunk_start_ms,
       CAST(least(chunk_start_ms + 10000, dur) AS BIGINT) AS chunk_end_ms
FROM s""",
        "multimodal_frame_plan": """
WITH d AS (SELECT doc_id, CAST(n_chars * 37 AS BIGINT) AS dur
           FROM documents)
SELECT doc_id, CAST(unnest(range(0, dur + 1, 5000)) AS BIGINT) AS frame_ts
FROM d""",
        "docs_dup_clusters": """
WITH RECURSIVE d0 AS (SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
            FROM documents),
sh AS (SELECT doc_id, list_distinct(list_transform(
         range(1, greatest(length(t) - 4, 1) + 1), i -> substr(t, i, 5))) AS shingles
       FROM d0),
sig AS (SELECT doc_id,
          [list_min(list_transform(shingles,
             s -> ('0x' || substr(md5(CAST(k AS VARCHAR) || '|' || s), 1, 15))::BIGINT))
           for k in range(0, 32)] AS sig
        FROM sh),
b AS (SELECT doc_id, sig, unnest(range(0, 8)) AS band FROM sig),
bk AS (SELECT doc_id, sig, band,
         ('0x' || substr(md5(
             CAST(sig[4*band+1] AS VARCHAR) || '|' || CAST(sig[4*band+2] AS VARCHAR)
             || '|' || CAST(sig[4*band+3] AS VARCHAR) || '|' || CAST(sig[4*band+4] AS VARCHAR)
           ), 1, 15))::BIGINT AS bucket
       FROM b),
cand AS (SELECT DISTINCT a.doc_id AS id_a, b2.doc_id AS id_b,
                a.sig AS sa, b2.sig AS sb
         FROM bk a JOIN bk b2 ON a.band = b2.band AND a.bucket = b2.bucket
                            AND a.doc_id < b2.doc_id),
prs AS (SELECT id_a, id_b FROM cand
        WHERE len(list_filter(range(1, 33), i -> sa[i] = sb[i])) / 32.0 >= 0.4),
e AS (SELECT id_a AS u, id_b AS v FROM prs
      UNION SELECT id_b, id_a FROM prs),
reach(u, v) AS (SELECT u, v FROM e
                UNION SELECT r.u, e2.v FROM reach r JOIN e e2
                      ON r.v = e2.u AND e2.v <> r.u),
cmp AS (SELECT u AS id, least(u, min(v)) AS comp FROM reach GROUP BY u)
SELECT comp, CAST(count(*) AS BIGINT) AS n_members,
       min(id) AS min_id, max(id) AS max_id
FROM cmp GROUP BY comp""",
        # portable-md5 48-bit SimHash near-dup pairs, fully replayed
        "docs_simhash": """
WITH t AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS toks
           FROM documents),
th AS (SELECT doc_id, list_transform(toks,
         s -> ('0x' || substr(md5('0|' || s), 1, 15))::BIGINT) AS hs
       FROM t),
fp AS (SELECT doc_id,
         list_sum(list_transform(range(0, 48), i ->
           CASE WHEN list_sum(list_transform(hs, h ->
                  CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END)) > 0
                THEN (1::BIGINT << i) ELSE 0 END))::BIGINT AS simhash
       FROM th),
b AS (SELECT doc_id, simhash, unnest(range(0, 4)) AS band FROM fp),
bk AS (SELECT doc_id, simhash, band,
              (simhash >> (12 * band)::INT) & 4095 AS chunk FROM b),
cand AS (SELECT DISTINCT a.doc_id AS id_a, b2.doc_id AS id_b,
                a.simhash AS fa, b2.simhash AS fb
         FROM bk a JOIN bk b2 ON a.band = b2.band AND a.chunk = b2.chunk
                            AND a.doc_id < b2.doc_id)
SELECT id_a, id_b, CAST(bit_count(xor(fa, fb)) AS BIGINT) AS hamming
FROM cand WHERE bit_count(xor(fa, fb)) <= 6""",
        "docs_bpe_pairs": """
WITH w AS (
  SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS w
  FROM documents WHERE length(trim(text)) > 0),
v AS (SELECT w, CAST(count(*) AS BIGINT) AS n
      FROM w WHERE length(w) >= 2 GROUP BY w),
p AS (SELECT substr(w, i, 2) AS pair, n
      FROM v, unnest(range(1, length(w))) AS t(i)),
c AS (SELECT pair, CAST(sum(n) AS BIGINT) AS occurrences
      FROM p GROUP BY pair)
SELECT CAST(row_number() OVER (ORDER BY occurrences DESC, pair)
            AS INT) AS rank,
       pair, occurrences
FROM c ORDER BY occurrences DESC, pair LIMIT 20""",
        "docs_segment_filter": """
WITH tok AS (
  SELECT doc_id,
         unnest(string_split(
           regexp_replace(trim(text), '\\s+', ' ', 'g'), ' ')) AS w,
         generate_subscripts(string_split(
           regexp_replace(trim(text), '\\s+', ' ', 'g'), ' '), 1) AS i
  FROM documents WHERE length(trim(text)) > 0),
seg AS (
  SELECT doc_id, CAST(floor((i - 1) / 20) AS BIGINT) AS seg_idx,
         string_agg(w, ' ' ORDER BY i) AS seg
  FROM tok GROUP BY doc_id, seg_idx),
rules AS (
  SELECT doc_id, seg_idx, seg,
         (len(string_split(seg, ' ')) >= 3
          AND length(regexp_replace(seg, '[^0-9]', '', 'g'))
              / greatest(length(seg), 1) <= 0.5
          AND length(regexp_replace(seg, '[^!-/:-@\\[-`{-~]', '', 'g'))
              / greatest(length(seg), 1) <= 0.3
          AND row_number() OVER (PARTITION BY doc_id, seg
                                 ORDER BY seg_idx) = 1) AS ok
  FROM seg),
kept AS (SELECT doc_id, seg_idx, seg FROM rules WHERE ok),
tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_segments
        FROM seg GROUP BY doc_id),
agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
               string_agg(seg, ' ' ORDER BY seg_idx) AS text_filtered
        FROM kept GROUP BY doc_id)
SELECT t.doc_id, coalesce(a.text_filtered, '') AS text_filtered,
       t.n_segments, coalesce(a.n_kept, 0) AS n_kept
FROM tot t LEFT JOIN agg a USING (doc_id)""",
        "docs_mixture_plan": """
WITH n AS (
  SELECT lang AS "group",
         CAST(sum(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT)
           AS available_tokens
  FROM documents WHERE lang IN ('en', 'de', 'es', 'fr') GROUP BY 1),
s AS (SELECT "group", available_tokens,
             CASE "group" WHEN 'en' THEN 0.4 WHEN 'de' THEN 0.2
                          WHEN 'es' THEN 0.2 WHEN 'fr' THEN 0.2 END AS share
      FROM n)
SELECT "group", available_tokens, round(share, 6) AS share,
       CAST(floor(share * 100000.0) AS BIGINT) AS assigned_tokens,
       round(CAST(floor(share * 100000.0) AS BIGINT)
             / CAST(available_tokens AS DOUBLE), 6) AS epochs
FROM s""",
        "docs_shard_plan": """
WITH h AS (
  SELECT doc_id,
         ((doc_id % 1000000007) * 2654435761 + 42) % 2147483648 AS b,
         CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
           AS n_tokens
  FROM documents)
SELECT doc_id, CAST(b % 8 AS INT) AS shard_id,
       CAST(row_number() OVER (PARTITION BY b % 8
                               ORDER BY b, doc_id) - 1 AS BIGINT)
         AS shard_pos,
       n_tokens
FROM h""",
        "docs_contamination_score": """
WITH t AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS toks
           FROM documents),
g AS (SELECT doc_id, unnest(list_distinct(list_transform(
        range(1, greatest(len(toks) - 3, 0) + 1),
        i -> array_to_string(list_slice(toks, i, i + 3), ' ')))) AS g
      FROM t),
bench AS (SELECT DISTINCT g FROM g WHERE doc_id % 97 = 0),
agg AS (SELECT a.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
               CAST(sum(CASE WHEN b.g IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_contaminated
        FROM g a LEFT JOIN bench b USING (g)
        WHERE a.doc_id % 97 <> 0 GROUP BY a.doc_id)
SELECT d.doc_id,
       coalesce(a.n_grams, 0) AS n_grams,
       coalesce(a.n_contaminated, 0) AS n_contaminated,
       CASE WHEN coalesce(a.n_grams, 0) > 0
            THEN round(CAST(a.n_contaminated AS DOUBLE) / a.n_grams, 6)
            ELSE 0.0 END AS contamination
FROM documents d LEFT JOIN agg a USING (doc_id)
WHERE d.doc_id % 97 <> 0""",
        "docs_decontaminate": """
WITH t AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS toks
           FROM documents),
g AS (SELECT doc_id, unnest(list_distinct(list_transform(
        range(1, greatest(len(toks) - 3, 0) + 1),
        i -> array_to_string(list_slice(toks, i, i + 3), ' ')))) AS g
      FROM t),
bench AS (SELECT DISTINCT g FROM g WHERE doc_id % 97 = 0)
SELECT DISTINCT a.doc_id FROM g a JOIN bench USING (g)
WHERE a.doc_id % 97 <> 0""",
        "docs_span_decontaminate": """
WITH tok AS (
  SELECT doc_id,
         unnest(string_split(
           regexp_replace(trim(text), '\\s+', ' ', 'g'), ' ')) AS w,
         generate_subscripts(string_split(
           regexp_replace(trim(text), '\\s+', ' ', 'g'), ' '), 1) AS i
  FROM documents WHERE doc_id % 97 <> 0 AND length(trim(text)) > 0),
seg AS (
  SELECT doc_id, CAST(floor((i - 1) / 20) AS BIGINT) AS seg_idx,
         string_agg(w, ' ' ORDER BY i) AS seg
  FROM tok GROUP BY doc_id, seg_idx),
bt AS (SELECT string_split_regex(trim(lower(text)), '\\s+') AS toks
       FROM documents WHERE doc_id % 97 = 0 AND length(trim(text)) > 0),
bench AS (SELECT DISTINCT unnest(list_distinct(list_transform(
            range(1, greatest(len(toks) - 3, 0) + 1),
            i -> array_to_string(list_slice(toks, i, i + 3), ' ')))) AS g
          FROM bt),
sg AS (SELECT doc_id, seg_idx,
              string_split_regex(trim(lower(seg)), '\\s+') AS stoks
       FROM seg),
segg AS (SELECT doc_id, seg_idx, unnest(list_distinct(list_transform(
            range(1, greatest(len(stoks) - 3, 0) + 1),
            i -> array_to_string(list_slice(stoks, i, i + 3), ' ')))) AS g
         FROM sg),
bad AS (SELECT DISTINCT doc_id, seg_idx FROM segg JOIN bench USING (g)),
kept AS (SELECT s.doc_id, CAST(count(*) AS BIGINT) AS n_kept,
                string_agg(s.seg, ' ' ORDER BY s.seg_idx) AS text_clean
         FROM seg s LEFT JOIN bad b
           ON s.doc_id = b.doc_id AND s.seg_idx = b.seg_idx
         WHERE b.doc_id IS NULL GROUP BY s.doc_id),
tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_segments
        FROM seg GROUP BY doc_id)
SELECT t.doc_id, coalesce(k.text_clean, '') AS text_clean, t.n_segments,
       CAST(t.n_segments - coalesce(k.n_kept, 0) AS BIGINT) AS n_removed
FROM tot t LEFT JOIN kept k USING (doc_id)""",
        "docs_pii_scrub": """
WITH d AS (SELECT doc_id,
             text || ' contact user' || CAST(doc_id AS VARCHAR)
                  || '@example.com or 555-123-4567 ssn 123-45-6789'
                  || ' card 4111 1111 1111 1111 end' AS text
           FROM documents WHERE doc_id < 200)
SELECT doc_id,
  regexp_replace(
    regexp_replace(
      regexp_replace(
        regexp_replace(text,
          '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        '\\b\\d{3}-\\d{2}-\\d{4}\\b', '<SSN>', 'g'),
      '\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b', '<PHONE>', 'g'),
    '\\b\\d(?:[ -]?\\d){12,15}\\b', '<CARD>', 'g') AS text
FROM d""",
        "docs_split": """
SELECT doc_id, lang,
       CASE WHEN ((doc_id % 1000000007) * 2654435761 + 42) % 1000000
                 < 800000 THEN 'train'
            WHEN ((doc_id % 1000000007) * 2654435761 + 42) % 1000000
                 < 900000 THEN 'val'
            ELSE 'test' END AS split
FROM documents""",
        "docs_sample_stratified": """
SELECT doc_id, lang FROM documents
WHERE ((doc_id % 1000000007) * 2654435761 + 42) % 1000000 <
      CASE lang WHEN 'en' THEN 500000 WHEN 'de' THEN 250000
                WHEN 'fr' THEN 100000 WHEN 'es' THEN 750000 ELSE 0 END""",
        "docs_quality_percentile": """
WITH r AS (
  SELECT doc_id, lang, n_chars,
         row_number() OVER (PARTITION BY lang
                            ORDER BY n_chars DESC, doc_id) AS rn,
         count(*) OVER (PARTITION BY lang) AS cnt
  FROM documents)
SELECT doc_id, lang, n_chars FROM r
WHERE rn <= ceil(CAST(0.3 AS DOUBLE) * cnt)""",
        "events_asof_join": """
WITH r AS (SELECT user_id, ts, value AS status FROM events
           WHERE event_id % 20 = 0),
l AS (SELECT event_id, user_id, ts FROM events WHERE event_id % 20 <> 0)
SELECT l.event_id, round(r.status, 6) AS status, r.ts AS status_ts
FROM l ASOF LEFT JOIN r
  ON l.user_id = r.user_id AND l.ts >= r.ts""",
        "events_resample": """
WITH series AS (SELECT user_id, ts, max(value) AS value FROM events
                WHERE user_id % 25 = 0 GROUP BY user_id, ts),
b AS (SELECT user_id, date_trunc('hour', min(ts)) AS lo,
             date_trunc('hour', max(ts)) AS hi
      FROM series GROUP BY user_id),
spine AS (SELECT user_id,
                 unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS grid_ts
          FROM b)
SELECT s.user_id, s.grid_ts, round(d.value, 6) AS last_value,
       d.ts AS obs_ts
FROM spine s ASOF LEFT JOIN series d
  ON s.user_id = d.user_id AND s.grid_ts >= d.ts""",
        "events_interval_join": """
WITH bands AS (SELECT i AS band_id, i * 8.0 AS lo, i * 8.0 + 12.0 AS hi
               FROM range(60) t(i))
SELECT band_id, CAST(count(*) AS BIGINT) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
FROM events JOIN bands ON lo <= value AND value < hi
GROUP BY 1""",
        "events_salted_join": """
WITH dim AS (SELECT DISTINCT event_type,
                    CAST(length(event_type) AS INTEGER) AS type_len
             FROM events)
SELECT e.event_type, type_len, CAST(count(*) AS BIGINT) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
FROM events e JOIN dim ON e.event_type = dim.event_type
GROUP BY 1, 2""",
        "orders_rollup": """
SELECT o_orderstatus, o_orderpriority, CAST(count(*) AS BIGINT) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""",
        "orders_pivot": """
SELECT o_orderpriority,
       CAST(count(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS n_p,
       CAST(count(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS n_o,
       CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_f
FROM orders GROUP BY 1""",
        "events_window_funcs": """
SELECT event_id, user_id,
       round(lag(value) OVER w, 6) AS prev_value,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER
            (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS DOUBLE) AS run_sum,
       CAST(row_number() OVER w AS BIGINT) AS seq_no
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)""",
        "orders_setops": """
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
INTERSECT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
EXCEPT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'""",
        "scd2_history": f"""
WITH {LI_CTES}
SELECT l_orderkey, l_linenumber, CAST(l_quantity AS DOUBLE) AS qty,
       1 AS from_idx,
       CASE WHEN l_orderkey % 10 = 0 THEN 2 ELSE NULL END AS to_idx
FROM base
UNION ALL
SELECT l_orderkey, l_linenumber, CAST(l_quantity + 1000.0 AS DOUBLE),
       2, CASE WHEN l_orderkey % 100 = 0 THEN 3 ELSE NULL END
FROM base WHERE l_orderkey % 10 = 0""",
        "orders_profile": """
WITH s AS (SELECT CAST(count(*) AS BIGINT) AS n FROM orders)
SELECT 'o_orderkey' AS column, s.n AS n_rows,
       (SELECT CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM orders) AS n_null,
       (SELECT CAST(count(DISTINCT o_orderkey) AS BIGINT) FROM orders) AS n_distinct,
       (SELECT round(CAST(min(o_orderkey) AS DOUBLE), 6) FROM orders) AS min_num,
       (SELECT round(CAST(max(o_orderkey) AS DOUBLE), 6) FROM orders) AS max_num,
       CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
FROM s
UNION ALL
SELECT 'o_custkey', s.n,
       (SELECT CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM orders),
       (SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) FROM orders),
       (SELECT round(CAST(min(o_custkey) AS DOUBLE), 6) FROM orders),
       (SELECT round(CAST(max(o_custkey) AS DOUBLE), 6) FROM orders),
       NULL, NULL FROM s
UNION ALL
SELECT 'o_totalprice', s.n,
       (SELECT CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM orders),
       (SELECT CAST(count(DISTINCT o_totalprice) AS BIGINT) FROM orders),
       (SELECT round(CAST(min(o_totalprice) AS DOUBLE), 6) FROM orders),
       (SELECT round(CAST(max(o_totalprice) AS DOUBLE), 6) FROM orders),
       NULL, NULL FROM s
UNION ALL
SELECT 'o_orderpriority', s.n,
       (SELECT CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM orders),
       (SELECT CAST(count(DISTINCT o_orderpriority) AS BIGINT) FROM orders),
       CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
       (SELECT min(o_orderpriority) FROM orders),
       (SELECT max(o_orderpriority) FROM orders)
FROM s""",
        "rollup_incremental": f"""
WITH {LI_CTES}
SELECT l_returnflag, l_linestatus,
       round(sum(CAST(l_quantity AS DOUBLE)), 2) AS sum_qty,
       round(sum(CAST(l_extendedprice AS DOUBLE)), 2) AS sum_price,
       CAST(count(*) AS BIGINT) AS n_rows
FROM final GROUP BY l_returnflag, l_linestatus""",
        "events_cohorts": """
WITH ev AS (SELECT user_id AS u, date_trunc('week', ts) AS p FROM events),
f AS (SELECT u, min(p) AS cohort FROM ev GROUP BY u),
j AS (SELECT ev.u, CAST(f.cohort AS DATE) AS cohort,
             CAST(floor(date_diff('day', CAST(f.cohort AS DATE),
                                  CAST(ev.p AS DATE)) / 7.0) AS INT)
               AS period_offset
      FROM ev JOIN f USING (u)),
c AS (SELECT cohort, period_offset,
             CAST(count(DISTINCT u) AS BIGINT) AS n_users
      FROM j GROUP BY cohort, period_offset),
s AS (SELECT cohort, n_users AS sz FROM c WHERE period_offset = 0)
SELECT c.cohort, c.period_offset, c.n_users,
       round(CAST(c.n_users AS DOUBLE) / CAST(s.sz AS DOUBLE), 6)
         AS retention
FROM c JOIN s USING (cohort)""",
        "events_top_paths": """
WITH rn AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS r
  FROM events),
p AS (SELECT user_id,
             string_agg(event_type, ' > ' ORDER BY r) AS path,
             CAST(count(*) AS INT) AS path_len
      FROM rn WHERE r <= 5 GROUP BY user_id)
SELECT path, CAST(count(*) AS BIGINT) AS n_users, path_len
FROM p GROUP BY path, path_len
ORDER BY n_users DESC, path ASC LIMIT 20""",
        "events_transitions": """
WITH nxt AS (
  SELECT event_type AS src,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS dst
  FROM events),
c AS (SELECT src, dst, CAST(count(*) AS BIGINT) AS n
      FROM nxt WHERE dst IS NOT NULL GROUP BY src, dst)
SELECT src, dst, n,
       round(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY src), 6) AS p
FROM c""",
        "docs_quality_classifier": """
WITH w(tok, wt) AS (VALUES ('spark', 1.0), ('vector', 0.8), ('query', 0.5),
                           ('slow', -1.2), ('big', -0.4), ('the', -0.1)),
tok AS (
  SELECT doc_id, unnest(string_split(
    regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS tok
  FROM documents WHERE length(trim(text)) > 0),
agg AS (
  SELECT t.doc_id, sum(coalesce(w.wt, 0.0)) AS s,
         CAST(count(*) AS DOUBLE) AS n
  FROM tok t LEFT JOIN w USING (tok) GROUP BY t.doc_id)
SELECT doc_id,
       round(1.0 / (1.0 + exp(-(0.1 + s / n))), 6) AS score
FROM agg""",
        "docs_tfidf": """
WITH tok AS (
  SELECT doc_id, unnest(string_split(
    regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS term
  FROM documents WHERE length(trim(text)) > 0),
dl AS (SELECT doc_id, CAST(count(*) AS DOUBLE) AS dl FROM tok GROUP BY doc_id),
tc AS (SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf
       FROM tok GROUP BY doc_id, term),
dfq AS (SELECT term, CAST(count(*) AS DOUBLE) AS dfq FROM tc GROUP BY term),
n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM dl),
s AS (SELECT tc.doc_id, tc.term,
             round(tf / dl * ln(n / dfq), 6) AS tfidf
      FROM tc JOIN dl USING (doc_id) JOIN dfq USING (term) CROSS JOIN n),
r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY tfidf DESC, term) AS rank
      FROM s)
SELECT doc_id, CAST(rank AS INT) AS rank, term, tfidf
FROM r WHERE rank <= 5 AND doc_id < 30""",
        "docs_substring_dedup": """
WITH tok AS (
  SELECT doc_id,
         unnest(string_split(
           regexp_replace(trim(text), '\\s+', ' ', 'g'), ' ')) AS w,
         generate_subscripts(string_split(
           regexp_replace(trim(text), '\\s+', ' ', 'g'), ' '), 1) AS i
  FROM documents WHERE length(trim(text)) > 0),
n AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY 1),
pos AS (SELECT doc_id, unnest(range(0, n - 8 + 1)) AS p
        FROM n WHERE n >= 8),
win AS (SELECT t.doc_id, p.p, string_agg(t.w, ' ' ORDER BY t.i) AS win
        FROM pos p JOIN tok t
          ON t.doc_id = p.doc_id AND t.i BETWEEN p.p + 1 AND p.p + 8
        GROUP BY t.doc_id, p.p),
mk AS (SELECT doc_id, p, count(*) OVER (PARTITION BY win) AS c,
              row_number() OVER (PARTITION BY win
                                 ORDER BY doc_id, p) AS r
       FROM win),
cov AS (SELECT doc_id, p FROM mk WHERE c > 1 AND r > 1),
rem AS (SELECT DISTINCT t.doc_id, t.i FROM tok t
        JOIN cov c ON c.doc_id = t.doc_id
                  AND t.i BETWEEN c.p + 1 AND c.p + 8),
kept AS (SELECT t.doc_id, t.i, t.w FROM tok t
         LEFT JOIN rem r ON r.doc_id = t.doc_id AND r.i = t.i
         WHERE r.i IS NULL)
SELECT n.doc_id,
       coalesce(string_agg(k.w, ' ' ORDER BY k.i), '') AS text_dedup,
       n.n AS n_tokens,
       n.n - count(k.i) AS n_removed
FROM n LEFT JOIN kept k USING (doc_id)
GROUP BY n.doc_id, n.n""",
        "docs_segment_dedup": """
WITH tok AS (
  SELECT doc_id,
         unnest(string_split(
           regexp_replace(trim(text), '\\s+', ' ', 'g'), ' ')) AS w,
         generate_subscripts(string_split(
           regexp_replace(trim(text), '\\s+', ' ', 'g'), ' '), 1) AS i
  FROM documents WHERE length(trim(text)) > 0),
seg AS (
  SELECT doc_id, CAST(floor((i - 1) / 20) AS BIGINT) AS seg_idx,
         string_agg(w, ' ' ORDER BY i) AS seg
  FROM tok GROUP BY doc_id, seg_idx),
rn AS (
  SELECT doc_id, seg_idx, seg,
         row_number() OVER (PARTITION BY seg
                            ORDER BY doc_id, seg_idx) AS r
  FROM seg),
tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_segments
        FROM seg GROUP BY doc_id),
kept AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
                string_agg(seg, ' ' ORDER BY seg_idx) AS text_dedup
         FROM rn WHERE r = 1 GROUP BY doc_id)
SELECT t.doc_id, coalesce(k.text_dedup, '') AS text_dedup,
       t.n_segments, coalesce(k.n_kept, 0) AS n_kept
FROM tot t LEFT JOIN kept k USING (doc_id)""",
        "docs_lm_unigram": """
WITH tok AS (
  SELECT doc_id, unnest(string_split(
    regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS w
  FROM documents WHERE length(trim(text)) > 0),
cnt AS (SELECT w, CAST(count(*) AS DOUBLE) AS c FROM tok GROUP BY w),
tot AS (SELECT sum(c) AS s FROM cnt)
SELECT doc_id, round(avg(ln(c / s)), 6) AS lm_logprob
FROM tok JOIN cnt USING (w) CROSS JOIN tot
GROUP BY doc_id
ORDER BY lm_logprob ASC, doc_id ASC LIMIT 20""",
        "docs_lm_bigram": """
WITH tok AS (
  SELECT doc_id,
         unnest(string_split(
           regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS w,
         generate_subscripts(string_split(
           regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' '), 1) AS i
  FROM documents WHERE length(trim(text)) > 0),
pairs AS (
  SELECT a.doc_id, a.w AS w1, b.w AS w2
  FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.i = a.i + 1),
pc AS (SELECT w1, w2, CAST(count(*) AS DOUBLE) AS c FROM pairs GROUP BY 1, 2),
cc AS (SELECT w1, sum(c) AS s FROM pc GROUP BY 1)
SELECT doc_id, round(avg(ln(c / s)), 6) AS lm_logprob
FROM pairs JOIN pc USING (w1, w2) JOIN cc USING (w1)
GROUP BY doc_id
ORDER BY lm_logprob ASC, doc_id ASC LIMIT 20""",
        "docs_mixture_sample": """
WITH c AS (SELECT lang, count(*) AS cnt FROM documents
           WHERE lang IN ('en','de','es','fr') GROUP BY 1),
t AS (SELECT lang, cnt,
        CASE lang WHEN 'en' THEN CAST(0.4 AS DOUBLE)
                  WHEN 'de' THEN CAST(0.2 AS DOUBLE)
                  WHEN 'es' THEN CAST(0.2 AS DOUBLE)
                  WHEN 'fr' THEN CAST(0.2 AS DOUBLE) END AS share
      FROM c),
m AS (SELECT min(cnt / share) AS nprime FROM t),
f AS (SELECT lang, least(CAST(1.0 AS DOUBLE), share * nprime / cnt) AS keep
      FROM t, m)
SELECT d.doc_id, d.lang FROM documents d JOIN f ON d.lang = f.lang
WHERE ((d.doc_id % 1000000007) * 2654435761 + 42) % 1000000 <
      round(keep * 1000000)""",
        "events_sessionize": """
WITH e AS (SELECT user_id, event_id, ts, value, epoch_us(ts) AS us FROM events),
l AS (SELECT *, lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev
      FROM e),
f AS (SELECT *, CASE WHEN prev IS NULL OR us - prev > 86400000000
                     THEN 1 ELSE 0 END AS nf FROM l),
s AS (SELECT *, SUM(nf) OVER (PARTITION BY user_id ORDER BY us, event_id
                              ROWS UNBOUNDED PRECEDING) AS sid FROM f)
SELECT user_id, CAST(sid AS BIGINT) AS session_id,
       CAST(count(*) AS BIGINT) AS n_events,
       min(ts) AS session_start, max(ts) AS session_end,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
FROM s GROUP BY 1, 2""",
        "emb_near_dup": """
SELECT a.vec_id AS id_a, b.vec_id AS id_b
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.40""",
        # same pair set, closed transitively; survivors = component minima
        # plus singletons never appearing in a pair
        "emb_semantic_dedup": """
WITH RECURSIVE prs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.40),
e AS (SELECT id_a AS u, id_b AS v FROM prs
      UNION SELECT id_b, id_a FROM prs),
reach(u, v) AS (SELECT u, v FROM e
                UNION SELECT r.u, e2.v FROM reach r JOIN e e2
                      ON r.v = e2.u AND e2.v <> r.u),
cmp AS (SELECT u AS id, least(u, min(v)) AS comp FROM reach GROUP BY u)
SELECT vec_id, CAST(label AS INT) AS label FROM embeddings
WHERE vec_id NOT IN (SELECT id FROM cmp WHERE id <> comp)""",
        # degenerate-exact LSH config (num_bits=0: one bucket, full candidate
        # set) -> the banding/re-rank plumbing must reproduce brute force
        "emb_lsh_topk": """
WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 5),
s AS (SELECT qid, vec_id AS nid,
             list_cosine_similarity(qe, embedding) AS c
      FROM embeddings, q WHERE vec_id <> qid),
r AS (SELECT qid AS query_id, nid AS neighbor_id,
             row_number() OVER (PARTITION BY qid ORDER BY c DESC, nid ASC) AS rank
      FROM s)
SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank FROM r WHERE rank <= 10""",
        "emb_topk": """
WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 5),
s AS (SELECT qid, vec_id AS nid,
             list_cosine_similarity(qe, embedding) AS c
      FROM embeddings, q WHERE vec_id <> qid),
r AS (SELECT qid AS query_id, nid AS neighbor_id,
             row_number() OVER (PARTITION BY qid ORDER BY c DESC, nid ASC) AS rank
      FROM s)
SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank FROM r WHERE rank <= 10""",
        # exhaustive probe over the synced index == exact topk over the
        # FINAL corpus state (post-negation churn, post-deletes)
        "emb_ivf_index_topk": """
WITH corpus AS (
  SELECT vec_id,
         CASE WHEN vec_id % 7 = 1
              THEN list_transform(embedding, x -> -x)
              ELSE embedding END AS embedding
  FROM embeddings
  WHERE vec_id % 5 <> 0 AND vec_id % 11 <> 1),
q AS (SELECT vec_id AS qid, embedding AS qe FROM corpus WHERE vec_id < 5),
s AS (SELECT qid, vec_id AS nid,
             list_cosine_similarity(qe, embedding) AS c
      FROM corpus, q WHERE vec_id <> qid),
r AS (SELECT qid AS query_id, nid AS neighbor_id,
             row_number() OVER (PARTITION BY qid ORDER BY c DESC, nid ASC) AS rank
      FROM s)
SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank FROM r WHERE rank <= 10""",
        # nprobe == num_cells makes IVF exhaustive => identical to exact topk
        "emb_ivf_topk": """
WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 5),
s AS (SELECT qid, vec_id AS nid,
             list_cosine_similarity(qe, embedding) AS c
      FROM embeddings, q WHERE vec_id <> qid),
r AS (SELECT qid AS query_id, nid AS neighbor_id,
             row_number() OVER (PARTITION BY qid ORDER BY c DESC, nid ASC) AS rank
      FROM s)
SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank FROM r WHERE rank <= 10""",
        "docs_dsir_topk": """
WITH d AS (SELECT doc_id, lang,
             string_split_regex(lower(trim(text)), '\\s+') AS toks
           FROM documents WHERE length(trim(text)) > 0),
uni AS (SELECT doc_id, lang, unnest(toks) AS g FROM d),
bi AS (SELECT doc_id, lang, unnest(list_transform(
         range(1, greatest(len(toks) - 1, 0) + 1),
         i -> toks[i] || ' ' || toks[i + 1])) AS g FROM d),
grams AS (SELECT doc_id, lang,
                 ('0x' || substr(md5('42|' || g), 1, 15))::BIGINT % 4096 AS b
          FROM (SELECT * FROM uni UNION ALL SELECT * FROM bi)),
tc AS (SELECT b, CAST(count(*) AS DOUBLE) AS c FROM grams
       WHERE lang = 'en' GROUP BY b),
rc AS (SELECT b, CAST(count(*) AS DOUBLE) AS c FROM grams GROUP BY b),
tt AS (SELECT sum(c) + 4096.0 AS s FROM tc),
rt AS (SELECT sum(c) + 4096.0 AS s FROM rc),
lam AS (SELECT rc.b,
               ln((coalesce(tc.c, 0) + 1.0) / tt.s)
             - ln((rc.c + 1.0) / rt.s) AS l
        FROM rc LEFT JOIN tc USING (b) CROSS JOIN tt CROSS JOIN rt),
sc AS (SELECT doc_id, sum(l) AS w FROM grams JOIN lam USING (b)
       GROUP BY doc_id),
ids AS (SELECT DISTINCT doc_id FROM documents)
SELECT i.doc_id, round(coalesce(sc.w, 0.0), 6) AS dsir_logw
FROM ids i LEFT JOIN sc ON i.doc_id = sc.doc_id
ORDER BY dsir_logw DESC, i.doc_id LIMIT 50""",
        "docs_ccnet_buckets": """
WITH tok AS (
  SELECT doc_id, unnest(string_split(
    regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS w
  FROM documents WHERE length(trim(text)) > 0),
cnt AS (SELECT w, CAST(count(*) AS DOUBLE) AS c FROM tok GROUP BY w),
tot AS (SELECT sum(c) AS s FROM cnt),
sc AS (SELECT doc_id, round(avg(ln(c / s)), 6) AS lp
       FROM tok JOIN cnt USING (w) CROSS JOIN tot GROUP BY doc_id),
j AS (SELECT d.doc_id, d.lang, -sc.lp AS nll
      FROM documents d JOIN sc ON d.doc_id = sc.doc_id),
r AS (SELECT doc_id, lang, nll,
             row_number() OVER (PARTITION BY lang ORDER BY nll, doc_id) AS rn,
             count(*) OVER (PARTITION BY lang) AS n
      FROM j),
b AS (SELECT doc_id, lang,
             CASE WHEN rn <= ceil(n * 0.3333333333333333) THEN 'head'
                  WHEN rn <= ceil(n * 0.6666666666666666) THEN 'middle'
                  ELSE 'tail' END AS ppl_bucket
      FROM r)
SELECT lang, ppl_bucket, count(*) AS n_docs, min(doc_id) AS min_doc
FROM b GROUP BY lang, ppl_bucket ORDER BY lang, ppl_bucket""",
        "docs_url_curate": """
WITH d AS (
  SELECT doc_id, lang,
         'HTTPS://WWW.' || source || CAST(doc_id % 5 AS VARCHAR)
         || '.COM:443/p/' || CAST(doc_id % 13 AS VARCHAR)
         || '/?utm=x&id=' || CAST(doc_id AS VARCHAR) || '#frag' AS url
  FROM documents),
n1 AS (SELECT doc_id, lang, lower(trim(url)) AS u FROM d),
n2 AS (SELECT doc_id, lang,
              regexp_replace(u, '^[a-z][a-z0-9+.-]*://', '') AS u FROM n1),
n3 AS (SELECT doc_id, lang, regexp_replace(u, '^www\\.', '') AS u FROM n2),
n4 AS (SELECT doc_id, lang, regexp_replace(u, '[?#].*$', '') AS u FROM n3),
n5 AS (SELECT doc_id, lang, regexp_replace(u, '/+$', '') AS u FROM n4),
h AS (SELECT doc_id, lang, u,
             regexp_replace(regexp_extract(u, '^([^/]+)', 1),
                            ':[0-9]+$', '') AS host FROM n5),
dm AS (SELECT doc_id, lang,
              host || regexp_replace(u, '^[^/]*', '') AS url_norm,
              regexp_extract(host, '([^.]+\\.[^.]+)$', 1) AS domain FROM h),
f AS (SELECT * FROM dm WHERE domain NOT IN ('src00.com', 'src31.com')),
r AS (SELECT *, row_number() OVER (PARTITION BY url_norm
                                   ORDER BY doc_id) AS rn FROM f)
SELECT doc_id, url_norm, domain, lang FROM r WHERE rn = 1 ORDER BY doc_id""",
        "docs_char_entropy": """
WITH ch AS (SELECT doc_id, unnest(string_split(text, '')) AS c
            FROM documents WHERE length(text) > 0),
cc AS (SELECT doc_id, c, CAST(count(*) AS DOUBLE) AS k
       FROM ch GROUP BY doc_id, c),
n AS (SELECT doc_id, sum(k) AS n FROM cc GROUP BY doc_id),
e AS (SELECT cc.doc_id, round(-sum((k / n.n) * ln(k / n.n)), 6) AS ent
      FROM cc JOIN n ON cc.doc_id = n.doc_id GROUP BY cc.doc_id)
SELECT d.doc_id, coalesce(e.ent, 0.0) AS char_entropy
FROM documents d LEFT JOIN e ON d.doc_id = e.doc_id
ORDER BY d.doc_id LIMIT 300""",
        "docs_weighted_sample": """
WITH keyed AS (
  SELECT doc_id, lang, n_chars,
         ln((((doc_id % 1000000007) * 2654435761 + 42) % 1000000 + 0.5)
            / 1000000.0) / n_chars AS k
  FROM documents WHERE n_chars > 0),
top AS (SELECT * FROM keyed ORDER BY k DESC, doc_id ASC LIMIT 60)
SELECT doc_id, lang, n_chars FROM top ORDER BY doc_id""",
        "docs_temperature_sample": """
WITH c AS (SELECT lang, count(*) AS cnt FROM documents GROUP BY 1),
n AS (SELECT CAST(sum(cnt) AS DOUBLE) AS total FROM c),
r AS (SELECT lang, cnt, pow(cnt / n.total, 0.5) AS raised FROM c, n),
z AS (SELECT sum(raised) AS z FROM r),
t AS (SELECT lang, cnt, raised / z.z AS share FROM r, z),
m AS (SELECT min(cnt / share) AS nprime FROM t),
f AS (SELECT lang, least(CAST(1.0 AS DOUBLE), share * nprime / cnt) AS keep
      FROM t, m),
k AS (SELECT d.doc_id, d.lang FROM documents d JOIN f USING (lang)
      WHERE ((d.doc_id % 1000000007) * 2654435761 + 42) % 1000000 <
            round(keep * 1000000))
SELECT lang, count(*) AS n_docs, min(doc_id) AS min_doc,
       max(doc_id) AS max_doc
FROM k GROUP BY lang ORDER BY lang""",
    }
    out["docs_boilerplate"] = """
WITH tok AS (
  SELECT doc_id,
         unnest(string_split_regex(trim(text), '\\s+')) AS w,
         generate_subscripts(string_split_regex(trim(text), '\\s+'), 1) AS i
  FROM documents WHERE length(trim(text)) > 0),
seg AS (
  SELECT doc_id, CAST(floor((i - 1) / 20) AS BIGINT) AS seg_idx,
         string_agg(w, ' ' ORDER BY i) AS seg
  FROM tok GROUP BY doc_id, seg_idx),
boiler AS (SELECT seg FROM seg GROUP BY seg
           HAVING count(DISTINCT doc_id) >= 2),
kept AS (SELECT s.doc_id, s.seg_idx, s.seg FROM seg s
         WHERE NOT EXISTS (SELECT 1 FROM boiler b WHERE b.seg = s.seg)),
tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_segments
        FROM seg GROUP BY doc_id),
agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
               string_agg(seg, ' ' ORDER BY seg_idx) AS text_filtered
        FROM kept GROUP BY doc_id)
SELECT d.doc_id, coalesce(a.text_filtered, '') AS text_filtered,
       CAST(coalesce(t.n_segments, 0) AS BIGINT) AS n_segments,
       CAST(coalesce(a.n_kept, 0) AS BIGINT) AS n_kept
FROM documents d LEFT JOIN tot t USING (doc_id)
LEFT JOIN agg a USING (doc_id)"""
    out["docs_gopher_quality"] = """
WITH t AS (SELECT doc_id, text AS tx,
                  CASE WHEN length(trim(text)) = 0
                       THEN CAST([] AS VARCHAR[])
                       ELSE string_split_regex(trim(text), '\\s+')
                  END AS toks
           FROM documents),
m AS (SELECT doc_id,
        CAST(len(toks) AS BIGINT) AS n_words,
        greatest(len(toks), 1) AS nw,
        length(regexp_replace(tx, '\\s', '', 'g')) AS n_chars,
        length(tx) - length(replace(tx, '#', '')) AS n_hash,
        CAST((length(tx) - length(replace(tx, '...', ''))) / 3 AS BIGINT)
          AS n_ell,
        len(list_filter(toks, w -> regexp_matches(w, '[A-Za-z]')))
          AS n_alpha,
        CAST(len(list_intersect(list_distinct(toks),
             ['the','be','to','of','and','that','have','with']))
             AS BIGINT) AS stop_hits,
        list_filter(string_split(tx, chr(10)),
                    s -> length(trim(s)) > 0) AS lines
      FROM t),
m2 AS (SELECT *, greatest(len(lines), 1) AS n_lines,
         len(list_filter(lines,
             s -> regexp_matches(trim(s), '^[-*\u2022]'))) AS n_bullet,
         len(list_filter(lines, s -> ends_with(trim(s), '...')))
           AS n_ell_end
       FROM m)
SELECT doc_id, n_words,
       round(n_chars / CAST(nw AS DOUBLE), 6) AS mean_word_len,
       round((n_hash + n_ell) / CAST(nw AS DOUBLE), 6) AS symbol_ratio,
       round(n_alpha / CAST(nw AS DOUBLE), 6) AS alpha_word_frac,
       stop_hits,
       (n_words >= 40 AND n_words <= 100000
        AND n_chars / CAST(nw AS DOUBLE) >= 4.2
        AND n_chars / CAST(nw AS DOUBLE) <= 10.0
        AND (n_hash + n_ell) / CAST(nw AS DOUBLE) <= 0.1
        AND n_alpha / CAST(nw AS DOUBLE) >= 0.8
        AND stop_hits >= 1
        AND n_bullet / CAST(n_lines AS DOUBLE) <= 0.9
        AND n_ell_end / CAST(n_lines AS DOUBLE) <= 0.3) AS pass_gopher
FROM m2"""
    out["events_rfm"] = """
WITH pu AS (SELECT user_id AS "user",
                   max(CAST(ts AS DATE)) AS last_d,
                   CAST(count(*) AS BIGINT) AS frequency,
                   sum(CAST(value AS DECIMAL(18,2))) AS mon
            FROM events GROUP BY 1),
r AS (SELECT max(CAST(ts AS DATE)) AS ref FROM events),
b AS (SELECT "user",
             CAST(date_diff('day', last_d, ref) AS BIGINT) AS recency_days,
             frequency, CAST(mon AS DOUBLE) AS monetary
      FROM pu CROSS JOIN r)
SELECT "user", recency_days, frequency, monetary,
       CAST(ntile(5) OVER (ORDER BY recency_days, "user") AS INT) AS r_tile,
       CAST(ntile(5) OVER (ORDER BY frequency DESC, "user") AS INT)
         AS f_tile,
       CAST(ntile(5) OVER (ORDER BY monetary DESC, "user") AS INT)
         AS m_tile,
       CAST(ntile(5) OVER (ORDER BY recency_days, "user") AS VARCHAR)
       || CAST(ntile(5) OVER (ORDER BY frequency DESC, "user") AS VARCHAR)
       || CAST(ntile(5) OVER (ORDER BY monetary DESC, "user") AS VARCHAR)
         AS segment
FROM b"""
    # approx mode: the tile engine is the fixed-width histogram sketch —
    # integer cells, then a fixed IEEE double expression tree for the
    # boundary interpolation (width = (hi-lo)/64, target = q*n,
    # est = lo + (bin + (target-cum_before)/cnt)*width) that mirrors
    # _histogram_tile_edges op for op, so the replay is bit-for-bit
    out["events_rfm_approx"] = """
WITH pu AS (SELECT user_id AS "user",
                   max(CAST(ts AS DATE)) AS last_d,
                   CAST(count(*) AS BIGINT) AS frequency,
                   sum(CAST(value AS DECIMAL(18,2))) AS mon
            FROM events GROUP BY 1),
r AS (SELECT max(CAST(ts AS DATE)) AS ref FROM events),
b AS (SELECT "user",
             CAST(date_diff('day', last_d, ref) AS BIGINT) AS recency_days,
             frequency, CAST(mon AS DOUBLE) AS monetary
      FROM pu CROSS JOIN r),
vals AS (SELECT 'r' AS m, CAST(recency_days AS DOUBLE) AS v FROM b
         UNION ALL SELECT 'f', CAST(frequency AS DOUBLE) FROM b
         UNION ALL SELECT 'm', monetary FROM b),
mdef AS (SELECT m, min(v) AS lo,
                CASE WHEN max(v) > min(v) THEN max(v) ELSE min(v) + 1 END
                  AS hi
         FROM vals GROUP BY m),
cells AS (SELECT v.m,
                 greatest(0, least(63, CAST(floor(
                   (v.v - d.lo) / ((d.hi - d.lo) / 64)) AS INT))) AS bin,
                 CAST(count(*) AS BIGINT) AS cnt
          FROM vals v JOIN mdef d USING (m)
          WHERE v.v IS NOT NULL GROUP BY 1, 2),
cum AS (SELECT m, bin, cnt,
               sum(cnt) OVER (PARTITION BY m ORDER BY bin) AS cum,
               sum(cnt) OVER (PARTITION BY m) AS n
        FROM cells),
qq AS (SELECT CAST(k AS DOUBLE) / CAST(5 AS DOUBLE) AS q
       FROM range(1, 5) t(k)),
probe AS (SELECT c.m, q.q, c.bin, c.cnt, c.cum,
                 q.q * CAST(c.n AS DOUBLE) AS target
          FROM cum c CROSS JOIN qq q
          WHERE CAST(c.cum AS DOUBLE) >= q.q * CAST(c.n AS DOUBLE)),
fst AS (SELECT m, q, min(bin) AS bin FROM probe GROUP BY 1, 2),
edges AS (SELECT p.m, p.q,
                 d.lo + (CAST(p.bin AS DOUBLE)
                         + (p.target - CAST(p.cum - p.cnt AS DOUBLE))
                           / CAST(p.cnt AS DOUBLE))
                        * ((d.hi - d.lo) / 64) AS est
          FROM fst f JOIN probe p USING (m, q, bin)
          JOIN mdef d ON d.m = p.m)
SELECT b."user", b.recency_days, b.frequency, b.monetary,
       CAST(1 + (SELECT count(*) FROM edges e WHERE e.m = 'r'
                 AND CAST(b.recency_days AS DOUBLE) > e.est) AS INT)
         AS r_tile,
       CAST(5 - (SELECT count(*) FROM edges e WHERE e.m = 'f'
                 AND CAST(b.frequency AS DOUBLE) > e.est) AS INT)
         AS f_tile,
       CAST(5 - (SELECT count(*) FROM edges e WHERE e.m = 'm'
                 AND b.monetary > e.est) AS INT) AS m_tile,
       CAST(1 + (SELECT count(*) FROM edges e WHERE e.m = 'r'
                 AND CAST(b.recency_days AS DOUBLE) > e.est) AS VARCHAR)
       || CAST(5 - (SELECT count(*) FROM edges e WHERE e.m = 'f'
                    AND CAST(b.frequency AS DOUBLE) > e.est) AS VARCHAR)
       || CAST(5 - (SELECT count(*) FROM edges e WHERE e.m = 'm'
                    AND b.monetary > e.est) AS VARCHAR) AS segment
FROM b"""
    out["events_anomaly"] = """
WITH dd AS (SELECT user_id AS "user", CAST(ts AS DATE) AS "day",
                   CAST(count(*) AS BIGINT) AS c
            FROM events GROUP BY 1, 2),
s AS (SELECT "user", CAST(count(*) AS BIGINT) AS n_days,
             sum(c) AS s1, sum(c * c) AS s2
      FROM dd GROUP BY 1)
SELECT d."user", d."day", d.c, s.n_days,
       round((s.n_days * d.c - s.s1)
             / sqrt(s.n_days * s.s2 - s.s1 * s.s1), 6) AS zscore
FROM dd d JOIN s USING ("user")
WHERE s.n_days >= 3 AND (s.n_days * d.c - s.s1) > 0
  AND (s.n_days * s.s2 - s.s1 * s.s1) > 0
  AND CAST(s.n_days * d.c - s.s1 AS DOUBLE)
      * CAST(s.n_days * d.c - s.s1 AS DOUBLE)
      > 6.25 * CAST(s.n_days * s.s2 - s.s1 * s.s1 AS DOUBLE)"""
    out["orders_basket_pairs"] = """
WITH it AS (SELECT DISTINCT l_orderkey AS o,
                   CAST(l_partkey % 50 AS BIGINT) AS i FROM lineitem),
ca AS (SELECT a.i AS item_a, b.i AS item_b,
              CAST(count(*) AS BIGINT) AS n_orders
       FROM it a JOIN it b ON a.o = b.o AND a.i < b.i GROUP BY 1, 2),
ci AS (SELECT i, CAST(count(*) AS BIGINT) AS n_i FROM it GROUP BY 1),
nt AS (SELECT CAST(count(DISTINCT o) AS BIGINT) AS n_baskets FROM it)
SELECT item_a, item_b, n_orders,
       round((CAST(n_orders AS DOUBLE) * n_baskets)
             / (CAST(x.n_i AS DOUBLE) * y.n_i), 6) AS lift
FROM ca JOIN ci x ON ca.item_a = x.i JOIN ci y ON ca.item_b = y.i
CROSS JOIN nt
ORDER BY n_orders DESC, item_a, item_b LIMIT 25"""
    out["events_ab_test"] = """
WITH ev AS (
  -- pmod, not signed %, at both reduction steps (matches ab_test_stats)
  SELECT ((((user_id % 1000000007) + 1000000007) % 1000000007)
          * 2654435761 + 42) % 2 AS variant,
         user_id AS u,
         CAST(json_extract(props, '$.k') AS BIGINT) AS m,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS conv
  FROM events),
arms AS (
  SELECT variant,
         CAST(count(DISTINCT u) AS BIGINT) AS n_users,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(sum(conv) AS BIGINT) AS n_conversions,
         CAST(coalesce(sum(CASE WHEN conv = 1 THEN m END), 0) AS BIGINT)
           AS metric_sum,
         CAST(coalesce(sum(CASE WHEN conv = 1 THEN m * m END), 0)
              AS BIGINT) AS q,
         CAST(sum(conv) AS BIGINT) AS nm
  FROM ev GROUP BY 1),
pre AS (
  SELECT CAST(a.metric_sum * b.nm - b.metric_sum * a.nm AS DOUBLE) AS dmean,
         CAST((a.nm * a.q - a.metric_sum * a.metric_sum) * b.nm
              + (b.nm * b.q - b.metric_sum * b.metric_sum) * a.nm
              AS DOUBLE) AS ssw,
         a.nm + b.nm AS ntot, a.nm + b.nm - 2 AS dof
  FROM (SELECT * FROM arms WHERE variant = 0) a
  CROSS JOIN (SELECT * FROM arms WHERE variant = 1) b),
t AS (
  SELECT CASE WHEN ssw > 0
              THEN round(dmean / sqrt(ssw * ntot / dof), 6) END AS t_stat,
         CASE WHEN ssw > 0
              THEN dmean * dmean * dof > 3.8415999999999997 * ssw * ntot
              ELSE dmean <> 0 END AS significant
  FROM pre)
SELECT arms.variant, arms.n_users, arms.n_events, arms.n_conversions,
       arms.metric_sum,
       CASE WHEN arms.nm > 0
            THEN round(arms.metric_sum / CAST(arms.nm AS DOUBLE), 6)
       END AS metric_mean,
       t.t_stat, t.significant
FROM arms CROSS JOIN t"""
    out["events_stickiness"] = """
WITH dau AS (
  SELECT strftime(ts, '%Y-%m') AS month, CAST(ts AS DATE) AS d,
         count(DISTINCT user_id) AS dau
  FROM events GROUP BY 1, 2),
daily AS (
  SELECT month, CAST(count(*) AS BIGINT) AS n_days,
         CAST(sum(dau) AS BIGINT) AS dau_sum
  FROM dau GROUP BY 1),
mau AS (SELECT strftime(ts, '%Y-%m') AS month,
               CAST(count(DISTINCT user_id) AS BIGINT) AS mau
        FROM events GROUP BY 1)
SELECT month, n_days, dau_sum, mau,
       round(dau_sum / CAST(n_days * mau AS DOUBLE), 6) AS stickiness
FROM daily JOIN mau USING (month)"""
    out["docs_readability"] = """
WITH t AS (SELECT doc_id, text AS tx,
                  CASE WHEN length(trim(text)) = 0
                       THEN CAST([] AS VARCHAR[])
                       ELSE string_split_regex(trim(text), '\\s+')
                  END AS toks
           FROM documents),
m AS (SELECT doc_id,
        CAST(len(toks) AS BIGINT) AS n_words,
        greatest(len(toks), 1) AS nw,
        greatest(len(regexp_extract_all(tx, '[.!?]+')), 1) AS n_sent,
        len(regexp_extract_all(lower(tx), '[aeiouy]+'))
          + len(list_filter(toks,
                w -> NOT regexp_matches(lower(w), '[aeiouy]'))) AS vg
      FROM t)
SELECT doc_id, n_words, CAST(n_sent AS BIGINT) AS n_sentences,
       CAST(greatest(vg, 1) AS BIGINT) AS n_syllables,
       round(206.835 - 1.015 * (n_words / CAST(n_sent AS DOUBLE))
             - 84.6 * (greatest(vg, 1) / CAST(nw AS DOUBLE)), 6) AS flesch
FROM m"""
    out["events_identity"] = """
WITH RECURSIVE raw AS (
  SELECT user_id AS u,
         CAST(json_extract(props, '$.k') AS BIGINT) + 1099511627776 AS d
  FROM events),
edges AS (SELECT u, d FROM raw GROUP BY u, d HAVING count(*) >= 4),
e AS (SELECT u, d AS v FROM edges UNION SELECT d, u FROM edges),
reach(u, v) AS (SELECT u, v FROM e
                UNION SELECT r.u, e2.v FROM reach r JOIN e e2
                      ON r.v = e2.u AND e2.v <> r.u),
cmp AS (SELECT u AS id, least(u, min(v)) AS comp FROM reach GROUP BY u),
sizes AS (SELECT comp,
                 CAST(sum(CASE WHEN id < 1099511627776 THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_users,
                 CAST(sum(CASE WHEN id >= 1099511627776 THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_devices
          FROM cmp GROUP BY comp)
SELECT c.id AS "user", c.comp AS identity_id, s.n_users, s.n_devices
FROM cmp c JOIN sizes s USING (comp) WHERE c.id < 1099511627776"""
    out["orders_basket_rules"] = """
WITH it AS (SELECT DISTINCT l_orderkey AS o,
                   CAST(l_partkey % 50 AS BIGINT) AS i FROM lineitem),
ca AS (SELECT a.i AS item_a, b.i AS item_b,
              CAST(count(*) AS BIGINT) AS n_both
       FROM it a JOIN it b ON a.o = b.o AND a.i < b.i GROUP BY 1, 2),
dr AS (SELECT item_a AS antecedent, item_b AS consequent, n_both FROM ca
       UNION ALL
       SELECT item_b, item_a, n_both FROM ca),
ci AS (SELECT i, CAST(count(*) AS BIGINT) AS n_i FROM it GROUP BY 1),
nt AS (SELECT CAST(count(DISTINCT o) AS BIGINT) AS n_baskets FROM it)
SELECT antecedent, consequent, n_both,
       round(n_both / CAST(x.n_i AS DOUBLE), 6) AS confidence,
       round((CAST(n_both AS DOUBLE) * n_baskets)
             / (CAST(x.n_i AS DOUBLE) * y.n_i), 6) AS lift
FROM dr JOIN ci x ON dr.antecedent = x.i JOIN ci y ON dr.consequent = y.i
CROSS JOIN nt
ORDER BY n_both DESC, antecedent, consequent LIMIT 25"""
    out["orders_item_triangles"] = """
WITH it AS (SELECT DISTINCT l_orderkey AS o,
                   CAST(l_partkey % 50 AS BIGINT) AS i FROM lineitem),
e AS (SELECT a.i AS x, b.i AS y FROM it a JOIN it b
      ON a.o = b.o AND a.i < b.i
      GROUP BY 1, 2 HAVING count(*) >= 100),
tr AS (SELECT e1.x AS a, e1.y AS b, e2.y AS c
       FROM e e1 JOIN e e2 ON e1.y = e2.x
       JOIN e e3 ON e3.x = e1.x AND e3.y = e2.y),
n AS (SELECT unnest([a, b, c]) AS id FROM tr)
SELECT id, CAST(count(*) AS BIGINT) AS n_triangles FROM n GROUP BY 1"""
    out["orders_correlation"] = """
WITH s AS (SELECT CAST(count(*) AS BIGINT) AS n,
  sum(CAST(l_quantity AS DECIMAL(19,4))) AS s_q,
  sum(CAST(l_quantity AS DECIMAL(19,4))
      * CAST(l_quantity AS DECIMAL(19,4))) AS q_q,
  sum(CAST(l_extendedprice AS DECIMAL(19,4))) AS s_e,
  sum(CAST(l_extendedprice AS DECIMAL(19,4))
      * CAST(l_extendedprice AS DECIMAL(19,4))) AS q_e,
  sum(CAST(l_discount AS DECIMAL(19,4))) AS s_d,
  sum(CAST(l_discount AS DECIMAL(19,4))
      * CAST(l_discount AS DECIMAL(19,4))) AS q_d,
  sum(CAST(l_quantity AS DECIMAL(19,4))
      * CAST(l_extendedprice AS DECIMAL(19,4))) AS p_qe,
  sum(CAST(l_quantity AS DECIMAL(19,4))
      * CAST(l_discount AS DECIMAL(19,4))) AS p_qd,
  sum(CAST(l_extendedprice AS DECIMAL(19,4))
      * CAST(l_discount AS DECIMAL(19,4))) AS p_ed
  FROM lineitem
  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
    AND l_discount IS NOT NULL),
pr AS (
  SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b, n,
         CAST(s_q AS DOUBLE) AS sx, CAST(q_q AS DOUBLE) AS qx,
         CAST(s_e AS DOUBLE) AS sy, CAST(q_e AS DOUBLE) AS qy,
         CAST(p_qe AS DOUBLE) AS sxy FROM s
  UNION ALL
  SELECT 'l_quantity', 'l_discount', n,
         CAST(s_q AS DOUBLE), CAST(q_q AS DOUBLE),
         CAST(s_d AS DOUBLE), CAST(q_d AS DOUBLE),
         CAST(p_qd AS DOUBLE) FROM s
  UNION ALL
  SELECT 'l_extendedprice', 'l_discount', n,
         CAST(s_e AS DOUBLE), CAST(q_e AS DOUBLE),
         CAST(s_d AS DOUBLE), CAST(q_d AS DOUBLE),
         CAST(p_ed AS DOUBLE) FROM s)
SELECT col_a, col_b, n,
       CASE WHEN (n * qx - sx * sx) > 0 AND (n * qy - sy * sy) > 0
            THEN round((n * sxy - sx * sy)
                       / sqrt((n * qx - sx * sx) * (n * qy - sy * sy)), 6)
       END AS r
FROM pr"""
    out["events_forecast_baseline"] = """
WITH d AS (SELECT event_type, CAST(ts AS DATE) AS dt,
                  CAST(count(*) AS BIGINT) AS c
           FROM events GROUP BY 1, 2),
j AS (SELECT a.event_type, abs(a.c - b.c) AS ae, a.c AS actual
      FROM d a JOIN d b ON a.event_type = b.event_type
                       AND b.dt = a.dt - 7)
SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
       round(sum(ae) / CAST(count(*) AS DOUBLE), 6) AS mae,
       round(sum(ae) / CAST(sum(actual) AS DOUBLE), 6) AS wape
FROM j GROUP BY 1"""
    out["join_rollup_incremental"] = f"""
WITH {LI_CTES},
o_cur AS (SELECT o_orderkey,
            CASE WHEN o_orderkey % 7 = 0 THEN '9-RECLASS'
                 ELSE o_orderpriority END AS o_orderpriority
          FROM orders),
o_final AS (SELECT * FROM o_cur WHERE o_orderkey % 50 <> 0)
SELECT o.o_orderpriority,
       round(sum(CAST(f.l_quantity AS DOUBLE)), 2) AS sum_qty,
       round(sum(CAST(f.l_extendedprice AS DOUBLE)), 2) AS sum_price,
       CAST(count(*) AS BIGINT) AS n_rows
FROM final f JOIN o_final o ON f.l_orderkey = o.o_orderkey
GROUP BY 1"""
    # exhaustive-probe IVF-PQ must equal plain PQ exactly: same oracle
    out["emb_ivfpq_topk"] = out["emb_pq_topk"]
    # the prefix-filtered gate must check against the IDENTICAL oracle —
    # structural aliasing, not a second copy of the SQL text
    out["docs_containment_prefix"] = out["docs_containment"]
    out["format_hudi_snapshot"] = out["cow_snapshot"]
    out["format_hudi_mor_snapshot"] = out["mor_snapshot"]
    # the format reader's incremental / time-travel query types must equal
    # the library paths bit-for-bit: identical oracles, aliased structurally
    out["format_hudi_incremental"] = out["cow_incremental"]
    out["format_hudi_time_travel"] = out["cow_time_travel"]
    out["format_hudi_read_optimized"] = out["mor_read_optimized"]
    out["format_hudi_mor_incremental"] = out["mor_incremental"]
    # the format WRITE path must be lossless: reading back what
    # df.write.format('hudi') wrote equals the plain aggregate over the
    # raw source rows — insert_packing's oracle, aliased structurally
    out["format_hudi_write_insert"] = out["insert_packing"]
    # the LSH-candidates-first composition must also equal brute on this
    # corpus (every qualifying pair here is a near-identical duplicate,
    # jaccard >= ~0.95, so band recall is total — the caveat where the
    # paths diverge is documented on the operator)
    out["docs_containment_lsh"] = out["docs_containment"]
    return out
