"""COW kernel: create / bulk_insert / upsert / delete / snapshot / incremental /
time-travel. Mirrors TestCOWDataSource.scala scenarios (SURVEY.md §5)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from hudi_0_12_0_my_spark import Engine


def make_rows(spark, rows):
    return spark.createDataFrame(
        [Row(id=i, name=n, price=float(p), ts=t, dt=d) for i, n, p, t, d in rows],
        "id int, name string, price double, ts long, dt string")


@pytest.fixture()
def table(spark, tmp_table_dir):
    eng = Engine(spark)
    return eng.create_table(tmp_table_dir, name="h0_p",
                            record_key_fields=["id"], precombine_field="ts",
                            partition_field="dt", table_type="cow")


BATCH1 = [(1, "a", 10.0, 100, "2021-01-01"),
          (2, "b", 20.0, 100, "2021-01-01"),
          (3, "c", 30.0, 100, "2021-01-02"),
          (4, "d", 40.0, 100, "2021-01-02")]


def test_bulk_insert_snapshot(spark, table):
    table.bulk_insert(make_rows(spark, BATCH1))
    got = {(r.id, r.name, r.price) for r in table.snapshot().collect()}
    assert got == {(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, "d", 40.0)}
    assert sorted(table.partitions()) == ["2021-01-01", "2021-01-02"]


def test_upsert_updates_and_inserts(spark, table):
    table.bulk_insert(make_rows(spark, BATCH1))
    c2 = table.upsert(make_rows(spark, [
        (2, "b2", 21.0, 200, "2021-01-01"),        # update
        (5, "e", 50.0, 200, "2021-01-03"),         # insert new partition
    ]))
    snap = {r.id: (r.name, r.price) for r in table.snapshot().collect()}
    assert snap == {1: ("a", 10.0), 2: ("b2", 21.0), 3: ("c", 30.0),
                    4: ("d", 40.0), 5: ("e", 50.0)}
    # incremental pull of just c2 returns exactly the changed rows
    inc = {r.id for r in table.incremental(begin="0", end=c2).collect()}
    assert inc == {1, 2, 3, 4, 5}
    c1 = table.commits()[0]["instant"]
    inc2 = {r.id for r in table.incremental(begin=c1, end=c2).collect()}
    assert inc2 == {2, 5}


def test_precombine_within_batch(spark, table):
    table.bulk_insert(make_rows(spark, BATCH1))
    # two versions of id=1 in one batch: higher ts wins
    table.upsert(make_rows(spark, [
        (1, "low", 11.0, 150, "2021-01-01"),
        (1, "high", 12.0, 300, "2021-01-01"),
    ]))
    row = table.snapshot().filter("id = 1").collect()[0]
    assert (row.name, row.price) == ("high", 12.0)


def test_delete(spark, table):
    table.bulk_insert(make_rows(spark, BATCH1))
    table.delete(where="id in (2, 3)")
    assert {r.id for r in table.snapshot().collect()} == {1, 4}


def test_time_travel(spark, table):
    c1 = table.bulk_insert(make_rows(spark, BATCH1))
    table.upsert(make_rows(spark, [(2, "b2", 21.0, 200, "2021-01-01")]))
    old = {r.id: r.name for r in table.time_travel(as_of=c1).collect()}
    assert old[2] == "b"
    new = {r.id: r.name for r in table.snapshot().collect()}
    assert new[2] == "b2"


def test_insert_overwrite_partition(spark, table):
    table.bulk_insert(make_rows(spark, BATCH1))
    table.insert_overwrite(make_rows(spark, [(9, "z", 90.0, 300, "2021-01-01")]))
    got = {(r.id, r.name) for r in table.snapshot().collect()}
    assert got == {(9, "z"), (3, "c"), (4, "d")}


def test_insert_overwrite_table(spark, table):
    table.bulk_insert(make_rows(spark, BATCH1))
    table.insert_overwrite_table(make_rows(spark, [(9, "z", 90.0, 300, "2021-01-05")]))
    got = {(r.id, r.name) for r in table.snapshot().collect()}
    assert got == {(9, "z")}


def test_delete_partition(spark, table):
    table.bulk_insert(make_rows(spark, BATCH1))
    table.delete_partition(["2021-01-01"])
    got = {r.id for r in table.snapshot().collect()}
    assert got == {3, 4}
    assert table.partitions() == ["2021-01-02"]


def test_custom_keygen_two_level_partition(spark, tmp_table_dir):
    """CustomAvroKeyGenerator 'f1:simple,f2:timestamp' -> nested 'v1/2021-01'
    partition paths (CustomAvroKeyGenerator.java:63-92)."""
    eng = Engine(spark)
    t = eng.create_table(tmp_table_dir, record_key_fields=["id"],
                         precombine_field="ts", keygen="custom",
                         partition_field="dt:simple,ts:timestamp",
                         keygen_timestamp_unit="epochsec",
                         keygen_output_format="yyyy-MM")
    rows = make_rows(spark, [(1, "a", 1.0, 1609459200, "x"),    # 2021-01
                             (2, "b", 2.0, 1612137600, "x"),    # 2021-02
                             (3, "c", 3.0, 1609459200, "y")])
    t.bulk_insert(rows)
    assert sorted(t.partitions()) == ["x/2021-01", "x/2021-02", "y/2021-01"]
    t.upsert(make_rows(spark, [(1, "a2", 9.0, 1609459200, "x")]))
    snap = {r.id: r.name for r in t.snapshot().collect()}
    assert snap == {1: "a2", 2: "b", 3: "c"}
    t.delete_partition(["x/2021-02"])
    assert {r.id for r in t.snapshot().collect()} == {1, 3}


def test_date_string_and_mixed_timestamp_keygen(spark, tmp_path):
    """TimestampBased DATE_STRING (explicit input format) and MIXED (string
    dates + epoch millis in one column) input types
    (TimestampBasedAvroKeyGenerator.java:88-123)."""
    eng = Engine(spark)
    t = eng.create_table(str(tmp_path / "ds"), record_key_fields=["id"],
                         precombine_field="id", keygen="timestamp",
                         partition_field="d",
                         keygen_timestamp_unit="date_string",
                         keygen_input_format="dd/MM/yyyy",
                         keygen_output_format="yyyy-MM")
    t.bulk_insert(spark.createDataFrame([(1, "15/01/2021"), (2, "02/03/2021")],
                                        "id long, d string"))
    assert sorted(t.partitions()) == ["2021-01", "2021-03"]

    t2 = eng.create_table(str(tmp_path / "mx"), record_key_fields=["id"],
                          precombine_field="id", keygen="timestamp",
                          partition_field="d",
                          keygen_timestamp_unit="mixed",
                          keygen_input_format="yyyy-MM-dd",
                          keygen_output_format="yyyy-MM")
    t2.bulk_insert(spark.createDataFrame(
        [(1, "2021-01-15"), (2, "1612137600000")],   # date string + epoch ms
        "id long, d string"))
    assert sorted(t2.partitions()) == ["2021-01", "2021-02"]


def test_uuid_keygen_inserts(spark, tmp_path):
    """UuidKeyGenerator: random record keys, insert-only tables."""
    eng = Engine(spark)
    t = eng.create_table(str(tmp_path / "u"), record_key_fields=["id"],
                         precombine_field="id", keygen="uuid")
    df = spark.createDataFrame([(1, "a"), (1, "b")], "id long, v string")
    t.insert(df)
    snap = t.reader.snapshot(keep_meta=True)
    keys = [r["_hoodie_record_key"] for r in snap.collect()]
    assert len(keys) == 2 and len(set(keys)) == 2   # both rows kept, distinct keys
    assert all(len(k) == 36 for k in keys)          # uuid format


def test_debezium_mysql_ordering(spark, tmp_path):
    """MySQL Debezium: late-arriving older binlog events (file+pos seq) must
    not clobber newer stored state (MySqlDebeziumAvroPayload.java)."""
    from hudi_0_12_0_my_spark.payloads import debezium_transform
    eng = Engine(spark)
    t = eng.create_table(str(tmp_path / "dbz"), record_key_fields=["id"],
                         precombine_field="_event_seq", payload="event_time")

    def ev(rows):
        return debezium_transform(spark.createDataFrame(
            rows, "id long, v string, _event_bin_file string, "
                  "_event_pos long, _change_operation_type string"))

    t.upsert(ev([(1, "a", "mysql-bin.000001", 10, "r"),
                 (2, "b", "mysql-bin.000001", 11, "r")]))
    t.upsert(ev([(1, "new", "mysql-bin.000003", 5, "u")]))   # newer, applied first
    t.upsert(ev([(1, "old", "mysql-bin.000002", 9, "u")]))   # older, arrives late
    snap = {r.id: r.v for r in t.snapshot().collect()}
    assert snap == {1: "new", 2: "b"}
    t.upsert(ev([(2, "b", "mysql-bin.000004", 1, "d")]))     # delete event
    assert {r.id for r in t.snapshot().collect()} == {1}


def test_debezium_postgres_lsn(spark, tmp_path):
    """Postgres Debezium orders by LSN (PostgresDebeziumAvroPayload.java)."""
    from hudi_0_12_0_my_spark.payloads import debezium_transform
    eng = Engine(spark)
    t = eng.create_table(str(tmp_path / "dbzp"), record_key_fields=["id"],
                         precombine_field="_event_lsn", payload="event_time")

    def ev(rows):
        return debezium_transform(spark.createDataFrame(
            rows, "id long, v string, _event_lsn long, "
                  "_change_operation_type string"), source="postgres")

    t.upsert(ev([(1, "a", 100, "r")]))
    t.upsert(ev([(1, "new", 300, "u")]))
    t.upsert(ev([(1, "old", 200, "u")]))     # lower LSN arrives late -> loses
    assert {r.v for r in t.snapshot().collect()} == {"new"}


def test_incremental_fallback_after_cleaning(spark, tmp_table_dir):
    """A row whose latest in-range version lived in a since-cleaned file must
    still appear in the incremental pull (IncrementalRelation.scala:199-254
    fallback-to-full-scan; VERDICT r1 'What's wrong' #4)."""
    eng = Engine(spark)
    t = eng.create_table(tmp_table_dir, record_key_fields=["id"],
                         precombine_field="ts", partition_field="dt",
                         cleaner_retain_commits=1)
    c0 = t.bulk_insert(make_rows(spark, BATCH1))
    c1 = t.upsert(make_rows(spark, [(1, "v1", 11.0, 200, "2021-01-01")]))
    c2 = t.upsert(make_rows(spark, [(2, "v2", 22.0, 300, "2021-01-01")]))
    out = t.clean()
    assert out["removed"] > 0                 # c1's file really got cleaned
    # pull (c0, c1]: id=1's only in-range version was written by c1, whose
    # file was cleaned (the group was rewritten by c2). Without the fallback
    # the row silently vanishes; with it, id=1 surfaces (its row in the c2
    # rewrite kept _hoodie_commit_time=c1 — untouched rows keep their meta).
    inc = {r.id: (r.name, r.price) for r in
           t.incremental(begin=c0, end=c1).collect()}
    assert inc == {1: ("v1", 11.0)}
    # and the wider pull still sees both updates
    inc2 = {r.id: (r.name, r.price) for r in
            t.incremental(begin=c0, end=c2).collect()}
    assert inc2 == {1: ("v1", 11.0), 2: ("v2", 22.0)}


def test_event_time_payload(spark, tmp_table_dir):
    eng = Engine(spark)
    t = eng.create_table(tmp_table_dir, record_key_fields=["id"],
                         precombine_field="ts", partition_field="dt",
                         payload="event_time")
    t.bulk_insert(make_rows(spark, [(1, "v1", 10.0, 500, "2021-01-01")]))
    # stale update (lower ordering) must lose (DefaultHoodieRecordPayload.java:115-126)
    t.upsert(make_rows(spark, [(1, "stale", 11.0, 400, "2021-01-01")]))
    assert t.snapshot().collect()[0].name == "v1"
    t.upsert(make_rows(spark, [(1, "fresh", 12.0, 600, "2021-01-01")]))
    assert t.snapshot().collect()[0].name == "fresh"


def test_update_command(spark, table):
    table.bulk_insert(make_rows(spark, BATCH1))
    table.update(set={"price": "price * 2"}, where="id = 1")
    assert table.snapshot().filter("id = 1").collect()[0].price == 20.0


def test_schema_evolution_add_column(spark, table):
    table.bulk_insert(make_rows(spark, BATCH1))
    df2 = make_rows(spark, [(6, "f", 60.0, 300, "2021-01-01")]) \
        .withColumn("extra", F.lit("x"))
    table.upsert(df2)
    snap = table.snapshot()
    assert "extra" in snap.columns
    vals = {r.id: r.extra for r in snap.collect()}
    assert vals[6] == "x" and vals[1] is None


def test_unpartitioned_table(spark, tmp_table_dir):
    eng = Engine(spark)
    t = eng.create_table(tmp_table_dir, record_key_fields=["id"],
                         precombine_field="ts", keygen="nonpartitioned")
    t.bulk_insert(make_rows(spark, BATCH1))
    t.upsert(make_rows(spark, [(2, "b2", 21.0, 200, "2021-01-09")]))
    got = {r.id: r.name for r in t.snapshot().collect()}
    assert got == {1: "a", 2: "b2", 3: "c", 4: "d"}


def test_empty_payload_native(spark, tmp_table_dir):
    """payload='empty' (EmptyHoodieRecordPayload.java): inserts are no-ops,
    upserts tombstone the matched keys."""
    from hudi_0_12_0_my_spark import Engine
    eng = Engine(spark)
    t = eng.create_table(tmp_table_dir, name="h0_empty",
                         record_key_fields=["id"], precombine_field="ts",
                         partition_field="dt", table_type="cow")
    t.bulk_insert(make_rows(spark, BATCH1))
    # switch payload to empty for the follow-up write
    t.cfg.payload = "empty"
    t.upsert(make_rows(spark, [(1, "x", 0.0, 200, "2021-01-01"),
                               (9, "new", 0.0, 200, "2021-01-02")]))
    got = {r.id for r in t.snapshot().collect()}
    assert got == {2, 3, 4}      # 1 deleted; 9 never inserted


def test_custom_registered_payload_counter(spark, tmp_path):
    """payloads.register(): the PySpark mapping of a user-written
    HoodieRecordPayload subclass (hoodie.datasource.write.payload.class).
    A counter payload SUMS `price` across merged versions instead of
    overwriting — verified through COW upsert merges AND the MOR snapshot
    log-merge path, both of which dispatch into the registered callable."""
    from pyspark.sql import Window
    from hudi_0_12_0_my_spark import payloads

    def additive(df, cfg, keys, fields, drop_deletes):
        w = Window.partitionBy(*keys).orderBy(
            *[F.col(f).desc_nulls_last() for f in fields])
        wsum = (Window.partitionBy(*keys)
                .rowsBetween(Window.unboundedPreceding,
                             Window.unboundedFollowing))
        out = (df.withColumn("price", F.sum("price").over(wsum))
                 .withColumn("__rn", F.row_number().over(w))
                 .filter(F.col("__rn") == 1).drop("__rn"))
        if drop_deletes:
            out = out.filter(~payloads.is_tombstone(out))
            from hudi_0_12_0_my_spark import meta
            if meta.OPERATION in out.columns:
                out = out.drop(meta.OPERATION)
        return out

    payloads.register("counter_sum", resolve_fn=additive)
    try:
        eng = Engine(spark)
        for kind in ("cow", "mor"):
            t = eng.create_table(str(tmp_path / kind),
                                 record_key_fields=["id"],
                                 precombine_field="ts", partition_field="dt",
                                 payload="counter_sum", table_type=kind)
            t.bulk_insert(make_rows(spark, [(1, "a", 10.0, 1, "2021-01-01"),
                                            (2, "b", 5.0, 1, "2021-01-01")]))
            t.upsert(make_rows(spark, [(1, "a2", 7.0, 2, "2021-01-01")]))
            t.upsert(make_rows(spark, [(1, "a3", 3.0, 3, "2021-01-01")]))
            got = {r.id: (r.price, r.name) for r in t.snapshot().collect()}
            assert got[1] == (20.0, "a3"), (kind, got)   # 10+7+3, latest name
            assert got[2] == (5.0, "b")
            if kind == "mor":                  # compaction folds the same way
                t.compact()
                got2 = {r.id: r.price for r in t.snapshot().collect()}
                assert got2 == {1: 20.0, 2: 5.0}
    finally:
        payloads.SPECS.pop("counter_sum", None)


def test_registered_python_keygen(spark, tmp_path):
    """keygen.register(): a user keygen built from Catalyst expressions —
    key = 'id#name', partition = price band — drives write AND read (point
    lookups/pruning use the same expressions), mirroring the reference's
    hoodie.datasource.write.keygenerator.class user-classpath hook."""
    from hudi_0_12_0_my_spark import keygen

    keygen.register(
        "banded",
        lambda cfg: F.concat_ws("#", F.col("id").cast("string"),
                                F.col("name")),
        lambda cfg: F.when(F.col("price") >= 50, F.lit("high"))
                     .otherwise(F.lit("low")))
    try:
        eng = Engine(spark)
        t = eng.create_table(str(tmp_path / "kg"), record_key_fields=["id"],
                             precombine_field="ts", keygen="banded",
                             partition_field="price")
        t.bulk_insert(make_rows(spark, [(1, "a", 10.0, 1, "2021-01-01"),
                                        (2, "b", 90.0, 1, "2021-01-01")]))
        parts = {r[0] for r in t.snapshot(keep_meta=True)
                 .select("_hoodie_partition_path").distinct().collect()}
        assert parts == {"low", "high"}
        keys = {r[0] for r in t.snapshot(keep_meta=True)
                .select("_hoodie_record_key").collect()}
        assert keys == {"1#a", "2#b"}
        # upsert targets the same derived key/partition
        t.upsert(make_rows(spark, [(1, "a", 20.0, 2, "2021-01-01")]))
        got = {r.id: r.price for r in t.snapshot().collect()}
        assert got == {1: 20.0, 2: 90.0}
    finally:
        keygen._CUSTOM_KEYGENS.pop("banded", None)


def test_snapshot_of_never_written_table_raises_clearly(spark, tmp_path):
    """A table with no completed write and no declared schema cannot be
    read — the error must SAY that (TableSchemaResolver's commit-less
    failure), not die as json.loads(None) deep in read planning."""
    import pytest
    from hudi_0_12_0_my_spark import Engine
    from hudi_0_12_0_my_spark.writer import NoTableSchemaError
    t = Engine(spark).create_table(str(tmp_path / "empty"),
                                   record_key_fields=["id"],
                                   precombine_field="seq",
                                   partition_field="grp")
    with pytest.raises(NoTableSchemaError, match="no registered schema"):
        t.snapshot()

def test_schema_evolution_drop_column(spark, table):
    """ALTER TABLE DROP COLUMN (TableChanges delete): registry-only drop,
    old files keep the bytes but reads never project them; later writes
    still carrying the column have the values discarded; re-adding or
    renaming onto the dropped name is refused (resurrect hazard)."""
    table.bulk_insert(make_rows(spark, BATCH1))
    table.drop_column("name")
    snap = table.snapshot()
    assert "name" not in snap.columns
    # an old-schema writer still sends `name`: values discarded, write ok
    table.upsert(make_rows(spark, [(5, "ghost", 50.0, 100, "2021-01-03")]))
    snap = table.snapshot()
    assert "name" not in snap.columns
    assert {r.id for r in snap.collect()} == {1, 2, 3, 4, 5}
    with pytest.raises(ValueError, match="dropped"):
        table.add_column("name", "string")
    table.add_column("label", "string")
    with pytest.raises(ValueError, match="dropped"):
        table.rename_column("label", "name")
    with pytest.raises(ValueError, match="record key"):
        table.drop_column("id")
    with pytest.raises(ValueError, match="partition"):
        table.drop_column("dt")
    with pytest.raises(ValueError, match="precombine"):
        table.drop_column("ts")
    with pytest.raises(ValueError, match="no column"):
        table.drop_column("nope")


def test_schema_evolution_move_column(spark, table):
    """ALTER TABLE ... FIRST / AFTER (ColumnPositionChange): declared order
    permutes; values and later writes (aligned by name) are unaffected."""
    table.bulk_insert(make_rows(spark, BATCH1))
    table.move_column("price", first=True)
    assert table.snapshot().columns[0] == "price"
    table.move_column("price", after="name")
    cols = table.snapshot().columns
    assert cols.index("price") == cols.index("name") + 1
    table.upsert(make_rows(spark, [(1, "a2", 11.0, 200, "2021-01-01")]))
    got = {r.id: (r.name, r.price) for r in table.snapshot().collect()}
    assert got[1] == ("a2", 11.0)
    with pytest.raises(ValueError, match="exactly one"):
        table.move_column("price")
    with pytest.raises(ValueError, match="exactly one"):
        table.move_column("price", first=True, after="name")
    with pytest.raises(ValueError, match="after itself"):
        table.move_column("price", after="price")


def test_schema_evolution_drop_and_move_sql(spark, tmp_table_dir):
    """The SQL surface for drop/reorder dispatches to the table methods."""
    eng = Engine(spark)
    t = eng.create_table(tmp_table_dir, name="h0_dropsql",
                         record_key_fields=["id"], precombine_field="ts",
                         partition_field="dt", table_type="cow")
    t.bulk_insert(make_rows(spark, BATCH1))
    eng.sql("ALTER TABLE h0_dropsql DROP COLUMN name")
    eng.sql("ALTER TABLE h0_dropsql ALTER COLUMN price FIRST")
    snap = t.reload().snapshot()
    assert "name" not in snap.columns and snap.columns[0] == "price"
    eng.sql("ALTER TABLE h0_dropsql ALTER COLUMN price AFTER id")
    assert t.reload().snapshot().columns[1] == "price"


def test_business_columns_shadowing_internal_names(spark, tmp_path):
    """Business columns named like the writer's internal lookup columns
    (fid, p, f, w, lo, hi, existing) must not break packing or bucket
    writes — the internal frames use reserved __pk_/__hb_ prefixes."""
    from hudi_0_12_0_my_spark import Engine
    eng = Engine(spark)
    t = eng.create_table(str(tmp_path / "shadow"),
                         record_key_fields=["fid"],
                         keygen="nonpartitioned")
    schema = ("fid string, p long, f long, w long, lo long, hi long, "
              "existing boolean, v long")
    t.insert(spark.createDataFrame(
        [(f"k{i}", i, i, i, i, i, True, i) for i in range(20)], schema))
    # second insert exercises small-file packing against existing groups
    t.insert(spark.createDataFrame(
        [(f"k{i}", i, i, i, i, i, False, i) for i in range(20, 40)], schema))
    t.upsert(spark.createDataFrame(
        [("k5", 0, 0, 0, 0, 0, True, 99)], schema))
    snap = t.snapshot()
    assert snap.count() == 40
    assert snap.filter("fid = 'k5'").collect()[0].v == 99
