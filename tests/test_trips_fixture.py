"""Lifecycle over the reference's canonical `trips` test table (FIXTURES.md
F1, HoodieTestDataGenerator.TRIP_EXAMPLE_SCHEMA): nested struct (fare),
map (city_to_state), array<struct> (tip_history), decimal, binary, date —
through bulk_insert / event-time upsert / stale-update rejection /
_hoodie_is_deleted deletes, on COW and MOR."""

import datetime
from decimal import Decimal

import pytest
from pyspark.sql import functions as F, types as T

from hudi_0_12_0_my_spark import Engine


SCHEMA = T.StructType([
    T.StructField("timestamp", T.LongType()),
    T.StructField("_row_key", T.StringType()),
    T.StructField("rider", T.StringType()),
    T.StructField("driver", T.StringType()),
    T.StructField("begin_lat", T.DoubleType()),
    T.StructField("distance_in_meters", T.IntegerType()),
    T.StructField("weight", T.FloatType()),
    T.StructField("nation", T.BinaryType()),
    T.StructField("current_date", T.DateType()),
    T.StructField("height", T.DecimalType(10, 6)),
    T.StructField("city_to_state", T.MapType(T.StringType(), T.StringType())),
    T.StructField("fare", T.StructType([
        T.StructField("amount", T.DoubleType()),
        T.StructField("currency", T.StringType())])),
    T.StructField("tip_history", T.ArrayType(T.StructType([
        T.StructField("amount", T.DoubleType()),
        T.StructField("currency", T.StringType())]))),
    T.StructField("partition_path", T.StringType()),
    T.StructField("_hoodie_is_deleted", T.BooleanType()),
])

PARTS = ["2016/03/15", "2015/03/16", "2015/03/17"]


def _trip(i, ts, fare_amount, deleted=False):
    return (ts, f"key-{i:04d}", f"rider-{i}", f"driver-{i}",
            1.0 + i, 100 * i, float(i), bytes([i % 256]),
            datetime.date(2016, 3, 15), Decimal(f"{170 + i}.{i:06d}"),
            {"sf": "ca", f"c{i}": "s"},
            (fare_amount, "USD"),
            [(fare_amount / 10, "USD"), (2.0, "EUR")],
            PARTS[i % 3], deleted)


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


@pytest.mark.parametrize("ttype", ["cow", "mor"])
def test_trips_lifecycle(spark, tmp_path, ttype):
    eng = Engine(spark)
    t = eng.create_table(str(tmp_path / ttype), record_key_fields=["_row_key"],
                         precombine_field="timestamp",
                         partition_field="partition_path",
                         payload="event_time", table_type=ttype)
    n = 60
    t.bulk_insert(_df(spark, [_trip(i, 1000, 10.0) for i in range(n)]))
    assert t.snapshot().count() == n
    assert sorted(t.partitions()) == sorted(PARTS)

    # update batch: higher timestamp, changed fare.amount
    t.upsert(_df(spark, [_trip(i, 2000, 99.0) for i in range(0, n, 2)]))
    # stale batch: LOWER timestamp must lose under the event-time payload
    t.upsert(_df(spark, [_trip(i, 500, 1.0) for i in range(0, n, 2)]))

    snap = t.snapshot()
    assert snap.count() == n
    fares = {r["_row_key"]: r["fare"]["amount"] for r in
             snap.select("_row_key", "fare").collect()}
    assert fares["key-0000"] == 99.0          # updated
    assert fares["key-0001"] == 10.0          # untouched
    got = snap.filter("_row_key = 'key-0002'").first()
    assert got["city_to_state"]["sf"] == "ca"          # map survives merge
    assert [x["currency"] for x in got["tip_history"]] == ["USD", "EUR"]
    assert got["height"] == Decimal("172.000002")
    assert got["nation"] == bytes([2])
    assert got["timestamp"] == 2000           # winner is the newer version

    # delete batch: _hoodie_is_deleted=true rows tombstone their keys
    t.upsert(_df(spark, [_trip(i, 3000, 0.0, deleted=True)
                         for i in range(0, n, 3)]))
    remaining = t.snapshot()
    assert remaining.count() == n - len(range(0, n, 3))
    assert remaining.filter("_row_key = 'key-0000'").count() == 0

    if ttype == "mor":
        t.compact()
        assert t.snapshot().count() == n - len(range(0, n, 3))
        assert t.read_optimized().count() == n - len(range(0, n, 3))


def test_trips_merge_into_nested(spark, tmp_path):
    """MERGE assigning a nested struct column wholesale."""
    eng = Engine(spark)
    t = eng.create_table(str(tmp_path / "m"), record_key_fields=["_row_key"],
                         precombine_field="timestamp",
                         partition_field="partition_path")
    t.bulk_insert(_df(spark, [_trip(i, 1000, 10.0) for i in range(9)]))
    src = _df(spark, [_trip(i, 2000, 55.0) for i in (0, 3, 100)])
    t.merge(src, on="t._row_key = s._row_key",
            when_matched_update={"fare": "s.fare", "timestamp": "s.timestamp"},
            when_not_matched_insert="*")
    snap = t.snapshot()
    assert snap.count() == 10                  # key-0100 inserted
    fares = {r["_row_key"]: r["fare"]["amount"] for r in
             snap.select("_row_key", "fare").collect()}
    assert fares["key-0000"] == 55.0 and fares["key-0003"] == 55.0
    assert fares["key-0001"] == 10.0
    assert fares["key-0100"] == 55.0
