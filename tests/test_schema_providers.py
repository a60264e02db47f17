"""Schema providers (utilities/schema/ parity: Filebased, SchemaRegistry,
Hive, RowBased, Delegating + the SchemaPostProcessor chain)."""

import json

from pyspark.sql import types as T

from hudi_0_12_0_my_spark import Engine
from hudi_0_12_0_my_spark.sources.schema_providers import (
    ChainedSchemaPostProcessor, DelegatingSchemaProvider,
    DeleteSupportSchemaPostProcessor, DropColumnSchemaPostProcessor,
    FilebasedSchemaProvider, HiveSchemaProvider, RowBasedSchemaProvider,
    SchemaProviderWithPostProcessor, SchemaRegistryProvider, avro_to_spark,
    create_schema_provider, parse_schema_text)

AVSC = {
    "type": "record", "name": "trip", "fields": [
        {"name": "id", "type": "long"},
        {"name": "rider", "type": ["null", "string"]},
        {"name": "fare", "type": {"type": "bytes", "logicalType": "decimal",
                                  "precision": 10, "scale": 2}},
        {"name": "ts", "type": {"type": "long",
                                "logicalType": "timestamp-millis"}},
        {"name": "day", "type": {"type": "int", "logicalType": "date"}},
        {"name": "tags", "type": {"type": "array", "items": "string"}},
        {"name": "props", "type": {"type": "map", "values": "double"}},
        {"name": "loc", "type": {"type": "record", "name": "pt", "fields": [
            {"name": "lat", "type": "double"},
            {"name": "lon", "type": "double"}]}},
    ]}


def test_avro_to_spark_full_surface():
    st = avro_to_spark(AVSC)
    assert st["id"].dataType == T.LongType()
    assert st["rider"].dataType == T.StringType()
    assert st["fare"].dataType == T.DecimalType(10, 2)
    assert st["ts"].dataType == T.TimestampType()
    assert st["day"].dataType == T.DateType()
    assert st["tags"].dataType == T.ArrayType(T.StringType())
    assert st["props"].dataType == T.MapType(T.StringType(), T.DoubleType())
    assert isinstance(st["loc"].dataType, T.StructType)
    assert st["loc"].dataType["lat"].dataType == T.DoubleType()


def test_parse_schema_text_three_forms():
    # avro record
    assert parse_schema_text(json.dumps(AVSC))["id"].dataType == T.LongType()
    # StructType.json() dump
    st = T.StructType([T.StructField("a", T.IntegerType())])
    assert parse_schema_text(st.json()) == st
    # config-field list
    got = parse_schema_text('[{"name": "x", "type": "decimal(8,3)"}]')
    assert got["x"].dataType == T.DecimalType(8, 3)


def test_filebased_provider_rereads(tmp_path):
    f = tmp_path / "s.avsc"
    f.write_text(json.dumps(AVSC))
    p = FilebasedSchemaProvider(str(f))
    assert "rider" in p.source_schema().fieldNames()
    # file edit visible on next call (per-batch hot reload contract)
    evolved = dict(AVSC)
    evolved["fields"] = AVSC["fields"] + [{"name": "tip", "type": "double"}]
    f.write_text(json.dumps(evolved))
    assert "tip" in p.source_schema().fieldNames()


def test_registry_provider_with_injected_fetch():
    calls = []

    def fake_fetch(url):
        calls.append(url)
        return json.dumps({"schema": json.dumps(AVSC)})

    p = SchemaRegistryProvider("http://registry/subjects/t/versions/latest",
                               fetch=fake_fetch)
    assert p.source_schema()["fare"].dataType == T.DecimalType(10, 2)
    assert calls == ["http://registry/subjects/t/versions/latest"]


def test_hive_and_rowbased_and_delegating(spark):
    df = spark.createDataFrame([(1, "a")], "id long, name string")
    df.createOrReplaceTempView("sp_hive_src")
    hive = HiveSchemaProvider(spark, "sp_hive_src")
    assert hive.source_schema() == df.schema
    row = RowBasedSchemaProvider(df.select("id"))
    deleg = DelegatingSchemaProvider(hive, row)
    assert deleg.source_schema() == df.schema
    assert deleg.target_schema().fieldNames() == ["id"]


def test_post_processors():
    st = T.StructType([T.StructField("a", T.IntegerType()),
                       T.StructField("b", T.StringType())])
    out = ChainedSchemaPostProcessor(
        DeleteSupportSchemaPostProcessor(),
        DropColumnSchemaPostProcessor(["b"])).process(st)
    assert out.fieldNames() == ["a", "_hoodie_is_deleted"]
    wrapped = SchemaProviderWithPostProcessor(
        RowBasedSchemaProviderLike(st), DeleteSupportSchemaPostProcessor())
    assert "_hoodie_is_deleted" in wrapped.source_schema().fieldNames()


class RowBasedSchemaProviderLike:
    def __init__(self, st):
        self._st = st

    def source_schema(self):
        return self._st

    def target_schema(self):
        return self._st


def test_factory_and_ingest_integration(spark, tmp_path):
    """File-provider-driven ingest: the stream's schema comes from an .avsc,
    not the inline fields list."""
    from hudi_0_12_0_my_spark.streaming import (TableStreamConfig,
                                                start_table_stream)
    avsc = {"type": "record", "name": "r", "fields": [
        {"name": "id", "type": "long"},
        {"name": "val", "type": "double"},
        {"name": "seq", "type": "long"}]}
    sf = tmp_path / "r.avsc"
    sf.write_text(json.dumps(avsc))
    spec = {"kind": "file", "path": str(sf)}
    p = create_schema_provider(spec)
    assert isinstance(p, FilebasedSchemaProvider)

    src_dir = tmp_path / "stream"
    src_dir.mkdir()
    (src_dir / "b1.json").write_text("\n".join(
        json.dumps({"id": i, "val": float(i), "seq": 1, "op": "I"})
        for i in range(5)))
    eng = Engine(spark)
    tc = TableStreamConfig(
        name="sp1", base_path=str(tmp_path / "sp1"),
        record_key_fields=["id"], precombine_field="seq",
        schema_provider=spec, op_col="op",
        source={"format": "json-files", "path": str(src_dir)})
    q = start_table_stream(eng, tc, str(tmp_path / "ck"),
                           trigger={"availableNow": True})
    q.awaitTermination(120)
    snap = eng.table("sp1").snapshot()
    assert snap.count() == 5
    assert dict(snap.dtypes)["val"] == "double"
