"""Schema providers for streaming ingestion — utilities/schema parity.

Reference spec: hudi-utilities/src/main/java/org/apache/hudi/utilities/schema/
(SchemaProvider.java, FilebasedSchemaProvider.java, SchemaRegistryProvider.java,
JdbcbasedSchemaProvider.java, HiveSchemaProvider.java, RowBasedSchemaProvider.java,
DelegatingSchemaProvider.java, and the SchemaPostProcessor chain).

Spark-first: providers return ``pyspark.sql.types.StructType`` directly (the
reference returns Avro ``Schema`` objects that Hudi then converts for Spark —
we skip the Avro hop). Avro-JSON *files/registries* are still understood: the
public Avro spec's JSON form is parsed into Spark types so existing ``.avsc``
assets keep working.
"""

from __future__ import annotations

import json

from pyspark.sql import types as T

# ------------------------------------------------------- avro-json -> spark
_AVRO_PRIMITIVES = {
    "null": T.NullType(), "boolean": T.BooleanType(), "int": T.IntegerType(),
    "long": T.LongType(), "float": T.FloatType(), "double": T.DoubleType(),
    "bytes": T.BinaryType(), "string": T.StringType(),
}

_AVRO_LOGICAL = {
    ("int", "date"): T.DateType(),
    ("long", "timestamp-millis"): T.TimestampType(),
    ("long", "timestamp-micros"): T.TimestampType(),
    ("long", "local-timestamp-millis"): T.TimestampNTZType(),
    ("long", "local-timestamp-micros"): T.TimestampNTZType(),
}


def avro_to_spark(schema) -> T.DataType:
    """Public Avro-spec JSON -> Spark DataType (records, arrays, maps, unions
    with null, decimal/date/timestamp logical types)."""
    if isinstance(schema, str):
        if schema in _AVRO_PRIMITIVES:
            return _AVRO_PRIMITIVES[schema]
        raise ValueError(f"unsupported avro type {schema!r}")
    if isinstance(schema, list):                    # union
        non_null = [s for s in schema if s != "null"]
        if len(non_null) != 1:
            raise ValueError(f"only [null, X] unions supported, got {schema}")
        return avro_to_spark(non_null[0])
    t = schema["type"]
    logical = schema.get("logicalType")
    if logical == "decimal":
        return T.DecimalType(schema.get("precision", 38), schema.get("scale", 18))
    if (t, logical) in _AVRO_LOGICAL:
        return _AVRO_LOGICAL[(t, logical)]
    if t == "record":
        return T.StructType([
            T.StructField(f["name"], avro_to_spark(f["type"]), True)
            for f in schema["fields"]])
    if t == "array":
        return T.ArrayType(avro_to_spark(schema["items"]))
    if t == "map":
        return T.MapType(T.StringType(), avro_to_spark(schema["values"]))
    if t in ("enum", "fixed"):
        return T.StringType() if t == "enum" else T.BinaryType()
    return avro_to_spark(t)                         # {"type": "string"} form


def parse_schema_text(text: str) -> T.StructType:
    """Accepts any of: Avro record JSON (.avsc), a StructType.json() dump, or
    the fork's config-field list [{"name","type"},...]."""
    d = json.loads(text)
    if isinstance(d, list):                          # config-field list
        from ..streaming.ingest import schema_from_fields
        return schema_from_fields(d)
    if d.get("type") == "struct":                    # StructType.json()
        return T.StructType.fromJson(d)
    if d.get("type") == "record":                    # Avro record
        st = avro_to_spark(d)
        if not isinstance(st, T.StructType):
            raise ValueError("top-level avro schema must be a record")
        return st
    if "fields" in d:                                # {"fields": [...]}
        from ..streaming.ingest import schema_from_fields
        return schema_from_fields(d["fields"])
    raise ValueError("unrecognized schema document")


# ------------------------------------------------------------ providers
class SchemaProvider:
    """SchemaProvider.java: source schema (what arrives) + target schema
    (what lands); target defaults to source."""

    def source_schema(self) -> T.StructType:
        raise NotImplementedError

    def target_schema(self) -> T.StructType:
        return self.source_schema()


class FilebasedSchemaProvider(SchemaProvider):
    """FilebasedSchemaProvider.java: schema file(s) on any storage; re-read
    on every call so a file edit is picked up by the next micro-batch."""

    def __init__(self, source_file: str, target_file: str | None = None):
        self.source_file = source_file
        self.target_file = target_file

    @staticmethod
    def _load(path: str) -> T.StructType:
        from ..storage import get_storage
        return parse_schema_text(get_storage(path).read_bytes(path).decode())

    def source_schema(self) -> T.StructType:
        return self._load(self.source_file)

    def target_schema(self) -> T.StructType:
        return self._load(self.target_file) if self.target_file \
            else self.source_schema()


class SchemaRegistryProvider(SchemaProvider):
    """SchemaRegistryProvider.java: Confluent-style registry — GET <url>
    returns {"schema": "<avro json string>"}. ``fetch`` is injectable for
    containers without network (tests) and for custom auth; the default uses
    stdlib urllib."""

    def __init__(self, url: str, target_url: str | None = None, fetch=None):
        self.url = url
        self.target_url = target_url
        self._fetch = fetch or self._http_fetch

    @staticmethod
    def _http_fetch(url: str) -> str:
        import urllib.request
        with urllib.request.urlopen(url, timeout=30) as r:  # noqa: S310
            return r.read().decode()

    def _schema(self, url: str) -> T.StructType:
        doc = json.loads(self._fetch(url))
        return parse_schema_text(doc["schema"] if isinstance(doc, dict)
                                 and "schema" in doc else json.dumps(doc))

    def source_schema(self) -> T.StructType:
        return self._schema(self.url)

    def target_schema(self) -> T.StructType:
        return self._schema(self.target_url) if self.target_url \
            else self.source_schema()


class HiveSchemaProvider(SchemaProvider):
    """HiveSchemaProvider.java: schema of a catalog table (works with any
    Spark catalog — hive metastore, in-memory temp views, v2 catalogs)."""

    def __init__(self, spark, source_table: str, target_table: str | None = None):
        self.spark = spark
        self.source_table = source_table
        self.target_table = target_table

    def source_schema(self) -> T.StructType:
        return self.spark.table(self.source_table).schema

    def target_schema(self) -> T.StructType:
        return self.spark.table(self.target_table).schema \
            if self.target_table else self.source_schema()


class JdbcbasedSchemaProvider(SchemaProvider):
    """JdbcbasedSchemaProvider.java: infer the schema of a JDBC table without
    reading rows (pushes ``WHERE 1=0``). Requires a JDBC driver jar on the
    Spark classpath — absent here, the error surfaces at call time."""

    def __init__(self, spark, url: str, table: str, options: dict | None = None):
        self.spark = spark
        self.url = url
        self.table = table
        self.options = options or {}

    def source_schema(self) -> T.StructType:
        reader = (self.spark.read.format("jdbc")
                  .option("url", self.url)
                  .option("query", f"SELECT * FROM {self.table} WHERE 1=0"))
        for k, v in self.options.items():
            reader = reader.option(k, v)
        return reader.load().schema


class RowBasedSchemaProvider(SchemaProvider):
    """RowBasedSchemaProvider.java: schema of an existing DataFrame."""

    def __init__(self, df):
        self._schema = df.schema

    def source_schema(self) -> T.StructType:
        return self._schema


class DelegatingSchemaProvider(SchemaProvider):
    """DelegatingSchemaProvider.java: independent source/target providers."""

    def __init__(self, source: SchemaProvider, target: SchemaProvider):
        self._source = source
        self._target = target

    def source_schema(self) -> T.StructType:
        return self._source.source_schema()

    def target_schema(self) -> T.StructType:
        return self._target.source_schema()


# ------------------------------------------------------- post-processors
class SchemaPostProcessor:
    """SchemaPostProcessor.java: schema -> schema rewrite step."""

    def process(self, schema: T.StructType) -> T.StructType:
        raise NotImplementedError


class DeleteSupportSchemaPostProcessor(SchemaPostProcessor):
    """DeleteSupportSchemaPostProcessor.java: append the _hoodie_is_deleted
    tombstone column if absent."""

    def process(self, schema: T.StructType) -> T.StructType:
        from .. import meta
        if meta.DELETE_MARKER in schema.fieldNames():
            return schema
        return schema.add(T.StructField(meta.DELETE_MARKER, T.BooleanType(), True))


class DropColumnSchemaPostProcessor(SchemaPostProcessor):
    """DropColumnSchemaPostProcessor.java: remove named columns; refuses to
    drop ALL columns (mirrors the reference's validation)."""

    def __init__(self, columns: list[str]):
        self.columns = set(columns)

    def process(self, schema: T.StructType) -> T.StructType:
        kept = [f for f in schema.fields if f.name not in self.columns]
        if not kept:
            raise ValueError("DropColumnSchemaPostProcessor would drop every column")
        return T.StructType(kept)


class ChainedSchemaPostProcessor(SchemaPostProcessor):
    """ChainedSchemaPostProcessor.java: apply in declaration order."""

    def __init__(self, *processors: SchemaPostProcessor):
        self.processors = processors

    def process(self, schema: T.StructType) -> T.StructType:
        for p in self.processors:
            schema = p.process(schema)
        return schema


class SchemaProviderWithPostProcessor(SchemaProvider):
    """SchemaProviderWithPostProcessor.java: wrap provider + processor."""

    def __init__(self, provider: SchemaProvider,
                 post_processor: SchemaPostProcessor):
        self.provider = provider
        self.post_processor = post_processor

    def source_schema(self) -> T.StructType:
        return self.post_processor.process(self.provider.source_schema())

    def target_schema(self) -> T.StructType:
        return self.post_processor.process(self.provider.target_schema())


# ---------------------------------------------------------------- factory
def create_schema_provider(spec: dict, spark=None) -> SchemaProvider:
    """Config-driven construction, e.g. {"kind": "file", "path": ".../s.avsc"}
    — the TableStreamConfig.schema_provider hook."""
    kind = spec.get("kind", "file")
    if kind == "file":
        p: SchemaProvider = FilebasedSchemaProvider(
            spec["path"], spec.get("target_path"))
    elif kind == "registry":
        p = SchemaRegistryProvider(spec["url"], spec.get("target_url"))
    elif kind == "hive":
        p = HiveSchemaProvider(spark, spec["table"], spec.get("target_table"))
    elif kind == "jdbc":
        p = JdbcbasedSchemaProvider(spark, spec["url"], spec["table"],
                                    spec.get("options"))
    else:
        raise ValueError(f"unknown schema provider kind {kind!r}")
    pps: list[SchemaPostProcessor] = []
    if spec.get("add_delete_marker"):
        pps.append(DeleteSupportSchemaPostProcessor())
    if spec.get("drop_columns"):
        pps.append(DropColumnSchemaPostProcessor(spec["drop_columns"]))
    if pps:
        p = SchemaProviderWithPostProcessor(p, ChainedSchemaPostProcessor(*pps))
    return p
