"""Batch ingestion sources — DeltaStreamer's sources/ dir re-expressed.

Reference: hudi-utilities/src/main/java/org/apache/hudi/utilities/sources/
(JsonDFSSource, AvroDFSSource, CsvDFSSource, ParquetDFSSource, ORCDFSSource,
JdbcSource, SqlSource, HoodieIncrSource.java:40, JsonKafkaSource.java:48).
Spark's built-in readers cover the file formats and JDBC 1:1; the
Hudi-incremental source is our own incremental query; Kafka batch reads use
the built-in kafka format (needs a broker, untestable in this container).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_source(spark: SparkSession, fmt: str, path: str | None = None,
                schema=None, options: dict | None = None,
                sql: str | None = None, engine=None,
                table: str | None = None, begin: str | None = None,
                end: str | None = None) -> DataFrame:
    """One entry point for every DeltaStreamer source kind.

    fmt: json | csv | parquet | orc | avro | jdbc | sql | hudi_incremental |
    kafka. ``sql`` feeds SqlSource; ``engine``+``table`` (+begin/end) feed
    HoodieIncrSource (Hudi -> Hudi incremental pipelines).
    """
    options = options or {}
    fmt = fmt.lower()
    if fmt == "sql":
        if not sql:
            raise ValueError("SqlSource needs sql=...")
        return spark.sql(sql)
    if fmt == "hudi_incremental":
        if engine is None or table is None:
            raise ValueError("hudi_incremental needs engine= and table=")
        t = engine.table(table) if isinstance(table, str) else table
        return t.incremental(begin=begin, end=end)
    if fmt == "jdbc":
        reader = spark.read.format("jdbc")
        for k, v in options.items():
            reader = reader.option(k, v)
        return reader.load()
    if fmt == "kafka":
        reader = spark.read.format("kafka")
        for k, v in options.items():
            reader = reader.option(k, v)
        return reader.load()
    if fmt in ("json", "csv", "parquet", "orc", "avro", "text"):
        reader = spark.read.format(fmt)
        if schema is not None:
            reader = reader.schema(schema)
        for k, v in options.items():
            reader = reader.option(k, v)
        if path is None:
            raise ValueError(f"{fmt} source needs path=")
        return reader.load(path)
    raise ValueError(f"unknown source format {fmt!r}")
