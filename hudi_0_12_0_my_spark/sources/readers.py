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


def s3_events_incr_source(spark: SparkSession, engine, events_table,
                          begin: str | None = None, end: str | None = None,
                          fmt: str = "parquet", fs_prefix: str = "s3",
                          key_prefix: str | None = None,
                          ignore_key_prefix: str | None = None,
                          ignore_key_substring: str | None = None,
                          check_exists: bool = False, schema=None,
                          options: dict | None = None):
    """S3EventsHoodieIncrSource (sources/S3EventsHoodieIncrSource.java:111-207):
    incrementally pull S3 event-notification rows from a "metadata" table
    (columns ``s3.bucket.name`` / ``s3.object.key`` / ``s3.object.size``),
    turn them into file paths, and load those files.

    Returns ``(DataFrame | None, checkpoint)`` where checkpoint is the end
    instant of the pull (the reference's Pair<Option<Dataset>, String>).
    The listing side stays a DataFrame until the final distinct-path collect
    (list of files per pull is checkpoint-bounded, not table-sized).
    ``fs_prefix="file"`` + an empty bucket name yields ``file:///...`` local
    paths, which is how the unit test drives the exact reference flow without
    an object store. (The upstream S3EventsSource — SQS polling into the
    events table — needs AWS and is out of scope; any writer that lands event
    rows in the table feeds this source.)
    """
    t = engine.table(events_table) if isinstance(events_table, str) else events_table
    commits = [i.time for i in t.timeline.completed_write_instants()]
    if not commits:
        return None, begin or ""
    end = end or commits[-1]
    inc = t.incremental(begin=begin, end=end) if begin else \
        t.time_travel(as_of=end)
    from pyspark.sql import functions as F
    ev = inc.filter(F.col("s3.object.size") > 0)
    key = F.col("s3.object.key")
    if key_prefix:
        ev = ev.filter(key.startswith(key_prefix))
    if ignore_key_prefix:
        ev = ev.filter(~key.startswith(ignore_key_prefix))
    if ignore_key_substring:
        ev = ev.filter(~key.contains(ignore_key_substring))
    ev = ev.filter(key.endswith(f".{fmt}") | key.contains(f".{fmt}"))
    rows = (ev.select(F.col("s3.bucket.name").alias("b"), key.alias("k"))
            .distinct().collect())
    paths = [f"{fs_prefix}://{r['b']}/{r['k']}" for r in rows]
    if check_exists:
        from ..storage import get_storage
        kept = []
        for p in paths:
            local = p[len("file://"):] if p.startswith("file://") else p
            try:
                if get_storage(local).exists(local):
                    kept.append(p)
            except Exception:  # noqa: BLE001 — unreachable backend: skip
                pass
        paths = kept
    if not paths:
        return None, end
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    return reader.load(paths), end


def hive_incr_pull_source(spark: SparkSession, root_path: str,
                          last_checkpoint: str | None = None,
                          fmt: str = "parquet", schema=None,
                          options: dict | None = None):
    """HiveIncrPullSource (sources/HiveIncrPullSource.java:89-116): the root
    dir holds one subdirectory per upstream commit; pull the FIRST commit dir
    strictly greater than the checkpoint (commit-by-commit causality), read
    its files, and return ``(DataFrame | None, new_checkpoint)``."""
    from ..storage import get_storage
    st = get_storage(root_path)
    if not st.isdir(root_path):
        return None, last_checkpoint
    commits = sorted(d for d in st.listdir(root_path)
                     if st.isdir(f"{root_path.rstrip('/')}/{d}"))
    todo = [c for c in commits if last_checkpoint is None or c > last_checkpoint]
    if not todo:
        return None, last_checkpoint
    commit = todo[0]
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    return reader.load(f"{root_path.rstrip('/')}/{commit}"), commit
