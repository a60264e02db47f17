"""Key generators: record key + partition path as pure column expressions.

Re-expression of hudi-client/hudi-client-common/.../keygen/:
SimpleAvroKeyGenerator, ComplexAvroKeyGenerator ("f1:v1,f2:v2"),
NonpartitionedAvroKeyGenerator, TimestampBasedAvroKeyGenerator
(types UNIX_TIMESTAMP/EPOCHMILLISECONDS/DATE_STRING/SCALAR with output date
formatting, TimestampBasedAvroKeyGenerator.java:51-52,88-123). The fork pins
TimestampBased epoch-millis -> yyyy-MM-dd partitions
(HoodieFlinkStreamerWithApollo.java:100-112).

Everything is a Catalyst expression — stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEFAULT_PARTITION = "default"   # Hudi's null-partition fallback


def record_key_expr(cfg) -> Column:
    fields = cfg.record_key_fields
    if len(fields) == 1 and cfg.keygen != "complex":
        return F.col(fields[0]).cast("string")
    # ComplexAvroKeyGenerator format: f1:v1,f2:v2
    parts = []
    for f in fields:
        parts.append(F.concat(F.lit(f + ":"), F.coalesce(F.col(f).cast("string"), F.lit("__null__"))))
    return F.concat_ws(",", *parts)


def _java_to_strftime(fmt: str) -> str:
    # spark's date_format takes java patterns directly; identity hook for clarity
    return fmt


def partition_path_expr(cfg, df=None) -> Column:
    if cfg.keygen == "nonpartitioned" or not cfg.partition_field:
        return F.lit("")
    src = F.col(cfg.partition_field)
    # timestamp-formatted partitions combine with ANY record-key style
    # (CustomAvroKeyGenerator allows per-field simple/timestamp mixes)
    if cfg.keygen == "timestamp" or cfg.partition_style == "timestamp":
        unit = cfg.keygen_timestamp_unit
        if unit == "auto":
            # infer from the column's type: temporal/string columns convert
            # directly, numeric columns are epoch millis (the fork's default,
            # HoodieFlinkStreamerWithApollo.java:100-112)
            dt = dict(df.dtypes).get(cfg.partition_field, "") if df is not None else ""
            unit = "epochms" if dt in ("bigint", "long", "int", "double", "float") \
                else "timestamp"
        if unit == "epochms":
            ts = F.timestamp_millis(src.cast("long"))
        elif unit == "epochsec":
            ts = F.timestamp_seconds(src.cast("long"))
        else:  # date / timestamp / string column
            ts = src.cast("timestamp")
        val = F.date_format(ts, _java_to_strftime(cfg.keygen_output_format))
    else:
        val = src.cast("string")
    val = F.coalesce(val, F.lit(DEFAULT_PARTITION))
    if cfg.hive_style_partitioning:
        val = F.concat(F.lit(cfg.partition_field + "="), val)
    return val
