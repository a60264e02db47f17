"""Key generators: record key + partition path as pure column expressions.

Re-expression of hudi-client/hudi-client-common/.../keygen/:
SimpleAvroKeyGenerator, ComplexAvroKeyGenerator ("f1:v1,f2:v2"),
NonpartitionedAvroKeyGenerator, UuidKeyGenerator (command/SqlKeyGenerator
sibling), GlobalAvroDeleteKeyGenerator (key only, empty partition path),
CustomAvroKeyGenerator ("field1:simple,field2:timestamp" partition specs
joined by "/" — CustomAvroKeyGenerator.java:63-92), and
TimestampBasedAvroKeyGenerator with types
UNIX_TIMESTAMP/EPOCHMILLISECONDS/DATE_STRING/MIXED/SCALAR and output date
formatting (TimestampBasedAvroKeyGenerator.java:51-52,88-123). The fork pins
TimestampBased epoch-millis -> yyyy-MM-dd partitions
(HoodieFlinkStreamerWithApollo.java:100-112).

Everything is a Catalyst expression — stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEFAULT_PARTITION = "default"   # Hudi's null-partition fallback

# PartitionPathEncodeUtils.charToEscape: HTTP control chars + the
# path/metadata-hostile set. '%' is escaped FIRST so escape output never
# re-escapes (escapePathName writes %XX for each member).
_ESCAPE_CHARS = [chr(c) for c in range(0x01, 0x20)] + [
    '"', '#', "'", '*', '/', ':', '=', '?', '\\', chr(0x7F), '{', '[', ']',
    '^']


def escape_partition_expr(val: Column) -> Column:
    """PartitionPathEncodeUtils.escapePathName as a Catalyst expression:
    %XX-escape the Hive-hostile character set, so a partition VALUE
    containing '/' (or ':' etc.) cannot explode into nested directories or
    an unlistable path. Enabled by cfg.partition_urlencode
    (hoodie.datasource.write.partitionpath.urlencode, default false — same
    default as the reference)."""
    import re as _re
    out = F.regexp_replace(val, "%", "%25")
    for ch in _ESCAPE_CHARS:
        out = F.regexp_replace(out, _re.escape(ch), "%%%02X" % ord(ch))
    return out


# User-registered key generators: the PySpark mapping of the reference's
# KeyGenerator extension point (a user class named by
# hoodie.datasource.write.keygenerator.class, KeyGenUtils.createKeyGenerator).
# Each entry maps a keygen name -> (key_expr_fn, partition_expr_fn), both
# cfg -> Column — pure Catalyst expressions so user keygens stay inside
# whole-stage codegen exactly like the built-ins. Like the Java classpath
# requirement, registration must exist before the table is written/read.
_CUSTOM_KEYGENS: dict = {}


def register(name: str, key_expr_fn, partition_expr_fn=None) -> None:
    """Register a custom key generator under ``name`` (then
    ``keygen=name`` in the table config). ``key_expr_fn(cfg) -> Column``
    builds the record key; ``partition_expr_fn(cfg) -> Column`` the
    partition path (None -> unpartitioned)."""
    _CUSTOM_KEYGENS[name] = (key_expr_fn, partition_expr_fn)


def is_identity_record_key(cfg) -> bool:
    """True when record_key_expr for this cfg is EXACTLY str(value) of the
    single key field (the default branch below). This is the semantics the
    format('hudi') planner's bucket point-lookup addressing assumes, so it
    is persisted in table_config at write time — gating pruning on the
    keygen NAME alone would silently prune wrong files when register()
    shadows a builtin name with arbitrary python the standalone planner
    cannot see (ADVICE r6)."""
    return (cfg.keygen not in _CUSTOM_KEYGENS
            and cfg.keygen in ("simple", "nonpartitioned", "timestamp",
                               "custom")
            and len(cfg.record_key_fields) == 1)


def is_identity_partition_source(cfg) -> bool:
    """True when partition_path_expr for a single value-style partition
    field is coalesce(cast(field as string), 'default') (+ optional hive
    k=v prefix) — what the format('hudi') partition pruner assumes. Only
    covers the keygen-semantics half; style/urlencode/global-index gates
    are separate persisted fields the planner already reads."""
    pf = cfg.partition_field
    return (cfg.keygen not in _CUSTOM_KEYGENS
            and cfg.keygen in ("simple", "complex")
            and isinstance(pf, str) and bool(pf)
            and ":" not in pf and "," not in pf)


def record_key_expr(cfg) -> Column:
    if cfg.keygen in _CUSTOM_KEYGENS:
        return _CUSTOM_KEYGENS[cfg.keygen][0](cfg)
    if cfg.keygen == "uuid":
        # UuidKeyGenerator: random key per row (INSERT-only tables)
        return F.expr("uuid()")
    fields = cfg.record_key_fields
    if len(fields) == 1 and cfg.keygen not in ("complex", "global_delete"):
        key = F.col(fields[0]).cast("string")
        # null/empty keys fail the WRITE, not silently create untargetable
        # rows (null joins match nothing, so such a row could never be
        # updated or deleted again) — KeyGenUtils.getRecordKey's
        # HoodieKeyException, JVM-side so no extra validation job
        return F.when(key.isNull() | (key == ""), F.raise_error(F.concat(
            F.lit(f"record key field '{fields[0]}' is null/empty "
                  "(HoodieKeyException)")))).otherwise(key)
    # ComplexAvroKeyGenerator format: f1:v1,f2:v2 (GlobalAvroDeleteKeyGenerator
    # reuses it for the delete-key record)
    parts = []
    for f in fields:
        parts.append(F.concat(F.lit(f + ":"), F.coalesce(F.col(f).cast("string"), F.lit("__null__"))))
    return F.concat_ws(",", *parts)


def _java_to_strftime(fmt: str) -> str:
    # spark's date_format takes java patterns directly; identity hook for clarity
    return fmt


def _timestamp_field_expr(cfg, field: str, df=None) -> Column:
    """One timestamp-styled partition field -> formatted date string
    (TimestampBasedAvroKeyGenerator.java:88-123 input-type dispatch)."""
    src = F.col(field)
    unit = cfg.keygen_timestamp_unit
    if unit == "auto":
        # infer from the column's type: temporal/string columns convert
        # directly, numeric columns are epoch millis (the fork's default,
        # HoodieFlinkStreamerWithApollo.java:100-112)
        dt = dict(df.dtypes).get(field, "") if df is not None else ""
        unit = "epochms" if dt in ("bigint", "long", "int", "double", "float") \
            else "timestamp"
    if unit == "epochms":
        ts = F.timestamp_millis(src.cast("long"))
    elif unit == "epochsec":
        ts = F.timestamp_seconds(src.cast("long"))
    elif unit in ("date_string", "mixed"):
        # DATE_STRING: parse with the configured input format(s); MIXED
        # additionally falls back to epoch millis for numeric-looking values
        # (TimestampBasedAvroKeyGenerator TimestampType.DATE_STRING/MIXED)
        fmts = [f.strip() for f in (cfg.keygen_input_format or "yyyy-MM-dd")
                .split(",") if f.strip()]
        tries = [F.try_to_timestamp(src.cast("string"), F.lit(f)) for f in fmts]
        if unit == "mixed":
            tries.append(F.timestamp_millis(src.cast("string").try_cast("long")))
        ts = F.coalesce(*tries) if len(tries) > 1 else tries[0]
    else:  # date / timestamp / string column
        ts = src.cast("timestamp")
    return F.date_format(ts, _java_to_strftime(cfg.keygen_output_format))


def _partition_specs(cfg) -> list[tuple[str, str]]:
    """[(field, style)] from the partition_field config. Styles: a
    ``field:simple`` / ``field:timestamp`` suffix wins (CustomAvroKeyGenerator
    SPLIT_REGEX ':'); otherwise the table-level keygen/partition_style."""
    raw = cfg.partition_field
    specs = raw if isinstance(raw, list) else \
        [s.strip() for s in str(raw).split(",") if s.strip()]
    default_style = "timestamp" if (cfg.keygen == "timestamp"
                                    or cfg.partition_style == "timestamp") \
        else "simple"
    out = []
    for spec in specs:
        if ":" in spec:
            fname, style = spec.split(":", 1)
            style = "timestamp" if style.strip().lower().startswith("timestamp") \
                else "simple"
            out.append((fname.strip(), style))
        else:
            out.append((spec, default_style))
    return out


def partition_path_expr(cfg, df=None) -> Column:
    if cfg.keygen in _CUSTOM_KEYGENS:
        pfn = _CUSTOM_KEYGENS[cfg.keygen][1]
        return pfn(cfg) if pfn is not None else F.lit("")
    if cfg.keygen in ("nonpartitioned", "global_delete") or not cfg.partition_field:
        return F.lit("")
    parts = []
    for fname, style in _partition_specs(cfg):
        if style == "timestamp":
            val = _timestamp_field_expr(cfg, fname, df)
        else:
            val = F.col(fname).cast("string")
        if getattr(cfg, "partition_urlencode", False):
            val = escape_partition_expr(val)
        val = F.coalesce(val, F.lit(DEFAULT_PARTITION))
        if cfg.hive_style_partitioning:
            val = F.concat(F.lit(fname + "="), val)
        parts.append(val)
    # multi-field partition paths join with "/" (CustomAvroKeyGenerator's
    # DEFAULT_PARTITION_PATH_SEPARATOR), producing nested directories
    return parts[0] if len(parts) == 1 else F.concat_ws("/", *parts)
