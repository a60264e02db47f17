"""Merge payloads: row-version resolution semantics as DataFrame expressions.

Re-expression of the HoodieRecordPayload contract
(hudi-common/.../model/HoodieRecordPayload.java:129 — preCombine /
combineAndGetUpdateValue / getInsertValue) as window functions, so resolution
stays vectorized/whole-stage-codegen instead of Hudi's row-at-a-time Avro merge
(an intentional improvement, SURVEY.md §4).

| payload key            | reference                                               |
|------------------------|---------------------------------------------------------|
| overwrite_latest       | OverwriteWithLatestAvroPayload.java:40,52,66 — latest
|                        | precombine wins within batch; incoming always overwrites |
| event_time / default   | DefaultHoodieRecordPayload.java:115-126 /
|                        | EventTimeAvroPayload.java:81 — stored survives if its
|                        | ordering value >= incoming                               |
| partial_update         | OverwriteNonDefaultsWithLatestAvroPayload.java — per
|                        | column, latest non-null wins                             |
| validate_dup           | ValidateDuplicateKeyPayload.scala — INSERT fails on dup  |

Deletes: `_hoodie_is_deleted = true` (OverwriteWithLatestAvroPayload.java:87),
the EmptyHoodieRecordPayload tombstone, and MOR delete blocks
(HoodieDeleteBlock.java) all become "winner row is a tombstone -> drop".
CDC ops (AWSDmsAvroPayload.java:95, debezium payloads, fork's
StringToRowDataMapFunction.java:110 I/U/D -> RowKind) map onto the same
tombstone column via `apply_cdc_ops`.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from . import meta


@dataclass(frozen=True)
class PayloadSpec:
    name: str
    event_time_ordered: bool = False   # stored kept when its ordering >= incoming
    column_merge: bool = False         # per-column latest-non-null merge
    always_delete: bool = False        # every incoming record is a tombstone
    # custom combineAndGetUpdateValue: (df, cfg, keys, ordering_fields,
    # drop_deletes) -> DataFrame with ONE surviving row per key. The PySpark
    # mapping of the reference's user-written HoodieRecordPayload subclasses
    # (hoodie.datasource.write.payload.class pointing at user code): a
    # DataFrame-level callable registered via payloads.register().
    resolve_fn: object = None


SPECS = {
    "overwrite_latest": PayloadSpec("overwrite_latest"),
    "event_time": PayloadSpec("event_time", event_time_ordered=True),
    "default": PayloadSpec("default", event_time_ordered=True),  # DefaultHoodieRecordPayload
    "partial_update": PayloadSpec("partial_update", column_merge=True),
    "overwrite_non_defaults": PayloadSpec("overwrite_non_defaults", column_merge=True),
    "validate_dup": PayloadSpec("validate_dup"),
    # EmptyHoodieRecordPayload.java: every record resolves to empty, i.e. a
    # tombstone — upserting keys deletes them, inserting absent keys no-ops
    "empty": PayloadSpec("empty", always_delete=True),
}


def get(name: str) -> PayloadSpec:
    if name not in SPECS:
        raise ValueError(f"unknown payload {name!r}; known: {sorted(SPECS)}")
    return SPECS[name]


def register(name: str, resolve_fn=None, **spec_kwargs) -> PayloadSpec:
    """Register a custom payload under ``name`` (then ``payload=name`` in the
    table config). The reference's extension point is a user-written
    HoodieRecordPayload subclass on the classpath; the PySpark mapping is a
    DataFrame-level combiner:

        resolve_fn(df, cfg, keys, ordering_fields, drop_deletes) -> DataFrame

    returning ONE row per key over the union of stored + incoming versions
    (``ordering_fields`` are strongest-first; tombstone winners must be
    dropped when ``drop_deletes``). It runs inside COW merge, MOR snapshot
    merge and compaction alike, so it must be a pure DataFrame transform.
    Like the Java classpath requirement, the registration must exist in the
    process before a table configured with it is written or read."""
    spec = PayloadSpec(name, resolve_fn=resolve_fn, **spec_kwargs)
    SPECS[name] = spec
    return spec


def _ordering_fields(spec: PayloadSpec, cfg) -> list[str]:
    """Resolution ordering, strongest first; winner = max over these fields."""
    pre = cfg.precombine_field
    if spec.event_time_ordered and pre:
        fields = [pre, meta.COMMIT_TIME]
    else:
        fields = [meta.COMMIT_TIME] + ([pre] if pre else [])
    return fields + [meta.COMMIT_SEQNO]


def _desc(fields):
    return [F.col(f).desc_nulls_last() for f in fields]


def _asc(fields):
    return [F.col(f).asc_nulls_first() for f in fields]


def _key_cols(cfg) -> list:
    # non-global index: key unique per partition (HoodieSimpleIndex); global:
    # unique table-wide (HoodieGlobalSimpleIndex)
    return [meta.RECORD_KEY] if cfg.global_index else [meta.PARTITION_PATH, meta.RECORD_KEY]


def is_tombstone(df: DataFrame):
    conds = []
    if meta.DELETE_MARKER in df.columns:
        conds.append(F.coalesce(F.col(meta.DELETE_MARKER).cast("boolean"), F.lit(False)))
    if meta.OPERATION in df.columns:
        conds.append(F.coalesce(F.col(meta.OPERATION) == "D", F.lit(False)))
    if not conds:
        return F.lit(False)
    out = conds[0]
    for c in conds[1:]:
        out = out | c
    return out


def resolve(df: DataFrame, cfg, spec: PayloadSpec, drop_deletes: bool = True) -> DataFrame:
    """One surviving row per key (combineAndGetUpdateValue over the union of
    stored + incoming versions). Tombstone winners are dropped when
    ``drop_deletes`` (COW write / snapshot merge); kept when the tombstone must
    propagate (MOR delta retention)."""
    keys = _key_cols(cfg)
    fields = _ordering_fields(spec, cfg)
    if spec.resolve_fn is not None:
        return spec.resolve_fn(df, cfg, keys, fields, drop_deletes)
    w = Window.partitionBy(*keys).orderBy(*_desc(fields))
    if spec.column_merge:
        internal = set(meta.META_COLS + [meta.OPERATION, meta.TARGET_FILE_ID, meta.DELETE_MARKER])
        business = [c for c in df.columns if c not in internal and c not in fields]
        # ascending frame over the whole key group: last() = newest non-null
        w_asc = (Window.partitionBy(*keys).orderBy(*_asc(fields))
                 .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
        proj = [F.row_number().over(w).alias("__rn")]
        for c in df.columns:
            if c in business:
                proj.append(F.last(F.col(c), ignorenulls=True).over(w_asc).alias(c))
            else:
                proj.append(F.col(c))
        out = df.select(*proj).filter(F.col("__rn") == 1).drop("__rn")
    else:
        # NB: a max_by(struct(*cols), ordering) groupBy was measured 27%
        # SLOWER than this window at sf0.1 (struct-valued hash-agg overhead
        # dominates when version multiplicity is ~1.1x); map-side partial agg
        # only pays off when many versions per key share a partition. The
        # sort-based window also degrades gracefully via spill at scale.
        out = (df.withColumn("__rn", F.row_number().over(w))
                 .filter(F.col("__rn") == 1).drop("__rn"))
    if drop_deletes:
        out = out.filter(~is_tombstone(out))
        if meta.OPERATION in out.columns:
            out = out.drop(meta.OPERATION)
    return out


def precombine(df: DataFrame, cfg, spec: PayloadSpec) -> DataFrame:
    """Within-batch dedup by precombine field (HoodieRecordPayload.preCombine;
    OverwriteWithLatestAvroPayload.java:52). Keeps tombstones so they still
    delete stored rows during the merge stage."""
    if not cfg.precombine_field:
        return df
    keys = _key_cols(cfg)
    order = [F.col(cfg.precombine_field).desc_nulls_last(),
             F.col(meta.COMMIT_SEQNO).desc_nulls_last()]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (df.withColumn("__rn", F.row_number().over(w))
              .filter(F.col("__rn") == 1).drop("__rn"))


def apply_cdc_ops(df: DataFrame, op_col: str = "op",
                  delete_values=("D", "d", "delete")) -> DataFrame:
    """CDC envelope -> engine rows: op I/U -> upsert, D -> tombstone.

    Mirrors the fork's StringToRowDataMapFunction.java:110 (I/U/D -> RowKind)
    and AWSDmsAvroPayload.java:95 (Op == 'D' -> delete)."""
    return (df.withColumn(meta.DELETE_MARKER, F.col(op_col).isin(*delete_values))
              .drop(op_col))


# --------------------------------------------------------- debezium ordering
MYSQL_SEQ_COL = "_event_seq"      # DebeziumConstants.ADDED_SEQ_COL_NAME
POSTGRES_LSN_COL = "_event_lsn"   # DebeziumConstants.FLATTENED_LSN_COL_NAME
DEBEZIUM_OP_COL = "_change_operation_type"  # FLATTENED_OP_COL_NAME


def debezium_transform(df: DataFrame, source: str = "mysql",
                       op_col: str = DEBEZIUM_OP_COL) -> DataFrame:
    """Flattened Debezium events -> engine rows with source-specific ordering.

    MySQL (MySqlDebeziumAvroPayload.java + MysqlDebeziumSource.java:94-100):
    ordering value `_event_seq` = binlog-file numeric suffix + "." + pos,
    compared as a STRING (the reference's compareTo) — reproduced exactly,
    including its lexicographic comparison. Postgres
    (PostgresDebeziumAvroPayload.java): ordering by the `_event_lsn` long.
    Ops: i/c/r -> insert, u -> update, d -> delete (tombstone).

    Use with a table whose payload='event_time' and precombine_field =
    MYSQL_SEQ_COL / POSTGRES_LSN_COL: stored rows then survive late-arriving
    older events (AbstractDebeziumAvroPayload.shouldPickCurrentRecord)."""
    if source == "mysql":
        if MYSQL_SEQ_COL not in df.columns:
            df = df.withColumn(
                MYSQL_SEQ_COL,
                F.concat(F.substring_index(F.col("_event_bin_file"), ".", -1),
                         F.lit("."), F.col("_event_pos").cast("string")))
    elif source == "postgres":
        if POSTGRES_LSN_COL not in df.columns:
            raise ValueError(f"postgres debezium events need {POSTGRES_LSN_COL}")
    else:
        raise ValueError(f"unknown debezium source {source!r}")
    return apply_cdc_ops(df, op_col=op_col, delete_values=("d", "D"))
