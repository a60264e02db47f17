"""LakeTable: user-facing facade over one keyed transactional table.

The PySpark-native equivalent of HoodieTableMetaClient + SparkRDDWriteClient +
DefaultSource read relations in one handle. SQL command surface
(CREATE/INSERT/MERGE/UPDATE/DELETE/CALL — SURVEY.md §2.3) maps onto these
methods; `spark.sql` handles all general relational processing over
`register()`-ed snapshot views, exactly as the reference delegates it
(HoodieBaseRelation.scala:304-340 hands an RDD to Catalyst).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

from . import config as cfgmod
from . import timeline as tl
from .fsview import FileSystemView
from .reader import Reader
from .writer import Writer
from .storage import get_storage


class LakeTable:
    def __init__(self, spark, base_path: str):
        if not cfgmod.table_exists(base_path):
            raise FileNotFoundError(f"no table at {base_path}")
        self.spark = spark
        self.base_path = base_path
        self.cfg = cfgmod.load_config(base_path)
        self.timeline = tl.Timeline(base_path)
        self.writer = Writer(self)
        self.reader = Reader(self)
        self._commit_listeners: list = []
        self._precommit_validators: list = []

    def add_precommit_validator(self, fn) -> None:
        """Register an in-process pre-commit validator — called with
        (spark, before_df, after_df) before every write commit of THIS
        table handle becomes visible; raising rejects the commit and the
        staged files are aborted (services/validators.py; declarative SQL
        validators live in cfg.precommit_validators)."""
        self._precommit_validators.append(fn)

    def on_commit(self, fn) -> None:
        """Register an in-process post-commit listener — called with the
        HoodieWriteCommitCallbackMessage-shaped dict after every successful
        write commit of THIS table handle (callbacks.py for external
        file:/http:/module: specs via cfg.commit_callback)."""
        self._commit_listeners.append(fn)

    # ------------------------------------------------------------ lifecycle
    @staticmethod
    def create(spark, base_path: str, name: str | None = None,
               df: DataFrame | None = None, **cfg_kwargs) -> "LakeTable":
        """CREATE TABLE / CTAS (CreateHoodieTableCommand.scala,
        CreateHoodieTableAsSelectCommand.scala)."""
        if cfgmod.table_exists(base_path):
            raise FileExistsError(f"table already exists at {base_path}")
        cfg = cfgmod.TableConfig(name=name or os.path.basename(base_path.rstrip("/")),
                                 **cfg_kwargs)
        get_storage(base_path).makedirs(os.path.join(base_path, ".hoodie", "timeline"))
        cfgmod.save_config(base_path, cfg)
        t = LakeTable(spark, base_path)
        if df is not None:
            t.bulk_insert(df)
        return t

    def abs(self, rel: str) -> str:
        return os.path.join(self.base_path, rel)

    def view(self, as_of: str | None = None) -> FileSystemView:
        return FileSystemView(self.base_path, self.timeline, as_of=as_of)

    def reload(self) -> "LakeTable":
        self.cfg = cfgmod.load_config(self.base_path)
        return self

    # ----------------------------------------------------------- write ops
    def upsert(self, df: DataFrame) -> str:
        return self.writer.upsert(df)

    def insert(self, df: DataFrame, validate_duplicates: bool = False,
               drop_duplicates: bool = False) -> str:
        return self.writer.insert(df, validate_duplicates=validate_duplicates,
                                  drop_duplicates=drop_duplicates)

    def bulk_insert(self, df: DataFrame, sort_mode: str = "GLOBAL_SORT") -> str:
        return self.writer.bulk_insert(df, sort_mode=sort_mode)

    def delete(self, keys_df: DataFrame | None = None, where=None) -> str:
        return self.writer.delete(keys_df=keys_df, where=where)

    def insert_overwrite(self, df: DataFrame) -> str:
        return self.writer.insert_overwrite(df, whole_table=False)

    def insert_overwrite_table(self, df: DataFrame) -> str:
        return self.writer.insert_overwrite(df, whole_table=True)

    def delete_partition(self, partition_values: list[str]) -> str:
        return self.writer.delete_partition(partition_values)

    def update(self, set: dict, where=None) -> str:
        """UPDATE ... SET ... WHERE (UpdateHoodieTableCommand.scala): snapshot
        filter -> apply expressions -> upsert."""
        from pyspark.sql import functions as F
        df = self.snapshot()
        if where is not None:
            df = df.filter(where)
        for col, expr in set.items():
            df = df.withColumn(col, F.expr(expr) if isinstance(expr, str) else expr)
        return self.upsert(df)

    def merge(self, source: DataFrame, on: str, **kwargs) -> str:
        """MERGE INTO (MergeIntoHoodieTableCommand.scala:147) — see merge.py."""
        from .merge import merge_into
        return merge_into(self, source, on, **kwargs)

    # ------------------------------------------------------------ read ops
    def snapshot(self, filters=None, keep_meta: bool = False) -> DataFrame:
        return self.reader.snapshot(filters=filters, keep_meta=keep_meta)

    def read_optimized(self, filters=None, keep_meta: bool = False) -> DataFrame:
        return self.reader.read_optimized(filters=filters, keep_meta=keep_meta)

    def time_travel(self, as_of: str, filters=None, keep_meta: bool = False) -> DataFrame:
        return self.reader.time_travel(as_of, filters=filters, keep_meta=keep_meta)

    def incremental_cdc(self, begin: str | None = None,
                        end: str | None = None,
                        columns: list | None = None) -> DataFrame:
        return self.reader.incremental_cdc(begin=begin, end=end,
                                           columns=columns)

    def incremental_contributions(self, begin: str | None = None,
                                  end: str | None = None,
                                  columns: list | None = None) -> DataFrame:
        return self.reader.incremental_contributions(begin=begin, end=end,
                                                     columns=columns)

    def incremental(self, begin: str | None = None, end: str | None = None,
                    keep_meta: bool = False, filters=None) -> DataFrame:
        return self.reader.incremental(begin=begin, end=end,
                                       keep_meta=keep_meta, filters=filters)

    def register(self, view_name: str, query_type: str = "snapshot", **kw) -> DataFrame:
        df = getattr(self, query_type)(**kw) if query_type != "snapshot" \
            else self.snapshot(**kw)
        df.createOrReplaceTempView(view_name)
        return df

    # -------------------------------------------------------------- services
    def compact(self, strategy: str = "log_file_size", max_groups: int | None = None,
                **kw) -> str | None:
        from .services.compaction import run_compaction
        return run_compaction(self, strategy=strategy, max_groups=max_groups, **kw)

    def cluster(self, sort_cols: list | None = None, layout: str = "linear",
                partitions: list | None = None,
                target_file_bytes: int | None = None,
                boundary_mode: str = "minmax") -> str | None:
        from .services.clustering import run_clustering
        return run_clustering(self, sort_cols=sort_cols, layout=layout,
                              partitions=partitions,
                              target_file_bytes=target_file_bytes,
                              boundary_mode=boundary_mode)

    def resize_buckets(self, split_above: int | None = None,
                       merge_below: int | None = None,
                       partitions: list | None = None) -> str | None:
        """Consistent-hash bucket split/merge (services/bucket_resize.py)."""
        from .services.bucket_resize import resize_buckets
        return resize_buckets(self, split_above=split_above,
                              merge_below=merge_below, partitions=partitions)

    def clean(self, policy: str | None = None, retain: int | None = None) -> dict:
        from .services.cleaner import run_clean
        return run_clean(self, policy=policy, retain=retain)

    def rollback(self, instant_time: str | None = None) -> dict:
        from .services.rollback import rollback_instant, rollback_pending
        if instant_time is None:
            return rollback_pending(self)
        return rollback_instant(self, instant_time)

    def savepoint(self, instant_time: str | None = None) -> str:
        from .services.savepoint import create_savepoint
        return create_savepoint(self, instant_time)

    def restore(self, savepoint_time: str) -> dict:
        from .services.savepoint import restore_to_savepoint
        return restore_to_savepoint(self, savepoint_time)

    def archive(self, retain_active: int = 20) -> dict:
        from .services.archival import archive_timeline
        return archive_timeline(self, retain_active=retain_active)

    # ------------------------------------------------------ schema evolution
    def add_column(self, name: str, dtype: str) -> None:
        """ALTER TABLE ADD COLUMNS (AlterHoodieTableAddColumnsCommand.scala):
        registry-only — old files read the new column as null."""
        from pyspark.sql import types as T

        from .writer import business_schema
        schema = business_schema(self.cfg)
        if name in schema.fieldNames():
            raise ValueError(f"column {name!r} already exists")
        if name in self.cfg.dropped_columns:
            raise ValueError(
                f"column {name!r} was previously dropped; re-adding it would "
                f"resurface pre-drop values from old data files (the "
                f"reference's column-id internal schema gives re-adds a new "
                f"id for the same reason) — use a different name")
        schema = schema.add(T.StructField(
            name, T._parse_datatype_string(dtype)))
        self.cfg.schema_json = schema.json()
        cfgmod.save_config(self.base_path, self.cfg)

    def rename_column(self, old: str, new: str) -> None:
        """ALTER TABLE RENAME COLUMN (AlterHoodieTableChangeColumnCommand /
        TableChanges rename): registry rename + a chronological rename entry;
        files of every era resolve at read via coalesce over the name chain
        (writer.rename_chains)."""
        from pyspark.sql import types as T

        from .writer import business_schema
        schema = business_schema(self.cfg)
        if old not in schema.fieldNames():
            raise ValueError(f"no column {old!r}")
        if new in schema.fieldNames():
            raise ValueError(f"column {new!r} already exists")
        if new in self.cfg.dropped_columns:
            raise ValueError(
                f"column {new!r} was previously dropped; renaming onto it "
                f"would resurface pre-drop values from old data files")
        fields = [T.StructField(new, f.dataType, f.nullable)
                  if f.name == old else f for f in schema.fields]
        self.cfg.schema_json = T.StructType(fields).json()
        self.cfg.column_renames = list(self.cfg.column_renames) + [
            {"from": old, "to": new}]
        if self.cfg.record_key_fields and old in self.cfg.record_key_fields:
            raise ValueError("cannot rename a record key field")
        if self.cfg.precombine_field == old:
            self.cfg.precombine_field = new
        if self.cfg.partition_field == old:
            raise ValueError("cannot rename the partition field")
        cfgmod.save_config(self.base_path, self.cfg)
        self.reload()

    def change_column(self, name: str, new_type: str) -> None:
        """ALTER TABLE CHANGE COLUMN — widen a column's registered type
        without rewriting data (AlterHoodieTableChangeColumnCommand.scala:
        37-94 swaps the field in the table schema, validates Avro
        compatibility, and commits the schema; no files change). Old files
        up-cast at read; later writes land in the wide type. Narrowing or
        cross-family changes are refused, mirroring the reference's
        validateSchema/Avro-promotion rules (int->long/float/double,
        long->float/double, float->double, decimal widening)."""
        from pyspark.sql import types as T

        from .writer import (_FRACTIONAL_RANK, _INTEGRAL_RANK,
                             business_schema, nullable_type)
        schema = business_schema(self.cfg)
        if name not in schema.fieldNames():
            raise ValueError(f"no column {name!r}")
        if self.cfg.record_key_fields and name in self.cfg.record_key_fields:
            raise ValueError("cannot change a record key field's type")
        target = nullable_type(T._parse_datatype_string(new_type))
        reg = next(f.dataType for f in schema.fields if f.name == name)
        rs, ts = reg.simpleString(), target.simpleString()
        widens = (
            rs == ts
            or (rs in _INTEGRAL_RANK and ts in _INTEGRAL_RANK
                and _INTEGRAL_RANK[ts] > _INTEGRAL_RANK[rs])
            or (rs in _INTEGRAL_RANK and ts in _FRACTIONAL_RANK)
            or (rs in _FRACTIONAL_RANK and ts in _FRACTIONAL_RANK
                and _FRACTIONAL_RANK[ts] > _FRACTIONAL_RANK[rs])
            or (isinstance(reg, T.DecimalType)
                and isinstance(target, T.DecimalType)
                and target.precision - target.scale >= reg.precision - reg.scale
                and target.scale >= reg.scale))
        if not widens:
            raise ValueError(
                f"ALTER TABLE CHANGE COLUMN: type {ts!r} does not widen "
                f"registered type {rs!r} for column {name!r} (only lossless "
                f"promotions are supported, per the reference's Avro schema "
                f"compatibility check)")
        if rs == ts:
            return
        fields = [T.StructField(name, target, True) if f.name == name else f
                  for f in schema.fields]
        self.cfg.schema_json = T.StructType(fields).json()
        cfgmod.save_config(self.base_path, self.cfg)
        self.reload()

    def drop_column(self, name: str) -> None:
        """ALTER TABLE DROP COLUMN (TableChanges.java delete action):
        registry-only — no data rewrite. Data files of every era keep the
        physical bytes; reads project only registered columns
        (writer.base_read_schema drives ``spark.read.schema``), so the
        column vanishes with parquet-footer-level pruning — free at 100 TB.
        The name is remembered in cfg.dropped_columns: later writes that
        still carry it have the values discarded (Avro projection
        semantics), and re-adding the same name is refused so pre-drop
        bytes can never resurface."""
        from .writer import business_schema
        schema = business_schema(self.cfg)
        if name not in schema.fieldNames():
            raise ValueError(f"no column {name!r}")
        if self.cfg.record_key_fields and name in self.cfg.record_key_fields:
            raise ValueError("cannot drop a record key field")
        if self.cfg.partition_field == name:
            raise ValueError("cannot drop the partition field")
        if self.cfg.precombine_field == name:
            raise ValueError("cannot drop the precombine field")
        from pyspark.sql import types as T
        self.cfg.schema_json = T.StructType(
            [f for f in schema.fields if f.name != name]).json()
        self.cfg.dropped_columns = list(self.cfg.dropped_columns) + [name]
        cfgmod.save_config(self.base_path, self.cfg)
        self.reload()

    def move_column(self, name: str, first: bool = False,
                    after: str | None = None) -> None:
        """ALTER TABLE ... FIRST / AFTER (TableChanges ColumnPositionChange):
        reorder the DECLARED column order in the table registry. Purely a
        registry permutation — writes align by name, reads project in
        registry order — so it costs nothing at any scale."""
        from pyspark.sql import types as T

        from .writer import business_schema
        schema = business_schema(self.cfg)
        names = schema.fieldNames()
        if name not in names:
            raise ValueError(f"no column {name!r}")
        if first == (after is not None):
            raise ValueError("move_column: pass exactly one of first/after")
        if after is not None and after not in names:
            raise ValueError(f"no column {after!r}")
        if after == name:
            raise ValueError("cannot move a column after itself")
        fld = next(f for f in schema.fields if f.name == name)
        rest = [f for f in schema.fields if f.name != name]
        if first:
            fields = [fld] + rest
        else:
            i = next(j for j, f in enumerate(rest) if f.name == after)
            fields = rest[:i + 1] + [fld] + rest[i + 1:]
        self.cfg.schema_json = T.StructType(fields).json()
        cfgmod.save_config(self.base_path, self.cfg)
        self.reload()

    # ------------------------------------------------------------- metadata
    def commits(self) -> list[dict]:
        out = []
        for ins in self.timeline.completed():
            md = self.timeline.metadata(ins)
            out.append({"instant": ins.time, "action": ins.action,
                        "operation": md.get("operation"),
                        "total_records": md.get("total_records"),
                        "total_bytes": md.get("total_bytes")})
        return out

    def partitions(self) -> list[str]:
        return self.view().partitions()

    def latest_instant(self) -> str | None:
        ins = self.timeline.latest_completed_write()
        return ins.time if ins else None
