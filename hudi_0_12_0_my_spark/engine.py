"""Engine: session-level entry point (create/load tables, CALL procedures).

The Python counterpart of HoodieSparkSessionExtension + HoodieProcedures
(hudi-spark-datasource/hudi-spark/.../HoodieSparkSessionExtension.scala:31-44;
procedures dir with 49 registered CALLs): since PySpark cannot inject a
Catalyst parser extension, Hudi-specific DML enters through this API (and the
mini SQL dispatcher in sql.py); all general relational SQL goes straight to
`spark.sql` over registered snapshot views — the same division of labor the
reference uses (SURVEY.md §2.10).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .table import LakeTable


class Engine:
    def __init__(self, spark: SparkSession):
        self.spark = spark
        self.catalog: dict[str, str] = {}   # table name -> base_path
        # quickstart parity: constructing the engine registers
        # spark.read.format("hudi") and readStream format("hudi_stream")
        # (re-registration overwrites, so this is idempotent); guarded for
        # Spark builds without the Python Data Source API
        if hasattr(spark, "dataSource"):
            from .datasource import register_hudi_format
            from .streaming.source import register_stream_source
            register_hudi_format(spark)
            register_stream_source(spark)
        # Every table read plans over an EXPLICIT leaf-file list (the
        # manifest fold hands spark.read.parquet the exact paths), so
        # "listing" is one stat() per known file. The listing-threshold
        # raise that makes those plans driver-side lives in
        # writer._manifest_listing, scoped around the library's own reads —
        # Engine construction no longer rewrites any session default (the
        # user's non-hudi reads keep Spark's distributed-listing behavior).

    def create_table(self, base_path: str, name: str | None = None,
                     df: DataFrame | None = None, **cfg_kwargs) -> LakeTable:
        t = LakeTable.create(self.spark, base_path, name=name, df=df, **cfg_kwargs)
        self.catalog[t.cfg.name] = base_path
        return t

    def load_table(self, base_path: str) -> LakeTable:
        t = LakeTable(self.spark, base_path)
        self.catalog.setdefault(t.cfg.name, base_path)
        return t

    def register_table(self, name: str, base_path: str) -> None:
        self.catalog[name] = base_path

    def bootstrap(self, base_path: str, source_dir: str,
                  mode: str = "METADATA_ONLY", **cfg_kwargs) -> LakeTable:
        """Adopt an existing parquet dataset (BootstrapMode.java:29-34)."""
        from .bootstrap import bootstrap_table
        t = bootstrap_table(self.spark, base_path, source_dir,
                            mode=mode, **cfg_kwargs)
        self.catalog[t.cfg.name] = base_path
        return t

    def has_table(self, name: str) -> bool:
        return name in self.catalog

    def table(self, name: str) -> LakeTable:
        if name not in self.catalog:
            raise KeyError(f"unknown table '{name}'; known: {sorted(self.catalog)}")
        return LakeTable(self.spark, self.catalog[name])

    def drop_table(self, name: str, purge: bool = True) -> bool:
        """DROP TABLE: deregister (and with purge, delete the table dir) —
        DropHoodieTableCommand.scala semantics."""
        if name not in self.catalog:
            return False
        base = self.catalog.pop(name)
        try:
            self.spark.catalog.dropTempView(name)
        except Exception:  # noqa: BLE001 — view may not exist
            pass
        if purge:
            import shutil
            shutil.rmtree(base, ignore_errors=True)
        return True

    def rename_table(self, old: str, new: str) -> None:
        """ALTER TABLE .. RENAME TO ..: catalog + persisted config name
        (AlterHoodieTableRenameCommand.scala — a metadata-only operation)."""
        from . import config as cfgmod
        base = self.catalog.pop(old)
        t = LakeTable(self.spark, base)
        t.cfg.name = new
        cfgmod.save_config(base, t.cfg)
        self.catalog[new] = base
        try:
            self.spark.catalog.dropTempView(old)
        except Exception:  # noqa: BLE001
            pass

    def table_exists(self, base_path: str) -> bool:
        from .config import table_exists
        return table_exists(base_path)

    def call(self, procedure: str, **kwargs):
        """CALL procedure dispatch (HoodieProcedures.scala registry)."""
        from .procedures import call as _call
        return _call(self, procedure, **kwargs)

    def sql(self, text: str):
        """Mini SQL front-end for Hudi-specific DML (CALL / RUN COMPACTION /
        MERGE INTO ...); everything else is delegated to spark.sql."""
        from .sql import dispatch
        return dispatch(self, text)
