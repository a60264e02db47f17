"""Spark-catalog meta sync (hive-sync-lite).

Re-expression of the reference's meta-sync module at the session-catalog
level (hudi-sync/hudi-hive-sync/.../HiveSyncTool.java:120-260 syncHoodieTable:
create database/table if absent, update the schema when it evolved, register
partitions ADDED SINCE THE LAST SYNC by reading the timeline — and the
fork's per-table ``hive_sync_config`` blocks,
HoodieMuiltiTableFlinkStreamer.java:186-205). Two levels:

- :class:`HiveMetastoreSync` — a REAL metastore (embedded-derby /
  thrift HMS / Glue) through a Hive-enabled SparkSession: database, EXTERNAL
  table, schema updates, incremental partition registration and the
  ``last_commit_time_synced`` table property, matching
  HiveSyncTool.syncHoodieTable order of operations.
- :class:`SparkCatalogSync` — session-catalog fallback for plain sessions,
  which is what downstream Spark SQL users of a single-cluster deployment
  actually query:

- table     -> a session view ``<sync_db>_<sync_table>`` (and the bare
  ``<sync_table>``) over the table's live snapshot, refreshed per sync so
  plain ``spark.sql`` sees new data — the stand-in for Hive's
  HoodieParquetInputFormat table (a raw LOCATION-based catalog table would
  expose stale file versions, which is exactly what the input format hides)
- partitions -> discovered INCREMENTALLY from commit metadata written since
  the last synced instant (HiveSyncTool.getPartitionEvents over
  TimelineUtils.getPartitionsWritten), never by listing storage

Sync state (the last synced instant) is read back from the engine's own
registry, so repeated syncs are cheap no-ops — the same
``lastCommitTimeSynced`` table property the reference stores in the
metastore.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class SparkCatalogSync:
    """Per-table catalog syncer. ``sync()`` after each commit (the streaming
    sink calls it via ``post_commit``/``hive_sync_config``)."""

    table: object
    sync_db: str = "default"
    sync_table: str | None = None
    last_synced: str | None = None
    known_partitions: set = field(default_factory=set)

    @property
    def qualified(self) -> str:
        name = self.sync_table or self.table.cfg.name or "hudi_table"
        return f"{self.sync_db}_{name}" if self.sync_db != "default" else name

    def sync(self) -> dict:
        """Create/refresh the synced view and register new partitions.
        Returns {"synced_instant", "new_partitions", "created"}.

        Scope: SESSION-level only — the queryable surface is the temp view
        named ``<sync_db>_<sync_table>`` (db-qualified ``db.table`` access
        needs a real metastore: use :class:`HiveMetastoreSync` on a
        Hive-enabled session). No CREATE DATABASE is issued here; a
        database without a catalog object inside it would be dead DDL."""
        t = self.table
        last = t.timeline.latest_completed_write()
        if last is None or last.time == self.last_synced:
            return {"synced_instant": self.last_synced,
                    "new_partitions": [], "created": False}
        created = self.last_synced is None
        # partitions added since the last sync, from commit metadata only
        # (HiveSyncTool.getPartitionEvents; TimelineUtils.getPartitionsWritten)
        new_parts: list[str] = []
        for ins in t.timeline.completed_write_instants():
            if self.last_synced is not None and ins.time <= self.last_synced:
                continue
            md = t.timeline.metadata(ins) or {}
            for p in (md.get("partition_to_write_stats") or {}):
                if p and p not in self.known_partitions:
                    self.known_partitions.add(p)
                    new_parts.append(p)
        # refresh the queryable surface (schema updates ride along for free:
        # the snapshot plan carries the evolved registered schema)
        t.reload().register(self.qualified)
        if self.qualified != (self.sync_table or t.cfg.name):
            t.register(self.sync_table or t.cfg.name)
        self.last_synced = last.time
        return {"synced_instant": last.time,
                "new_partitions": sorted(new_parts), "created": created}


class HiveSyncError(RuntimeError):
    pass


@dataclass
class HiveMetastoreSync:
    """Metastore-level sync against a REAL Hive metastore through a
    Hive-enabled SparkSession (``enableHiveSupport()``; embedded-derby in
    tests, thrift HMS / Glue in production — Spark's HiveExternalCatalog
    speaks to whatever ``hive.metastore.uris`` points at, which is exactly
    the connection HiveSyncTool.java opens itself).

    Re-expression of HiveSyncTool.syncHoodieTable (hudi-sync/hudi-hive-sync
    /src/main/java/org/apache/hudi/hive/HiveSyncTool.java:120-260), same
    order of operations:

    1. create the database if absent,
    2. create the table if absent (EXTERNAL, LOCATION = table base path,
       PARTITIONED BY the table's partition field),
    3. update the catalog schema when the registered schema evolved
       (``ALTER TABLE .. ADD COLUMNS``; the reference's
       ``schema_evolution`` branch of syncSchema),
    4. register partitions added since the last sync, discovered from
       commit metadata (getPartitionEvents over getPartitionsWritten) —
       never by listing storage,
    5. record ``last_commit_time_synced`` in TBLPROPERTIES — the same
       property name the reference persists, so sync state survives the
       process and repeated syncs are cheap no-ops.

    What is synced is METADATA — discovery, schema, partitions — which is
    the HiveSyncTool contract: a second Hive-enabled session sees the
    table, its schema and its partitions with no engine API involved.
    Correct SNAPSHOT reads still go through the engine's reader (the
    reference relies on HoodieParquetInputFormat to hide superseded file
    versions the same way; a raw ``SELECT`` over the location sees every
    version until ``clean`` retires old slices).

    At 100 TB this is driver-side metadata work proportional to NEW
    partitions per commit (a handful of DDL statements), nothing
    data-sized.
    """

    table: object
    sync_db: str = "default"
    sync_table: str | None = None

    PROP_LAST_SYNCED = "last_commit_time_synced"

    @property
    def qualified(self) -> str:
        name = self.sync_table or self.table.cfg.name or "hudi_table"
        return f"{self.sync_db}.{name}"

    # ------------------------------------------------------------ helpers
    def _spark(self):
        spark = self.table.spark
        impl = spark.conf.get("spark.sql.catalogImplementation", "in-memory")
        if impl != "hive":
            raise HiveSyncError(
                "HiveMetastoreSync needs a Hive-enabled SparkSession "
                "(SparkSession.builder.enableHiveSupport()); this session's "
                f"catalog implementation is {impl!r}. For session-local "
                "views without a metastore use SparkCatalogSync.")
        return spark

    def _table_exists(self, spark) -> bool:
        return spark.catalog.tableExists(self.qualified)

    def _last_synced(self, spark) -> str | None:
        rows = spark.sql(f"SHOW TBLPROPERTIES {self.qualified}").collect()
        props = {r[0]: r[1] for r in rows}
        return props.get(self.PROP_LAST_SYNCED)

    def _partition_field(self) -> str | None:
        cfg = self.table.cfg
        if cfg.keygen == "nonpartitioned" or not cfg.partition_field:
            return None
        pf = cfg.partition_field
        if isinstance(pf, (list, tuple)):
            if len(pf) > 1:
                raise HiveSyncError(
                    "HiveMetastoreSync supports single-level partitioning; "
                    f"got {pf!r}")
            pf = pf[0]
        return pf

    def _data_columns_ddl(self) -> str:
        from .writer import business_schema
        pf = self._partition_field()
        return ", ".join(
            f"`{f.name}` {f.dataType.simpleString()}"
            for f in business_schema(self.table.cfg).fields if f.name != pf)

    def _partition_value(self, partition_path: str) -> str:
        # commit metadata records partition PATHS; hive-style paths are
        # field=value (PartitionPathEncodeUtils), plain style is the value
        val = partition_path.split("=", 1)[1] if "=" in partition_path \
            else partition_path
        if self.table.cfg.partition_urlencode:
            from urllib.parse import unquote
            val = unquote(val)
        return val.replace("'", "''")

    # --------------------------------------------------------------- sync
    def sync(self) -> dict:
        """One syncHoodieTable round. Returns {"synced_instant",
        "new_partitions", "created", "added_columns"}."""
        t = self.table
        spark = self._spark()
        last = t.timeline.latest_completed_write()
        if last is None:
            return {"synced_instant": None, "new_partitions": [],
                    "created": False, "added_columns": []}
        from .writer import business_schema
        pf = self._partition_field()
        spark.sql(f"CREATE DATABASE IF NOT EXISTS {self.sync_db}")
        created = not self._table_exists(spark)
        if created:
            part_clause = f" PARTITIONED BY (`{pf}` string)" if pf else ""
            spark.sql(
                f"CREATE EXTERNAL TABLE {self.qualified} "
                f"({self._data_columns_ddl()}) STORED AS PARQUET"
                f"{part_clause} LOCATION '{t.base_path}'")
            last_synced = None
        else:
            last_synced = self._last_synced(spark)
        # schema update (syncSchema: add columns the catalog lacks)
        have = {f.name for f in spark.table(self.qualified).schema.fields}
        add = [f for f in business_schema(t.cfg).fields
               if f.name not in have and f.name != pf]
        if add:
            cols = ", ".join(f"`{f.name}` {f.dataType.simpleString()}"
                             for f in add)
            spark.sql(f"ALTER TABLE {self.qualified} ADD COLUMNS ({cols})")
        # partitions written since the last synced instant, metadata-only
        new_parts: list[str] = []
        if pf:
            seen: set = set()
            for ins in t.timeline.completed_write_instants():
                if last_synced is not None and ins.time <= last_synced:
                    continue
                md = t.timeline.metadata(ins) or {}
                for p in (md.get("partition_to_write_stats") or {}):
                    if p and p not in seen:
                        seen.add(p)
                        new_parts.append(p)
            for p in sorted(new_parts):
                val = self._partition_value(p)
                spark.sql(
                    f"ALTER TABLE {self.qualified} ADD IF NOT EXISTS "
                    f"PARTITION (`{pf}`='{val}') "
                    f"LOCATION '{t.base_path}/{p}'")
        spark.sql(
            f"ALTER TABLE {self.qualified} SET TBLPROPERTIES "
            f"('{self.PROP_LAST_SYNCED}'='{last.time}')")
        return {"synced_instant": last.time,
                "new_partitions": sorted(new_parts), "created": created,
                "added_columns": [f.name for f in add]}


def make_post_commit_sync(table, hive_sync_config: dict):
    """Build a ``post_commit`` hook for the streaming sink from the fork's
    per-table ``hive_sync_config`` JSON block ({sync_db, sync_table, ...},
    HoodieMuiltiTableFlinkStreamer.java:186-205). When the session is
    Hive-enabled (or ``metastore_uris`` is set, implying a real HMS is
    wanted), syncs the metastore via HiveMetastoreSync; otherwise falls
    back to session-level SparkCatalogSync views."""
    impl = getattr(table.spark, "conf", None)
    hive_enabled = (impl is not None and impl.get(
        "spark.sql.catalogImplementation", "in-memory") == "hive")
    if hive_enabled:
        syncer = HiveMetastoreSync(
            table,
            sync_db=hive_sync_config.get("sync_db", "default"),
            sync_table=hive_sync_config.get("sync_table"))
    else:
        syncer = SparkCatalogSync(
            table,
            sync_db=hive_sync_config.get("sync_db", "default"),
            sync_table=hive_sync_config.get("sync_table"))
    return lambda _t: syncer.sync()
