"""Spark-catalog meta sync (hive-sync-lite).

Re-expression of the reference's meta-sync module at the session-catalog
level (hudi-sync/hudi-hive-sync/.../HiveSyncTool.java:120-260 syncHoodieTable:
create database/table if absent, update the schema when it evolved, register
partitions ADDED SINCE THE LAST SYNC by reading the timeline — and the
fork's per-table ``hive_sync_config`` blocks,
HoodieMuiltiTableFlinkStreamer.java:186-205). The reference talks thrift to
a Hive metastore; this engine syncs the SparkSession catalog, which is what
downstream Spark SQL users of a single-cluster deployment actually query:

- database  -> ``CREATE DATABASE IF NOT EXISTS <sync_db>``
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
        Returns {"synced_instant", "new_partitions", "created"}."""
        t = self.table
        last = t.timeline.latest_completed_write()
        if last is None or last.time == self.last_synced:
            return {"synced_instant": self.last_synced,
                    "new_partitions": [], "created": False}
        created = self.last_synced is None
        spark = t.spark
        if self.sync_db and self.sync_db != "default":
            spark.sql(f"CREATE DATABASE IF NOT EXISTS {self.sync_db}")
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


def make_post_commit_sync(table, hive_sync_config: dict):
    """Build a ``post_commit`` hook for the streaming sink from the fork's
    per-table ``hive_sync_config`` JSON block ({sync_db, sync_table, ...},
    HoodieMuiltiTableFlinkStreamer.java:186-205; metastore_uris is accepted
    and ignored — the session catalog IS the metastore here)."""
    syncer = SparkCatalogSync(
        table,
        sync_db=hive_sync_config.get("sync_db", "default"),
        sync_table=hive_sync_config.get("sync_table"))
    return lambda _t: syncer.sync()
