"""File-system view: fold of completed timeline instants into live file slices.

Re-expression of Hudi's AbstractTableFileSystemView / HoodieTableFileSystemView
(hudi-common/.../table/view/AbstractTableFileSystemView.java, 1180 LoC) plus the
metadata-table ``files`` partition (HoodieBackedTableMetadata.java): instead of
listing the filesystem or running an embedded timeline server
(hudi-timeline-service/.../TimelineService.java), the view is reconstructed from
completed-commit metadata on the driver — driver-side metadata only, no data IO.
At 100 TB the same fold runs over an archived-manifest parquet (see
services/archival.py) so the active timeline stays O(retained commits).

Concepts (hudi-common/.../model/HoodieFileGroup.java, FileSlice.java):
  file group  = (partition_path, file_id), stable across rewrites
  file slice  = one base file + ordered delta files, keyed by base instant
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from . import timeline as tl


@dataclass
class FileInfo:
    path: str          # relative to table base path
    instant: str
    records: int = 0
    bytes: int = 0
    col_stats: dict = field(default_factory=dict)   # {col: {min,max,nulls}}


@dataclass
class FileSlice:
    base_instant: str
    base_file: FileInfo | None = None
    deltas: list = field(default_factory=list)      # list[FileInfo], instant-ordered

    @property
    def delta_bytes(self) -> int:
        return sum(d.bytes for d in self.deltas)

    def deltas_as_of(self, as_of: str | None):
        if as_of is None:
            return self.deltas
        return [d for d in self.deltas if d.instant <= as_of]


@dataclass
class FileGroup:
    partition: str
    file_id: str
    slices: list = field(default_factory=list)      # sorted by base_instant asc
    replaced_at: str | None = None                  # replacecommit instant

    def latest_slice(self, as_of: str | None = None) -> FileSlice | None:
        live = [s for s in self.slices
                if (as_of is None or s.base_instant <= as_of) and s.base_file is not None]
        return live[-1] if live else None


class FileSystemView:
    def __init__(self, base_path: str, timeline: tl.Timeline, as_of: str | None = None,
                 upto: str | None = None):
        # `as_of` = read-time time travel (writes above it stay in the fold but
        # are filtered by latest_slice/live_groups); `upto` = hard fold bound —
        # instants above it never enter the fold at all. Archival uses `upto`
        # to checkpoint the state exactly at the archive boundary.
        self.base_path = base_path
        self.as_of = as_of
        self.groups: dict = {}          # (partition, file_id) -> FileGroup
        self.savepointed_files: set = set()
        self.earliest_retained: str | None = None
        # manifest checkpoint (services/archival.py): normal reads start from
        # the checkpointed fold state; only deep time travel replays archives
        from .services.archival import latest_manifest
        manifest = latest_manifest(base_path)
        if manifest and (as_of is None or as_of >= manifest["instant"]) \
                and (upto is None or upto >= manifest["instant"]):
            self._load_checkpoint(manifest)
            stream = [(i, None) for i in timeline.completed()
                      if i.time > manifest["instant"]]
        else:
            # dedupe by (time, action): a crash between writing an archived
            # batch and unlinking the active instants leaves both copies, and
            # folding an instant twice duplicates its slices
            stream = timeline.archived() + [(i, None) for i in timeline.completed()]
            stream.sort(key=lambda im: (im[0].time, im[0].action))
            seen: set = set()
            stream = [(i, md) for i, md in stream
                      if not ((i.time, i.action) in seen
                              or seen.add((i.time, i.action)))]
        # PENDING clean plans fold like completed cleans, and commits
        # targeted by a PENDING rollback plan are hidden: plan-then-execute
        # means planned files may already be deleted even though the
        # service instant hasn't completed — readers must treat the whole
        # plan as applied (services/cleaner.py, services/rollback.py;
        # found by the crash-injection sweep)
        pend = timeline.pending()
        rolled = set()
        for i in pend:
            if i.action == tl.ROLLBACK:
                rolled.add((timeline.metadata(i) or {})
                           .get("rolled_back_instant"))
        if rolled:
            stream = [(i, md) for i, md in stream
                      if not (i.action in tl.WRITE_ACTIONS
                              and i.time in rolled)]
        stream += [(i, None) for i in pend if i.action == tl.CLEAN]
        if upto is not None:
            stream = [(i, md) for i, md in stream if i.time <= upto]
        self._fold(timeline, stream)

    def _load_checkpoint(self, manifest: dict) -> None:
        for gd in manifest["groups"]:
            g = FileGroup(gd["partition"], gd["file_id"])
            g.replaced_at = gd.get("replaced_at")
            for sd in gd["slices"]:
                bf = sd.get("base_file")
                s = FileSlice(sd["base_instant"],
                              FileInfo(**bf) if bf else None,
                              [FileInfo(**d) for d in sd.get("deltas", [])])
                g.slices.append(s)
            self.groups[(g.partition, g.file_id)] = g
        self.savepointed_files = set(manifest.get("savepointed_files", []))
        self.earliest_retained = manifest.get("earliest_retained")

    # ------------------------------------------------------------------ fold
    def _group(self, partition: str, file_id: str) -> FileGroup:
        key = (partition, file_id)
        if key not in self.groups:
            self.groups[key] = FileGroup(partition, file_id)
        return self.groups[key]

    def _fold(self, timeline: tl.Timeline, stream) -> None:
        for ins, md_pre in stream:
            md = None
            if ins.action in tl.WRITE_ACTIONS:
                if self.as_of is not None and ins.time > self.as_of:
                    continue
                md = md_pre if md_pre is not None else timeline.metadata(ins)
                for partition, stats in (md.get("partition_to_write_stats") or {}).items():
                    for st in stats:
                        fi = FileInfo(st["path"], ins.time, st.get("records", 0),
                                      st.get("bytes", 0), st.get("col_stats", {}))
                        g = self._group(partition, st["file_id"])
                        if st.get("kind", "base") == "base":
                            g.slices.append(FileSlice(ins.time, fi))
                            g.slices.sort(key=lambda s: s.base_instant)
                        else:  # delta file appended to the latest slice at/below it
                            target = None
                            for s in g.slices:
                                if s.base_instant <= ins.time:
                                    target = s
                            if target is None:   # log-only group (no base yet)
                                target = FileSlice(ins.time, None)
                                g.slices.append(target)
                                g.slices.sort(key=lambda s: s.base_instant)
                            target.deltas.append(fi)
                for partition, fids in (md.get("replaced_file_groups") or {}).items():
                    for fid in fids:
                        self._group(partition, fid).replaced_at = ins.time
            elif ins.action == tl.CLEAN:
                # cleans apply regardless of as_of: the files are physically gone
                md = md_pre if md_pre is not None else timeline.metadata(ins)
                removed = set()
                for paths in (md.get("removed_files") or {}).values():
                    removed.update(paths)
                er = md.get("earliest_retained_instant")
                if er and (self.earliest_retained is None or er > self.earliest_retained):
                    self.earliest_retained = er
                for g in self.groups.values():
                    for s in list(g.slices):
                        if s.base_file is not None and s.base_file.path in removed:
                            g.slices.remove(s)
                        else:
                            s.deltas = [d for d in s.deltas if d.path not in removed]
            elif ins.action == tl.SAVEPOINT:
                md = md_pre if md_pre is not None else timeline.metadata(ins)
                for paths in (md.get("files") or {}).values():
                    self.savepointed_files.update(paths)
        if self.as_of is not None and self.earliest_retained and self.as_of < self.earliest_retained:
            raise ValueError(
                f"time-travel to {self.as_of} impossible: cleaner retained only "
                f">= {self.earliest_retained} (HoodieCleaningPolicy)")

    # ----------------------------------------------------------------- reads
    def live_groups(self, partitions=None):
        for (p, fid), g in sorted(self.groups.items()):
            if partitions is not None and p not in partitions:
                continue
            if g.replaced_at is not None and (self.as_of is None or g.replaced_at <= self.as_of):
                continue
            yield g

    def live_slices(self, partitions=None):
        """-> list[(FileGroup, FileSlice)] of the latest live slice per group."""
        out = []
        for g in self.live_groups(partitions):
            s = g.latest_slice(self.as_of)
            if s is not None:
                out.append((g, s))
        return out

    def live_base_files(self, partitions=None) -> list[str]:
        return [self.abs(s.base_file.path) for _, s in self.live_slices(partitions)]

    def partitions(self) -> list[str]:
        return sorted({g.partition for g in self.live_groups()})

    def abs(self, rel: str) -> str:
        return os.path.join(self.base_path, rel)

    def stats_rows(self):
        """Per live base file: flat rows for the column-stats manifest
        (ColumnStatsIndexSupport.scala:109 transpose equivalent)."""
        for g, s in self.live_slices():
            bf = s.base_file
            yield {"partition": g.partition, "file_id": g.file_id, "path": bf.path,
                   "records": bf.records, "bytes": bf.bytes, "col_stats": bf.col_stats,
                   "has_deltas": bool(s.deltas)}
