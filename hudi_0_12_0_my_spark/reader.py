"""Query types: snapshot / read-optimized / incremental / time-travel.

Re-expression of the DefaultSource dispatch
(hudi-spark-datasource/hudi-spark-common/.../DefaultSource.scala:112-146):

  snapshot COW      -> BaseFileOnlyRelation.scala:48
  snapshot MOR      -> MergeOnReadSnapshotRelation.scala:42 +
                       HoodieMergeOnReadRDD.scala:116-132 per-task merge —
                       here: union(base, deltas) + window payload resolution,
                       which keeps the merge vectorized (SURVEY.md §4)
  read-optimized    -> DefaultSource.scala:129-132 (base files only)
  incremental       -> IncrementalRelation.scala:53-254 /
                       MergeOnReadIncrementalRelation.scala:42 (files touched by
                       commits in range + _hoodie_commit_time window filter)
  time-travel       -> TIME_TRAVEL_AS_OF_INSTANT (DataSourceOptions.scala:119):
                       file-system view as of the instant

File pruning before the scan uses the manifest's per-file column stats
(stats.py) — the data-skipping path of HoodieFileIndex.scala:111-214.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from . import config as cfgmod
from . import meta, payloads, stats as statsmod
from . import timeline as tl
from .writer import base_read_schema, delta_read_schema, read_files
from .storage import get_storage


def bootstrap_instant(timeline) -> str | None:
    """Instant of the METADATA_ONLY bootstrap commit, if any (bootstrap.py).

    Consults the ARCHIVED timeline too: the bootstrap commit is the oldest
    instant, so archival moves it out of the active timeline early in the
    table's life — and a read that then fails to detect bootstrap skips meta
    reconstruction, leaving NULL record keys that break MOR delta-key joins
    (tombstoned bootstrap rows resurrected under time travel; found by the
    randomized DAG sweep, mor/simple/bootstrap seed 203)."""
    for ins in timeline.completed(actions=(tl.COMMIT,)):
        if timeline.metadata(ins).get("operation") == "bootstrap":
            return ins.time
    for ins, md in timeline.archived():
        if md.get("operation") == "bootstrap":
            return ins.time
    return None


def fill_bootstrap_meta(spark, df: DataFrame, cfg, view, bs: str) -> DataFrame:
    """Reconstruct meta columns for rows read from bootstrapped (meta-less)
    parquet files — the vectorized equivalent of HoodieBootstrapRDD's
    skeleton-file join (HoodieBootstrapRelation.scala:55): record key from the
    keygen expression, partition/file-id from a broadcast path map keyed by
    input_file_name(), commit time = the bootstrap instant."""
    import os

    from .keygen import record_key_expr

    mapping = [(s.base_file.path, g.file_id, g.partition)
               for g, s in view.live_slices()
               if s.base_file is not None and os.path.isabs(s.base_file.path)]
    if not mapping:
        return df
    mdf = spark.createDataFrame(mapping, "__bs_path string, __bs_fid string, "
                                "__bs_part string")
    out = (df.withColumn("__fp", F.regexp_replace(F.input_file_name(),
                                                  "^file:/+", "/"))
             .join(F.broadcast(mdf), F.col("__fp") == F.col("__bs_path"), "left")
             .withColumn(meta.RECORD_KEY,
                         F.coalesce(F.col(meta.RECORD_KEY), record_key_expr(cfg)))
             .withColumn(meta.PARTITION_PATH,
                         F.coalesce(F.col(meta.PARTITION_PATH), F.col("__bs_part")))
             .withColumn(meta.COMMIT_TIME,
                         F.coalesce(F.col(meta.COMMIT_TIME), F.lit(bs)))
             .withColumn(meta.FILE_NAME,
                         F.coalesce(F.col(meta.FILE_NAME),
                                    F.concat(F.col("__bs_fid"), F.lit("_" + bs))))
             .drop("__fp", "__bs_path", "__bs_fid", "__bs_part"))
    return out


class Reader:
    def __init__(self, table):
        self.t = table

    @property
    def spark(self):
        return self.t.spark

    @property
    def cfg(self):
        return self.t.cfg

    # ------------------------------------------------------------- helpers
    def _merge_plan(self, view, slices, filters=None,
                    bs: str | None = None) -> DataFrame:
        """MOR merge: groups without deltas stream straight from their base
        file; groups with deltas split base rows by delta-key membership so
        the payload window runs ONLY over contested keys.

        Scale shape: the window (exchange + sort on key) is the expensive
        step of Hudi's merge — restricting it to |delta| + |matched base|
        rows instead of the whole table is the vectorized analogue of
        HoodieMergedLogRecordScanner's hashmap probe (only log-present keys
        are merged). The delta-key set is a distinct of the (small) delta
        files, so AQE turns the two membership joins into broadcasts when it
        fits; untouched base rows never shuffle at all.
        """
        cfg = self.cfg
        spec = payloads.get(cfg.payload)
        preds = statsmod.parse_predicates(filters)
        ab = self._allowed_buckets(preds)
        if ab is not None:
            # bucket pruning is delta-safe: a key's file group is pinned by
            # its hash, so every version (base AND delta) of a non-matching
            # key lives in a pruned group
            slices = [(g, s) for g, s in slices if g.file_id[:8] in ab]
        clean_slices = [(g, s) for g, s in slices
                        if not s.deltas_as_of(view.as_of)
                        and s.base_file is not None]
        # min/max stats pruning is only safe for groups WITHOUT deltas — a
        # delta row may carry values outside the base file's range
        clean = statsmod.prune_files(view, clean_slices, preds)
        dirty_base = [view.abs(s.base_file.path) for g, s in slices
                      if s.deltas_as_of(view.as_of) and s.base_file is not None]
        dirty_delta = [view.abs(d.path) for g, s in slices
                       for d in s.deltas_as_of(view.as_of)]
        # bootstrap meta reconstruction must wrap EACH base relation here,
        # BEFORE any union/join: input_file_name() refuses multi-source
        # plans, and the delta-key membership joins below key on meta
        # columns that are null in meta-less bootstrap files
        def _fill(df):
            return fill_bootstrap_meta(self.spark, df, cfg, view, bs) \
                if bs else df
        out = _fill(read_files(self.spark, clean, base_read_schema(cfg), cfg))
        if dirty_delta:
            base = _fill(read_files(self.spark, dirty_base,
                                    base_read_schema(cfg), cfg))
            delta = read_files(self.spark, dirty_delta, delta_read_schema(cfg), cfg)
            on = [meta.PARTITION_PATH, meta.RECORD_KEY]
            dkeys = delta.select(*on).distinct()
            untouched = base.join(dkeys, on=on, how="left_anti")
            contested = base.join(dkeys, on=on, how="left_semi")
            merged = payloads.resolve(
                contested.unionByName(delta, allowMissingColumns=True),
                cfg, spec, drop_deletes=True)
            out = (out.unionByName(untouched.select(*out.columns))
                      .unionByName(merged.select(*out.columns)))
        return out

    def _allowed_buckets(self, preds) -> set | None:
        """Bucket-index read pruning (HoodieBucketIndex query-side
        counterpart): an equality/IN predicate on the single record-key
        field pins the pmod bucket, and the bucket number IS the first 8
        chars of the file id — a point lookup then scans ONE file group per
        partition instead of num_buckets. Returns allowed file-id prefixes,
        or None when inapplicable (no bucket index, composite key, no key
        predicate, or a value whose string form may differ from the
        engine's cast — only int/str values are pinned)."""
        cfg = self.cfg
        if cfg.index_type != "bucket" or len(cfg.record_key_fields) != 1 \
                or not preds:
            return None
        keyf = cfg.record_key_fields[0]
        if preds and isinstance(preds[0], tuple):
            preds = [preds]              # legacy single conjunction
        # DNF: every disjunct must pin the key or the union is unbounded;
        # allowed buckets = union of each disjunct's pinned values
        vals: list = []
        for conj in preds:
            dv = None
            for col, op, lit in conj:
                if col == keyf and op in ("=", "==", "in"):
                    dv = list(lit) if op == "in" else [lit]
                    break
            if not dv:
                return None
            vals.extend(dv)
        if not all(isinstance(v, (int, str))
                   and not isinstance(v, bool) for v in vals):
            return None
        # xxhash64 must match the write side bit-for-bit: evaluate the same
        # JVM expression over the literal keys (one local 1-row-per-key job)
        hashed = (self.spark.createDataFrame([(str(v),) for v in vals],
                                             "k string")
                  .select(F.pmod(F.xxhash64("k"),
                                 F.lit(cfg.num_buckets)).alias("b"))
                  .collect())
        return {f"{r['b']:08d}" for r in hashed}

    def _bucket_prune(self, view, slices, preds) -> set | None:
        allowed = self._allowed_buckets(preds)
        if allowed is None:
            return None
        return {view.abs(s.base_file.path) for g, s in slices
                if s.base_file is not None and g.file_id[:8] in allowed}

    def _apply_filters(self, df: DataFrame, filters):
        if filters is None:
            return df
        if isinstance(filters, str):
            return df.filter(filters)
        return df.filter(filters)

    def _write_history(self) -> list:
        """(instant, metadata) for every write commit, archived + active,
        deduped by (time, action): a crash mid-archival leaves an instant in
        both the batch file and the active dir, and enumerating its files
        twice would duplicate every row it wrote in incremental reads."""
        hist = [(i, md) for i, md in self.t.timeline.archived()
                if i.action in tl.WRITE_ACTIONS]
        seen = {(i.time, i.action) for i, _ in hist}
        hist += [(i, self.t.timeline.metadata(i))
                 for i in self.t.timeline.completed_write_instants()
                 if (i.time, i.action) not in seen]
        # commits targeted by a PENDING rollback plan are already dead
        # (plan-then-execute: their files may be half-deleted)
        rolled = {(self.t.timeline.metadata(i) or {}).get("rolled_back_instant")
                  for i in self.t.timeline.pending()
                  if i.action == tl.ROLLBACK}
        if rolled:
            hist = [(i, md) for i, md in hist if i.time not in rolled]
        return hist

    # ----------------------------------------------------------- query API
    def snapshot(self, as_of: str | None = None, filters=None,
                 keep_meta: bool = False, key_probe: DataFrame | None = None) -> DataFrame:
        """``key_probe``: optional DataFrame with a ``_hoodie_record_key``
        column; COW base files whose key ranges no probe key intersects are
        pruned from the scan (the MERGE fast path — only file groups the
        source can touch are read; see merge.py)."""
        view = self.t.view(as_of=as_of)
        return self.snapshot_of_view(view, filters=filters,
                                     keep_meta=keep_meta, key_probe=key_probe)

    def snapshot_of_view(self, view, filters=None, keep_meta: bool = False,
                         key_probe: DataFrame | None = None,
                         partitions=None) -> DataFrame:
        """Snapshot rows of an explicit FileSystemView (optionally restricted
        to ``partitions``). Pre-commit validation reads a hypothetical
        post-write state this way: a view with the inflight commit's metadata
        folded in, before anything lands on the timeline."""
        cfg = self.cfg
        slices = view.live_slices(partitions)
        bs = bootstrap_instant(self.t.timeline)
        if cfg.table_type == cfgmod.COW:
            preds = statsmod.parse_predicates(filters)
            paths = statsmod.prune_files(view, slices, preds)
            bp = self._bucket_prune(view, slices, preds)
            if bp is not None:
                paths = [p for p in paths if p in bp]
            if key_probe is not None:
                cand = set(self.t.writer._candidate_base_files(
                    view, None, key_probe, ignore_partition=True))
                paths = [p for p in paths if p in cand]
            df = read_files(self.spark, paths, base_read_schema(cfg), cfg)
            if bs:
                df = fill_bootstrap_meta(self.spark, df, cfg, view, bs)
        else:
            # MOR fills bootstrap meta per base relation INSIDE the plan —
            # input_file_name() cannot sit above the base∪delta union
            df = self._merge_plan(view, slices, filters, bs=bs)
        df = self._apply_filters(df, filters)
        return df if keep_meta else meta.strip_meta(df)

    def read_optimized(self, filters=None, keep_meta: bool = False) -> DataFrame:
        view = self.t.view()
        slices = view.live_slices()
        # RO reads bases only, so base-file min/max pruning is always safe
        # here (deltas are ignored BY DEFINITION); bucket pruning likewise
        preds = statsmod.parse_predicates(filters)
        paths = statsmod.prune_files(view, slices, preds)
        bp = self._bucket_prune(view, slices, preds)
        if bp is not None:
            paths = [p for p in paths if p in bp]
        df = read_files(self.spark, paths, base_read_schema(self.cfg), self.cfg)
        bs = bootstrap_instant(self.t.timeline)
        if bs:
            df = fill_bootstrap_meta(self.spark, df, self.cfg, view, bs)
        df = self._apply_filters(df, filters)
        return df if keep_meta else meta.strip_meta(df)

    def time_travel(self, as_of: str, filters=None, keep_meta: bool = False) -> DataFrame:
        return self.snapshot(as_of=as_of, filters=filters, keep_meta=keep_meta)

    def incremental(self, begin: str | None = None, end: str | None = None,
                    keep_meta: bool = False, filters=None) -> DataFrame:
        """Rows whose latest version landed in commits with
        begin < instant <= end (IncrementalRelation.scala:83-86). Reads only
        files written by in-range commits (from commit metadata), then filters
        the commit-time window and resolves the latest version per key.

        `filters` mirrors the reference's extra-pushed-filters option
        (DataSourceOptions PUSH_DOWN_INCR_FILTERS): applied AFTER version
        resolution — pruning in-range files by a value predicate would be
        wrong (a key's latest version could sit in a pruned file and an
        older matching version would wrongly win); Catalyst still pushes
        whatever is safe below the window on its own."""
        cfg = self.cfg
        spec = payloads.get(cfg.payload)
        begin = begin or "0"
        # archived write instants participate with their batched metadata:
        # a begin older than the archive boundary must still enumerate the
        # archived commits' files (HoodieArchivedTimeline serves exactly
        # this; found by the randomized DAG suite when `archive` joined the
        # service mix)
        hist = self._write_history()
        in_range = [(i, md) for i, md in hist
                    if i.time > begin and (end is None or i.time <= end)]
        # file groups replaced at-or-before `end` (insert_overwrite /
        # delete_partition / clustering replacecommits): their rows are not
        # part of the latest state as of `end`, so in-range files belonging
        # to them must NOT resurrect (the replacing commit's own files carry
        # any surviving rows with their original commit times). Found by the
        # randomized DAG suite; reference behavior per IncrementalRelation's
        # replace-aware file listing.
        replaced: set = set()
        for ins, md in hist:
            if end is not None and ins.time > end:
                continue
            for p, fids in ((md or {}).get("replaced_file_groups") or {}).items():
                replaced.update((p, f) for f in fids)
        # Per file group, only the NEWEST in-range base file is scanned
        # (IncrementalRelation's fileIdToFullPath map, where later commits
        # overwrite earlier entries): a COW rewrite carries every surviving
        # row forward with its original commit time, so older slices add
        # nothing — and a row deleted by a later rewrite must NOT resurrect
        # from the stale slice (found by the randomized DAG suite). Delta
        # files all participate (their rows resolve by version).
        base_latest: dict = {}    # (partition, file_id) -> (instant, path)
        delta_candidates = []
        for ins, md in in_range:
            for partition, sts in ((md or {}).get("partition_to_write_stats") or {}).items():
                for st in sts:
                    if (partition, st.get("file_id")) in replaced:
                        continue
                    p = self.t.abs(st["path"])
                    if st.get("kind", "base") == "base":
                        key = (partition, st.get("file_id"))
                        prev = base_latest.get(key)
                        if prev is None or ins.time > prev[0]:
                            base_latest[key] = (ins.time, p)
                    else:
                        delta_candidates.append(p)
        # ONE batched existence probe (listdir per touched partition dir,
        # not an exists() round-trip per file) detects files the cleaner
        # removed since their commit
        wanted = set(delta_candidates) | {p for _t, p in base_latest.values()}
        present = get_storage(self.t.base_path).exists_many(wanted) \
            if wanted else set()
        missing = len(present) < len(wanted)
        delta_paths = [p for p in delta_candidates if p in present]
        base_paths = [p for _t, p in base_latest.values() if p in present]
        if missing:
            # Fallback-to-full-scan (IncrementalRelation.scala:199-254): an
            # in-range file was cleaned, so a row whose latest in-range version
            # lived in it would silently VANISH from the file-list plan (its
            # newer version may be outside the range). The snapshot as of
            # `end` + commit-time window is always correct: each surviving row
            # carries the commit time of its latest version <= end.
            try:
                snap = self.snapshot(as_of=end, keep_meta=True)
            except ValueError:
                # cleaning also removed pre-`end` history: the reference falls
                # back to the LATEST snapshot + window filter (rows updated
                # after `end` drop out — their commit time is newer)
                snap = self.snapshot(keep_meta=True)
            cond = F.col(meta.COMMIT_TIME) > F.lit(begin)
            if end is not None:
                cond = cond & (F.col(meta.COMMIT_TIME) <= F.lit(end))
            df = self._apply_filters(snap.filter(cond), filters)
            return df if keep_meta else meta.strip_meta(df)
        df = read_files(self.spark, sorted(set(base_paths)), base_read_schema(cfg), cfg)
        bs = bootstrap_instant(self.t.timeline)
        if bs:
            # bootstrap files carry no meta columns; without reconstruction
            # their rows would fail the commit-time window below and vanish.
            # Fill BEFORE the delta union (input_file_name is single-source).
            df = fill_bootstrap_meta(self.spark, df, cfg,
                                     self.t.view(as_of=end), bs)
        if delta_paths:
            df = df.unionByName(
                read_files(self.spark, sorted(set(delta_paths)), delta_read_schema(cfg), cfg),
                allowMissingColumns=True)
        cond = F.col(meta.COMMIT_TIME) > F.lit(begin)
        if end is not None:
            cond = cond & (F.col(meta.COMMIT_TIME) <= F.lit(end))
        df = payloads.resolve(df.filter(cond), cfg, spec, drop_deletes=True)
        df = self._apply_filters(df, filters)
        return df if keep_meta else meta.strip_meta(df)

    def incremental_cdc(self, begin: str | None = None,
                        end: str | None = None,
                        columns: list | None = None) -> DataFrame:
        """Change-data-capture diff between two instants: one row per key
        whose RESOLVED state differs between the table as-of `begin` and
        as-of `end` — op `i` (inserted), `u` (updated: before+after), `d`
        (deleted). Unlike `incremental`, this surfaces deletes and before
        images; unlike log-based CDC (Hudi 0.13's cdc.enabled write path,
        out of scope for the 0.12 reference), it is a read-side
        reconstruction: correct for any table, no write-path cooperation.

        ``columns`` narrows the before/after structs (and the change test)
        to just those business columns: the scans project fewer bytes into
        the diff exchange and rows whose changes lie entirely OUTSIDE the
        subset emit nothing. For consumers that only read a column subset
        and treat an unchanged-subset row as a no-op (every linear fold —
        the derived-table maintainers), the result is equivalent and far
        cheaper; consumers that need "did anything change" must keep the
        default full width.

        Scale shape: only partitions TOUCHED by in-range commits (write
        stats + replaced-group metadata) are scanned — twice (state at each
        boundary) — and the diff is one full-outer join shuffled on the
        record key, bounded by the touched partitions' size, never the
        table. Rows rewritten with identical values (clustering, re-upsert
        of the same payload) compare equal and emit nothing.
        """
        old, new = self._boundary_states(begin or "0", end)
        cfg = self.cfg
        # non-global tables scope key uniqueness to the partition; global
        # index lets a key move across partitions and still be ONE entity
        keys = [meta.RECORD_KEY] if cfg.global_index \
            else [meta.PARTITION_PATH, meta.RECORD_KEY]
        data_cols = sorted(c for c in new.columns
                           if c not in meta.META_COLS
                           and c not in (meta.OPERATION, meta.TARGET_FILE_ID))
        if columns is not None:
            unknown = sorted(set(columns) - set(data_cols))
            if unknown:
                raise ValueError(
                    f"incremental_cdc: columns {unknown} are not business "
                    f"columns of this table (have: {data_cols})")
            data_cols = sorted(set(columns))
        pack = F.struct(*[F.col(c) for c in data_cols])
        o = old.select(*keys, pack.alias("before"))
        n = new.select(*keys, pack.alias("after"))
        j = o.join(n, on=keys, how="full_outer")
        op = (F.when(F.col("before").isNull(), F.lit("i"))
               .when(F.col("after").isNull(), F.lit("d"))
               .otherwise(F.lit("u")))
        return (j.filter(~F.col("before").eqNullSafe(F.col("after")))
                 .select(op.alias("op"), *keys, "before", "after"))

    def _boundary_states(self, begin: str, end: str | None,
                         context: str = "incremental_cdc"
                         ) -> tuple[DataFrame, DataFrame]:
        """The table's resolved state at `begin` and at `end`, scoped to
        the partitions TOUCHED by in-range commits (write stats +
        replaced-group metadata) — the shared prelude of the CDC diff and
        the contributions fold. Refuses a `begin` outside cleaning
        retention (the view would reconstruct EMPTY and the diff would
        silently report the whole table as inserts — observed; same
        constraint as the reference's CDC read)."""
        if begin != "0":
            for ins in self.t.timeline.completed(actions=(tl.CLEAN,)):
                er = (self.t.timeline.metadata(ins) or {}) \
                    .get("earliest_retained_instant")
                if er and er > begin:
                    raise ValueError(
                        f"{context}: state as-of begin={begin} is no "
                        f"longer reconstructable — cleaning retained only "
                        f"instants >= {er}; choose begin within retention")
        # archived write instants count too: a begin older than the archive
        # boundary must still see the archived commits' touched partitions
        hist = self._write_history()
        instants = [i for i, _md in hist
                    if i.time > begin and (end is None or i.time <= end)]
        touched: set[str] = set()
        for ins, md in hist:
            if ins.time <= begin or (end is not None and ins.time > end):
                continue
            touched |= set(((md or {}).get("partition_to_write_stats") or {}).keys())
            touched |= set(((md or {}).get("replaced_file_groups") or {}).keys())

        def _scope(df):
            # restrict to touched partitions; beyond a few hundred the
            # literal In-list bloats the plan, so switch to a broadcast
            # semi-join on a partitions DataFrame (still metadata-sized)
            if len(touched) <= 256:
                return df.filter(F.col(meta.PARTITION_PATH).isin(*touched))
            pdf = self.spark.createDataFrame(
                [(p,) for p in sorted(touched)], f"{meta.PARTITION_PATH} string")
            return df.join(F.broadcast(pdf), on=meta.PARTITION_PATH,
                           how="left_semi")

        new = self.snapshot(as_of=end, keep_meta=True)
        if not instants:
            # nothing committed in range: provably empty diff — the false
            # filter folds to an empty LocalRelation, no files are scanned
            new = new.filter(F.lit(False))
        elif touched:
            new = _scope(new)
        try:
            old = self.snapshot(as_of=begin, keep_meta=True) if begin != "0" \
                else new.filter(F.lit(False))
        except ValueError:     # begin predates the first surviving instant
            old = new.filter(F.lit(False))
        if not instants:
            old = old.filter(F.lit(False))
        elif touched:
            old = _scope(old)
        return old, new

    def incremental_contributions(self, begin: str | None = None,
                                  end: str | None = None,
                                  columns: list | None = None) -> DataFrame:
        """The CDC window as a SIGNED MULTISET of rows over `columns`:
        +1-weighted rows of the state as-of `end` minus (-1-weighted) rows
        of the state as-of `begin`, scoped to touched partitions — columns
        `_sign` + `columns` (default: every business column).

        For any LINEAR fold (SUM / COUNT maintenance — the derived-table
        maintainers), this is mathematically equal to folding the signed
        per-key CDC diff: unchanged rows contribute +x and -x which cancel
        in the aggregate. The plan shape is the win — the per-key diff
        costs a full-outer join (an Exchange of BOTH boundary states on
        the record key, evaluated once per ±branch) just to DROP the
        no-op rows that the aggregate would cancel anyway; the
        contributions fold has NO join and NO key exchange, so the only
        shuffle left is the consumer's own (partial-aggregated) groupBy.
        NOT for consumers that need per-key semantics (op classification,
        before/after pairing) — use incremental_cdc there.
        """
        old, new = self._boundary_states(begin or "0", end,
                                         "incremental_contributions")
        data_cols = sorted(c for c in new.columns
                           if c not in meta.META_COLS
                           and c not in (meta.OPERATION, meta.TARGET_FILE_ID))
        if columns is not None:
            unknown = sorted(set(columns) - set(data_cols))
            if unknown:
                raise ValueError(
                    f"incremental_contributions: columns {unknown} are not "
                    f"business columns of this table (have: {data_cols})")
            data_cols = sorted(set(columns))
        plus = new.select(F.lit(1).alias("_sign"), *data_cols)
        minus = old.select(F.lit(-1).alias("_sign"), *data_cols)
        return plus.unionByName(minus)
