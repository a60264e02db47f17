"""Incremental materialized-view maintenance off the CDC feed.

A derived rollup table (distributive aggregates: SUM / COUNT per group) is
kept in sync with its source lake table by folding the read-side CDC diff
(reader.incremental_cdc) instead of recomputing the aggregate:

    inserts contribute +after, deletes -before, updates -before +after —
    so a row that moves between groups debits its old group and credits the
    new one. Groups whose maintained count reaches zero are tombstoned.

This is the lakehouse "derived pipeline" pattern: the same machinery a
100 TB deployment uses to keep hourly/board-level aggregates fresh without
re-scanning the fact table.  Scale shape per sync: ONE cdc read (touched
file groups only) -> delta aggregate (shuffle on the group key, map-side
combine) -> key-join against the CURRENT rollup rows of affected groups ->
one upsert of |affected groups| rows.  Nothing source-sized is rewritten.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from . import meta
from .storage import get_storage

_CKPT = "rollup_checkpoint"


def scd2_history(src, key_cols: list[str], value_cols: list[str]):
    """Slowly-changing-dimension (type 2) history of a lake table: one row
    per key VERSION with its validity interval in commit time —
    (key..., value..., valid_from, valid_to), valid_to NULL for the live
    version.  Built from the engine's own change feed: the first commit's
    snapshot opens the initial intervals, each subsequent commit's CDC diff
    opens a new version on insert/update and closes the previous one
    (a delete closes without opening — the tombstone acts purely as the
    interval boundary).

    Scale shape: one time-travel scan of the FIRST commit plus one
    touched-group-scoped CDC diff per later commit (commit count is a
    table-maintenance quantity, not a data quantity), then a single window
    over key versions — the lead() that assigns each version its successor's
    commit time. Nothing is ever joined pairwise.
    """
    from pyspark.sql import Window

    commits = [i.time for i in src.timeline.completed_write_instants()]
    if not commits:
        raise ValueError("scd2_history: table has no completed writes")
    cols = list(key_cols) + list(value_cols)
    parts = [src.time_travel(commits[0]) if len(commits) > 1 else src.snapshot()]
    parts[0] = (parts[0].select(*cols)
                .withColumn("_vf", F.lit(commits[0]))
                .withColumn("_opens", F.lit(True)))
    for a, b in zip(commits, commits[1:]):
        cdc = src.incremental_cdc(a, b)
        opens = (cdc.filter(F.col("op").isin("i", "u"))
                 .select(*[F.col(f"after.{c}").alias(c) for c in cols])
                 .withColumn("_vf", F.lit(b))
                 .withColumn("_opens", F.lit(True)))
        closes = (cdc.filter(F.col("op") == "d")
                  .select(*[F.col(f"before.{c}").alias(c) for c in cols])
                  .withColumn("_vf", F.lit(b))
                  .withColumn("_opens", F.lit(False)))
        parts.append(opens.unionByName(closes))
    evs = parts[0]
    for p in parts[1:]:
        evs = evs.unionByName(p)
    w = Window.partitionBy(*key_cols).orderBy("_vf")
    return (evs.withColumn("valid_to", F.lead("_vf").over(w))
            .filter(F.col("_opens"))
            .select(*cols, F.col("_vf").alias("valid_from"), "valid_to"))


def _ckpt_path(dst) -> str:
    return os.path.join(dst.base_path, ".hoodie", _CKPT)


def rollup_checkpoint(dst) -> str | None:
    """Source checkpoint of a derived table. Stored in the dst commit's
    extra_metadata (the DeltaStreamer checkpoint pattern,
    HoodieDeltaStreamer CHECKPOINT_KEY) so checkpoint and data advance in
    ONE atomic commit — a crash can never leave a committed fold with a
    stale checkpoint (which would re-fold the same CDC window and
    double-apply deltas). Falls back to the legacy side-file for tables
    written before this scheme."""
    for ins in reversed(dst.timeline.completed_write_instants()):
        ck = (dst.timeline.metadata(ins).get("extra_metadata") or {}).get(_CKPT)
        if ck:
            return ck
    st = get_storage(dst.base_path)
    p = _ckpt_path(dst)
    if not st.exists(p):
        return None
    return st.read_bytes(p).decode().strip() or None


def _signed_cdc(cdc, cols: list[str]):
    """CDC diff as +-1-weighted rows over `cols`: -before for u/d,
    +after for i/u — the fold every incremental maintainer shares."""
    minus = (cdc.filter(F.col("op").isin("u", "d"))
             .select(F.lit(-1).alias("_sign"), F.col("before").alias("_r")))
    plus = (cdc.filter(F.col("op").isin("i", "u"))
            .select(F.lit(1).alias("_sign"), F.col("after").alias("_r")))
    return minus.unionByName(plus).select(
        "_sign", *[F.col(f"_r.{c}").alias(c) for c in cols])


def _merge_group_deltas(dst, deltas, gcols: list[str],
                        sum_cols: dict[str, str], ckpt: dict) -> None:
    """Fold an |affected groups|-sized delta aggregate (columns: gcols +
    sum_cols outputs + n_rows, additively signed) into dst: coalesce
    against the current rows of affected groups, tombstone groups whose
    maintained count reaches zero, commit with the checkpoint metadata —
    the delta-merge every incremental rollup maintainer shares.

    `deltas` lineage is typically the whole CDC diff; persist it here or
    the diff would be recomputed for the semi-join probe, the merge join,
    AND the upsert's evaluation."""
    deltas = deltas.persist()
    try:
        cur = dst.snapshot().join(deltas.select(*gcols).distinct(),
                                  on=gcols, how="left_semi")
        cur = cur.select(*gcols,
                         *[F.col(o).alias(f"__old_{o}") for o in sum_cols],
                         F.col("n_rows").alias("__old_n"))
        merged = (deltas.join(cur, on=gcols, how="left")
                  .select(*gcols,
                          *[(F.coalesce(F.col(f"__old_{o}"), F.lit(0.0))
                             + F.col(o)).alias(o) for o in sum_cols],
                          (F.coalesce(F.col("__old_n"), F.lit(0))
                           + F.col("n_rows")).cast("bigint")
                          .alias("n_rows"))
                  .withColumn(meta.DELETE_MARKER, F.col("n_rows") <= 0))
        dst.writer.set_extra_metadata(ckpt)
        dst.upsert(merged)
    finally:
        deltas.unpersist()


def _guard_reconstructable(table, at: str, ctx: str) -> None:
    """Refuse a time-travel read whose target instant predates the cleaning
    retention boundary — the view would silently reconstruct EMPTY (the
    same loud-refusal contract as reader.incremental_cdc)."""
    from . import timeline as tl

    for ins in table.timeline.completed(actions=(tl.CLEAN,)):
        er = (table.timeline.metadata(ins) or {})             .get("earliest_retained_instant")
        if er and er > at:
            raise ValueError(
                f"{ctx}: state as-of {at} is no longer reconstructable — "
                f"cleaning retained only instants >= {er}")


def sync_rollup(src, dst, group_cols: list[str], sum_cols: dict[str, str],
                end: str | None = None) -> str | None:
    """Advance `dst` (record-keyed by group_cols, columns = group_cols +
    sum_cols keys + `n_rows`) to cover src commits up to `end` (default: the
    source's latest completed write). Returns the new checkpoint instant, or
    None when already current.

    First sync folds the full source snapshot (as of `end`); later syncs
    fold only the CDC diff (begin = stored checkpoint). Group columns must
    be non-null (they form the record key).
    """
    last = src.timeline.latest_completed_write()
    if last is None:
        return None
    end = end or last.time
    begin = rollup_checkpoint(dst)
    if begin is not None and begin >= end:
        return None

    gcols = list(group_cols)
    if begin is None:
        snap = src.time_travel(end) if end != last.time else src.snapshot()
        # no tombstone column on the FIRST write: it would register as a
        # business column in the fresh table's schema (writer.prepare infers
        # the marker's role from the registered schema), and a full-snapshot
        # aggregate can't produce empty groups anyway
        merged = snap.groupBy(*gcols).agg(
            *[F.sum(F.col(s).cast("double")).alias(o)
              for o, s in sum_cols.items()],
            F.count(F.lit(1)).cast("bigint").alias("n_rows"))
    else:
        # signed-contributions fold, NOT the per-key CDC diff: for a SUM the
        # diff's full-outer join (two boundary-state exchanges on the record
        # key, one per ±branch of _signed_cdc) exists only to drop no-op
        # rows — which the aggregate cancels anyway (+x + -x = 0). The
        # contributions shape scans the same two boundary states, projects
        # ONLY the group+measure columns, and goes straight into the
        # map-side-partial groupBy: the only exchange left is |groups|-sized
        contrib = src.incremental_contributions(
            begin, end, gcols + list(dict.fromkeys(sum_cols.values())))
        deltas = contrib.groupBy(*gcols).agg(
            *[F.sum(F.col("_sign") * F.col(s).cast("double")).alias(o)
              for o, s in sum_cols.items()],
            F.sum("_sign").cast("bigint").alias("n_rows"))
        _merge_group_deltas(dst, deltas, gcols, sum_cols, {_CKPT: end})
        return end
    dst.writer.set_extra_metadata({_CKPT: end})
    dst.upsert(merged)
    return end


def sync_minhash_index(src, dst, text_col: str = "text",
                       id_col: str = "doc_id", num_hashes: int = 32,
                       bands: int = 8, shingle_k: int = 5,
                       hash_fn: str = "xxhash64",
                       end: str | None = None) -> str | None:
    """Advance `dst` (record-keyed by id_col; columns id, sig, buckets —
    operators.dedup.minhash_index_rows) to cover src commits up to `end`.
    Returns the new checkpoint instant, or None when already current.

    First sync signatures the full snapshot; later syncs re-signature ONLY
    the CDC diff's changed documents (inserts/updates re-hash their after
    image, deletes tombstone the index row). This keeps a 100 TB corpus's
    LSH state warm at the cost of each increment, so
    operators.dedup.dedup_against_index never re-reads corpus text.
    The checkpoint file is the same derived-table checkpoint sync_rollup
    uses (one deriver per derived table).
    """
    from .operators.dedup import minhash_index_rows

    last = src.timeline.latest_completed_write()
    if last is None:
        return None
    end = end or last.time
    begin = rollup_checkpoint(dst)
    if begin is not None and begin >= end:
        return None

    kw = dict(text_col=text_col, id_col=id_col, num_hashes=num_hashes,
              bands=bands, shingle_k=shingle_k, hash_fn=hash_fn)
    if begin is None:
        snap = src.time_travel(end) if end != last.time else src.snapshot()
        dst.writer.set_extra_metadata({_CKPT: end})
        dst.upsert(minhash_index_rows(snap, **kw))
    else:
        # narrowed: the signature depends only on (id, text) — a change
        # confined to other source columns re-derives the identical index
        # row, so the narrowed diff (which skips such rows entirely) is
        # equivalent and avoids re-hashing untouched text
        cdc = src.incremental_cdc(begin, end, columns=[id_col, text_col])
        changed = (cdc.filter(F.col("op").isin("i", "u"))
                   .select(F.col(f"after.{id_col}").alias(id_col),
                           F.col(f"after.{text_col}").alias(text_col)))
        upserts = minhash_index_rows(changed, **kw) \
            .withColumn(meta.DELETE_MARKER, F.lit(False))
        dels = (cdc.filter(F.col("op") == "d")
                .select(F.col(f"before.{id_col}").alias(id_col),
                        F.lit(None).cast("array<bigint>").alias("sig"),
                        F.lit(None).cast("array<bigint>").alias("buckets"),
                        F.lit(True).alias(meta.DELETE_MARKER)))
        dst.writer.set_extra_metadata({_CKPT: end})
        dst.upsert(upserts.unionByName(dels))
    return end


# --------------------------------------------------------------- IVF index
_IVF_CENTS = "ivf_centroids.json"


def _ivf_cents_path(dst) -> str:
    return os.path.join(dst.base_path, ".hoodie", _IVF_CENTS)


def load_ivf_centroids(spark, dst):
    """(cell, centroid) DataFrame from the centroids frozen at first sync."""
    from .util import read_json
    doc = read_json(_ivf_cents_path(dst))
    return spark.createDataFrame(
        [(int(c), [float(x) for x in v]) for c, v in doc["centroids"]],
        "cell int, centroid array<float>")


def sync_ivf_index(src, dst, num_cells: int = 16, id_col: str = "vec_id",
                   vec_col: str = "embedding", seed: int = 42,
                   end: str | None = None) -> str | None:
    """Advance `dst` — a lake table PARTITIONED BY IVF cell, record-keyed by
    `id_col`, columns (id, vec, cell) — to cover src commits up to `end`.
    The stream-maintained vector-index counterpart of sync_minhash_index.

    First sync samples centroids from the snapshot (assign_ivf_cells),
    freezes them at dst/.hoodie/ivf_centroids.json (IVF lists are trained
    once; incremental updates assign onto the frozen ring of cells), and
    loads the full assignment. Later syncs fold ONLY the CDC diff: changed
    vectors re-assign to the frozen centroids; a vector whose nearest cell
    MOVED is expressed as tombstone(old cell) + insert(new cell), and
    deletes tombstone their before-image's cell — so the per-cell
    partitions stay exact without a global index. Checkpointing rides the
    same atomic extra_metadata scheme as sync_rollup.

    Scale shape per sync: one CDC read (touched groups only) -> broadcast
    argmin over num_cells centroids (map-only) -> one upsert of |changed|
    rows into their cell partitions. ANN queries then prune to nprobe cell
    partitions via ivf_index_search.
    """
    from .operators.similarity import assign_ivf_cells, assign_to_centroids
    from .util import atomic_write_json

    last = src.timeline.latest_completed_write()
    if last is None:
        return None
    end = end or last.time
    begin = rollup_checkpoint(dst)
    if begin is not None and begin >= end:
        return None

    spark = src.spark
    if begin is None:
        snap = src.time_travel(end) if end != last.time else src.snapshot()
        assigned, cents = assign_ivf_cells(snap.select(id_col, vec_col),
                                           num_cells=num_cells,
                                           id_col=id_col, vec_col=vec_col,
                                           seed=seed)
        atomic_write_json(_ivf_cents_path(dst), {
            "num_cells": num_cells, "seed": seed,
            "centroids": [[r["cell"], [float(x) for x in r["centroid"]]]
                          for r in cents.collect()]})
        dst.writer.set_extra_metadata({_CKPT: end})
        dst.upsert(assigned)
        return end

    cents = load_ivf_centroids(spark, dst)
    # narrowed: re-assignment depends only on (id, vector) — a change
    # confined to other source columns re-derives the identical index row
    # (and no stale-cell tombstone), so the narrowed diff is equivalent
    # and projects/joins only the two needed columns
    cdc = src.incremental_cdc(begin, end, columns=[id_col, vec_col])
    after = (cdc.filter(F.col("op").isin("i", "u"))
             .select(F.col(f"after.{id_col}").alias(id_col),
                     F.col(f"after.{vec_col}").alias(vec_col)))
    upserts = (assign_to_centroids(after, cents, id_col, vec_col)
               .withColumn(meta.DELETE_MARKER, F.lit(False)))
    # before-images that no longer own their old cell: deletes, plus
    # updates whose nearest centroid changed (assign the before vector to
    # find the cell its stale row sits in)
    before = (cdc.filter(F.col("op").isin("u", "d"))
              .select(F.col("op"),
                      F.col(f"before.{id_col}").alias(id_col),
                      F.col(f"before.{vec_col}").alias(vec_col)))
    old = assign_to_centroids(before, cents, id_col, vec_col) \
        .withColumnRenamed("cell", "old_cell")
    stale = (old.join(upserts.select(id_col,
                                     F.col("cell").alias("new_cell")),
                      id_col, "left")
             .filter((F.col("op") == "d")
                     | (F.col("old_cell") != F.col("new_cell")))
             .select(F.col(id_col),
                     F.lit(None).cast("array<float>").alias(vec_col),
                     F.col("old_cell").alias("cell"),
                     F.lit(True).alias(meta.DELETE_MARKER)))
    dst.writer.set_extra_metadata({_CKPT: end})
    dst.upsert(upserts.unionByName(stale))
    return end


def ivf_index_search(dst, queries, k: int = 10, nprobe: int = 4,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding"):
    """ANN top-k against a sync_ivf_index table: rank the frozen centroids
    per query, take the nprobe best cells, and scan ONLY those cell
    partitions (manifest-level partition pruning via snapshot filters — at
    100 TB the scan touches nprobe/num_cells of the index). Output
    (query_id, neighbor_id, rank), deterministic tie-breaks; exact when
    nprobe == num_cells."""
    from pyspark.sql import Window as W
    from .operators.similarity import _dot, _norm

    spark = dst.spark
    cents = load_ivf_centroids(spark, dst)
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("qvec"))
    qs = q.crossJoin(F.broadcast(cents))
    qsim = _dot(F.col("qvec"), F.col("centroid")) / \
        (_norm(F.col("qvec")) * _norm(F.col("centroid")))
    wq = W.partitionBy("query_id").orderBy(F.desc("_qs"), F.asc("cell"))
    probe = (qs.withColumn("_qs", qsim)
               .withColumn("_rn", F.row_number().over(wq))
               .filter(F.col("_rn") <= nprobe)
               .select("query_id", "qvec", "cell"))
    cells = sorted({r["cell"] for r in probe.select("cell")
                    .distinct().collect()})          # <= num_cells values
    idx = dst.snapshot(filters=f"cell in ({','.join(map(str, cells))})") \
        .select(F.col(id_col).alias("neighbor_id"),
                F.col(vec_col).alias("cvec"), "cell")
    j = idx.join(F.broadcast(probe), "cell")
    sim = _dot(F.col("qvec"), F.col("cvec")) / \
        (_norm(F.col("qvec")) * _norm(F.col("cvec")))
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"),
                                          F.asc("neighbor_id"))
    return (j.filter(F.col("neighbor_id") != F.col("query_id"))
             .withColumn("cosine", sim)
             .withColumn("rank", F.row_number().over(w))
             .filter(F.col("rank") <= k)
             .select("query_id", "neighbor_id", "rank"))


# --------------------------------------------------- incremental CMS sketch
_CMS_PARAMS = "cms_sketch_params"


def cms_sketch_params(dst) -> dict | None:
    """Sketch geometry of a maintained CMS table (recorded on first sync,
    immutable afterwards — folding deltas hashed with different seeds/width
    into existing cells would silently corrupt every estimate)."""
    for ins in reversed(dst.timeline.completed_write_instants()):
        p = (dst.timeline.metadata(ins).get("extra_metadata") or {}) \
            .get(_CMS_PARAMS)
        if p:
            import json
            return json.loads(p)
    return None


def sync_cms_sketch(src, dst, key_col: str, depth: int = 4, width: int = 64,
                    hash_fn: str = "xxhash64",
                    end: str | None = None) -> str | None:
    """Keep a Count-Min sketch of `src[key_col]` current as a derived lake
    table (record key (d, bucket), columns d/bucket/cnt) by folding the
    CDC diff — the canonical incremental use of a MERGEABLE sketch: deletes
    and update-befores contribute -1 to their hashed cells, inserts and
    update-afters +1, and cell-wise addition is exactly CMS merge
    (operators/sketches.py). First sync folds the full snapshot.

    Scale shape per sync: one CDC read (touched file groups only) -> hash
    fan-out depth per changed row -> delta cells (ONE shuffle, model-sized
    result) -> join against current cells (<= depth*width rows) -> upsert of
    the changed cells. The corpus itself never re-scans after sync #1 —
    which is the whole point of maintaining the sketch instead of the keys.

    Returns the new checkpoint instant, or None when already current.
    Probe the maintained sketch with `cms_table_estimate`.
    """
    import json

    from .operators.dedup import _seeded_hash
    from .operators.sketches import _nonneg_hash, cms_cells

    _ = _seeded_hash(hash_fn)  # validates hash_fn before any job runs
    # geometry pin FIRST — a drifted config must refuse loudly even when
    # the table happens to be current (an "already current" None would mask
    # the misconfiguration until the next source commit)
    params = {"key_col": key_col, "depth": depth, "width": width,
              "hash_fn": hash_fn}
    stored = cms_sketch_params(dst)
    if stored is not None and stored != params:
        raise ValueError(
            f"sketch params changed: table built with {stored}, "
            f"sync called with {params}")
    last = src.timeline.latest_completed_write()
    if last is None:
        return None
    end = end or last.time
    begin = rollup_checkpoint(dst)
    if begin is not None and begin >= end:
        return None

    if begin is None:
        snap = src.time_travel(end) if end != last.time else src.snapshot()
        merged = cms_cells(snap, key_col, depth, width, hash_fn) \
            .select(F.col("d").cast("int").alias("d"), "bucket", "cnt")
    else:
        h = _nonneg_hash(hash_fn)
        # CMS cells are SUMs of ±key contributions — a linear fold, so the
        # signed-contributions shape replaces the CDC per-key full-outer
        # join (no-op rewrites cancel in the cell sums; see sync_rollup)
        contrib = (src.incremental_contributions(begin, end, [key_col])
                   .select("_sign", F.col(key_col).alias("_k")))
        contrib = contrib.select(
            "_sign", F.posexplode(F.array(*[
                F.pmod(h(d, F.col("_k")), F.lit(width))
                for d in range(depth)])).alias("d", "bucket"))
        deltas = (contrib.groupBy("d", "bucket")
                  .agg(F.sum("_sign").cast("bigint").alias("_delta"))
                  .filter(F.col("_delta") != 0))
        deltas = deltas.persist()   # reused by semi-join probe AND merge
        try:
            cur = (dst.snapshot()
                   .join(deltas.select("d", "bucket").distinct(),
                         on=["d", "bucket"], how="left_semi")
                   .select("d", "bucket", F.col("cnt").alias("__old")))
            merged = (deltas.join(cur, on=["d", "bucket"], how="left")
                      .select(F.col("d").cast("int").alias("d"), "bucket",
                              (F.coalesce(F.col("__old"), F.lit(0))
                               + F.col("_delta")).cast("bigint").alias("cnt"))
                      .withColumn(meta.DELETE_MARKER, F.col("cnt") <= 0))
            dst.writer.set_extra_metadata(
                {_CKPT: end, _CMS_PARAMS: json.dumps(params)})
            dst.upsert(merged)
        finally:
            deltas.unpersist()
        return end
    dst.writer.set_extra_metadata(
        {_CKPT: end, _CMS_PARAMS: json.dumps(params)})
    dst.upsert(merged)
    return end


def cms_table_estimate(dst, candidates, key_col: str):
    """Probe a maintained CMS table: (key, est) per candidate row — the
    same literal-array broadcast probe as operators/sketches.py
    heavy_hitters (shared `cms_probe`), reading cells from the sketch table
    instead of building them. Map-only over the candidate set."""
    from .operators.sketches import cms_probe

    params = cms_sketch_params(dst)
    if params is None:
        raise ValueError("no synced CMS sketch on this table")
    mat = {(r["d"], r["bucket"]): r["cnt"] for r in dst.snapshot().collect()}
    est = cms_probe(mat, params["depth"], params["width"],
                    params["hash_fn"], key_col)
    return candidates.withColumn("est", est)


# --------------------------------------------------- incremental HLL sketch
_HLL_PARAMS = "hll_sketch_params"


def hll_sketch_params(dst) -> dict | None:
    """Register geometry of a maintained HLL table (see cms_sketch_params)."""
    for ins in reversed(dst.timeline.completed_write_instants()):
        p = (dst.timeline.metadata(ins).get("extra_metadata") or {}) \
            .get(_HLL_PARAMS)
        if p:
            import json
            return json.loads(p)
    return None


def sync_hll_sketch(src, dst, key_col: str, p: int = 8,
                    hash_fn: str = "xxhash64", seed: int = 7,
                    end: str | None = None) -> str | None:
    """Keep an HLL register table of `src[key_col]` current (record key
    `bucket`, columns bucket/reg).

    HLL registers are MAX-folds — monotone, so inserts (and update-afters)
    merge incrementally as max(old, new) — but a max is NOT invertible: a
    delete (or an update that changes key_col) could lower a register, and
    no bounded state can tell. The sync therefore checks the CDC window for
    register-lowering ops and falls back to a full register recompute for
    that window only (the standard production treatment of non-invertible
    sketches: fold the monotone 99%, recompute when retraction actually
    happens). Distinct-count queries read the m-row table with the same
    scaled-integer estimate as operators/sketches.py (`hll_table_estimate`).

    Scale shape: monotone syncs touch only the CDC diff; the fallback costs
    one corpus scan — the same price as building the sketch once, and only
    on windows that retract keys.
    """
    import json

    from .operators.dedup import _seeded_hash
    from .operators.sketches import _check_p, hll_registers

    _ = _seeded_hash(hash_fn)  # validates hash_fn before any job runs
    _check_p(p)
    # geometry pin FIRST (see sync_cms_sketch): drifted config must refuse
    # loudly even when the table is already current
    params = {"key_col": key_col, "p": p, "hash_fn": hash_fn, "seed": seed}
    stored = hll_sketch_params(dst)
    if stored is not None and stored != params:
        raise ValueError(
            f"sketch params changed: table built with {stored}, "
            f"sync called with {params}")
    last = src.timeline.latest_completed_write()
    if last is None:
        return None
    end = end or last.time
    begin = rollup_checkpoint(dst)
    if begin is not None and begin >= end:
        return None

    full = begin is None
    if not full:
        # narrowed to the sketched column: a change confined to OTHER
        # columns is never lowering and its key re-contribution is
        # idempotent under the register max — the diff only needs key_col
        cdc = src.incremental_cdc(begin, end, columns=[key_col])
        changed = ~F.col(f"before.{key_col}").eqNullSafe(
            F.col(f"after.{key_col}"))   # null-safe: NULL -> non-NULL flips
        lowering = cdc.filter(
            (F.col("op") == "d") | ((F.col("op") == "u") & changed)
        ).limit(1).count()
        full = lowering > 0

    if full:
        snap = src.time_travel(end) if end != last.time else src.snapshot()
        regs = hll_registers(snap, key_col, p=p, hash_fn=hash_fn, seed=seed)
        if begin is not None:
            # recompute replaces the whole register set: buckets that fell
            # silent since the last sync must tombstone, not linger
            old = dst.snapshot().select("bucket")
            gone = old.join(regs.select("bucket"), "bucket", "left_anti") \
                      .withColumn("reg", F.lit(0)) \
                      .withColumn(meta.DELETE_MARKER, F.lit(True))
            regs = regs.withColumn(meta.DELETE_MARKER, F.lit(False)) \
                       .unionByName(gone)
    else:
        # register deltas need no per-key diff at all: registers only GROW
        # (max), and every touched-partition row present at `begin` is
        # already covered by the stored registers, so folding the full
        # end-boundary state of the touched partitions yields the same
        # maxima as folding just the changed rows — without the diff's
        # two-boundary scan + full-outer join. The filter on the literal
        # +1 sign prunes the begin-boundary branch at plan time.
        contrib = (src.incremental_contributions(begin, end, [key_col])
                   .filter(F.col("_sign") == 1).select(key_col))
        delta = hll_registers(contrib, key_col, p=p, hash_fn=hash_fn,
                              seed=seed)
        cur = dst.snapshot().select("bucket", F.col("reg").alias("__old"))
        regs = (delta.join(cur, "bucket", "left")
                .select("bucket",
                        F.greatest(F.col("reg"),
                                   F.coalesce(F.col("__old"), F.lit(0)))
                        .alias("reg")))
    dst.writer.set_extra_metadata(
        {_CKPT: end, _HLL_PARAMS: json.dumps(params)})
    dst.upsert(regs)
    return end


def hll_table_estimate(dst) -> float:
    """Distinct-count estimate from a maintained HLL register table — the
    same transcendental-free scaled-integer formula as
    operators/sketches.py hll_distinct."""
    from .operators.sketches import _alpha, _rho_cap

    params = hll_sketch_params(dst)
    if params is None:
        raise ValueError("no synced HLL sketch on this table")
    m, cap = 1 << params["p"], _rho_cap(params["p"])
    rows = dst.snapshot().select("bucket", "reg").collect()
    s = sum(1 << (cap - r["reg"]) for r in rows) \
        + (m - len(rows)) * (1 << cap)
    return round(_alpha(m) * m * m * float(1 << cap) / float(s), 6)


_JCKPT = "join_rollup_checkpoint"


def join_rollup_checkpoint(dst) -> dict | None:
    """Two-source checkpoint of a join-maintained view: JSON
    {"fact": instant, "dim": instant} in the dst commit's extra_metadata —
    the same atomic checkpoint-with-data pattern as rollup_checkpoint."""
    import json

    for ins in reversed(dst.timeline.completed_write_instants()):
        ck = (dst.timeline.metadata(ins).get("extra_metadata") or {}) \
            .get(_JCKPT)
        if ck:
            return json.loads(ck)
    return None


_DIM_LEG_PRUNE_MAX_KEYS = 10_000
# below these thresholds the key prune cannot skip enough IO to repay its
# extra collect job (~0.5s measured at sf0.1's 9 small fact files — the
# r5 A/B): the leg scans the fact unpruned and stays plan-only. Gated on
# file count OR total live base bytes: a fact with few but LARGE files
# still repays the collect through row-group-level stats skipping
# (ADVICE r6) — both numbers come from the same driver-side metadata
# fold, no data read.
_DIM_LEG_PRUNE_MIN_FILES = 16
_DIM_LEG_PRUNE_MIN_BYTES = 256 * 1024 * 1024


def _join_rollup_dim_leg(fact_df, d_d, fact_key: str, dim_key: str,
                         gcols: list, measures: list, prune: bool = True):
    """The dD leg of the delta-join identity: OLD fact ⋈ broadcast dim
    delta. The classic IVM asymmetry is that a dim change must visit the
    fact side — so the visit must PRUNE: the delta's key set (model-sized
    by the slowly-changing-dim assumption, it is being broadcast anyway)
    is collected and pushed as an explicit fact_key IN (...) predicate,
    which reaches the parquet scan (PushedFilters, plan-pinned) and lets
    row-group/file key stats skip every fact file whose key range misses
    all changed dims. Above _DIM_LEG_PRUNE_MAX_KEYS changed keys the
    In-list would bloat the plan (a million-literal predicate), so the
    prune degrades to the [min, max] RANGE of the changed keys — two
    literals, still sargable (PushedFilters Gte/Lte), and effective
    exactly when fact files are key-clustered (GLOBAL_SORT bulk inserts,
    clustering by key): high-churn syncs keep file/row-group skipping
    instead of falling off a cliff to an unpruned scan. A false positive
    only costs scan bytes — the broadcast inner join drops it; never a
    result change. ``prune=False`` skips
    the collect entirely (the caller gates on the fact's live file count:
    with few files there is nothing to skip and the collect is pure
    overhead)."""
    leg = fact_df.select(fact_key, *measures)
    if prune:
        # NULL keys are excluded BEFORE the limit: a NULL inside the
        # budget window could otherwise displace a real key and make the
        # isin filter silently drop that key's fact contributions (NULLs
        # never survive the inner join anyway)
        keys = [r[0] for r in d_d.select(dim_key)
                .filter(F.col(dim_key).isNotNull()).distinct()
                .limit(_DIM_LEG_PRUNE_MAX_KEYS + 1).collect()]
        if len(keys) <= _DIM_LEG_PRUNE_MAX_KEYS:
            # empty delta -> isin([]) is constant-false: correct (no dim
            # rows can join) and the scan short-circuits
            leg = leg.filter(F.col(fact_key).isin(keys))
        else:
            # one tiny extra agg over the (persisted, model-sized) delta;
            # runs only at high dim churn, where the In-list is off the
            # table anyway
            lo, hi = d_d.agg(F.min(dim_key), F.max(dim_key)).first()
            if lo is not None:
                leg = leg.filter(F.col(fact_key).between(F.lit(lo),
                                                         F.lit(hi)))
    return (leg.join(F.broadcast(d_d),
                     F.col(fact_key) == F.col(dim_key), "inner")
            .select("_w", *gcols, *measures))


def sync_join_rollup(fact, dim, dst, fact_key: str, dim_key: str,
                     group_cols: list[str], sum_cols: dict[str, str],
                     end_fact: str | None = None,
                     end_dim: str | None = None) -> dict | None:
    """Incrementally maintain a JOIN view: dst holds
    group_cols (from `dim`) -> SUM(fact measures) + n_rows over
    ``fact INNER JOIN dim ON fact_key = dim_key``, advanced to the given
    source instants WITHOUT recomputing the join. The delta-join identity
    (DBSP / classic IVM):

        F2 (x) D2 - F1 (x) D1  =  dF (x) D2  +  F1 (x) dD

    so each sync folds the fact CDC diff against the NEW dim snapshot plus
    the dim CDC diff against the OLD fact snapshot, every row weighted
    +1 (insert/after) or -1 (delete/before). Group moves (a dim row's
    group attribute changes) debit the old group and credit the new one
    through dD's paired before/after rows; fact-side foreign-key changes
    flow through dF the same way. Groups whose maintained count reaches
    zero are tombstoned.

    Returns the new checkpoint dict, or None when both sources are
    already covered. First sync folds the full join as of the ends.

    Scale shape per sync: the dF side reads only touched fact file groups
    and joins the dim snapshot (keyed; dims broadcast when small); the dD
    side is the classic IVM asymmetry — a dim change must visit the OLD
    fact (one keyed join of the fact scan against the BROADCAST dim
    delta, prunable by join-key stats) — so keep dims slowly-changing,
    which star schemas are. Nothing view-sized or fact-sized is ever
    rewritten: the upsert touches |affected groups| rows.
    """
    import json

    gcols = list(group_cols)
    measures = list(dict.fromkeys(sum_cols.values()))
    # the fold references fact columns and dim columns in ONE unqualified
    # namespace — overlapping names (incl. fact_key == dim_key) would be
    # ambiguous in every join leg; refuse with guidance instead
    overlap = set([fact_key] + measures) & set([dim_key] + gcols)
    if overlap:
        raise ValueError(
            f"sync_join_rollup: fact columns and dim columns must be "
            f"disjoint; rename/alias before syncing (overlap: "
            f"{sorted(overlap)})")

    f_last = fact.timeline.latest_completed_write()
    d_last = dim.timeline.latest_completed_write()
    if f_last is None or d_last is None:
        return None
    end_fact = end_fact or f_last.time
    end_dim = end_dim or d_last.time
    ck = join_rollup_checkpoint(dst)
    if ck is not None:
        # an explicit end older than the stored checkpoint on one axis
        # (while the other advances) would REGRESS that axis — the next
        # default sync would then re-fold and double-apply the window the
        # view already contains, and the dF leg would join a dim state
        # older than the view's. Checkpoints are monotone: clamp.
        end_fact = max(end_fact, ck["fact"])
        end_dim = max(end_dim, ck["dim"])
        if ck["fact"] >= end_fact and ck["dim"] >= end_dim:
            return None

    def fact_snap(at):
        if at != f_last.time:
            _guard_reconstructable(fact, at, "sync_join_rollup(fact)")
            return fact.time_travel(at)
        return fact.snapshot()

    def dim_snap(at):
        if at != d_last.time:
            _guard_reconstructable(dim, at, "sync_join_rollup(dim)")
            return dim.time_travel(at)
        return dim.snapshot()

    ckpt_md = {_JCKPT: json.dumps({"fact": end_fact, "dim": end_dim})}
    if ck is None:
        joined = (fact_snap(end_fact).select(fact_key, *measures)
                  .join(dim_snap(end_dim).select(dim_key, *gcols),
                        F.col(fact_key) == F.col(dim_key), "inner"))
        merged = joined.groupBy(*gcols).agg(
            *[F.sum(F.col(s).cast("double")).alias(o)
              for o, s in sum_cols.items()],
            F.count(F.lit(1)).cast("bigint").alias("n_rows"))
        dst.writer.set_extra_metadata(ckpt_md)
        dst.upsert(merged)
        return {"fact": end_fact, "dim": end_dim}

    def signed(cdc, cols):
        return _signed_cdc(cdc, cols).withColumnRenamed("_sign", "_w")

    parts = []
    d_d = None
    if ck["fact"] < end_fact:
        # contributions, not the per-key diff: the dF leg is a linear fold
        # (±rows joined to the dim then SUMmed), so no-op fact rewrites
        # cancel in the aggregate — the diff's full-outer join (a key
        # exchange of both fact boundary states per ±branch) bought
        # nothing. The leg now streams scan -> dim join -> partial agg
        # with no fact-side exchange at all, projected to key+measures.
        d_f = (fact.incremental_contributions(ck["fact"], end_fact,
                                              [fact_key] + measures)
               .withColumnRenamed("_sign", "_w"))
        parts.append(
            d_f.join(dim_snap(end_dim).select(dim_key, *gcols),
                     F.col(fact_key) == F.col(dim_key), "inner")
            .select("_w", *gcols, *measures))
    if ck["dim"] < end_dim:
        # the dim leg KEEPS the per-key CDC diff — the slowly-changing-dim
        # assumption is what makes the delta broadcastable and the key
        # prune model-sized, and only the diff drops unchanged dim rows —
        # but narrows it to key+group columns: changes confined to other
        # dim attributes no longer surface (their ±leg rows cancel in the
        # SUM anyway), so the boundary scans project less and the
        # broadcast delta stays minimal.
        # persisted: the dim-leg prune collects the delta's key set (one
        # eager job) and the leg joins the same delta — without the cache
        # the dim-CDC plan (two time-travel scans + before/after join)
        # would evaluate twice
        d_d = signed(dim.incremental_cdc(ck["dim"], end_dim,
                                         columns=[dim_key] + gcols),
                     [dim_key] + gcols).persist()
        # prune only when the fact has enough live files OR bytes for
        # stats skipping to repay the key-collect job (one metadata fold,
        # driver-side, no data read)
        live = fact.view(as_of=ck["fact"]).live_slices()
        fact_bytes = sum(s.base_file.bytes for _g, s in live)
        parts.append(_join_rollup_dim_leg(
            fact_snap(ck["fact"]), d_d, fact_key, dim_key, gcols, measures,
            prune=(len(live) >= _DIM_LEG_PRUNE_MIN_FILES
                   or fact_bytes >= _DIM_LEG_PRUNE_MIN_BYTES)))
    try:
        contrib = parts[0]
        for p in parts[1:]:
            contrib = contrib.unionByName(p)
        deltas = contrib.groupBy(*gcols).agg(
            *[F.sum(F.col("_w") * F.col(s).cast("double")).alias(o)
              for o, s in sum_cols.items()],
            F.sum("_w").cast("bigint").alias("n_rows"))
        _merge_group_deltas(dst, deltas, gcols, sum_cols, ckpt_md)
    finally:
        if d_d is not None:
            d_d.unpersist()
    return {"fact": end_fact, "dim": end_dim}
