"""Incremental rollup maintenance (derived.py) vs full recompute."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from hudi_0_12_0_my_spark import Engine
from hudi_0_12_0_my_spark.derived import rollup_checkpoint, sync_rollup

SCHEMA = "id string, grp string, v long"


def _expected(t):
    return {(r.grp, float(r.sum_v), r.n_rows) for r in
            t.snapshot().groupBy("grp")
            .agg(F.sum(F.col("v").cast("double")).alias("sum_v"),
                 F.count(F.lit(1)).alias("n_rows")).collect()}


def _got(dst):
    return {(r.grp, float(r.sum_v), r.n_rows)
            for r in dst.snapshot().collect()}


def test_sync_rollup_matches_full_recompute(spark, tmp_path):
    eng = Engine(spark)
    src = eng.create_table(str(tmp_path / "src"), record_key_fields=["id"],
                           partition_field="grp")
    dst = eng.create_table(str(tmp_path / "dst"), record_key_fields=["grp"],
                           keygen="nonpartitioned")

    src.bulk_insert(spark.createDataFrame(
        [("a", "g1", 10), ("b", "g1", 20), ("c", "g2", 5)], SCHEMA))
    ck1 = sync_rollup(src, dst, ["grp"], {"sum_v": "v"})
    assert ck1 == rollup_checkpoint(dst)
    assert _got(dst) == _expected(src) == {("g1", 30.0, 2), ("g2", 5.0, 1)}

    # update in place + insert a new group; then move b between groups the
    # non-global way (delete old partition copy, insert into the new one)
    src.upsert(spark.createDataFrame(
        [("a", "g1", 11), ("d", "g3", 7)], SCHEMA))
    src.delete(where=(F.col("id") == "b") & (F.col("grp") == "g1"))
    src.upsert(spark.createDataFrame([("b", "g2", 20)], SCHEMA))
    assert sync_rollup(src, dst, ["grp"], {"sum_v": "v"}) > ck1
    assert _got(dst) == _expected(src) == {
        ("g1", 11.0, 1), ("g2", 25.0, 2), ("g3", 7.0, 1)}

    # delete the last row of g3: its rollup group is tombstoned
    src.delete(where=F.col("id") == "d")
    sync_rollup(src, dst, ["grp"], {"sum_v": "v"})
    assert _got(dst) == _expected(src) == {("g1", 11.0, 1), ("g2", 25.0, 2)}

    # already current -> no-op
    assert sync_rollup(src, dst, ["grp"], {"sum_v": "v"}) is None


def test_sync_rollup_steps_equal_one_shot(spark, tmp_path):
    """Syncing after every commit lands on the same state as one final
    full-snapshot rollup of a fresh destination."""
    eng = Engine(spark)
    src = eng.create_table(str(tmp_path / "src2"), record_key_fields=["id"],
                           partition_field="grp")
    stepped = eng.create_table(str(tmp_path / "stepped"),
                               record_key_fields=["grp"],
                               keygen="nonpartitioned")
    oneshot = eng.create_table(str(tmp_path / "oneshot"),
                               record_key_fields=["grp"],
                               keygen="nonpartitioned")
    batches = [
        [("a", "g1", 1), ("b", "g2", 2)],
        [("a", "g2", 3), ("c", "g1", 4)],
        [("b", "g2", 9), ("d", "g4", 1)],
    ]
    for rows in batches:
        src.upsert(spark.createDataFrame(rows, SCHEMA))
        sync_rollup(src, stepped, ["grp"], {"sum_v": "v"})
    sync_rollup(src, oneshot, ["grp"], {"sum_v": "v"})
    assert _got(stepped) == _got(oneshot) == _expected(src)


def test_scd2_history_intervals(spark, tmp_path):
    """Versions open on insert/update, close at the successor's commit;
    a delete closes without opening; a re-insert opens a fresh interval."""
    eng = Engine(spark)
    t = eng.create_table(str(tmp_path / "scd"), record_key_fields=["id"],
                         partition_field="grp")
    from hudi_0_12_0_my_spark.derived import scd2_history
    t.bulk_insert(spark.createDataFrame(
        [("a", "g1", 1), ("b", "g1", 2)], SCHEMA))
    t.upsert(spark.createDataFrame([("a", "g1", 10)], SCHEMA))
    t.delete(where=F.col("id") == "b")
    t.upsert(spark.createDataFrame([("b", "g1", 20)], SCHEMA))
    c = [i.time for i in t.timeline.completed_write_instants()]
    h = {(r.id, r.v): (r.valid_from, r.valid_to) for r in
         scd2_history(t, ["id"], ["v"]).collect()}
    assert h[("a", 1)] == (c[0], c[1])
    assert h[("a", 10)] == (c[1], None)
    assert h[("b", 2)] == (c[0], c[2])        # closed by the delete
    assert h[("b", 20)] == (c[3], None)       # re-insert opens fresh
    assert len(h) == 4


def test_sync_minhash_index_incremental_matches_recompute(spark, tmp_path):
    """Index maintained via CDC folds must equal a from-scratch signature
    pass over the final corpus state, and dedup_against_index must find the
    planted near-dups (and only the planted near-dups)."""
    from hudi_0_12_0_my_spark.derived import sync_minhash_index
    from hudi_0_12_0_my_spark.operators import (dedup_against_index,
                                                minhash_index_rows)
    eng = Engine(spark)
    src = eng.create_table(str(tmp_path / "docs"),
                           record_key_fields=["doc_id"],
                           precombine_field="ver", keygen="nonpartitioned")
    idx = eng.create_table(str(tmp_path / "idx"),
                           record_key_fields=["doc_id"],
                           keygen="nonpartitioned")
    base = "the quick brown fox jumps over the lazy dog and runs far away "
    rows = [(i, base * 3 + f"tail {i}", 1) for i in range(8)]
    rows += [(100 + i, f"completely different text number {i} " * 5, 1)
             for i in range(4)]
    src.bulk_insert(spark.createDataFrame(
        rows, "doc_id long, text string, ver int"))
    ck1 = sync_minhash_index(src, idx)
    assert ck1 is not None
    # second call: already current
    assert sync_minhash_index(src, idx) is None

    # update doc 0's text, delete doc 101, insert doc 200
    src.upsert(spark.createDataFrame(
        [(0, "totally rewritten text with nothing in common anymore " * 4, 2),
         (200, base * 3 + "tail 200", 1)],
        "doc_id long, text string, ver int"))
    src.delete(where="doc_id = 101")
    ck2 = sync_minhash_index(src, idx)
    assert ck2 is not None and ck2 > ck1

    got = {(r.doc_id, tuple(r.sig), tuple(r.buckets))
           for r in idx.snapshot().collect()}
    want = {(r.doc_id, tuple(r.sig), tuple(r.buckets))
            for r in minhash_index_rows(src.snapshot()).collect()}
    assert got == want and len(want) == 12   # 8 - 1del + 4 - 1 + 1ins + 1upd

    # a batch with one near-dup of the "base" family, one unique doc, and a
    # re-ingest of indexed doc 3 (self-match must be excluded; its family
    # still matches)
    batch = spark.createDataFrame(
        [(900, base * 3 + "tail 900"), (901, "zebra " * 40),
         (3, base * 3 + "tail 3")], "doc_id long, text string")
    m = dedup_against_index(batch, idx.snapshot(), jaccard_threshold=0.5)
    hits = {(r.doc_id, r.match_id) for r in m.collect()}
    assert all(mid != did for did, mid in hits)
    assert any(did == 900 for did, _ in hits)      # planted near-dup found
    assert all(did != 901 for did, _ in hits)      # unique doc clean
    assert any(did == 3 and mid != 3 for did, mid in hits)


def test_rollup_checkpoint_atomic_with_commit(spark, tmp_path):
    """The checkpoint rides in the dst commit's extra_metadata, so data and
    checkpoint advance in ONE atomic commit: no side-file is written, and
    rolling back the dst commit also rolls back the checkpoint (a re-sync
    re-folds exactly the rolled-back window — no double-apply)."""
    import os
    from hudi_0_12_0_my_spark.derived import _CKPT
    eng = Engine(spark)
    src = eng.create_table(str(tmp_path / "src"), record_key_fields=["id"],
                           partition_field="grp")
    dst = eng.create_table(str(tmp_path / "dst"), record_key_fields=["grp"],
                           keygen="nonpartitioned")
    src.bulk_insert(spark.createDataFrame(
        [("a", "g1", 10), ("b", "g2", 20)], SCHEMA))
    ck1 = sync_rollup(src, dst, ["grp"], {"sum_v": "v"})
    # no legacy side-file; checkpoint comes from commit metadata
    assert not os.path.exists(os.path.join(str(tmp_path / "dst"),
                                           ".hoodie", _CKPT))
    last = dst.timeline.latest_completed_write()
    assert dst.timeline.metadata(last)["extra_metadata"][_CKPT] == ck1

    # incremental fold commits data+checkpoint together
    src.upsert(spark.createDataFrame([("a", "g1", 15)], SCHEMA))
    ck2 = sync_rollup(src, dst, ["grp"], {"sum_v": "v"})
    assert ck2 > ck1 and rollup_checkpoint(dst) == ck2
    assert _got(dst) == _expected(src)

    # simulate the crash-recovery path: roll back the dst fold commit ->
    # the checkpoint reverts WITH the data, and a re-sync converges
    dst.rollback(dst.timeline.latest_completed_write().time)
    assert rollup_checkpoint(dst) == ck1
    assert sync_rollup(src, dst, ["grp"], {"sum_v": "v"}) == ck2
    assert _got(dst) == _expected(src) == {("g1", 15.0, 1), ("g2", 20.0, 1)}


def test_sync_ivf_index_incremental_matches_exact(spark, tmp_path):
    """Stream-maintained IVF index: CDC folds keep the cell-partitioned
    index equal to the corpus (moves re-home across cells via tombstone +
    insert, deletes tombstone their old cell), exhaustive probe == exact
    top-k, and nprobe search scans only the probed cell partitions."""
    import math
    from hudi_0_12_0_my_spark.derived import (ivf_index_search,
                                              sync_ivf_index)
    from hudi_0_12_0_my_spark.operators import cosine_topk
    eng = Engine(spark)
    rows = [(i, [math.sin(i * 0.7 + j) for j in range(8)], i % 3)
            for i in range(60)]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")
    src = eng.create_table(str(tmp_path / "src"),
                           record_key_fields=["vec_id"],
                           precombine_field="label",
                           keygen="nonpartitioned")
    idx = eng.create_table(str(tmp_path / "idx"),
                           record_key_fields=["vec_id"],
                           partition_field="cell")
    src.bulk_insert(emb.filter("vec_id % 4 != 0"))
    assert sync_ivf_index(src, idx, num_cells=4) is not None
    # churn: negate (forces cell moves), delete, and noop re-sync
    src.upsert(emb.filter("vec_id % 5 = 1 and vec_id % 4 != 0")
               .withColumn("embedding",
                           F.transform("embedding", lambda x: -x)))
    src.delete(where="vec_id % 7 = 1")
    assert sync_ivf_index(src, idx, num_cells=4) is not None
    assert sync_ivf_index(src, idx, num_cells=4) is None    # checkpointed

    snap = src.snapshot().select("vec_id", "embedding")
    isnap = idx.snapshot()
    assert isnap.count() == snap.count()
    assert isnap.groupBy("vec_id").count().filter("count > 1").count() == 0

    q = snap.filter("vec_id < 8")
    got = {(r.query_id, r.rank): r.neighbor_id
           for r in ivf_index_search(idx, q, k=5, nprobe=4).collect()}
    want = {(r.query_id, r.rank): r.neighbor_id
            for r in cosine_topk(snap, q, k=5).collect()}
    assert got == want

    # nprobe=1 must prune the scan to a strict subset of index files
    all_files = set(idx.snapshot().inputFiles())
    one_cell = set(idx.snapshot(filters="cell in (1)").inputFiles())
    assert one_cell and one_cell < all_files


def test_sync_cms_sketch_incremental_matches_recompute(spark, tmp_path):
    import pytest

    from hudi_0_12_0_my_spark.derived import (cms_sketch_params,
                                              cms_table_estimate,
                                              sync_cms_sketch)
    from hudi_0_12_0_my_spark.operators.sketches import cms_cells

    eng = Engine(spark)
    src = eng.create_table(str(tmp_path / "src"), record_key_fields=["id"],
                           partition_field="grp")
    dst = eng.create_table(str(tmp_path / "dst"),
                           record_key_fields=["d", "bucket"],
                           keygen="nonpartitioned")

    src.bulk_insert(spark.createDataFrame(
        [(f"r{i}", "g1", i % 5) for i in range(40)], SCHEMA))
    ck1 = sync_cms_sketch(src, dst, "v", depth=3, width=8)
    assert ck1 is not None
    assert cms_sketch_params(dst)["width"] == 8

    def cells(df_or_table):
        if hasattr(df_or_table, "snapshot"):
            rows = df_or_table.snapshot().select("d", "bucket", "cnt").collect()
        else:
            rows = df_or_table.collect()
        return {(r["d"], r["bucket"]): r["cnt"] for r in rows}

    # incremental folds: update moves keys between cells, delete debits
    src.upsert(spark.createDataFrame(
        [(f"r{i}", "g1", 7) for i in range(10)], SCHEMA))       # v 0->7 moves
    src.delete(where=F.col("v") == 3)
    assert sync_cms_sketch(src, dst, "v", depth=3, width=8) > ck1
    assert cells(dst) == cells(cms_cells(src.snapshot(), "v", 3, 8))

    # zero-count cells are tombstoned, not kept as 0 rows
    assert all(c > 0 for c in cells(dst).values())

    # estimates from the maintained table are one-sided (>= exact)
    exact = {r["v"]: r["n"] for r in
             src.snapshot().groupBy("v").agg(F.count("*").alias("n")).collect()}
    est = {r["v"]: r["est"] for r in cms_table_estimate(
        dst, src.snapshot().select("v").distinct(), "v").collect()}
    assert all(est[k] >= n for k, n in exact.items())

    # geometry is pinned: a different width must refuse to fold — even
    # BEFORE the new source commit lands (pin checked ahead of currency)
    with pytest.raises(ValueError, match="params changed"):
        sync_cms_sketch(src, dst, "v", depth=3, width=16)
    src.upsert(spark.createDataFrame([("x", "g1", 1)], SCHEMA))
    with pytest.raises(ValueError, match="params changed"):
        sync_cms_sketch(src, dst, "v", depth=3, width=16)

    # already current after a matching re-sync -> no-op
    assert sync_cms_sketch(src, dst, "v", depth=3, width=8) is not None
    assert sync_cms_sketch(src, dst, "v", depth=3, width=8) is None


def test_sync_hll_sketch_monotone_fold_and_retraction_fallback(spark, tmp_path):
    import pytest

    from hudi_0_12_0_my_spark.derived import (hll_sketch_params,
                                              hll_table_estimate,
                                              sync_hll_sketch)
    from hudi_0_12_0_my_spark.operators.sketches import hll_registers

    eng = Engine(spark)
    src = eng.create_table(str(tmp_path / "src"), record_key_fields=["id"],
                           partition_field="grp")
    dst = eng.create_table(str(tmp_path / "dst"),
                           record_key_fields=["bucket"],
                           keygen="nonpartitioned")

    def regs_of(df):
        return {(r["bucket"], r["reg"])
                for r in hll_registers(df, "v", p=4, hash_fn="xxhash64",
                                       seed=7).collect()}

    def regs_tbl():
        return {(r["bucket"], r["reg"])
                for r in dst.snapshot().select("bucket", "reg").collect()}

    src.bulk_insert(spark.createDataFrame(
        [(f"r{i}", "g1", i) for i in range(50)], SCHEMA))
    ck1 = sync_hll_sketch(src, dst, "v", p=4)
    assert ck1 is not None and hll_sketch_params(dst)["p"] == 4
    assert regs_tbl() == regs_of(src.snapshot())

    # inserts + an update that does NOT change v: monotone max-fold path
    src.upsert(spark.createDataFrame(
        [(f"r{i}", "g1", i) for i in range(50, 90)]
        + [("r0", "g2", 0)], SCHEMA))          # moves partition, same v
    assert sync_hll_sketch(src, dst, "v", p=4) > ck1
    assert regs_tbl() == regs_of(src.snapshot())

    # a delete retracts keys: registers could lower -> recompute fallback,
    # with silent buckets tombstoned
    src.delete(where=F.col("v") >= 10)
    sync_hll_sketch(src, dst, "v", p=4)
    assert regs_tbl() == regs_of(src.snapshot())

    # estimate in the right range at m=16 (raw HLL without the low-range
    # linear-counting correction overshoots small cardinalities; 10 keys)
    assert 5 <= hll_table_estimate(dst) <= 20

    # geometry pinned
    src.upsert(spark.createDataFrame([("x", "g1", 3)], SCHEMA))
    with pytest.raises(ValueError, match="params changed"):
        sync_hll_sketch(src, dst, "v", p=6)
    assert sync_hll_sketch(src, dst, "v", p=4) is not None
    assert sync_hll_sketch(src, dst, "v", p=4) is None


def test_sketch_sync_checkpoint_atomic_rollback_converges(spark, tmp_path):
    """Sketch syncs inherit the atomic checkpoint-in-commit contract:
    rolling back a fold commit reverts the checkpoint WITH the cells, and a
    re-sync re-folds exactly the rolled-back window — the maintained sketch
    converges to the batch recompute, no double-applied deltas."""
    from hudi_0_12_0_my_spark.derived import (rollup_checkpoint,
                                              sync_cms_sketch)
    from hudi_0_12_0_my_spark.operators.sketches import cms_cells

    eng = Engine(spark)
    src = eng.create_table(str(tmp_path / "src"), record_key_fields=["id"],
                           partition_field="grp")
    dst = eng.create_table(str(tmp_path / "dst"),
                           record_key_fields=["d", "bucket"],
                           keygen="nonpartitioned")
    src.bulk_insert(spark.createDataFrame(
        [(f"r{i}", "g1", i % 6) for i in range(30)], SCHEMA))
    ck1 = sync_cms_sketch(src, dst, "v", depth=3, width=8)

    src.upsert(spark.createDataFrame(
        [(f"r{i}", "g1", (i % 6) + 10) for i in range(15)], SCHEMA))
    ck2 = sync_cms_sketch(src, dst, "v", depth=3, width=8)
    assert ck2 > ck1

    def cells(rows):
        return {(r["d"], r["bucket"]): r["cnt"] for r in rows}

    want = cells(cms_cells(src.snapshot(), "v", 3, 8).collect())
    assert cells(dst.snapshot().collect()) == want

    # crash-recovery path: roll back the fold commit -> checkpoint reverts
    # with the cells; re-sync converges to the same sketch
    dst.rollback(dst.timeline.latest_completed_write().time)
    assert rollup_checkpoint(dst) == ck1
    assert sync_cms_sketch(src, dst, "v", depth=3, width=8) == ck2
    assert cells(dst.snapshot().collect()) == want


def test_sync_join_rollup_matches_full_recompute(spark, tmp_path):
    from hudi_0_12_0_my_spark.derived import (join_rollup_checkpoint,
                                              sync_join_rollup)
    eng = Engine(spark)
    fact = eng.create_table(str(tmp_path / "fact"),
                            record_key_fields=["fid"],
                            keygen="nonpartitioned")
    dim = eng.create_table(str(tmp_path / "dim"), record_key_fields=["did"],
                           keygen="nonpartitioned")
    dst = eng.create_table(str(tmp_path / "jdst"),
                           record_key_fields=["grp"],
                           keygen="nonpartitioned")
    FS = "fid string, fk long, v long"
    DS = "did long, grp string"
    fact.bulk_insert(spark.createDataFrame(
        [("a", 1, 10), ("b", 1, 20), ("c", 2, 5), ("x", 9, 99)], FS))
    dim.bulk_insert(spark.createDataFrame(
        [(1, "g1"), (2, "g2"), (3, "g3")], DS))   # fk=9 dangles: inner-drop

    def expected():
        return {(r.grp, float(r.sum_v), r.n_rows) for r in
                fact.snapshot().join(dim.snapshot(),
                                     F.col("fk") == F.col("did"))
                .groupBy("grp")
                .agg(F.sum(F.col("v").cast("double")).alias("sum_v"),
                     F.count(F.lit(1)).alias("n_rows")).collect()}

    def got():
        return {(r.grp, float(r.sum_v), r.n_rows)
                for r in dst.snapshot().collect()}

    def sync():
        return sync_join_rollup(fact, dim, dst, "fk", "did", ["grp"],
                                {"sum_v": "v"})

    ck = sync()
    assert ck == join_rollup_checkpoint(dst)
    assert got() == expected() == {("g1", 30.0, 2), ("g2", 5.0, 1)}
    assert sync() is None                        # already current

    # fact-only delta: update measure, move a row to another dim key,
    # insert a row landing on a previously-empty group
    fact.upsert(spark.createDataFrame(
        [("a", 1, 11), ("c", 1, 5), ("d", 3, 7)], FS))
    assert sync() is not None
    assert got() == expected() == {("g1", 36.0, 3), ("g3", 7.0, 1)}

    # dim-only delta: GROUP MOVE (key 1: g1 -> g9) + delete key 3
    # (tombstones g3) + insert key 9 (the dangling fact rows join in)
    dim.upsert(spark.createDataFrame([(1, "g9"), (9, "gx")], DS))
    dim.delete(where=F.col("did") == 3)
    assert sync() is not None
    assert got() == expected() == {("g9", 36.0, 3), ("gx", 99.0, 1)}

    # both sides move in the same window: the dF (x) D2 + F1 (x) dD split
    fact.upsert(spark.createDataFrame([("b", 2, 21)], FS))
    fact.delete(where=F.col("fid") == "x")
    dim.upsert(spark.createDataFrame([(2, "g2b")], DS))
    assert sync() is not None
    assert got() == expected() == {("g9", 16.0, 2), ("g2b", 21.0, 1)}


def test_sync_join_rollup_guards(spark, tmp_path):
    from hudi_0_12_0_my_spark.derived import (join_rollup_checkpoint,
                                              sync_join_rollup)
    eng = Engine(spark)
    fact = eng.create_table(str(tmp_path / "gf"), record_key_fields=["rid"],
                            keygen="nonpartitioned")
    dim = eng.create_table(str(tmp_path / "gd"), record_key_fields=["did"],
                           keygen="nonpartitioned")
    dst = eng.create_table(str(tmp_path / "gv"), record_key_fields=["grp"],
                           keygen="nonpartitioned")
    fact.bulk_insert(spark.createDataFrame([("a", 1, 10)],
                                           "rid string, fk long, v long"))
    dim.bulk_insert(spark.createDataFrame([(1, "g1")], "did long, grp string"))

    # overlapping fact/dim column names refuse loudly
    with pytest.raises(ValueError, match="disjoint"):
        sync_join_rollup(fact, dim, dst, "fk", "fk", ["grp"], {"sum_v": "v"})

    args = (fact, dim, dst, "fk", "did", ["grp"], {"sum_v": "v"})
    ck1 = sync_join_rollup(*args)

    # advance the fact twice; sync only the dim axis with a STALE explicit
    # end_fact — the checkpoint must clamp (never regress) so the next
    # default sync cannot double-apply the already-folded fact window
    fact.upsert(spark.createDataFrame([("b", 1, 5)],
                                      "rid string, fk long, v long"))
    ck2 = sync_join_rollup(*args)
    dim.upsert(spark.createDataFrame([(2, "g2")], "did long, grp string"))
    ck3 = sync_join_rollup(*args, end_fact=ck1["fact"])
    assert ck3["fact"] == ck2["fact"]          # clamped, not regressed
    assert join_rollup_checkpoint(dst)["fact"] == ck2["fact"]
    assert sync_join_rollup(*args) is None     # nothing left to double-fold
    got = {(r.grp, float(r.sum_v), r.n_rows)
           for r in dst.snapshot().collect()}
    assert got == {("g1", 15.0, 2)}


def test_write_rejects_reserved_prefix_columns(spark, tmp_path):
    eng = Engine(spark)
    t = eng.create_table(str(tmp_path / "rsv"), record_key_fields=["id"],
                         keygen="nonpartitioned")
    with pytest.raises(ValueError, match="reserved"):
        t.insert(spark.createDataFrame([("a", 1)],
                                       "id string, __pk_p long"))
    with pytest.raises(ValueError, match="reserved"):
        t.insert(spark.createDataFrame([("a", 1)],
                                       "id string, _hoodie_custom long"))
    # the user-facing tombstone marker stays allowed
    t.insert(spark.createDataFrame(
        [("a", 1, False)], "id string, v long, _hoodie_is_deleted boolean"))
    assert t.snapshot().count() == 1
    # the write path's own scratch names are reserved too — a "__pp"
    # business column would be silently overwritten by stage_write
    for bad in ("__pp", "__fid", "__bucket", "__ring"):
        with pytest.raises(ValueError, match="reserved"):
            t.insert(spark.createDataFrame([("a", 1)],
                                           f"id string, `{bad}` long"))
    # a "__"-prefixed BUSINESS column outside the enumerated internal
    # namespaces stays writable (backward compat: only _hoodie_ and the
    # actual internal prefixes are reserved, mirroring the reference)
    t2 = eng.create_table(str(tmp_path / "biz"), record_key_fields=["id"],
                          keygen="nonpartitioned")
    t2.insert(spark.createDataFrame([("a", 7)], "id string, __source long"))
    assert t2.snapshot().select("__source").collect()[0][0] == 7
    # ...and it gets column stats like any other business column (the old
    # blanket "__" skip in the footer-stats collectors starved it)
    ins = t2.timeline.completed_write_instants()[-1]
    sts = t2.timeline.metadata(ins)["partition_to_write_stats"]
    st = next(iter(sts.values()))[0]
    assert st["col_stats"]["__source"]["min"] == 7


def test_join_rollup_dim_leg_null_keys_never_eat_prune_budget(spark):
    from hudi_0_12_0_my_spark.derived import _join_rollup_dim_leg
    fact_df = spark.createDataFrame([(1, 10), (2, 20)], "fk long, v long")
    # a NULL join key in the delta must be ignored by the prune filter
    # (it can never survive the inner join) — not displace a real key
    d_d = spark.createDataFrame([(None, "gx", 1), (2, "g2", 1)],
                                "did long, grp string, _w int")
    rows = {(r._w, r.grp, r.v)
            for r in _join_rollup_dim_leg(fact_df, d_d, "fk", "did",
                                          ["grp"], ["v"]).collect()}
    assert rows == {(1, "g2", 20)}
