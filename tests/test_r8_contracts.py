"""r8 optimization contracts.

1. COW upsert's broadcast-join resolution (one scan of affected files, no
   payload window) must be row-identical to the two-probe split plan it
   replaces, across commit-time and event-time payloads, deletes, stale
   updates and schema-adding updates.
2. The join-rollup dim leg degrades to a sargable [min,max] range prune
   above the In-list key cap instead of dropping pruning.
3. The format('hudi') writer merges sub-limit small files at commit time
   (one file per partition at tiny scale) and restamps _hoodie_file_name.
"""

import os

import pytest
from pyspark.sql import functions as F

from hudi_0_12_0_my_spark import Engine

S = "id long, grp string, v long, seq long"


def _snap(t):
    return sorted((r.id, r.grp, r.v, r.seq)
                  for r in t.snapshot().select("id", "grp", "v", "seq")
                  .collect())


@pytest.mark.parametrize("payload", ["default", "overwrite_latest"])
def test_upsert_broadcast_join_resolution_equals_split(spark, tmp_path,
                                                       payload,
                                                       monkeypatch):
    """The same batch upserted through the broadcast-join path and through
    the split path (gate disabled via SPARK_GRAFT_UPSERT_BROADCAST_BYTES=0)
    must produce identical snapshots — including a stale update (loses
    under event-time ordering, wins under commit-time ordering), a delete,
    a winning update and untouched rows."""
    eng = Engine(spark)
    snaps = {}
    for mode, env in (("join", None), ("split", "0")):
        if env is None:
            monkeypatch.delenv("SPARK_GRAFT_UPSERT_BROADCAST_BYTES",
                               raising=False)
        else:
            monkeypatch.setenv("SPARK_GRAFT_UPSERT_BROADCAST_BYTES", env)
        t = eng.create_table(str(tmp_path / f"{payload}_{mode}"),
                             record_key_fields=["id"],
                             precombine_field="seq", partition_field="grp",
                             payload=payload)
        t.bulk_insert(spark.createDataFrame(
            [(i, "ab"[i % 2], i, 5) for i in range(20)], S))
        batch = spark.createDataFrame(
            [(0, "a", 100, 9),      # newer seq: wins under both payloads
             (2, "a", 200, 1),      # STALE seq: loses under event-time
             (5, "b", 500, 5)],     # tie seq: newer commit -> update wins
            S)
        t.upsert(batch)
        t.delete(where=F.col("id") == 4)
        snaps[mode] = _snap(t)
    assert snaps["join"] == snaps["split"]
    got = {r[0]: r[2] for r in snaps["join"]}
    assert got[0] == 100 and got[5] == 500 and 4 not in got
    # event-time payloads keep the stored row on a stale update;
    # commit-time payloads let the incoming overwrite
    assert got[2] == (2 if payload == "default" else 200)


def test_upsert_broadcast_join_with_added_column(spark, tmp_path):
    """An update that ADDS a business column flows through the join
    resolution: winners carry the new value, losers/untouched surface
    NULL (unionByName-allowMissing parity)."""
    eng = Engine(spark)
    t = eng.create_table(str(tmp_path / "addcol"), record_key_fields=["id"],
                         precombine_field="seq", keygen="nonpartitioned")
    t.bulk_insert(spark.createDataFrame(
        [(i, "g", i, 1) for i in range(6)], S))
    t.upsert(spark.createDataFrame([(1, "g", 111, 2, "x")],
                                   S + ", extra string"))
    got = {r.id: (r.v, r.extra) for r in
           t.snapshot().select("id", "v", "extra").collect()}
    assert got[1] == (111, "x")
    assert got[0] == (0, None) and len(got) == 6


def test_upsert_split_path_still_used_for_column_merge_payload(spark,
                                                               tmp_path):
    """partial_update resolves per COLUMN — the pairwise join resolution
    must decline (gate) and the window path must still produce the
    column-merged row."""
    eng = Engine(spark)
    t = eng.create_table(str(tmp_path / "pu"), record_key_fields=["id"],
                         precombine_field="seq", keygen="nonpartitioned",
                         payload="partial_update")
    t.bulk_insert(spark.createDataFrame(
        [(1, "g", 10, 1, "keep")], S + ", note string"))
    t.upsert(spark.createDataFrame(
        [(1, "g", 99, 2, None)], S + ", note string"))
    r = t.snapshot().select("v", "note").first()
    assert (r.v, r.note) == (99, "keep")   # latest non-null per column


def test_dim_leg_range_prune_above_key_cap(spark, monkeypatch):
    """Above _DIM_LEG_PRUNE_MAX_KEYS the leg pushes a [min,max] range on
    the fact key (sargable — reaches PushedFilters) instead of skipping
    pruning; results unchanged."""
    import hudi_0_12_0_my_spark.derived as dv

    monkeypatch.setattr(dv, "_DIM_LEG_PRUNE_MAX_KEYS", 1)
    fact_df = spark.createDataFrame([(1, 10), (2, 20), (9, 90)],
                                    "fk long, v long")
    d_d = spark.createDataFrame([(1, "g1", 1), (2, "g2", 1)],
                                "did long, grp string, _w int")
    leg = dv._join_rollup_dim_leg(fact_df, d_d, "fk", "did", ["grp"], ["v"])
    plan = leg._jdf.queryExecution().optimizedPlan().toString()
    assert "In(" not in plan                 # over the cap: no In-list
    assert ">= 1" in plan and "<= 2" in plan  # the range prune instead
    rows = {(r._w, r.grp, r.v) for r in leg.collect()}
    assert rows == {(1, "g1", 10), (1, "g2", 20)}


def test_format_write_merges_small_files_at_commit(spark, tmp_path):
    """One file per partition value at tiny scale (was: one per task x
    partition — Spark's Python DataSourceWriter has no distribution
    hook), with _hoodie_file_name restamped to the merged file."""
    import glob

    eng = Engine(spark)
    base = str(tmp_path / "fw")
    df = spark.createDataFrame(
        [(i, "ab"[i % 2], i, 1) for i in range(40)], S).repartition(6)
    (df.write.format("hudi")
       .option("hoodie.datasource.write.recordkey.field", "id")
       .option("hoodie.datasource.write.partitionpath.field", "grp")
       .option("hoodie.datasource.write.precombine.field", "seq")
       .mode("overwrite").save(base))
    files = [f for f in glob.glob(os.path.join(base, "**", "*.parquet"),
                                  recursive=True) if ".hoodie" not in f]
    assert len(files) == 2               # one per partition value (a, b)
    back = spark.read.format("hudi").load(base)
    assert back.count() == 40
    names = {os.path.basename(f) for f in files}
    stamped = {r[0] for r in back.select("_hoodie_file_name")
               .distinct().collect()}
    assert stamped == names              # restamped, no stale small names


def test_dsir_sample_caches_weights_between_threshold_and_select(spark):
    """dsir_sample persists the per-doc weight table between its threshold
    pass and the selection semi-join (the second consumer must hit the
    cache, not re-run the corpus gram scan), and still selects exactly the
    top-fraction ids the uncached computation does."""
    from hudi_0_12_0_my_spark.operators import dsir_logweights, dsir_sample

    rows = [(i, ("spark sql engine " * (i % 4 + 1)).strip())
            for i in range(40)]
    raw = spark.createDataFrame(rows, "doc_id long, text string")
    target = raw.filter("doc_id % 3 = 0")
    out = dsir_sample(raw, target, 0.4, num_buckets=512)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "InMemoryRelation" in plan     # weights cached, not recomputed
    # identity vs the uncached reference selection
    w = dsir_logweights(raw, target, num_buckets=512)
    thr = w.agg(F.percentile_approx("dsir_logw", 1.0 - 0.4, 1000)) \
        .collect()[0][0]
    expect = {r.doc_id for r in w.filter(F.col("dsir_logw") >= thr)
              .collect()}
    assert {r.doc_id for r in out.collect()} == expect


def test_format_pack_uses_manifest_sizes(spark, tmp_path):
    """_pack sizes slices from commit-manifest write stats (no per-file
    stat round trip); the map is populated by partitions()."""
    from hudi_0_12_0_my_spark.datasource import HudiBatchReader

    eng = Engine(spark)
    base = str(tmp_path / "szs")
    t = eng.create_table(base, record_key_fields=["id"],
                         precombine_field="seq", partition_field="grp")
    t.bulk_insert(spark.createDataFrame(
        [(i, f"g{i % 6}", i, 1) for i in range(30)], S))
    sch = spark.read.format("hudi").load(base).schema
    rd = HudiBatchReader(sch, {"path": base})
    rd.partitions()
    assert rd._manifest_sizes
    for p, b in rd._manifest_sizes.items():
        assert b == os.path.getsize(p)   # manifest bytes == real bytes
