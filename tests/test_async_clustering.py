"""Async-safe clustering: schedule/run split, update rejection
(SparkRejectUpdateStrategy), three-phase locking, revalidation abort."""

from __future__ import annotations

import threading

import pytest
from pyspark.sql import functions as F

from hudi_0_12_0_my_spark import Engine
from hudi_0_12_0_my_spark import timeline as tl
from hudi_0_12_0_my_spark.services.clustering import (clustering_due,
                                                      run_clustering,
                                                      schedule_clustering)
from hudi_0_12_0_my_spark.writer import ClusteringUpdateRejected


def _rows(spark, vals):
    return spark.createDataFrame(vals, "id long, v double, ts long, dt string")


def test_update_rejected_while_clustering_pending(spark, tmp_path):
    """An upsert UPDATING a file group under a pending clustering plan is
    rejected (reference default hoodie.clustering.updates.strategy); inserts
    commit fine and never pack into the planned groups; after the plan runs
    the update goes through."""
    eng = Engine(spark)
    t = eng.create_table(str(tmp_path / "cl"), record_key_fields=["id"],
                         precombine_field="ts", partition_field="dt")
    t.bulk_insert(_rows(spark, [(1, 1.0, 1, "a"), (2, 2.0, 1, "a"),
                                (3, 3.0, 1, "b")]))
    plan = schedule_clustering(t, sort_cols=["id"], layout="linear",
                               small_files_only=False)
    assert plan and plan["groups"]
    with pytest.raises(ClusteringUpdateRejected, match="pending clustering"):
        t.upsert(_rows(spark, [(1, 9.0, 2, "a")]))
    # inserts are safe: they open fresh groups instead of packing into the
    # planned ones
    t.insert(_rows(spark, [(10, 10.0, 2, "a")]))
    planned = {(g["partition"], g["file_id"]) for g in plan["groups"]}
    md = t.timeline.metadata(t.timeline.latest_completed_write())
    written = {(p, s["file_id"])
               for p, sl in md["partition_to_write_stats"].items() for s in sl}
    assert not (written & planned)
    assert run_clustering(t, plan=plan) == plan["instant"]
    t.upsert(_rows(spark, [(1, 9.0, 2, "a")]))     # now accepted
    got = {(r.id, r.v) for r in t.snapshot().collect()}
    assert got == {(1, 9.0), (2, 2.0), (3, 3.0), (10, 10.0)}


def test_async_clustering_overlaps_inserts(spark, tmp_path):
    """A micro-batch INSERT commits while the clustering rewrite of earlier
    groups runs on another thread (three-phase locking); both land and the
    snapshot is their union."""
    eng = Engine(spark)
    t = eng.create_table(str(tmp_path / "ov"), record_key_fields=["id"],
                         precombine_field="ts", partition_field="dt")
    t.bulk_insert(_rows(spark, [(1, 1.0, 1, "a"), (2, 2.0, 1, "a")]))
    plan = schedule_clustering(t, sort_cols=["id"], layout="linear",
                               small_files_only=False)
    rewrite_started = threading.Event()
    insert_committed = threading.Event()

    def hook():
        rewrite_started.set()
        assert insert_committed.wait(timeout=60), \
            "foreground insert never landed during the clustering rewrite"

    out = {}
    th = threading.Thread(target=lambda: out.update(
        ins=run_clustering(t, plan=plan, on_rewrite_start=hook)))
    th.start()
    assert rewrite_started.wait(timeout=60)
    t.insert(_rows(spark, [(5, 5.0, 2, "b")]))
    insert_committed.set()
    th.join(timeout=120)
    assert not th.is_alive() and out["ins"] == plan["instant"]
    assert {(r.id, r.v) for r in t.snapshot().collect()} == {
        (1, 1.0), (2, 2.0), (5, 5.0)}
    acts = [i.action for i in t.timeline.completed()]
    assert tl.REPLACECOMMIT in acts


def test_clustering_revalidation_aborts_on_replaced_groups(spark, tmp_path):
    """A replace operation landing between schedule and run supersedes the
    plan's groups: the rewrite aborts (returns None) instead of completing a
    replacecommit that would resurrect replaced slices."""
    eng = Engine(spark)
    t = eng.create_table(str(tmp_path / "rv"), record_key_fields=["id"],
                         precombine_field="ts", partition_field="dt")
    t.bulk_insert(_rows(spark, [(1, 1.0, 1, "a"), (2, 2.0, 1, "b")]))
    plan = schedule_clustering(t, sort_cols=["id"], layout="linear",
                               small_files_only=False)
    t.delete_partition(["a"])          # replaces partition a's groups
    assert run_clustering(t, plan=plan) is None
    cluster_done = [i for i in t.timeline.completed()
                    if (t.timeline.metadata(i) or {}).get("operation") == "cluster"]
    assert not cluster_done
    assert {r.id for r in t.snapshot().collect()} == {2}


def test_clustering_due_trigger(spark, tmp_path):
    """clustering_due counts write commits since the last clustering
    (hoodie.clustering.async.max.commits) and stays False while a plan is
    pending."""
    eng = Engine(spark)
    t = eng.create_table(str(tmp_path / "due"), record_key_fields=["id"],
                         precombine_field="ts", partition_field="dt",
                         clustering_async_max_commits=2)
    t.insert(_rows(spark, [(1, 1.0, 1, "a")]))
    assert not clustering_due(t)
    t.insert(_rows(spark, [(2, 2.0, 1, "a")]))
    assert clustering_due(t)
    plan = schedule_clustering(t, sort_cols=["id"], small_files_only=False)
    assert not clustering_due(t)           # pending plan blocks re-trigger
    run_clustering(t, plan=plan)
    assert not clustering_due(t)           # counter reset by the completion


def test_occ_writer_reaps_stale_cluster_plan(spark, tmp_path):
    """Under OCC no single-writer guard heals a dead scheduler's plan, so a
    blocked upsert reaps stale-heartbeat cluster plans itself (mirrors the
    lazy failed-write cleaning the reference applies to service plans); a
    fresh-heartbeat plan still rejects the update."""
    import os
    eng = Engine(spark)
    t = eng.create_table(str(tmp_path / "occl"), record_key_fields=["id"],
                         precombine_field="ts", partition_field="dt",
                         concurrency_mode="occ")
    t.bulk_insert(_rows(spark, [(1, 1.0, 1, "a"), (2, 2.0, 1, "a")]))
    plan = schedule_clustering(t, sort_cols=["id"], layout="linear",
                               small_files_only=False)
    # live scheduler (fresh heartbeat): update still rejected, and the
    # rejected writer retracts its own minted instant (no pending leak)
    with pytest.raises(ClusteringUpdateRejected):
        t.upsert(_rows(spark, [(1, 9.0, 2, "a")]))
    assert [i.time for i in t.timeline.pending()] == [plan["instant"]]
    # scheduler dies: expire its heartbeat -> blocked writer reaps the plan
    hb_dir = os.path.join(t.base_path, ".hoodie", ".heartbeat")
    for f in os.listdir(hb_dir):
        with open(os.path.join(hb_dir, f), "w") as fh:
            fh.write("0")
    t.upsert(_rows(spark, [(1, 9.0, 2, "a")]))
    assert {(r.id, r.v) for r in t.snapshot().collect()} == {
        (1, 9.0), (2, 2.0)}
    assert not any(i.time == plan["instant"] for i in t.timeline.pending())
