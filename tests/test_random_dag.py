"""Randomized operation-DAG suite — the port of the reference's
hudi-integ-test layer (HoodieTestSuiteJob + dag/: yaml-defined random
sequences of insert/upsert/delete/compact/query nodes validated against
expected state).

A seeded RNG drives a sequence of write ops + table services against a real
table AND a driver-side model folded with the same payload/index semantics;
after every step the snapshot must equal the model exactly, and at the end
an incremental pull over the full history must equal the final state. Runs
for COW and MOR (bucket index included) so the same DAG exercises rewrite,
delta-append, compaction and replacecommit paths.

Index semantics matter:
- NON-global index: record identity is (partition, key) — an upsert that
  moves a key's partition value creates a SECOND record
  (HoodieSimpleIndex), and a row's partition always equals its partition
  column, so the model keys on (id, grp).
- GLOBAL index: identity is the bare key; an update lands in the STORED
  partition (HoodieGlobalSimpleIndex, update_partition_path=false) while
  the business partition column keeps the incoming value — the model keys
  on id and tracks the physical partition separately.

This suite found the incremental-resurrection bug (in-range files of
file groups later replaced by insert_overwrite / delete_partition leaked
back into incremental pulls).
"""

import random
import zlib

import pytest
from pyspark.sql import functions as F

from hudi_0_12_0_my_spark import Engine
from hudi_0_12_0_my_spark.services.clustering import (run_clustering,
                                                      schedule_clustering)
from hudi_0_12_0_my_spark.writer import ClusteringUpdateRejected

SCHEMA = "id long, grp string, val double, seq long"
GRPS = ["a", "b", "c"]


def _rows(rng, ids, seq, grp=None):
    return [(i, grp if grp else GRPS[rng.randrange(len(GRPS))],
             float(rng.randrange(10000)) / 100.0, seq) for i in ids]


def run_dag(spark, base_path, table_type, index_type, global_index,
            seed, n_steps=None, bootstrap=False):
    """One full randomized DAG run; importable for offline seed sweeps.

    Default in-gate depth is 8 steps (suite time budget — VERIFY r7 hit the
    driver's pytest window); SPARK_GRAFT_TEST_SWEEP=full restores the
    12-step sweep (run offline and recorded green in OPTIMIZATION_r08.md).
    Same seed => the shorter sweep is a deterministic PREFIX of the full
    one, so coverage shrinks in depth only, never in kind."""
    import os
    if n_steps is None:
        n_steps = 12 if os.environ.get("SPARK_GRAFT_TEST_SWEEP") == "full" \
            else 8
    rng = random.Random(seed)
    eng = Engine(spark)
    kw = {"record_key_fields": ["id"], "precombine_field": "seq",
          "partition_field": "grp", "table_type": table_type,
          "global_index": global_index}
    if index_type in ("bucket", "bucket_consistent"):
        kw.update(index_type=index_type, num_buckets=4)
    rows0 = []
    if bootstrap:
        # start from a METADATA_ONLY bootstrap of pre-existing parquet dirs
        # (one subdir per partition): every later service/read must cope
        # with file slices whose bytes live outside the table dir
        rows0 = _rows(rng, rng.sample(range(200), 12), 0)
        df0 = spark.createDataFrame(rows0, SCHEMA)
        for g in sorted({r[1] for r in rows0}):
            df0.filter(F.col("grp") == g).coalesce(1) \
               .write.parquet(os.path.join(base_path + "_src", g))
        t = eng.bootstrap(base_path, base_path + "_src", **kw)
    else:
        t = eng.create_table(base_path, **kw)

    # model: key -> (pp, grp, val, seq); key = id (global) or (id, grp)
    model: dict = {}
    commits: list = []            # (instant, model copy) after each write op
    seq = 0
    for (i, g, v, s) in rows0:
        model[i if global_index else (i, g)] = (g, g, v, s)
    if bootstrap:
        commits.append((t.timeline.completed_write_instants()[-1].time,
                        dict(model)))

    def _key(i, g):
        return i if global_index else (i, g)

    def _snap():
        if global_index:
            return {r.id: (r.grp, r.val, r.seq)
                    for r in t.snapshot().collect()}
        return {(r.id, r.grp): (r.grp, r.val, r.seq)
                for r in t.snapshot().collect()}

    def _want():
        return {k: (v[1], v[2], v[3]) for k, v in model.items()}

    def _check(step):
        got, want = _snap(), _want()
        assert got == want, (
            f"step {step}: snapshot diverged\n"
            f"  missing: {sorted(set(want) - set(got))[:5]}\n"
            f"  extra:   {sorted(set(got) - set(want))[:5]}\n"
            f"  changed: {[k for k in set(got) & set(want) if got[k] != want[k]][:5]}")

    def live_ids():
        return sorted({k if global_index else k[0] for k in model})

    def write_op(kind):
        nonlocal seq, model
        seq += 1
        if kind == "upsert":
            ids = rng.sample(range(200), rng.randrange(5, 40))
            rows = _rows(rng, ids, seq)
            t.upsert(spark.createDataFrame(rows, SCHEMA))
            for (i, g, v, s) in rows:
                k = _key(i, g)
                pp = model[k][0] if (global_index and k in model) else g
                model[k] = (pp, g, v, s)   # overwrite_latest: incoming wins
        elif kind == "insert":
            taken = set(live_ids())
            ids = [i for i in rng.sample(range(200, 400),
                                         rng.randrange(3, 20))
                   if i not in taken]
            rows = _rows(rng, ids, seq)
            t.insert(spark.createDataFrame(rows, SCHEMA))
            for (i, g, v, s) in rows:
                model[_key(i, g)] = (g, g, v, s)
        elif kind == "delete":
            live = live_ids()
            if not live:
                return False
            ids = set(rng.sample(live, min(len(live), rng.randrange(1, 15))))
            t.delete(t.snapshot().filter(F.col("id").isin(list(ids))))
            model = {k: r for k, r in model.items()
                     if (k if global_index else k[0]) not in ids}
        elif kind == "insert_overwrite":
            g = rng.choice(GRPS)
            # per-partition id bands: insert_overwrite does NO index lookup
            # (reference semantics), so a shared id range would create
            # legitimate cross-partition duplicates the id-keyed global
            # model cannot represent
            lo = 400 + 33 * GRPS.index(g)
            ids = rng.sample(range(lo, lo + 33), rng.randrange(3, 10))
            rows = _rows(rng, ids, seq, grp=g)
            t.insert_overwrite(spark.createDataFrame(rows, SCHEMA))
            model = {k: r for k, r in model.items() if r[0] != g}
            for (i, gg, v, s) in rows:
                model[_key(i, gg)] = (gg, gg, v, s)
        elif kind == "delete_partition":
            g = rng.choice(GRPS)
            t.delete_partition([g])
            model = {k: r for k, r in model.items() if r[0] != g}
        elif kind == "merge":
            ids = rng.sample(range(200), rng.randrange(5, 25))
            rows = _rows(rng, ids, seq)
            src = spark.createDataFrame(rows, SCHEMA)
            on = "t.id = s.id" if global_index \
                else "t.id = s.id AND t.grp = s.grp"
            t.merge(src, on=on,
                    when_matched_update={"val": "s.val", "seq": "s.seq"},
                    when_not_matched_insert="*")
            for (i, g, v, s) in rows:
                k = _key(i, g)
                if k in model:
                    # matched: val/seq update only — row stays in its
                    # partition and keeps its stored grp column
                    pp, gg, _v, _s = model[k]
                    model[k] = (pp, gg, v, s)
                else:
                    model[k] = (g, g, v, s)
        commits.append((t.timeline.completed_write_instants()[-1].time,
                        dict(model)))
        return True

    ops = ["upsert", "upsert", "insert", "delete", "insert_overwrite",
           "delete_partition", "merge"]
    services = ["compact", "cluster", "clean", "archive", "none", "none"]

    write_op("upsert")            # seed data
    _check("seed")
    for step in range(n_steps):
        did = write_op(rng.choice(ops))
        if did:
            _check(f"{step}-write")
        svc = rng.choice(services)
        if svc == "compact" and table_type == "mor":
            t.compact()
        elif svc == "cluster" and rng.random() < 0.5:
            if index_type == "bucket":
                # bucket ids address file groups; clustering must refuse
                # (it would re-home rows into non-bucket group ids)
                with pytest.raises(ValueError, match="bucket"):
                    t.cluster(sort_cols=["id"])
            elif index_type == "bucket_consistent":
                # consistent hashing's clustering analogue is a resize
                # (SparkConsistentBucketClusteringPlanStrategy); plain
                # sort-clustering must refuse here too
                with pytest.raises(ValueError, match="bucket"):
                    t.cluster(sort_cols=["id"])
                t.resize_buckets(split_above=1)   # force splits, then verify
            elif rng.random() < 0.5:
                t.cluster(sort_cols=["id"])
            else:
                # async schedule/run split: a random write lands BETWEEN
                # schedule and run. Updates hitting planned groups must be
                # REJECTED (SparkRejectUpdateStrategy) with the model
                # untouched; inserts commit into unblocked groups; replace
                # ops (insert_overwrite / delete_partition) supersede the
                # plan and the run must ABORT, never rewrite a stale subset
                plan = schedule_clustering(t, sort_cols=["id"],
                                           small_files_only=False)
                if plan is not None:
                    try:
                        if write_op(rng.choice(ops)):
                            _check(f"{step}-between-schedule-run")
                    except ClusteringUpdateRejected:
                        pass          # write raised before mutating state
                    _check(f"{step}-pre-run")
                    run_clustering(t, plan=plan)   # None if superseded
        elif svc == "clean":
            t.clean(policy="KEEP_LATEST_COMMITS", retain=8)
        elif svc == "archive":
            t.archive(retain_active=8)
        if svc != "none":
            _check(f"{step}-{svc}")

    def _fold(df):
        if global_index:
            return {r.id: (r.grp, r.val, r.seq) for r in df.collect()}
        return {(r.id, r.grp): (r.grp, r.val, r.seq) for r in df.collect()}

    def _proj(m):
        return {k: (v[1], v[2], v[3]) for k, v in m.items()}

    # incremental over the whole history folds to the final state (deleted
    # rows drop, replaced file groups must not resurrect, latest version
    # per identity survives)
    assert _fold(t.incremental(begin="0")) == _want()

    # time travel to recent write instants reproduces the recorded model
    # (recent = inside the cleaning retention window)
    for instant, m in commits[-3:]:
        got, want = _fold(t.time_travel(instant)), _proj(m)
        assert got == want, (
            f"time_travel({instant}) diverged (commit "
            f"{[c for c, _ in commits].index(instant) + 1}/{len(commits)})\n"
            f"  missing: {sorted(set(want) - set(got))[:5]}\n"
            f"  extra:   {sorted(set(got) - set(want))[:5]}\n"
            f"  changed: {[k for k in set(got) & set(want) if got[k] != want[k]][:5]}")

    # incremental windows between recorded commits equal the model diff:
    # every seq bump changes the row value, so "changed since i, alive at
    # j" is exactly the window's contents
    for _ in range(3):
        i = rng.randrange(max(len(commits) - 4, 0), len(commits) - 1)
        j = rng.randrange(i + 1, len(commits))
        (ci, mi), (cj, mj) = commits[i], commits[j]
        wi, wj = _proj(mi), _proj(mj)
        expect = {k: v for k, v in wj.items() if wi.get(k) != v}
        got = _fold(t.incremental(begin=ci, end=cj))
        assert got == expect, f"incremental({ci}, {cj}] diverged"

    # rollback of one final upsert restores the pre-upsert state
    pre = dict(model)
    seq += 1
    extra = _rows(rng, rng.sample(range(200), 5), seq)
    t.upsert(spark.createDataFrame(extra, SCHEMA))
    t.rollback(t.timeline.completed_write_instants()[-1].time)
    t = t.reload()
    model = pre
    _check("rollback")

    # savepoint -> more writes -> restore lands exactly on the pinned state
    sp = t.savepoint()
    pinned = dict(model)
    for _ in range(2):
        write_op(rng.choice(["upsert", "delete", "insert_overwrite"]))
    _check("post-savepoint-writes")
    t.restore(sp)
    t = t.reload()
    model = pinned
    _check("restore")

    # the zero-import format('hudi') path must agree with the library on
    # the DAG's final state: the standalone timeline fold (datasource.py)
    # vs fsview parity under this run's random mix of writes, compaction,
    # clustering, cleaning, archival, rollback and restore. (Bootstrap
    # DAGs excluded: bootstrap bases carry no meta columns and the format
    # documents its refusal surface for them.)
    if not bootstrap:
        fmt = spark.read.format("hudi").load(base_path) \
            .select("id", "grp", "val", "seq")
        assert _fold(fmt) == _want(), "format snapshot diverged from model"
        wr = t.timeline.completed_write_instants()
        if len(wr) >= 2:
            lo_i, hi_i = wr[-2].time, wr[-1].time
            fmt_inc = (spark.read.format("hudi")
                       .option("hoodie.datasource.query.type", "incremental")
                       .option("hoodie.datasource.read.begin.instanttime",
                               lo_i)
                       .option("hoodie.datasource.read.end.instanttime",
                               hi_i)
                       .load(base_path).select("id", "grp", "val", "seq"))
            lib_inc = t.incremental(begin=lo_i, end=hi_i) \
                .select("id", "grp", "val", "seq")
            assert _fold(fmt_inc) == _fold(lib_inc), \
                "format incremental diverged from library"


@pytest.mark.parametrize("table_type,index_type,global_index", [
    ("cow", "simple", False), ("cow", "simple", True),
    ("cow", "bucket", False), ("mor", "simple", True),
    ("mor", "simple", False), ("mor", "bucket", False),
    ("cow", "bucket_consistent", False), ("mor", "bucket_consistent", False)])
def test_random_dag(spark, tmp_path, table_type, index_type, global_index):
    # crc32, not hash(): Python string hashing is process-salted and would
    # make the DAG nondeterministic across runs
    seed = zlib.crc32(f"{table_type}-{index_type}-{global_index}".encode())
    run_dag(spark, str(tmp_path / "dag"), table_type, index_type,
            global_index, seed)


@pytest.mark.parametrize("table_type", ["cow", "mor"])
def test_random_dag_bootstrap_start(spark, tmp_path, table_type):
    """Same DAG body, but the table begins life as a METADATA_ONLY bootstrap
    over external parquet dirs — services and reads run over adopted
    file slices from step one."""
    seed = zlib.crc32(f"boot-{table_type}".encode())
    run_dag(spark, str(tmp_path / "dag"), table_type, "simple", False,
            seed, bootstrap=True)
