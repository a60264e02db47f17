"""Cross-PROCESS optimistic concurrency: two real driver processes (own
JVMs) upserting the same OCC table concurrently. Exercises what the
in-process tests cannot: the file-lock commit critical section and the
table-unique instant minting (.hoodie/.last_instant) across processes."""

import os
import subprocess
import sys

from pyspark.sql import functions as F  # noqa: F401  (fixture session)

from hudi_0_12_0_my_spark import Engine

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = """
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[2]")
         .appName("occ-worker-{tag}")
         .config("spark.sql.shuffle.partitions", "2")
         .config("spark.ui.enabled", "false").getOrCreate())
from hudi_0_12_0_my_spark import Engine
from hudi_0_12_0_my_spark.writer import ConcurrentWriteConflictError
eng = Engine(spark)
for seq in range(2, 5):
    df = spark.createDataFrame(
        [(i, {grp!r}, float(seq * 1000 + i), seq) for i in range({lo}, {hi})],
        "id long, grp string, val double, seq long")
    for attempt in range(8):
        try:
            eng.load_table({path!r}).upsert(df)
            break
        except ConcurrentWriteConflictError:
            continue
    else:
        raise SystemExit("worker {tag}: conflict retries exhausted")
print("WORKER {tag} DONE")
"""


def test_two_processes_occ_upserts(spark, tmp_path):
    eng = Engine(spark)
    path = str(tmp_path / "occ_mp")
    t = eng.create_table(path, record_key_fields=["id"],
                         precombine_field="seq", partition_field="grp",
                         concurrency_mode="occ")
    t.bulk_insert(spark.createDataFrame(
        [(i, "a" if i < 10 else "b", float(i), 1) for i in range(20)],
        "id long, grp string, val double, seq long"))

    procs = []
    for tag, grp, lo, hi in (("A", "a", 0, 10), ("B", "b", 10, 20)):
        code = WORKER.format(repo=REPO, tag=tag, grp=grp, lo=lo, hi=hi,
                             path=path)
        procs.append(subprocess.Popen(
            [sys.executable, "-c", code],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    outs = [p.communicate(timeout=300)[0].decode() for p in procs]
    assert all(p.returncode == 0 for p in procs), outs
    assert "WORKER A DONE" in outs[0] and "WORKER B DONE" in outs[1]

    t = t.reload()
    # all 6 worker commits landed (3 per process) on top of the bulk insert
    times = [i.time for i in t.timeline.completed_write_instants()]
    assert len(times) == 7
    assert len(set(times)) == 7              # cross-process unique instants
    assert t.timeline.pending() == []
    snap = {r.id: (r.val, r.seq) for r in t.snapshot().collect()}
    assert len(snap) == 20
    for i in range(20):
        assert snap[i] == (4000.0 + i, 4)    # every worker's last seq won
