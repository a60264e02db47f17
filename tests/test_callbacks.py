"""Write-commit callbacks (HoodieWriteCommitCallback parity)."""

import json

from hudi_0_12_0_my_spark import Engine


def _mk(spark, rows):
    return spark.createDataFrame(rows, "id long, grp string, val double, seq long")


def test_on_commit_listener_and_file_callback(spark, tmp_path):
    eng = Engine(spark)
    sink = tmp_path / "cb.jsonl"
    t = eng.create_table(str(tmp_path / "t"), record_key_fields=["id"],
                         precombine_field="seq", partition_field="grp",
                         commit_callback=f"file:{sink}")
    seen = []
    t.on_commit(seen.append)

    t.bulk_insert(_mk(spark, [(1, "a", 1.0, 1)]))
    t.upsert(_mk(spark, [(1, "a", 2.0, 2)]))

    assert len(seen) == 2
    assert seen[0]["operation"] == "bulk_insert"
    assert seen[1]["operation"] == "upsert"
    assert seen[1]["table_name"] == "t"
    assert "a" in seen[1]["partition_to_write_stats"]
    commits = [i.time for i in t.timeline.completed_write_instants()]
    assert [m["commit_time"] for m in seen] == commits

    lines = [json.loads(ln) for ln in sink.read_text().splitlines()]
    assert [m["commit_time"] for m in lines] == commits


def test_failing_callback_never_fails_the_commit(spark, tmp_path):
    eng = Engine(spark)
    t = eng.create_table(str(tmp_path / "t2"), record_key_fields=["id"],
                         precombine_field="seq", partition_field="grp",
                         commit_callback="file:/nonexistent-dir/nope.jsonl")

    def boom(msg):
        raise RuntimeError("listener exploded")

    t.on_commit(boom)
    t.bulk_insert(_mk(spark, [(1, "a", 1.0, 1)]))   # must not raise
    assert t.snapshot().count() == 1
    assert len(t.timeline.completed_write_instants()) == 1
