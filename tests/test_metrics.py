"""Commit metrics + reporters (HoodieMetrics / MetricsReporterType parity).

Counters are folded into commit metadata before the instant file lands
(durable, queryable via CALL show_commit_metrics) and dispatched post-commit
to the configured reporter; reporter failures never unwind a commit.
"""

import json

import pytest

from hudi_0_12_0_my_spark import Engine
from hudi_0_12_0_my_spark import metrics


def _mk(spark, rows):
    return spark.createDataFrame(rows,
                                 "id long, grp string, val double, seq long")


def test_write_commits_carry_metrics(spark, tmp_path):
    eng = Engine(spark)
    t = eng.create_table(str(tmp_path / "t"), record_key_fields=["id"],
                         precombine_field="seq", partition_field="grp")
    t.bulk_insert(_mk(spark, [(1, "a", 1.0, 1), (2, "b", 2.0, 1)]))
    t.upsert(_mk(spark, [(1, "a", 9.0, 2)]))
    mds = [t.timeline.metadata(i)
           for i in t.timeline.completed_write_instants()]
    for md in mds:
        m = md["metrics"]
        assert m["duration_ms"] > 0            # timer started at mint
        assert m["total_files_written"] == m["total_base_files_written"]
        assert m["total_bytes_written"] > 0
    assert mds[0]["metrics"]["total_records_written"] == 2
    assert mds[0]["metrics"]["total_partitions_written"] == 2
    assert mds[1]["metrics"]["total_records_written"] >= 1


def test_compact_and_clean_emit_metrics(spark, tmp_path):
    eng = Engine(spark)
    t = eng.create_table(str(tmp_path / "m"), record_key_fields=["id"],
                         precombine_field="seq", partition_field="grp",
                         table_type="mor")
    t.bulk_insert(_mk(spark, [(1, "a", 1.0, 1), (2, "a", 2.0, 1)]))
    t.upsert(_mk(spark, [(1, "a", 5.0, 2)]))
    t.compact()
    # force the cleaner past retention so it actually removes files
    for s in range(3, 7):
        t.upsert(_mk(spark, [(1, "a", float(s), s)]))
        t.compact()
    t.clean(policy="KEEP_LATEST_COMMITS", retain=1)
    by_action = {}
    for ins in t.timeline.completed():
        md = t.timeline.metadata(ins) or {}
        if "metrics" in md:
            by_action.setdefault(ins.action, []).append(md["metrics"])
    assert "clean" in by_action
    clean_m = by_action["clean"][-1]
    assert clean_m["total_files_deleted"] > 0
    assert clean_m["duration_ms"] > 0
    compact_like = [m for ms in by_action.values() for m in ms
                    if m.get("total_log_files_written") is not None]
    assert any(m["total_records_written"] > 0 for m in compact_like)
    # compaction commits specifically (operation=compact) carry timers
    comp = [t.timeline.metadata(i)["metrics"]
            for i in t.timeline.completed()
            if (t.timeline.metadata(i) or {}).get("operation") == "compact"]
    assert comp and all(m["duration_ms"] > 0 for m in comp)


def test_registered_reporter_plugin_and_json_file(spark, tmp_path):
    seen = []
    metrics.register("capture_test", seen.append)
    eng = Engine(spark)
    t = eng.create_table(str(tmp_path / "r"), record_key_fields=["id"],
                         precombine_field="seq", partition_field="grp",
                         metrics_reporter="capture_test")
    t.bulk_insert(_mk(spark, [(1, "a", 1.0, 1)]))
    t.upsert(_mk(spark, [(1, "a", 2.0, 2)]))
    assert len(seen) == 2
    assert seen[0]["action"] in ("commit", "deltacommit")
    assert seen[0]["metrics"]["total_records_written"] == 1
    assert seen[1]["operation"] == "upsert"
    assert seen[1]["table_name"] == "r"

    sink = tmp_path / "metrics.jsonl"
    t2 = eng.create_table(str(tmp_path / "j"), record_key_fields=["id"],
                          precombine_field="seq", partition_field="grp",
                          metrics_reporter=f"json:{sink}")
    t2.bulk_insert(_mk(spark, [(5, "a", 1.0, 1)]))
    lines = [json.loads(ln) for ln in sink.read_text().splitlines()]
    assert len(lines) == 1
    assert lines[0]["metrics"]["total_files_written"] == 1


def test_failing_reporter_never_fails_the_commit(spark, tmp_path):
    eng = Engine(spark)
    t = eng.create_table(str(tmp_path / "f"), record_key_fields=["id"],
                         precombine_field="seq", partition_field="grp",
                         metrics_reporter="json:/nonexistent-dir/nope.jsonl")
    t.bulk_insert(_mk(spark, [(1, "a", 1.0, 1)]))   # must not raise
    assert t.snapshot().count() == 1
    with pytest.raises(ValueError, match="metrics_reporter"):
        metrics._dispatch_one("garbage-spec-with-no-colon", {})


def test_show_commit_metrics_procedure(spark, tmp_path):
    eng = Engine(spark)
    t = eng.create_table(str(tmp_path / "p"), record_key_fields=["id"],
                         precombine_field="seq", partition_field="grp",
                         name="mtbl")
    t.bulk_insert(_mk(spark, [(1, "a", 1.0, 1), (2, "b", 1.0, 1)]))
    t.upsert(_mk(spark, [(2, "b", 3.0, 2)]))
    rows = eng.call("show_commit_metrics", table="mtbl").collect()
    assert len(rows) == 2
    assert all(r.duration_ms > 0 for r in rows)
    assert rows[0].total_records_written == 2
    assert rows[0].total_partitions_written == 2
    # and the raw JSON surface exposes the same block
    meta_rows = eng.call("show_commits_metadata", table="mtbl").collect()
    assert all("metrics" in json.loads(r.metadata) for r in meta_rows)
