"""Admin CLI (hudi-cli parity front-end over the procedure registry)."""

import json

from hudi_0_12_0_my_spark import Engine
from hudi_0_12_0_my_spark.cli import main


def _mk(spark, rows):
    return spark.createDataFrame(rows, "id long, grp string, val double, seq long")


def test_cli_commands(spark, tmp_path, capsys):
    eng = Engine(spark)
    path = str(tmp_path / "t")
    t = eng.create_table(path, record_key_fields=["id"],
                         precombine_field="seq", partition_field="grp")
    t.bulk_insert(_mk(spark, [(1, "a", 1.0, 1), (2, "b", 2.0, 1)]))
    t.upsert(_mk(spark, [(1, "a", 9.0, 2)]))

    def run(*args):
        assert main(["--table", path, "--json", *args], spark=spark) == 0
        return [json.loads(ln) for ln in
                capsys.readouterr().out.strip().splitlines()]

    commits = run("commits")
    assert len(commits) == 2
    assert {c["operation"] for c in commits} == {"bulk_insert", "upsert"}

    tl = run("timeline")
    assert [r["state"] for r in tl] == ["completed", "completed"]

    mets = run("metrics")
    assert len(mets) == 2
    assert all(m["duration_ms"] > 0 and m["total_files_written"] >= 1
               for m in mets)

    parts = run("partitions")
    assert sorted(p["partition"] for p in parts) == ["a", "b"]

    desc = run("desc")
    props = {d["property"]: d["value"] for d in desc}
    assert json.loads(props["record_key_fields"]) == ["id"]

    # raw procedure pass-through with --key value args
    files = run("show_commit_files", "--instant", commits[-1]["commit_time"])
    assert files and all("file" in json.dumps(f) for f in files)

    sp = run("savepoint", "--instant_time", commits[-1]["commit_time"])
    assert sp
    assert run("savepoints")


def test_export_instants_via_cli(spark, tmp_path, capsys):
    """hudi-cli ExportCommand through the CLI front-end (the procedure
    itself is covered by test_sql_and_procedures)."""
    eng = Engine(spark)
    path = str(tmp_path / "e")
    t = eng.create_table(path, record_key_fields=["id"],
                         precombine_field="seq", partition_field="grp")
    t.bulk_insert(_mk(spark, [(1, "a", 1.0, 1)]))
    t.upsert(_mk(spark, [(1, "a", 2.0, 2)]))
    out = tmp_path / "export"
    assert main(["--table", path, "--json", "export_instants",
                 "--out_path", str(out)], spark=spark) == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["exported"] == 2
    assert len(list(out.iterdir())) == 2


def test_sql_two_level_partitioned_table(spark, tmp_path):
    """PARTITIONED BY (a, b) through SQL: nested partition directories,
    SHOW PARTITIONS and partition-scoped queries work."""
    eng = Engine(spark)
    eng.sql(f"create table t2p (id bigint, name string, region string, "
            f"day string) using hudi partitioned by (region, day) "
            f"options (primaryKey = 'id') location '{tmp_path}/t2p'")
    eng.sql("insert into t2p values (1, 'a', 'eu', '2024-01-01'), "
            "(2, 'b', 'eu', '2024-01-02'), (3, 'c', 'us', '2024-01-01')")
    t = eng.table("t2p")
    assert sorted(t.partitions()) == \
        ["eu/2024-01-01", "eu/2024-01-02", "us/2024-01-01"]
    rows = sorted(tuple(r) for r in spark.sql(
        "select id, region, day from t2p where region = 'eu'").collect())
    assert rows == [(1, "eu", "2024-01-01"), (2, "eu", "2024-01-02")]
