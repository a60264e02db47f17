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
