"""Pre-commit validators (SparkPreCommitValidator family, SURVEY.md §2.7):
SQL assertions gate every write commit; a failing validator aborts the
staged write and the commit never becomes visible. Mirrors
TestPreCommitValidators / Sql*PreCommitValidator.java semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from hudi_0_12_0_my_spark import Engine, compat
from hudi_0_12_0_my_spark.services.validators import PreCommitValidationError


def rows(spark, data):
    return spark.createDataFrame(
        [Row(id=i, v=v, ts=t, dt=d) for i, v, t, d in data],
        "id int, v double, ts long, dt string")


BATCH = [(1, 10.0, 100, "2021-01-01"), (2, 20.0, 100, "2021-01-01"),
         (3, 30.0, 100, "2021-01-02"), (4, 40.0, 100, "2021-01-02")]


def make(spark, path, validators, **kw):
    return Engine(spark).create_table(
        str(path / "t"), record_key_fields=["id"], precombine_field="ts",
        partition_field="dt", precommit_validators=validators, **kw)


def test_equality_passes_on_upsert(spark, tmp_path):
    # distinct ids must survive the write: an upsert of existing keys keeps
    # them, so equality (prev ⊆ new, reference intersect test) holds
    t = make(spark, tmp_path,
             [{"kind": "equality",
               "queries": "SELECT id FROM <TABLE_NAME>"}])
    t.bulk_insert(rows(spark, BATCH))
    t.upsert(rows(spark, [(1, 11.0, 200, "2021-01-01")]))
    got = {(r.id, r.v) for r in t.snapshot().collect()}
    assert got == {(1, 11.0), (2, 20.0), (3, 30.0), (4, 40.0)}


def test_equality_rejects_row_loss(spark, tmp_path):
    t = make(spark, tmp_path,
             [{"kind": "equality",
               "queries": "SELECT id FROM <TABLE_NAME>"}])
    t.bulk_insert(rows(spark, BATCH))
    n_commits = len(t.timeline.completed_write_instants())
    with pytest.raises(PreCommitValidationError):
        t.delete(where="id = 2")                 # loses a prev id -> reject
    # the staged write was aborted: timeline unchanged, data unchanged
    assert len(t.timeline.completed_write_instants()) == n_commits
    assert not t.timeline.pending()
    got = {r.id for r in t.snapshot().collect()}
    assert got == {1, 2, 3, 4}


def test_inequality_requires_change(spark, tmp_path):
    # inequality asserts the write CHANGED the query result — an upsert that
    # re-writes identical rows is rejected, a real change passes. Configured
    # after seeding: on an EMPTY table the reference's intersect test
    # (0 == 0) reads as "equal" and rejects the bootstrap write too.
    t = make(spark, tmp_path, [])
    t.bulk_insert(rows(spark, BATCH))
    t.cfg.precommit_validators = [{"kind": "inequality",
                                   "queries": "SELECT id, v FROM <TABLE_NAME>"}]
    with pytest.raises(PreCommitValidationError):
        t.upsert(rows(spark, [(1, 10.0, 100, "2021-01-01")]))  # no-op rewrite
    t.upsert(rows(spark, [(1, 99.0, 200, "2021-01-01")]))      # real change
    assert {r.v for r in t.snapshot().filter("id = 1").collect()} == {99.0}


def test_single_value_expected_result(spark, tmp_path):
    # query#expected runs on the NEW state only
    # (SqlQuerySingleResultPreCommitValidator.java)
    t = make(spark, tmp_path,
             [{"kind": "single_value",
               "queries": "SELECT COUNT(*) FROM <TABLE_NAME> WHERE v < 0#0"}])
    t.bulk_insert(rows(spark, BATCH))
    t.upsert(rows(spark, [(5, 50.0, 100, "2021-01-02")]))
    with pytest.raises(PreCommitValidationError):
        t.upsert(rows(spark, [(6, -1.0, 100, "2021-01-02")]))
    assert {r.id for r in t.snapshot().collect()} == {1, 2, 3, 4, 5}


def test_callable_validator_and_mor(spark, tmp_path):
    # in-process validator over a MOR table: the after-state folds the
    # inflight deltacommit into the merge plan before anything lands
    t = make(spark, tmp_path, [], table_type="mor")
    t.bulk_insert(rows(spark, BATCH))
    seen = {}

    def guard(_spark, before, after):
        seen["before"], seen["after"] = before.count(), after.count()
        if after.filter("v > 100").count():
            raise PreCommitValidationError("price cap exceeded")

    t.add_precommit_validator(guard)
    t.upsert(rows(spark, [(5, 50.0, 100, "2021-01-02")]))
    assert (seen["before"], seen["after"]) == (2, 3)   # touched partition only
    with pytest.raises(PreCommitValidationError):
        t.upsert(rows(spark, [(6, 500.0, 100, "2021-01-02")]))
    assert {r.id for r in t.snapshot().collect()} == {1, 2, 3, 4, 5}


def test_compat_option_mapping():
    kw = compat.options_to_config({
        "hoodie.precommit.validators":
            "org.apache.hudi.client.validator.SqlQueryEqualityPreCommitValidator,"
            "org.apache.hudi.client.validator.SqlQuerySingleResultPreCommitValidator",
        "hoodie.precommit.validators.equality.sql.queries":
            "SELECT id FROM <TABLE_NAME>",
        "hoodie.precommit.validators.single.value.sql.queries":
            "SELECT COUNT(*) FROM <TABLE_NAME>#4",
    })
    assert kw["precommit_validators"] == [
        {"kind": "equality", "queries": "SELECT id FROM <TABLE_NAME>"},
        {"kind": "single_value",
         "queries": "SELECT COUNT(*) FROM <TABLE_NAME>#4"}]
    with pytest.raises(ValueError):
        compat.options_to_config(
            {"hoodie.precommit.validators": "com.example.Unknown"})
