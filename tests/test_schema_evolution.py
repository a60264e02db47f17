"""Schema evolution: add column, rename column (mixed-era file reads)."""

import pytest
from pyspark.sql import functions as F

from hudi_0_12_0_my_spark import Engine


@pytest.fixture()
def eng_t(spark, tmp_path):
    eng = Engine(spark)
    t = eng.create_table(str(tmp_path / "se"), name="se",
                         record_key_fields=["id"], precombine_field="seq")
    t.bulk_insert(spark.createDataFrame(
        [(1, 10.0, 1), (2, 20.0, 1)], "id long, val double, seq long"))
    return eng, t


def test_add_column(eng_t, spark):
    eng, t = eng_t
    t.add_column("note", "string")
    snap = t.snapshot()
    assert "note" in snap.columns
    assert snap.filter(F.col("note").isNull()).count() == 2
    t.upsert(spark.createDataFrame([(3, 30.0, 1, "hi")],
                                   "id long, val double, seq long, note string"))
    got = {r.id: r.note for r in t.snapshot().collect()}
    assert got == {1: None, 2: None, 3: "hi"}


def test_rename_column_mixed_era_files(eng_t, spark):
    eng, t = eng_t
    t.rename_column("val", "amount")
    snap = t.snapshot()
    assert "amount" in snap.columns and "val" not in snap.columns
    assert {r.id: r.amount for r in snap.collect()} == {1: 10.0, 2: 20.0}

    # new write uses the new name; old file (val) + new file (amount) coexist
    t.upsert(spark.createDataFrame([(2, 99.0, 2), (3, 30.0, 1)],
                                   "id long, amount double, seq long"))
    got = {r.id: r.amount for r in t.snapshot().collect()}
    assert got == {1: 10.0, 2: 99.0, 3: 30.0}

    # chained rename a->b->c still resolves the oldest files
    t.rename_column("amount", "price")
    got = {r.id: r.price for r in t.snapshot().collect()}
    assert got == {1: 10.0, 2: 99.0, 3: 30.0}


def test_rename_guards(eng_t):
    _eng, t = eng_t
    with pytest.raises(ValueError, match="no column"):
        t.rename_column("nope", "x")
    with pytest.raises(ValueError, match="record key"):
        t.rename_column("id", "id2")


def test_alter_sql(eng_t, spark):
    eng, t = eng_t
    eng.sql("ALTER TABLE se ADD COLUMNS (tag string)")
    assert "tag" in eng.table("se").snapshot().columns
    eng.sql("ALTER TABLE se RENAME COLUMN val TO amount")
    snap = eng.table("se").snapshot()
    assert "amount" in snap.columns
    assert {r.id: r.amount for r in snap.collect()} == {1: 10.0, 2: 20.0}
