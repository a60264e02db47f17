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


def test_change_column_widen_mixed_eras(spark, tmp_path):
    """ALTER TABLE CHANGE COLUMN widens the registered type without
    rewriting data (AlterHoodieTableChangeColumnCommand.scala:37-94): old
    int32/float files up-cast at read, a post-widen write stores values
    beyond the old range, and both eras agree in one snapshot."""
    eng = Engine(spark)
    t = eng.create_table(str(tmp_path / "cw"), name="cw",
                         record_key_fields=["id"], precombine_field="seq")
    t.bulk_insert(spark.createDataFrame(
        [(1, 10, 1.5, 1), (2, 20, 2.5, 1)],
        "id long, v int, f float, seq long"))
    t.change_column("v", "bigint")
    eng.sql("ALTER TABLE cw ALTER COLUMN f TYPE double")
    t.upsert(spark.createDataFrame([(3, 5_000_000_000, 9.25, 1)],
                                   "id long, v long, f double, seq long"))
    snap = t.snapshot()
    types = dict(snap.dtypes)
    assert types["v"] == "bigint" and types["f"] == "double"
    assert {(r.id, r.v, r.f) for r in snap.collect()} == {
        (1, 10, 1.5), (2, 20, 2.5), (3, 5_000_000_000, 9.25)}
    # idempotent same-type change is a no-op; narrowing and cross-family
    # changes are refused; record keys are protected
    t.change_column("v", "bigint")
    with pytest.raises(ValueError, match="does not widen"):
        t.change_column("v", "int")
    with pytest.raises(ValueError, match="does not widen"):
        t.change_column("f", "string")
    with pytest.raises(ValueError, match="record key"):
        t.change_column("id", "string")
    # CHANGE COLUMN must not rename (reference columnEqual check)
    with pytest.raises(ValueError, match="cannot rename"):
        eng.sql("ALTER TABLE cw CHANGE COLUMN v w BIGINT")
    # decimal widening via the Spark-2 CHANGE syntax
    t2 = eng.create_table(str(tmp_path / "cw2"), name="cw2",
                          record_key_fields=["id"])
    t2.insert(spark.createDataFrame([(1, "1.25")], "id long, d string")
              .select("id", F.col("d").cast("decimal(10,2)").alias("d")))
    eng.sql("ALTER TABLE cw2 CHANGE d d DECIMAL(20, 4)")
    assert dict(eng.table("cw2").snapshot().dtypes)["d"] == "decimal(20,4)"
    with pytest.raises(ValueError, match="does not widen"):
        eng.sql("ALTER TABLE cw2 CHANGE d d DECIMAL(10, 1)")
