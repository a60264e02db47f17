"""Replay of the reference's golden SQL corpus.

Mirrors hudi-spark-datasource/hudi-spark/src/test/resources/sql-statements.sql
statement-for-statement (CTAS, partitioned CTAS, static/dynamic-partition
inserts, insert overwrite of a partition, updates with expressions, delete,
three MERGE variants incl. subquery sources / `update set *` / a delete
branch, table rename, add column, drop), for both table types, asserting the
corpus's expected result tables. One adaptation: branch conditions inside
MERGE are qualified (`s0.name`) because our matched-branch frame exposes both
sides, where the reference resolves bare `name` against the source.
"""

import pytest

from hudi_0_12_0_my_spark import Engine


def _rows(spark, sql):
    return sorted(tuple(r) for r in spark.sql(sql).collect())


@pytest.mark.parametrize("ttype", ["cow", "mor"])
def test_golden_sql_statements(spark, tmp_path, ttype):
    eng = Engine(spark)
    d = str(tmp_path)
    q = eng.sql

    # ---- CTAS
    q(f"create table h0 using hudi options(type = '{ttype}', "
      f"primaryKey = 'id') location '{d}/h0' "
      "as select 1 as id, 'a1' as name, 10 as price")
    assert _rows(spark, "select id, name, price from h0") == [(1, "a1", 10)]

    q(f"create table h0_p using hudi partitioned by(dt) options("
      f"type = '{ttype}', primaryKey = 'id') location '{d}/h0_p' "
      "as select cast('2021-05-07 00:00:00' as timestamp) as dt, "
      "1 as id, 'a1' as name, 10 as price")
    assert _rows(spark, "select id, name, price, cast(dt as string) "
                 "from h0_p") == [(1, "a1", 10, "2021-05-07 00:00:00")]

    # ---- CREATE TABLE
    q(f"create table h1 (id bigint, name string, price double, ts bigint) "
      f"using hudi options (type = '{ttype}', primaryKey = 'id', "
      f"preCombineField = 'ts') location '{d}/h1'")
    q(f"create table h1_p (id bigint, name string, price double, ts bigint, "
      f"dt string) using hudi partitioned by (dt) options ("
      f"type = '{ttype}', primaryKey = 'id', preCombineField = 'ts') "
      f"location '{d}/h1_p'")

    # ---- INSERT
    q("insert into h1 values(1, 'a1', 10, 1000)")
    q("insert into h1 values(2, 'a2', 11, 1000)")

    # static partition
    q("insert into h1_p partition(dt = '2021-05-07') select * from h1")
    assert _rows(spark, "select id, name, price, ts, dt from h1_p") == [
        (1, "a1", 10.0, 1000, "2021-05-07"),
        (2, "a2", 11.0, 1000, "2021-05-07")]

    # insert overwrite a partition: same rows land, state unchanged
    q("insert overwrite table h1_p partition(dt = '2021-05-07') "
      "select * from h1 limit 10")
    assert _rows(spark, "select id, name, price, ts, dt from h1_p") == [
        (1, "a1", 10.0, 1000, "2021-05-07"),
        (2, "a2", 11.0, 1000, "2021-05-07")]

    # dynamic partition
    q("insert into h1_p "
      "select id, concat('a', id) as name, price, ts, dt from ( "
      "  select id + 2 as id, price + 2 as price, ts, '2021-05-08' as dt "
      "  from h1 ) "
      "union all "
      "select 5 as id, 'a5' as name, 10 as price, 1000 as ts, "
      "'2021-05-08' as dt")
    assert _rows(spark, "select id, name, price, ts, dt from h1_p") == [
        (1, "a1", 10.0, 1000, "2021-05-07"),
        (2, "a2", 11.0, 1000, "2021-05-07"),
        (3, "a3", 12.0, 1000, "2021-05-08"),
        (4, "a4", 13.0, 1000, "2021-05-08"),
        (5, "a5", 10.0, 1000, "2021-05-08")]

    # ---- UPDATE
    q("update h1_p set price = price * 2 where id % 2 = 1")
    assert _rows(spark, "select id, price from h1_p") == [
        (1, 20.0), (2, 11.0), (3, 24.0), (4, 13.0), (5, 20.0)]

    q("update h1 set price = if (id %2 = 1, price * 2, price)")
    assert _rows(spark, "select id, name, price, ts from h1") == [
        (1, "a1", 20.0, 1000), (2, "a2", 11.0, 1000)]

    # ---- DELETE
    q("delete from h1_p where id = 5")
    assert _rows(spark, "select count(1) from h1_p") == [(4,)]

    # ---- MERGE (subquery source, full update list + insert *)
    q("merge into h1_p t0 using ( select *, '2021-05-07' as dt from h1 ) s0 "
      "on t0.id = s0.id "
      "when matched then update set id = s0.id, name = s0.name, "
      "price = s0.price *2, ts = s0.ts, dt = s0.dt "
      "when not matched then insert *")
    assert _rows(spark, "select id, name, price, ts, dt from h1_p") == [
        (1, "a1", 40.0, 1000, "2021-05-07"),
        (2, "a2", 22.0, 1000, "2021-05-07"),
        (3, "a3", 24.0, 1000, "2021-05-08"),
        (4, "a4", 13.0, 1000, "2021-05-08")]

    # ---- MERGE (renamed source cols, update set *, insert (cols) values)
    q("merge into h1_p t0 using ( "
      "  select 5 as _id, 'a5' as _name, 10 as _price, 1000 as _ts, "
      "  '2021-05-08' as dt ) s0 "
      "on s0._id = t0.id "
      "when matched then update set * "
      "when not matched then insert (id, name, price, ts, dt) "
      "values(_id, _name, _price, _ts, s0.dt)")
    assert _rows(spark, "select id, name, price, ts, dt from h1_p") == [
        (1, "a1", 40.0, 1000, "2021-05-07"),
        (2, "a2", 22.0, 1000, "2021-05-07"),
        (3, "a3", 24.0, 1000, "2021-05-08"),
        (4, "a4", 13.0, 1000, "2021-05-08"),
        (5, "a5", 10.0, 1000, "2021-05-08")]

    # ---- MERGE (branch conditions + delete branch)
    q("merge into h1_p t0 using ( "
      "  select 1 as id, '_delete' as name, 10 as price, 1000 as ts, "
      "         '2021-05-07' as dt "
      "  union "
      "  select 2 as id, '_update' as name, 12 as price, 1001 as ts, "
      "         '2021-05-07' as dt "
      "  union "
      "  select 6 as id, '_insert' as name, 10 as price, 1000 as ts, "
      "         '2021-05-08' as dt ) s0 "
      "on s0.id = t0.id "
      "when matched and s0.name = '_update' then update set id = s0.id, "
      "name = s0.name, price = s0.price, ts = s0.ts, dt = s0.dt "
      "when matched and s0.name = '_delete' then delete "
      "when not matched and s0.name = '_insert' then insert *")
    assert _rows(spark, "select id, name, price, ts, dt from h1_p") == [
        (2, "_update", 12.0, 1001, "2021-05-07"),
        (3, "a3", 24.0, 1000, "2021-05-08"),
        (4, "a4", 13.0, 1000, "2021-05-08"),
        (5, "a5", 10.0, 1000, "2021-05-08"),
        (6, "_insert", 10.0, 1000, "2021-05-08")]

    # ---- ALTER TABLE
    q("alter table h1_p rename to h2_p")
    assert eng.has_table("h2_p") and not eng.has_table("h1_p")
    q("alter table h2_p add columns(ext0 int)")
    t = eng.table("h2_p")
    assert "ext0" in [f.name for f in t.snapshot().schema.fields]
    assert t.snapshot().count() == 5

    # ---- DROP TABLE
    for name in ("h0", "h0_p", "h1", "h2_p"):
        q(f"drop table {name}")
        assert not eng.has_table(name)
