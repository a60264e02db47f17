"""Streaming tests: sink (foreachBatch upsert), CDC ingest with hot-reload,
multi-table job, and the hudi_stream incremental source."""

import json
import os
import time

import pytest
from pyspark.sql import functions as F

from hudi_0_12_0_my_spark import Engine
from hudi_0_12_0_my_spark.streaming import (TableStreamConfig,
                                            register_stream_source,
                                            schema_from_fields,
                                            start_multi_table_ingest,
                                            start_table_stream, stream_write)


def _write_jsonl(dirpath, name, rows):
    os.makedirs(dirpath, exist_ok=True)
    tmp = os.path.join(dirpath, f".{name}.tmp")
    with open(tmp, "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")
    os.rename(tmp, os.path.join(dirpath, name))


def test_schema_from_fields_types():
    st = schema_from_fields([
        {"name": "a", "type": "varchar"}, {"name": "b", "type": "decimal(10,2)"},
        {"name": "c", "type": "timestamp"}, {"name": "d", "type": "int"},
        {"name": "e", "type": "bigint"}])
    kinds = [f.dataType.simpleString() for f in st.fields]
    assert kinds == ["string", "decimal(10,2)", "timestamp", "int", "bigint"]
    with pytest.raises(ValueError, match="unsupported"):
        schema_from_fields([{"name": "x", "type": "blob"}])


def test_stream_sink_upsert(spark, tmp_path):
    eng = Engine(spark)
    t = eng.create_table(str(tmp_path / "tbl"), record_key_fields=["id"],
                         precombine_field="seq", partition_field="grp")
    src_dir = str(tmp_path / "in")
    _write_jsonl(src_dir, "b1.json",
                 [{"id": 1, "grp": "a", "val": 1.0, "seq": 1},
                  {"id": 2, "grp": "b", "val": 2.0, "seq": 1}])
    raw = (spark.readStream.format("text").load(src_dir)
           .select(F.from_json(
               "value", "id long, grp string, val double, seq long").alias("r"))
           .select("r.*"))
    q = stream_write(t, raw, str(tmp_path / "ckpt")) \
        .trigger(availableNow=True).start()
    q.awaitTermination(120)
    assert t.snapshot().count() == 2

    # second batch: update id=1, insert id=3; checkpoint skips b1
    _write_jsonl(src_dir, "b2.json",
                 [{"id": 1, "grp": "a", "val": 10.0, "seq": 2},
                  {"id": 3, "grp": "a", "val": 3.0, "seq": 1}])
    q = stream_write(t, raw, str(tmp_path / "ckpt")) \
        .trigger(availableNow=True).start()
    q.awaitTermination(120)
    snap = {r.id: r.val for r in t.snapshot().collect()}
    assert snap == {1: 10.0, 2: 2.0, 3: 3.0}
    # one commit per micro-batch (checkpoint-commit cadence)
    assert len(t.timeline.completed_write_instants()) == 2


def test_cdc_ingest_with_hot_reload(spark, tmp_path):
    eng = Engine(spark)
    cfg_file = str(tmp_path / "cfg.json")
    src_dir = str(tmp_path / "stream")
    cfg = {
        "name": "cdc1", "base_path": str(tmp_path / "cdc1"),
        "fields": [{"name": "id", "type": "bigint"},
                   {"name": "grp", "type": "string"},
                   {"name": "val", "type": "double"},
                   {"name": "seq", "type": "bigint"}],
        "record_key_fields": ["id"], "precombine_field": "seq",
        "partition_field": "grp", "op_col": "op",
        "source": {"format": "json-files", "path": src_dir},
    }
    with open(cfg_file, "w") as fh:
        json.dump(cfg, fh)

    _write_jsonl(src_dir, "b1.json", [
        {"id": 1, "grp": "a", "val": 1.0, "seq": 1, "op": "I"},
        {"id": 2, "grp": "a", "val": 2.0, "seq": 1, "op": "I"},
        {"id": 3, "grp": "b", "val": 3.0, "seq": 1, "op": "I"}])
    tc = TableStreamConfig.from_file(cfg_file)
    q = start_table_stream(eng, tc, str(tmp_path / "ck"),
                           trigger={"availableNow": True})
    q.awaitTermination(120)
    t = eng.table("cdc1")
    assert t.snapshot().count() == 3

    # update + delete via CDC ops; hot-add a column to the config first
    cfg["fields"].append({"name": "extra", "type": "string"})
    with open(cfg_file, "w") as fh:
        json.dump(cfg, fh)
    _write_jsonl(src_dir, "b2.json", [
        {"id": 1, "grp": "a", "val": 10.0, "seq": 2, "op": "U",
         "extra": "hello"},
        {"id": 2, "grp": "a", "val": 0.0, "seq": 2, "op": "D"}])
    q = start_table_stream(eng, tc, str(tmp_path / "ck"),
                           trigger={"availableNow": True})
    q.awaitTermination(120)
    snap = {r.id: r for r in eng.table("cdc1").snapshot().collect()}
    assert set(snap) == {1, 3}
    assert snap[1].val == 10.0
    assert snap[1].extra == "hello"      # hot-reloaded column, no restart


def test_multi_table_one_job(spark, tmp_path):
    eng = Engine(spark)
    confs = []
    for name in ("t_a", "t_b"):
        src = str(tmp_path / f"in_{name}")
        _write_jsonl(src, "b.json",
                     [{"id": 1, "v": name, "seq": 1, "op": "I"},
                      {"id": 2, "v": name, "seq": 1, "op": "I"}])
        confs.append(TableStreamConfig(
            name=name, base_path=str(tmp_path / name),
            fields=[{"name": "id", "type": "bigint"},
                    {"name": "v", "type": "string"},
                    {"name": "seq", "type": "bigint"}],
            record_key_fields=["id"], precombine_field="seq",
            source={"format": "json-files", "path": src}))
    queries = start_multi_table_ingest(eng, confs, str(tmp_path / "ck"),
                                       trigger={"availableNow": True})
    for q in queries:
        q.awaitTermination(120)
    assert eng.table("t_a").snapshot().count() == 2
    assert {r.v for r in eng.table("t_b").snapshot().collect()} == {"t_b"}


def test_hudi_stream_source_incremental(spark, tmp_path):
    eng = Engine(spark)
    t = eng.create_table(str(tmp_path / "src_tbl"), record_key_fields=["id"],
                         precombine_field="seq", partition_field="grp")
    df1 = spark.createDataFrame([(1, "a", 1.0, 1), (2, "b", 2.0, 1)],
                                "id long, grp string, val double, seq long")
    t.bulk_insert(df1)

    register_stream_source(spark)
    ckpt = str(tmp_path / "ck_src")
    out = str(tmp_path / "out")

    def run_round():
        stream = (spark.readStream.format("hudi_stream")
                  .option("path", str(tmp_path / "src_tbl")).load())
        q = (stream.writeStream.format("parquet")
             .option("path", out).option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        return spark.read.parquet(out)

    got1 = run_round()
    assert got1.count() == 2
    assert "_hoodie_commit_time" in got1.columns

    # a second commit: only the new/changed rows stream out (cumulative sink)
    t.upsert(spark.createDataFrame([(1, "a", 99.0, 2), (3, "a", 3.0, 1)],
                                   "id long, grp string, val double, seq long"))
    got2 = run_round()
    assert got2.count() == 4
    rows = {(r.id, r.val) for r in got2.collect()}
    assert rows == {(1, 1.0), (2, 2.0), (1, 99.0), (3, 3.0)}

    # no new commits -> nothing appended
    got3 = run_round()
    assert got3.count() == 4


def test_hudi_stream_source_mor_deletes(spark, tmp_path):
    """MOR delta files persist deletes as _hoodie_operation='D' rows; the
    streaming source must not emit them as live upserts (ADVICE r1, medium)."""
    eng = Engine(spark)
    t = eng.create_table(str(tmp_path / "mor_tbl"), record_key_fields=["id"],
                         precombine_field="seq", partition_field="grp",
                         table_type="MERGE_ON_READ")
    t.bulk_insert(spark.createDataFrame(
        [(1, "a", 1.0, 1), (2, "a", 2.0, 1)],
        "id long, grp string, val double, seq long"))
    t.delete(where="id = 2")

    register_stream_source(spark)
    out = str(tmp_path / "out_mor")
    stream = (spark.readStream.format("hudi_stream")
              .option("path", str(tmp_path / "mor_tbl")).load())
    q = (stream.writeStream.format("parquet")
         .option("path", out)
         .option("checkpointLocation", str(tmp_path / "ck_mor"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    rows = {(r.id, r.val) for r in spark.read.parquet(out).collect()}
    assert rows == {(1, 1.0), (2, 2.0)}   # the delete row itself is NOT emitted


def test_format_hudi_serves_streaming_too(spark, tmp_path):
    """spark.readStream.format('hudi') — the reference registers ONE name
    for batch and stream (HoodieStreamSource.scala:50), so the batch
    format must serve streamReader() too ("hudi_stream" stays an alias).
    Change batches replay column renames: rows from pre-rename files
    surface values under the CURRENT name, not NULLs."""
    eng = Engine(spark)          # registers format("hudi") + the alias
    path = str(tmp_path / "fmt_stream_tbl")
    t = eng.create_table(path, record_key_fields=["id"],
                         precombine_field="seq", partition_field="grp")
    t.bulk_insert(spark.createDataFrame(
        [(1, "a", 1.0, 1), (2, "b", 2.0, 1)],
        "id long, grp string, val double, seq long"))
    t.rename_column("val", "value")
    t.upsert(spark.createDataFrame(
        [(3, "a", 3.0, 1)],
        "id long, grp string, value double, seq long"))

    out = str(tmp_path / "fmt_stream_out")
    stream = (spark.readStream.format("hudi").option("path", path).load())
    q = (stream.writeStream.format("parquet")
         .option("path", out)
         .option("checkpointLocation", str(tmp_path / "fmt_stream_ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    rows = {(r.id, r.value) for r in got.collect()}
    assert rows == {(1, 1.0), (2, 2.0), (3, 3.0)}    # no NULLed renames
    # format("hudi")'s schema carries the meta columns (reference parity)
    assert got.filter("_hoodie_record_key IS NULL").count() == 0


def test_hudi_batch_changes_reader(spark, tmp_path):
    """spark.read.format('hudi_stream') (batch flavor): raw change rows in
    (begininstant, endinstant], defaulting to everything; tombstone rows are
    never emitted. External jobs get incremental pulls without the library."""
    eng = Engine(spark)
    t = eng.create_table(str(tmp_path / "b_tbl"), record_key_fields=["id"],
                         precombine_field="seq", partition_field="grp")
    t.bulk_insert(spark.createDataFrame(
        [(1, "a", 1.0, 1), (2, "b", 2.0, 1)],
        "id long, grp string, val double, seq long"))
    c0 = t.timeline.completed_write_instants()[-1].time
    t.upsert(spark.createDataFrame([(1, "a", 99.0, 2), (3, "a", 3.0, 1)],
                                   "id long, grp string, val double, seq long"))

    register_stream_source(spark)
    path = str(tmp_path / "b_tbl")
    full = spark.read.format("hudi_stream").option("path", path).load()
    assert {(r.id, r.val) for r in full.collect()} == \
        {(1, 1.0), (2, 2.0), (1, 99.0), (3, 3.0)}
    assert "_hoodie_commit_time" in full.columns

    inc = (spark.read.format("hudi_stream").option("path", path)
           .option("begininstant", c0).load())
    assert {(r.id, r.val) for r in inc.collect()} == {(1, 99.0), (3, 3.0)}

    empty = (spark.read.format("hudi_stream").option("path", path)
             .option("begininstant", "99999999999999999").load())
    assert empty.count() == 0

    # archived commits still feed the change pull: after archival moves old
    # instants off the active timeline, a full-range read must enumerate
    # their files from the archive batches (same as Table.incremental)
    for v in range(6):
        t.upsert(spark.createDataFrame([(2, "b", 10.0 + v, 3 + v)],
                                       "id long, grp string, val double, seq long"))
    assert t.archive(retain_active=3)["archived"] > 0
    full2 = spark.read.format("hudi_stream").option("path", path).load()
    got = {(r.id, r.val) for r in full2.collect()}
    assert {(1, 1.0), (2, 2.0), (1, 99.0), (3, 3.0), (2, 15.0)} <= got


def test_streaming_exact_dedup_within_watermark(spark, tmp_path):
    """Duplicate content arriving later in the stream is suppressed; the
    whitespace/case normalization matches the batch exact_dedup."""
    from hudi_0_12_0_my_spark.streaming import streaming_exact_dedup
    src = tmp_path / "src"
    src.mkdir()
    _write_jsonl(src, "b1.json", [
        {"doc_id": 1, "text": "the quick fox", "ts": "2024-01-01 10:00:00"},
        {"doc_id": 2, "text": "other text", "ts": "2024-01-01 10:00:10"},
        {"doc_id": 3, "text": "THE  quick fox", "ts": "2024-01-01 10:00:20"},
        {"doc_id": 4, "text": "the quick fox", "ts": "2024-01-01 10:00:30"},
    ])
    stream = (spark.readStream.schema("doc_id long, text string, ts string")
              .json(str(src))
              .withColumn("ts", F.col("ts").cast("timestamp")))
    out = str(tmp_path / "out")
    q = (streaming_exact_dedup(stream, watermark="5 minutes")
         .writeStream.format("parquet").option("path", out)
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 2                     # 1/3/4 collapse to one
    kept_texts = {r.content_hash for r in rows}
    assert len(kept_texts) == 2


def _write_events_json(dirpath, name, rows):
    _write_jsonl(dirpath, name, rows)


def test_streaming_sessionize_matches_batch(spark, tmp_path):
    """applyInPandasWithState sessionization over two micro-batches equals
    the batch gaps-and-islands operator on the union of the data."""
    from hudi_0_12_0_my_spark.operators import session_stats
    from hudi_0_12_0_my_spark.streaming import streaming_sessionize

    src = str(tmp_path / "ev_src")
    out = str(tmp_path / "ev_out")
    ck = str(tmp_path / "ev_ck")
    batch1 = [{"event_id": 1, "user_id": 1, "ts": "2024-01-01 00:00:00", "value": 1.0},
              {"event_id": 2, "user_id": 1, "ts": "2024-01-01 00:10:00", "value": 2.0},
              {"event_id": 3, "user_id": 2, "ts": "2024-01-01 00:00:00", "value": 5.0}]
    batch2 = [{"event_id": 4, "user_id": 1, "ts": "2024-01-01 03:00:00", "value": 3.0},
              {"event_id": 5, "user_id": 2, "ts": "2024-01-01 00:20:00", "value": 7.0}]
    schema = "event_id long, user_id long, ts timestamp, value double"

    def run_once():
        stream = spark.readStream.schema(schema).json(src)
        q = (streaming_sessionize(stream, gap_seconds=3600)
             .writeStream.foreachBatch(
                 lambda df, _bid: df.write.mode("append").parquet(out))
             .option("checkpointLocation", ck)
             .outputMode("update")
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    _write_events_json(src, "b1.json", batch1)
    run_once()
    _write_events_json(src, "b2.json", batch2)
    run_once()

    # latest emitted row per (user, session) = final running stats
    emitted = spark.read.parquet(out)
    w_latest = (emitted.groupBy("user_id", "session_id")
                .agg(F.max(F.struct("n_events", "sum_value")).alias("s"))
                .select("user_id", "session_id", "s.n_events", "s.sum_value"))
    got = {(r.user_id, r.session_id): (r.n_events, r.sum_value)
           for r in w_latest.collect()}

    allev = spark.createDataFrame(
        [tuple(b.values()) for b in batch1 + batch2],
        "event_id long, user_id long, ts string, value double") \
        .withColumn("ts", F.col("ts").cast("timestamp"))
    want = {(r.user_id, r.session_id): (r.n_events, r.sum_value)
            for r in session_stats(allev, gap_seconds=3600,
                                   value_col="value").collect()}
    assert got == want
    assert got[(1, 1)] == (2, 3.0) and got[(1, 2)] == (1, 3.0)
    assert got[(2, 1)] == (2, 12.0)


def test_windowed_sessions_closes_on_watermark(spark, tmp_path):
    """Built-in session_window path: sessions close once the watermark passes
    end+gap; late-but-in-watermark events merge into their session."""
    from hudi_0_12_0_my_spark.streaming import windowed_sessions

    src = str(tmp_path / "sw_src")
    out = str(tmp_path / "sw_out")
    ck = str(tmp_path / "sw_ck")
    schema = "event_id long, user_id long, ts timestamp, value double"
    rows = [{"event_id": 1, "user_id": 1, "ts": "2024-01-01 00:00:00", "value": 1.0},
            {"event_id": 2, "user_id": 1, "ts": "2024-01-01 00:05:00", "value": 2.0},
            # far-future event advances the watermark past session end + gap
            {"event_id": 3, "user_id": 9, "ts": "2024-01-02 00:00:00", "value": 0.0}]
    _write_events_json(src, "b1.json", rows)
    stream = spark.readStream.schema(schema).json(src)
    q = (windowed_sessions(stream, gap_seconds=600, watermark="10 minutes")
         .writeStream.format("parquet").option("path", out)
         .option("checkpointLocation", ck)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    # run a second empty-ish trigger so the advanced watermark flushes
    _write_events_json(src, "b2.json",
                       [{"event_id": 4, "user_id": 9,
                         "ts": "2024-01-03 00:00:00", "value": 0.0}])
    q2 = (windowed_sessions(spark.readStream.schema(schema).json(src),
                            gap_seconds=600, watermark="10 minutes")
          .writeStream.format("parquet").option("path", out)
          .option("checkpointLocation", ck)
          .outputMode("append").trigger(availableNow=True).start())
    q2.awaitTermination(120)
    closed = {(r.user_id, r.n_events) for r in spark.read.parquet(out).collect()}
    assert (1, 2) in closed   # the two user-1 events merged into one session


def test_stream_sink_replayed_batch_skipped(spark, tmp_path):
    """Exactly-once on replay: if Spark's checkpoint is lost AFTER a batch
    committed to the table, re-running the stream re-delivers batch 0 — the
    sink recognizes it via the batch id recorded in commit metadata
    (HoodieStreamingSink latestBatchId) and skips, so an INSERT stream does
    not duplicate rows."""
    import shutil
    eng = Engine(spark)
    t = eng.create_table(str(tmp_path / "tbl"), record_key_fields=["id"],
                         precombine_field="seq", partition_field="grp")
    src_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    _write_jsonl(src_dir, "b1.json",
                 [{"id": 1, "grp": "a", "val": 1.0, "seq": 1},
                  {"id": 2, "grp": "b", "val": 2.0, "seq": 1}])
    raw = (spark.readStream.format("text").load(src_dir)
           .select(F.from_json(
               "value", "id long, grp string, val double, seq long").alias("r"))
           .select("r.*"))
    q = stream_write(t, raw, ckpt, operation="insert") \
        .trigger(availableNow=True).start()
    q.awaitTermination(120)
    assert t.snapshot().count() == 2
    assert len(t.timeline.completed_write_instants()) == 1

    # simulate losing the Spark checkpoint: the file source re-delivers
    # b1.json as batch 0 again
    shutil.rmtree(ckpt)
    q = stream_write(t, raw, ckpt, operation="insert") \
        .trigger(availableNow=True).start()
    q.awaitTermination(120)
    assert t.snapshot().count() == 2                 # no duplicated rows
    assert len(t.timeline.completed_write_instants()) == 1  # no extra commit


def test_stream_sink_maintains_rollup(spark, tmp_path):
    """post_commit hook keeps a derived rollup current with the stream:
    after each micro-batch the materialized per-group sums equal a full
    recompute of the sink table."""
    import os
    from hudi_0_12_0_my_spark.derived import sync_rollup

    eng = Engine(spark)
    t = eng.create_table(str(tmp_path / "tbl"), record_key_fields=["id"],
                         precombine_field="seq", partition_field="grp")
    dst = eng.create_table(str(tmp_path / "rollup"),
                           record_key_fields=["grp"],
                           keygen="nonpartitioned")
    src_dir = str(tmp_path / "in")

    def keep_fresh(table):
        sync_rollup(table, dst, ["grp"], {"sum_val": "val"})

    _write_jsonl(src_dir, "b1.json",
                 [{"id": 1, "grp": "a", "val": 1.0, "seq": 1},
                  {"id": 2, "grp": "b", "val": 2.0, "seq": 1}])
    raw = (spark.readStream.format("text").load(src_dir)
           .select(F.from_json(
               "value", "id long, grp string, val double, seq long").alias("r"))
           .select("r.*"))
    q = stream_write(t, raw, str(tmp_path / "ckpt"), post_commit=keep_fresh) \
        .trigger(availableNow=True).start()
    q.awaitTermination(120)
    got = {(r.grp, r.sum_val, r.n_rows) for r in dst.snapshot().collect()}
    assert got == {("a", 1.0, 1), ("b", 2.0, 1)}

    _write_jsonl(src_dir, "b2.json",
                 [{"id": 1, "grp": "a", "val": 10.0, "seq": 2},
                  {"id": 3, "grp": "b", "val": 3.0, "seq": 1}])
    q = stream_write(t, raw, str(tmp_path / "ckpt"), post_commit=keep_fresh) \
        .trigger(availableNow=True).start()
    q.awaitTermination(120)
    got = {(r.grp, r.sum_val, r.n_rows) for r in dst.snapshot().collect()}
    assert got == {("a", 10.0, 1), ("b", 5.0, 2)}


def test_stream_sink_maintains_minhash_index(spark, tmp_path):
    """post_commit composition with the LSH index maintainer: each
    micro-batch re-signatures only its own documents, and the index equals
    a from-scratch signature pass after every batch."""
    from hudi_0_12_0_my_spark.derived import sync_minhash_index
    from hudi_0_12_0_my_spark.operators import minhash_index_rows

    eng = Engine(spark)
    t = eng.create_table(str(tmp_path / "docs"), record_key_fields=["doc_id"],
                         precombine_field="seq", keygen="nonpartitioned")
    idx = eng.create_table(str(tmp_path / "idx"), record_key_fields=["doc_id"],
                           keygen="nonpartitioned")
    src_dir = str(tmp_path / "in")

    def keep_fresh(table):
        sync_minhash_index(table, idx)

    _write_jsonl(src_dir, "b1.json",
                 [{"doc_id": 1, "text": "alpha beta gamma delta " * 5, "seq": 1},
                  {"doc_id": 2, "text": "epsilon zeta eta theta " * 5, "seq": 1}])
    raw = (spark.readStream.format("text").load(src_dir)
           .select(F.from_json(
               "value", "doc_id long, text string, seq long").alias("r"))
           .select("r.*"))
    q = stream_write(t, raw, str(tmp_path / "ckpt"), post_commit=keep_fresh) \
        .trigger(availableNow=True).start()
    q.awaitTermination(120)
    _write_jsonl(src_dir, "b2.json",
                 [{"doc_id": 1, "text": "totally new text for doc one " * 5,
                   "seq": 2},
                  {"doc_id": 3, "text": "alpha beta gamma delta " * 5 + "x",
                   "seq": 1}])
    q = stream_write(t, raw, str(tmp_path / "ckpt"), post_commit=keep_fresh) \
        .trigger(availableNow=True).start()
    q.awaitTermination(120)
    got = {(r.doc_id, tuple(r.sig)) for r in idx.snapshot().collect()}
    want = {(r.doc_id, tuple(r.sig))
            for r in minhash_index_rows(t.snapshot()).collect()}
    assert got == want and len(want) == 3


def test_async_compaction_overlaps_micro_batches(spark, tmp_path):
    """Async table services (HoodieStreamingSink.scala:41-139): a compaction
    of an EARLIER instant executes on the background worker while a later
    micro-batch commit lands — the stream cadence never waits for the merge.
    Proven with events: the compaction thread signals the start of its
    unlocked merge phase and then blocks until the foreground upsert has
    committed; if the merge held the table lock (old inline behavior) this
    would deadlock instead of passing."""
    import threading

    from hudi_0_12_0_my_spark.services.compaction import (run_compaction,
                                                          schedule_compaction)
    from hudi_0_12_0_my_spark.streaming import AsyncTableServices
    from hudi_0_12_0_my_spark import timeline as tl

    eng = Engine(spark)
    t = eng.create_table(str(tmp_path / "async_mor"),
                         record_key_fields=["id"], precombine_field="seq",
                         table_type="mor", compaction_max_delta_commits=2)
    rows = lambda vals: spark.createDataFrame(vals, "id long, v long, seq long")
    t.bulk_insert(rows([(1, 10, 1), (2, 20, 1)]))
    t.upsert(rows([(1, 11, 2)]))
    t.upsert(rows([(2, 21, 3)]))           # 2 deltacommits -> compaction due

    plan = schedule_compaction(t)
    assert plan and plan["groups"]
    merge_started = threading.Event()
    batch_committed = threading.Event()

    def hook():
        merge_started.set()
        assert batch_committed.wait(timeout=60), \
            "foreground commit never landed while compaction merge ran"

    out = {}
    worker = threading.Thread(
        target=lambda: out.update(ins=run_compaction(
            t, plan=plan, on_merge_start=hook)))
    worker.start()
    assert merge_started.wait(timeout=60)
    # compaction of the EARLIER instant is mid-merge: commit a new batch NOW
    t.upsert(rows([(3, 30, 4)]))
    batch_committed.set()
    worker.join(timeout=120)
    assert not worker.is_alive() and out["ins"] == plan["instant"]
    # both instants completed; commit-time order: compaction < late upsert
    times = [(i.time, i.action) for i in t.timeline.completed_write_instants()]
    assert (plan["instant"], tl.COMMIT) in times
    assert times[-1][1] == tl.DELTACOMMIT and times[-1][0] > plan["instant"]
    # snapshot is the union of compacted state + late delta
    got = {(r.id, r.v) for r in t.snapshot().collect()}
    assert got == {(1, 11), (2, 21), (3, 30)}


def test_async_services_with_sink(spark, tmp_path):
    """End-to-end: stream_write with an AsyncTableServices runner compacts
    in the background across micro-batches and converges to the same state
    as the inline path."""
    from hudi_0_12_0_my_spark.streaming import AsyncTableServices
    from hudi_0_12_0_my_spark import timeline as tl

    eng = Engine(spark)
    # event_time payload: the largest seq wins regardless of micro-batch
    # arrival order (the file stream source orders same-mtime files
    # arbitrarily)
    t = eng.create_table(str(tmp_path / "sink_async"),
                         record_key_fields=["id"], precombine_field="seq",
                         payload="event_time",
                         table_type="mor", compaction_max_delta_commits=2)
    src_dir, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")
    for i in range(4):
        _write_jsonl(src_dir, f"b{i}.json",
                     [{"id": k, "v": i * 100 + k, "seq": i}
                      for k in range(5)])
    schema = "id long, v long, seq long"
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", "1").json(src_dir))
    svc = AsyncTableServices(t)
    q = stream_write(t, stream, ckpt, inline_compact=False,
                     async_services=svc).trigger(availableNow=True).start()
    q.awaitTermination(120)
    svc.wait()
    svc.close()
    assert not svc.errors
    actions = {i.action for i in t.timeline.completed_write_instants()}
    assert tl.COMMIT in actions          # at least one async compaction ran
    got = {(r.id, r.v) for r in t.snapshot().collect()}
    assert got == {(k, 300 + k) for k in range(5)}


def test_async_clustering_with_cow_sink(spark, tmp_path):
    """A COW stream with cluster=True async services: the commits-since-
    last-clustering trigger fires mid-stream, the replacecommit lands in
    the background, and the final snapshot equals the event-time fold of
    all batches (clustering is result-invisible)."""
    from hudi_0_12_0_my_spark.streaming import AsyncTableServices
    from hudi_0_12_0_my_spark import timeline as tl

    eng = Engine(spark)
    t = eng.create_table(str(tmp_path / "sink_cl"),
                         record_key_fields=["id"], precombine_field="seq",
                         payload="event_time",
                         clustering_async_max_commits=2)
    src_dir, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")
    for i in range(4):
        _write_jsonl(src_dir, f"b{i}.json",
                     [{"id": k, "v": i * 100 + k, "seq": i}
                      for k in range(5)])
    schema = "id long, v long, seq long"
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", "1").json(src_dir))
    svc = AsyncTableServices(t, compact=False, cluster=True,
                             cluster_kwargs=dict(sort_cols=["id"],
                                                 small_files_only=False))
    # a micro-batch upserting keys in groups under the pending plan is
    # rejected (SparkRejectUpdateStrategy) and must win via the sink's
    # retry loop once the background clustering completes — give it room
    q = stream_write(t, stream, ckpt, inline_compact=False,
                     retry_count=15, retry_interval_sec=1.0,
                     async_services=svc).trigger(availableNow=True).start()
    q.awaitTermination(180)
    svc.wait()
    svc.close()
    assert not svc.errors, svc.errors
    done = [i for i in t.timeline.completed()
            if i.action == tl.REPLACECOMMIT
            and (t.timeline.metadata(i) or {}).get("operation") == "cluster"]
    assert done                          # at least one async clustering ran
    got = {(r.id, r.v) for r in t.snapshot().collect()}
    assert got == {(k, 300 + k) for k in range(5)}


def test_quarantine_diverts_bad_records(spark, tmp_path):
    """Poison-pill protection: malformed JSON lines and rows with NULL
    record keys land in the quarantine parquet (partitioned by batch id,
    idempotent dynamic overwrite) while good rows commit — the fork's map
    function would throw and wedge the stream on the first such message
    (StringToRowDataMapFunction.java:70)."""
    eng = Engine(spark)
    src_dir, qdir = str(tmp_path / "in"), str(tmp_path / "quarantine")
    os.makedirs(src_dir, exist_ok=True)
    with open(os.path.join(src_dir, "b1.json"), "w") as fh:
        fh.write(json.dumps({"id": 1, "grp": "a", "val": 1.0, "seq": 1}) + "\n")
        fh.write("{this is not json\n")
        fh.write(json.dumps({"grp": "a", "val": 9.0, "seq": 1}) + "\n")  # no key
        fh.write(json.dumps({"id": 2, "grp": "b", "val": 2.0, "seq": 1}) + "\n")
    tc = TableStreamConfig(
        name="quar1", base_path=str(tmp_path / "quar1"),
        fields=[{"name": "id", "type": "bigint"},
                {"name": "grp", "type": "string"},
                {"name": "val", "type": "double"},
                {"name": "seq", "type": "bigint"}],
        record_key_fields=["id"], precombine_field="seq",
        partition_field="grp", op_col=None,
        source={"format": "json-files", "path": src_dir},
        quarantine_path=qdir)
    q = start_table_stream(eng, tc, str(tmp_path / "ck"),
                           trigger={"availableNow": True})
    q.awaitTermination(120)
    assert {r.id for r in eng.table("quar1").snapshot().collect()} == {1, 2}
    quar = spark.read.parquet(qdir).collect()
    assert {r["_reason"] for r in quar} == {"malformed_json", "null_record_key"}
    assert len(quar) == 2
    assert all(r["_table"] == "quar1" for r in quar)


def test_bad_records_fail_batch_without_quarantine(spark, tmp_path):
    """Strict fork parity when no quarantine is configured: the batch fails
    instead of silently upserting null-keyed rows."""
    eng = Engine(spark)
    src_dir = str(tmp_path / "in")
    os.makedirs(src_dir, exist_ok=True)
    with open(os.path.join(src_dir, "b1.json"), "w") as fh:
        fh.write(json.dumps({"id": 1, "grp": "a", "val": 1.0, "seq": 1}) + "\n")
        fh.write("oops\n")
    tc = TableStreamConfig(
        name="quar2", base_path=str(tmp_path / "quar2"),
        fields=[{"name": "id", "type": "bigint"},
                {"name": "grp", "type": "string"},
                {"name": "val", "type": "double"},
                {"name": "seq", "type": "bigint"}],
        record_key_fields=["id"], precombine_field="seq",
        partition_field="grp", op_col=None,
        source={"format": "json-files", "path": src_dir})
    q = start_table_stream(eng, tc, str(tmp_path / "ck"), retry_count=0,
                           trigger={"availableNow": True})
    import pyspark.errors
    with pytest.raises(pyspark.errors.exceptions.captured.StreamingQueryException):
        q.awaitTermination(120)


def test_stream_sink_maintains_ivf_index(spark, tmp_path):
    """post_commit composition with the IVF vector-index maintainer: batch
    one builds centroids + full assignment, later micro-batches fold only
    their own CDC diff — after every batch the index holds exactly the
    corpus ids, one cell each, and ANN search over it matches brute force."""
    import math

    from hudi_0_12_0_my_spark.derived import (ivf_index_search,
                                              sync_ivf_index)
    from hudi_0_12_0_my_spark.operators import cosine_topk

    eng = Engine(spark)
    t = eng.create_table(str(tmp_path / "vecs"), record_key_fields=["vec_id"],
                         precombine_field="seq", keygen="nonpartitioned")
    idx = eng.create_table(str(tmp_path / "idx"), record_key_fields=["vec_id"],
                           partition_field="cell")
    src_dir = str(tmp_path / "in")

    def vec(i, flip=1.0):
        return [round(flip * math.sin(i * 0.7 + j), 6) for j in range(8)]

    def keep_fresh(table):
        sync_ivf_index(table, idx, num_cells=3)

    _write_jsonl(src_dir, "b1.json",
                 [{"vec_id": i, "embedding": vec(i), "seq": 1}
                  for i in range(20)])
    raw = (spark.readStream.format("text").load(src_dir)
           .select(F.from_json(
               "value", "vec_id long, embedding array<float>, seq long")
               .alias("r"))
           .select("r.*"))
    q = stream_write(t, raw, str(tmp_path / "ckpt"), post_commit=keep_fresh) \
        .trigger(availableNow=True).start()
    q.awaitTermination(120)
    # batch 2: move some vectors (negation changes the nearest centroid)
    _write_jsonl(src_dir, "b2.json",
                 [{"vec_id": i, "embedding": vec(i, -1.0), "seq": 2}
                  for i in range(0, 20, 5)]
                 + [{"vec_id": 20 + i, "embedding": vec(40 + i), "seq": 1}
                    for i in range(5)])
    q = stream_write(t, raw, str(tmp_path / "ckpt"), post_commit=keep_fresh) \
        .trigger(availableNow=True).start()
    q.awaitTermination(120)

    snap = t.snapshot().select("vec_id", "embedding")
    isnap = idx.snapshot()
    assert isnap.count() == snap.count() == 25
    assert isnap.groupBy("vec_id").count().filter("count > 1").count() == 0
    qv = snap.filter("vec_id < 3")
    got = {(r.query_id, r.rank): r.neighbor_id
           for r in ivf_index_search(idx, qv, k=5, nprobe=3).collect()}
    want = {(r.query_id, r.rank): r.neighbor_id
            for r in cosine_topk(snap, qv, k=5).collect()}
    assert got == want


def test_continuous_ingest_rounds_with_services(spark, tmp_path):
    """ContinuousIngest (HoodieDeltaStreamer.java:94 continuous mode): N
    sync rounds over arriving files, exactly-once across rounds, async
    compaction interleaved by the managed loop, graceful close."""
    from hudi_0_12_0_my_spark import timeline as tl
    from hudi_0_12_0_my_spark.streaming.ingest import ContinuousIngest

    eng = Engine(spark)
    base, src = str(tmp_path / "ct"), str(tmp_path / "in")
    eng.create_table(base, name="ct", record_key_fields=["id"],
                     precombine_field="seq", table_type="mor",
                     compaction_max_delta_commits=2)
    tc = TableStreamConfig(
        name="ct", base_path=base, table_type="mor",
        fields=[{"name": "id", "type": "bigint"},
                {"name": "v", "type": "bigint"},
                {"name": "seq", "type": "bigint"}],
        record_key_fields=["id"], precombine_field="seq",
        source={"format": "json-files", "path": src})
    ci = ContinuousIngest(eng, [tc], str(tmp_path / "ck"))
    _write_jsonl(src, "b1.json", [{"id": k, "v": k, "seq": 1}
                                  for k in range(5)])
    ci.run(max_rounds=1)
    _write_jsonl(src, "b2.json", [{"id": k, "v": 100 + k, "seq": 2}
                                  for k in range(3)])
    ci.run(max_rounds=1)
    _write_jsonl(src, "b3.json", [{"id": 9, "v": 9, "seq": 3}])
    stats = ci.run(max_rounds=1)
    assert len(ci.rounds) == 3 and stats[-1]["tables"] == ["ct"]
    t = eng.load_table(base)
    got = {(r.id, r.v) for r in t.snapshot().collect()}
    assert got == {(k, 100 + k) for k in range(3)} \
        | {(k, k) for k in range(3, 5)} | {(9, 9)}
    # the loop's service worker compacted between rounds (MOR, trigger=2)
    actions = {i.action for i in t.timeline.completed_write_instants()}
    assert tl.COMMIT in actions
    # an idle extra round is a no-op (ledger + availableNow see nothing new)
    ci.run(max_rounds=1)
    assert {(r.id, r.v) for r in eng.load_table(base).snapshot().collect()} \
        == got


def test_continuous_ingest_crash_replays_exactly_once(spark, tmp_path):
    """A round killed mid-commit (storage-mutation crash injection) must
    leave the table recoverable; the restarted loop replays the batch
    EXACTLY once via the sink's batch-id ledger — no duplicate or lost
    rows (VERDICT r3 item 6 done-criterion)."""
    from tests.test_crash_injection import InjectedCrash, crash_after
    from hudi_0_12_0_my_spark.streaming.ingest import ContinuousIngest

    eng = Engine(spark)
    base, src = str(tmp_path / "cc"), str(tmp_path / "in")
    tc = TableStreamConfig(
        name="cc", base_path=base,
        fields=[{"name": "id", "type": "bigint"},
                {"name": "v", "type": "bigint"},
                {"name": "seq", "type": "bigint"}],
        record_key_fields=["id"], precombine_field="seq",
        source={"format": "json-files", "path": src})
    ck = str(tmp_path / "ck")
    _write_jsonl(src, "b1.json", [{"id": k, "v": k, "seq": 1}
                                  for k in range(4)])
    ContinuousIngest(eng, [tc], ck).run(max_rounds=1)
    _write_jsonl(src, "b2.json", [{"id": k, "v": 100 + k, "seq": 2}
                                  for k in range(2)])
    died = False
    try:
        with crash_after(6, base_path=base):
            ContinuousIngest(eng, [tc], ck, retry_count=0).run(max_rounds=1)
    except Exception as e:  # StreamingQueryException wraps InjectedCrash
        died = isinstance(e, InjectedCrash) or "InjectedCrash" in str(e)
    assert died, "crash injection never fired"
    # restart: the replayed micro-batch applies exactly once
    ContinuousIngest(eng, [tc], ck).run(max_rounds=1)
    snap = eng.load_table(base).snapshot().collect()
    assert len(snap) == 4
    assert {(r.id, r.v) for r in snap} == {(0, 100), (1, 101), (2, 2), (3, 3)}
