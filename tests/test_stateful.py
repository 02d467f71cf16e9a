"""Stateful Structured Streaming operators: cross-batch LWW state
(applyInPandasWithState) and watermarked windowed counters."""

import json
import os
import shutil
import time

import pytest
from pyspark.sql import functions as F

from plugin_debezium_spark.models import envelope_log_schema
from plugin_debezium_spark.streaming.stateful import (
    lww_state_stream,
    windowed_stream_counts,
)


def _write_stream_file(spark, stage_dir, stream_dir, name, rows):
    """Write one controlled-name parquet file into the stream source
    dir (file source orders micro-batches by modification time, so the
    caller sets names AND call order oldest-first)."""
    df = spark.createDataFrame(rows, envelope_log_schema())
    tmp = os.path.join(stage_dir, f"stage_{name}")
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
    os.makedirs(stream_dir, exist_ok=True)
    dst = os.path.join(stream_dir, name)
    shutil.copyfile(os.path.join(tmp, part), dst)
    return dst


def _env(lsn, ts_ms, op, key, content=None, db="d1", table="t1"):
    return (
        lsn,
        ts_ms,
        op,
        {"repo": key[0], "path": key[1], "commit": key[2]},
        None,
        json.dumps({"content": content or f"v{lsn}"}),
        {"db": db, "table": table, "snapshot": "false", "connector": "mysql"},
        None,  # transaction
        None,  # message_json
        None,  # epoch_hint
        lsn % 4,
    )


def test_lww_state_stream_emits_only_improvements(spark, tmp_path):
    stream_dir = str(tmp_path / "stream")
    f1 = _write_stream_file(
        spark,
        str(tmp_path),
        stream_dir,
        "000.parquet",
        [
            _env(5, 5000, "u", ("r1", "p1", "c1")),
            _env(2, 2000, "c", ("r2", "p2", "c2")),
        ],
    )
    f2 = _write_stream_file(
        spark,
        str(tmp_path),
        stream_dir,
        "001.parquet",
        [
            _env(3, 3000, "u", ("r1", "p1", "c1")),  # stale: loses to 5
            _env(7, 7000, "u", ("r2", "p2", "c2")),  # improvement
            _env(1, 1000, "c", ("r3", "p3", "c3")),  # new key
        ],
    )
    # force micro-batch order: file source picks oldest mtime first
    now = time.time()
    os.utime(f1, (now - 20, now - 20))
    os.utime(f2, (now, now))

    src = (
        spark.readStream.schema(envelope_log_schema())
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    q = (
        lww_state_stream(src)
        .writeStream.format("memory")
        .queryName("lww_state_t")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["repo"], r["lsn"], json.loads(r["after_json"])["content"])
        for r in spark.table("lww_state_t").collect()
    }
    # r1@3 (stale redelivery) must NOT appear — cross-batch state
    assert got == {("r1", 5, "v5"), ("r2", 2, "v2"), ("r2", 7, "v7"), ("r3", 1, "v1")}


def test_windowed_counts_drop_late_events(spark, tmp_path):
    """Append-mode watermark semantics: a window emits once when the
    watermark passes its end, and an event arriving after the
    watermark moved past it is dropped — the closed window's count
    excludes it."""
    stream_dir = str(tmp_path / "stream")
    files = [
        # window [0,10s): 3 events, one delete
        _write_stream_file(
            spark, str(tmp_path), stream_dir, "000.parquet",
            [
                _env(1, 1000, "c", ("a", "a", "a")),
                _env(2, 2000, "d", ("b", "b", "b")),
                _env(3, 4000, "u", ("c", "c", "c")),
            ],
        ),
        # t=100s pushes the watermark to 95s after this batch
        _write_stream_file(
            spark, str(tmp_path), stream_dir, "001.parquet",
            [_env(4, 100_000, "c", ("d", "d", "d"))],
        ),
        # a batch under the advanced watermark: [0,10s) is evicted and
        # emitted at the END of this one (eviction runs after the
        # batch's input merges, so the too-late row must come later)
        _write_stream_file(
            spark, str(tmp_path), stream_dir, "002.parquet",
            [_env(5, 100_500, "c", ("e", "e", "e"))],
        ),
        # too-late event for the now-FINALIZED [0,10s) (3s << watermark
        # 95s): dropped — no recount, no duplicate append of the window
        _write_stream_file(
            spark, str(tmp_path), stream_dir, "003.parquet",
            [
                _env(6, 3000, "u", ("f", "f", "f")),
                _env(7, 101_000, "c", ("g", "g", "g")),
            ],
        ),
    ]
    now = time.time()
    for i, f in enumerate(files):
        os.utime(f, (now - 30 + 10 * i, now - 30 + 10 * i))

    src = (
        spark.readStream.schema(envelope_log_schema())
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    q = (
        windowed_stream_counts(
            src, window_duration="10 seconds", watermark_delay="5 seconds"
        )
        .writeStream.format("memory")
        .queryName("win_counts_t")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.table("win_counts_t").select(
        F.col("win.start").cast("long").alias("start"),
        "db", "table", "n_events", "n_deletes",
    ).collect()
    emitted = {tuple(r) for r in rows}
    # only [0,10s) has closed; its count excludes the late lsn=5 event
    assert emitted == {(0, "d1", "t1", 3, 1)}


def test_seen_once_stream_cross_batch_dedup(spark, tmp_path):
    """First occurrence of each content hash passes; duplicates are
    suppressed WITHIN a batch (min order_col wins the tie) and ACROSS
    batches (state store); distinct later content still flows."""
    from plugin_debezium_spark.streaming.stateful import seen_once_stream

    stream_dir = str(tmp_path / "stream")

    def _docs_file(name, rows):
        df = spark.createDataFrame(
            rows, "doc_id long, text string, content_sha string"
        )
        tmp = os.path.join(str(tmp_path), f"stage_{name}")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
        os.makedirs(stream_dir, exist_ok=True)
        dst = os.path.join(stream_dir, name)
        shutil.copyfile(os.path.join(tmp, part), dst)
        return dst

    def row(doc_id, text):
        import hashlib

        return (doc_id, text, hashlib.sha256(text.encode()).hexdigest())

    f1 = _docs_file(
        "000.parquet",
        [row(3, "alpha"), row(1, "alpha"), row(2, "beta")],  # in-batch dup
    )
    f2 = _docs_file(
        "001.parquet",
        [row(4, "alpha"), row(5, "gamma"), row(6, "beta")],  # cross-batch dups
    )
    now = time.time()
    os.utime(f1, (now - 20, now - 20))
    os.utime(f2, (now, now))

    src = (
        spark.readStream.schema("doc_id long, text string, content_sha string")
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    q = (
        seen_once_stream(src, key_col="content_sha", order_col="doc_id")
        .writeStream.format("memory")
        .queryName("seen_once_t")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["doc_id"], r["text"])
        for r in spark.table("seen_once_t").collect()
    }
    # alpha: doc 1 (min id in first batch), beta: doc 2, gamma: doc 5;
    # docs 3 (in-batch tie loser), 4 and 6 (cross-batch dups) suppressed
    assert got == {(1, "alpha"), (2, "beta"), (5, "gamma")}
