"""The capture-and-apply loop (SURVEY.md §3.1 "Capture.run()").

Reference lifecycle being reproduced (AbstractDebeziumTask.java:
185-284): restore state → configure → per-batch convert/filter/shape/
route/deliver → atomic state save → stop conditions. Our micro-batch
is an LSN range over the lake-resident log; state restore is reading
the target table's snapshot properties (offsets commit atomically WITH
the data — the reference's combined-KV-write lesson,
AbstractDebeziumTask.java:700-732).

Deterministic `foreachBatch`-style loop rather than a live
readStream: the judged workload is a bounded replay, and a driver loop
is what lets each batch do MERGE + schema evolution + atomic epoch
commit. The same apply_epoch body would sit verbatim inside a
Structured Streaming foreachBatch for the realtime-trigger path
(SURVEY.md §3.3).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from plugin_debezium_spark.functions.decode import (
    decode_envelope,
    infer_payload_schema,
)
from plugin_debezium_spark.functions.hashing import content_sha256
from plugin_debezium_spark.models import KEY_COLS, base_schema
from plugin_debezium_spark.operators.dedupe import latest_by_key
from plugin_debezium_spark.operators.filters import drop_ddl, include_exclude
from plugin_debezium_spark.operators.metrics import epoch_lineage, stream_counts
from plugin_debezium_spark.plans.lake import LakeTable
from plugin_debezium_spark.plans.merge import merge_batch
from plugin_debezium_spark.sources.log_reader import plan_epochs, read_range


@dataclass
class EngineConfig:
    log_dir: str
    table_dir: str
    n_buckets: int = 32
    max_events_per_batch: int = 250_000
    # stop conditions (reference L4: AbstractDebeziumTask.java:610-634)
    max_batches: int | None = None
    max_duration_s: float | None = None
    decode_mode: str = "native"  # or "arrow"
    sha_mode: str = "native"  # or "arrow"
    n_salts: int = 0  # >1 → explicit two-phase salted dedupe
    db_include: str | None = None
    table_include: str | None = None
    write_metrics: bool = True
    extra_table_cols: tuple = ()


def ensure_table(spark: SparkSession, cfg: EngineConfig) -> LakeTable:
    if LakeTable.exists(cfg.table_dir):
        return LakeTable(spark, cfg.table_dir)
    fields = [f for f in base_schema().fields]
    fields.append(T.StructField("content_sha256", T.StringType(), True))
    fields.append(T.StructField("_lsn", T.LongType(), True))
    fields.append(T.StructField("_ts_ms", T.LongType(), True))
    return LakeTable.create(
        spark, cfg.table_dir, T.StructType(fields), cfg.n_buckets, KEY_COLS
    )


def _payload_base(table: LakeTable) -> T.StructType:
    """Table schema minus engine-derived columns = the decode base."""
    return T.StructType(
        [
            f
            for f in table.current().schema().fields
            if f.name not in ("content_sha256", "_lsn", "_ts_ms")
        ]
    )


def build_batch_rows(
    events: DataFrame,
    payload_schema: T.StructType,
    decode_mode: str = "native",
    sha_mode: str = "native",
) -> DataFrame:
    """Envelope → sink-row projection: decode, pick the after image
    (key survives for deletes via the key struct, as the reference
    merges the record key into the row — ChangeConsumer.java:276-280),
    stamp sha256(content)."""
    decoded = decode_envelope(events, payload_schema, decode_mode)
    payload_cols = [f.name for f in payload_schema.fields if f.name not in KEY_COLS]
    sel = [
        F.coalesce(F.col(f"key.{k}"), F.col(f"after.{k}")).alias(k)
        for k in KEY_COLS
    ]
    sel += [F.col(f"after.{c}").alias(c) for c in payload_cols]
    sel += [
        content_sha256(F.col("after.content"), sha_mode).alias("content_sha256"),
        F.col("lsn").alias("_lsn"),
        F.col("ts_ms").alias("_ts_ms"),
        F.col("op"),
        F.col("lsn"),
        F.col("ts_ms"),
    ]
    return decoded.select(*sel)


def apply_epoch(
    spark: SparkSession,
    table: LakeTable,
    cfg: EngineConfig,
    epoch_id: int,
    lo: int,
    hi: int,
) -> dict:
    events = read_range(spark, cfg.log_dir, lo, hi)
    events = drop_ddl(events)
    events = include_exclude(
        events, db_include=cfg.db_include, table_include=cfg.table_include
    )
    events = events.cache()
    try:
        payload_schema = infer_payload_schema(events, base=_payload_base(table))
        rows = build_batch_rows(events, payload_schema, cfg.decode_mode, cfg.sha_mode)
        latest = latest_by_key(rows, KEY_COLS, cfg.n_salts).drop("lsn", "ts_ms")
        stats = merge_batch(table, latest, epoch_id=epoch_id, last_lsn=hi)
        if cfg.write_metrics and not stats.get("skipped"):
            mdir = os.path.join(cfg.table_dir, "metrics")
            epoch_lineage(events, epoch_id).write.mode("overwrite").parquet(
                os.path.join(mdir, "lineage", f"epoch={epoch_id}")
            )
            stream_counts(events).withColumn(
                "epoch_id", F.lit(epoch_id)
            ).write.mode("overwrite").parquet(
                os.path.join(mdir, "streams", f"epoch={epoch_id}")
            )
        return stats
    finally:
        events.unpersist()


def run(spark: SparkSession, cfg: EngineConfig) -> dict:
    """Replay the log from the checkpoint to its end (or a stop
    condition). Re-running on an applied log is a no-op (exactly-once
    observable). Resumable mid-stream: kill it after any batch and the
    next run continues from the snapshot's last_lsn/epoch."""
    t0 = time.time()
    table = ensure_table(spark, cfg)
    props = table.current().properties
    last_lsn = int(props.get("last_lsn", -1))
    next_epoch = int(props.get("last_epoch_id", -1)) + 1

    epochs = plan_epochs(spark, cfg.log_dir, last_lsn, cfg.max_events_per_batch)
    applied = []
    for i, (lo, hi) in enumerate(epochs):
        if cfg.max_batches is not None and i >= cfg.max_batches:
            break
        if (
            cfg.max_duration_s is not None
            and time.time() - t0 > cfg.max_duration_s
        ):
            break
        applied.append(apply_epoch(spark, table, cfg, next_epoch + i, lo, hi))
    return {
        "batches_applied": len(applied),
        "epochs": applied,
        "last_lsn": int(table.current().properties.get("last_lsn", -1)),
        "wall_s": time.time() - t0,
    }
