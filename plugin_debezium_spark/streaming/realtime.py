"""Structured Streaming delivery path (SURVEY.md §2.6 K2 / §3.3).

The reference's RealtimeTrigger wraps the engine in a reactive stream
and emits per-row (AbstractDebeziumRealtimeTrigger.java:117-186). The
Spark-native equivalent: ``readStream`` over the envelope-log dataset
with ``foreachBatch`` running the SAME apply body as the batch engine
— micro-batch MERGE + atomic epoch commit — under a short trigger (or
``availableNow`` for the reference's polling-Trigger cadence,
SURVEY.md §3.2: "exactly Spark's Trigger.AvailableNow").

foreachBatch is at-least-once; idempotent epoch commits (streaming
batch id = epoch id) give the same exactly-once observable as the
batch path.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from plugin_debezium_spark.models import envelope_log_schema
from plugin_debezium_spark.streaming.engine import (
    EngineConfig,
    _apply_epoch_variant,
    ensure_table,
    filter_events,
)


def stream_log(
    spark: SparkSession,
    cfg: EngineConfig,
    checkpoint_dir: str,
    available_now: bool = True,
    processing_time: str = "5 seconds",
    max_files_per_trigger: int = 8,
):
    """Start the streaming applier; returns the StreamingQuery.

    Offsets live in BOTH Spark's streaming checkpoint (source progress)
    and our snapshot properties (epoch idempotence). The idempotence
    guard is SCOPED TO THIS CHECKPOINT (property
    ``stream_epoch:<checkpoint-hash>``), never the batch engine's
    shared epoch counter: a stream whose batch ids restart at 0 on a
    table previously populated by the batch engine (epoch ids 0..N)
    must not silently skip its first N micro-batches. After checkpoint
    loss (a new checkpoint dir), batches re-apply under a fresh scope —
    safe because the lww_guard merge is idempotent under reapplication.
    """
    import dataclasses
    import hashlib

    # the file source delivers files in listing order, not LSN order —
    # the merge must be out-of-order safe
    cfg = dataclasses.replace(cfg, lww_guard=True)
    table = ensure_table(spark, cfg)
    ck = hashlib.sha256(checkpoint_dir.encode()).hexdigest()[:12]
    epoch_key = f"stream_epoch:{ck}"

    stream = (
        spark.readStream.schema(envelope_log_schema())
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(cfg.log_dir)
    )

    def _apply(batch_df, batch_id: int) -> None:
        # same ingest filters as the batch engine (DDL drop,
        # include/exclude, shard) — the two paths must not diverge
        batch_df = filter_events(cfg, batch_df)
        if batch_df.isEmpty():
            return
        hi = batch_df.agg(F.max("lsn")).collect()[0][0]
        _apply_epoch_variant(
            spark,
            table,
            cfg,
            epoch_id=int(batch_id),
            hi=int(hi),
            events=batch_df,
            epoch_key=epoch_key,
        )

    writer = (
        stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()


def run_available_now(
    spark: SparkSession, cfg: EngineConfig, checkpoint_dir: str
) -> None:
    """Reference poll-Trigger cadence (§3.2): drain everything
    currently in the log, then stop."""
    q = stream_log(spark, cfg, checkpoint_dir, available_now=True)
    q.awaitTermination()
