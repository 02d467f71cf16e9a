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

Merge strategy: the streaming applier defaults to MERGE-ON-READ delta
appends. A per-micro-batch copy-on-write rewrite costs O(touched
table) per batch — with a short trigger against a large table that is
the classic scale-killer for a streaming applier (every tiny batch
rewrites whole buckets). MOR epochs append O(batch) delta files with
ZERO target I/O, tombstones make them safe under the file source's
lexical (out-of-LSN-order) delivery, and a cadence compaction folds
deltas back into base files every ``compact_every`` micro-batches.
``merge_mode="cow"`` keeps the old read-optimized behavior (lww_guard
rewrite per batch) for tables that are read far more than written.
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
    merge_mode: str = "mor",
    compact_every: int | None = 64,
    expire_keep_last: int | None = 8,
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
    safe because both merge modes are idempotent under reapplication
    (MOR re-appends resolve to the same LWW winners; lww_guard COW is
    a fixed point).

    merge_mode:
      "mor" (default) — each micro-batch APPENDS delta files: epoch
        cost is O(batch) regardless of table size. The file source
        delivers files in LEXICAL order, not LSN order; MOR is
        inherently safe under that disorder because deletes persist as
        tombstones and readers LWW-resolve on (_lsn, _ts_ms) at scan
        time. Every ``compact_every`` micro-batches a compaction pass
        folds accumulated deltas into base files (read cost bounded
        without putting a table-sized rewrite in EVERY batch), then —
        unless ``expire_keep_last`` is None — retires snapshots beyond
        the ``expire_keep_last`` newest and reclaims their
        now-unreferenced files, so a long-running stream's disk usage
        tracks TABLE size, not stream length.
      "cow" — out-of-order-safe lww_guard rewrite per micro-batch
        (reads stay delta-free at the price of O(touched table) per
        batch — only for small tables or very slow triggers). The
        expiry cadence applies here too: superseded bucket rewrites
        accumulate per batch and must be reclaimed.

    TRUNCATE envelopes: an out-of-order truncate is ill-defined, so
    under the default truncate_policy="apply" a 't' event fails the
    stream loudly (merge_prepared raises); set
    ``truncate_policy="drop"`` on the config to skip them.
    """
    import dataclasses
    import hashlib

    if merge_mode == "mor":
        cfg = dataclasses.replace(cfg, merge_mode="mor", lww_guard=False)
    elif merge_mode == "cow":
        # the file source delivers files in listing order, not LSN
        # order — a COW merge must be the out-of-order-safe variant
        cfg = dataclasses.replace(cfg, merge_mode="cow", lww_guard=True)
    else:
        raise ValueError(f"merge_mode must be 'mor' or 'cow': {merge_mode}")
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
        if compact_every and (int(batch_id) + 1) % compact_every == 0:
            # cadence maintenance, inside foreachBatch so it never
            # races an epoch commit of THIS stream. Compaction folds
            # MOR deltas → base; expiry runs in BOTH merge modes (a
            # cow stream accumulates superseded bucket rewrites just
            # as fast — without it, disk grows with stream LENGTH, not
            # table size; anchored on the current pointer, so safe
            # under the stream's own sequential commits). A concurrent
            # writer on the same table (a batch engine sharing it —
            # stream_log's epoch_key design allows that) surfaces as
            # ConcurrentCommitError: maintenance is best-effort, so
            # swallow it and retry at the next cadence rather than
            # kill the stream (the epoch itself is already committed;
            # only this maintenance pass is lost).
            from plugin_debezium_spark.plans.compact import (
                compact,
                expire_snapshots,
            )
            from plugin_debezium_spark.plans.lake import (
                ConcurrentCommitError,
            )

            try:
                if cfg.merge_mode == "mor":
                    compact(table, min_files_per_bucket=2)
                if expire_keep_last:
                    expire_snapshots(table, keep_last=expire_keep_last)
            except ConcurrentCommitError:
                pass  # lost the race to another writer; next cadence

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
    spark: SparkSession,
    cfg: EngineConfig,
    checkpoint_dir: str,
    merge_mode: str = "mor",
    compact_every: int | None = 64,
    expire_keep_last: int | None = 8,
) -> None:
    """Reference poll-Trigger cadence (§3.2): drain everything
    currently in the log, then stop."""
    q = stream_log(
        spark,
        cfg,
        checkpoint_dir,
        available_now=True,
        merge_mode=merge_mode,
        compact_every=compact_every,
        expire_keep_last=expire_keep_last,
    )
    q.awaitTermination()
