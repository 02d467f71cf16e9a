"""Custom stateful Structured Streaming operators.

The batch engine replays epochs with exactly-once commits; these are
the stream-native counterparts for long-running topologies:

- ``lww_state_stream``: per-key LWW state that SURVIVES across
  micro-batches (``applyInPandasWithState``) — turns a raw change
  stream into a stream of *current-state improvements* (a row is
  emitted only when a key's winning LSN advances). The batch engine's
  per-epoch dedupe cannot see across epochs without reading the table;
  this operator holds the winning LSN in Spark's state store
  (RocksDB/HDFS-checkpointed on a cluster), the same role the
  reference's in-flight offset map plays in-process
  (AbstractDebeziumTask.java:528-530) but partitioned by key and
  fault-tolerant via checkpoints.
- ``windowed_stream_counts``: event-time windowed per-stream counters
  with a watermark, the streaming-native form of operators/metrics.py
  — late events beyond the watermark are dropped, windows finalize
  (append mode) once the watermark passes their end.

State scale: the LWW state is one LONG per live key — 10^9 keys ≈
8 GB across the cluster's state stores, far below the payloads the
table holds; the emitted stream is winner-only so downstream sinks see
the same key-sized traffic the two-pass dedupe achieves in batch.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from plugin_debezium_spark.models import KEY_COLS, OP_DELETE


def lww_state_stream(
    events: DataFrame, key_cols: tuple[str, ...] = KEY_COLS
) -> DataFrame:
    """Envelope stream → stream of per-key LWW improvements.

    Emits (key, lsn, ts_ms, op, after_json) whenever a key's max LSN
    advances; stale/duplicate deliveries (lower or equal LSN than the
    stored winner) emit nothing — cross-batch, unlike per-batch
    dedupe. Works on out-of-order streams by construction (state keeps
    the max). Use outputMode("update")."""
    flat = events.select(
        *[F.col(f"key.{k}").alias(k) for k in key_cols],
        "lsn",
        "ts_ms",
        "op",
        "after_json",
    )
    out_schema = T.StructType(
        [T.StructField(k, T.StringType()) for k in key_cols]
        + [
            T.StructField("lsn", T.LongType()),
            T.StructField("ts_ms", T.LongType()),
            T.StructField("op", T.StringType()),
            T.StructField("after_json", T.StringType()),
        ]
    )
    state_schema = T.StructType([T.StructField("lsn", T.LongType())])

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        cur = state.get[0] if state.exists else None
        best = None
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            row = pdf.loc[pdf["lsn"].idxmax()]
            if best is None or int(row["lsn"]) > int(best["lsn"]):
                best = row
        if best is not None and (cur is None or int(best["lsn"]) > cur):
            state.update((int(best["lsn"]),))
            yield pd.DataFrame(
                [
                    {
                        **{k: key[i] for i, k in enumerate(key_cols)},
                        "lsn": int(best["lsn"]),
                        "ts_ms": int(best["ts_ms"]),
                        "op": best["op"],
                        "after_json": best["after_json"],
                    }
                ]
            )

    return flat.groupBy(*key_cols).applyInPandasWithState(
        update,
        out_schema,
        state_schema,
        "update",
        GroupStateTimeout.NoTimeout,
    )


def windowed_stream_counts(
    events: DataFrame,
    window_duration: str = "10 seconds",
    watermark_delay: str = "5 seconds",
) -> DataFrame:
    """Event-time windowed per-stream counters with late-data cutoff.

    Watermark = max(event time) − delay. In append mode a window emits
    exactly once, in the first batch whose watermark passed its end
    (eviction runs AFTER that batch's input merges — a late row landing
    in the same batch still counts; one landing after finalization is
    dropped and the window is never re-emitted). That exactly-once
    window contract is what a downstream metrics sink wants."""
    ts = events.withColumn(
        "_event_time", F.timestamp_millis(F.col("ts_ms"))
    )
    return (
        ts.withWatermark("_event_time", watermark_delay)
        .groupBy(
            F.window("_event_time", window_duration).alias("win"),
            F.col("source.db").alias("db"),
            F.col("source.table").alias("table"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(
                F.when(F.col("op") == OP_DELETE, 1).otherwise(0)
            ).alias("n_deletes"),
        )
    )


def seen_once_stream(
    docs: DataFrame,
    key_col: str,
    order_col: str,
) -> DataFrame:
    """Streaming first-occurrence dedup: emit each ``key_col`` value's
    first arrival, suppress every later duplicate — the stream-native
    form of operators/neardup.exact_dedup, for ingest-time dedup of a
    training corpus (a crawler re-delivering the same page, a CDC
    stream re-inserting identical content) without ever re-reading the
    accumulated corpus.

    Semantics: within the micro-batch where a key is first seen, ties
    resolve to min ``order_col`` (deterministic when ``order_col`` is
    unique per key — pass a row id); once a key's row is
    committed, later batches never replace it — first-arrival wins, by
    design (state is one boolean per key, not a comparator; use
    ``lww_state_stream`` when late rows must win).

    Input must be flat (no nested structs) — compute the key upstream,
    e.g. ``docs.withColumn("content_sha", F.sha2("text", 256))``.
    Output schema == input schema. State scale: one boolean per
    distinct key in Spark's state store (RocksDB on a cluster), the
    same footprint class as lww_state_stream; the emitted stream is
    distinct-keys-only. Use outputMode("update") or append.
    """
    out_schema = docs.schema
    state_schema = T.StructType([T.StructField("seen", T.BooleanType())])

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if state.exists:
            return
        best = None
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            cand = pdf.loc[[pdf[order_col].idxmin()]]
            if (
                best is None
                or cand.iloc[0][order_col] < best.iloc[0][order_col]
            ):
                best = cand
        if best is not None:
            state.update((True,))
            yield best

    return docs.groupBy(key_col).applyInPandasWithState(
        update,
        out_schema,
        state_schema,
        "update",
        GroupStateTimeout.NoTimeout,
    )
