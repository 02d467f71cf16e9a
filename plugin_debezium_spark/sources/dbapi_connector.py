"""Engine-generic trigger-audit CDC capture over any DB-API database.

Round-5 verdict #4: the live capture protocol proven against SQLite
(sources/sqlite_connector.py) is not SQLite-shaped — consistent
snapshot (write-block + audit high-water mark in ONE transaction),
lake-resident offset with atomic pointer swap, deterministic LSN mint
(snapshot rows 0..n-1, audit id a → n_snap + a) so at-least-once
re-delivery is LWW-absorbed. This module extracts that machinery
behind a small ``Dialect`` interface; everything engine-specific is a
handful of SQL-text hooks (trigger DDL, JSON image expression,
autoincrement audit id, snapshot isolation statements).

Reference parity: the six connector property heads
(mysql/Capture.java:74-95, postgres/Capture.java:100-108,
sqlserver/SqlServerInterface.java:35-41, oracle/Capture.java:96-117,
db2/Capture.java:73-90, mongodb/Capture.java:122-146) become six
dialect classes below. ``SqliteDialect`` is the live-tested one (a
real transactional database in-process); the server dialects carry
their engines' real trigger/JSON SQL but ``connect`` raises — no live
servers in this sandbox. Mongo is documented as change-stream-based
(no SQL triggers); its dialect raises from every hook with that
explanation.

Offset safety (ADVICE r5, medium): the snapshot's audit high-water
mark exists ONLY in the offset file — change rows ≤ hwm were folded
into the snapshot, never imported — so a PROVISIONAL offset is written
atomically as soon as the snapshot rows are durably flushed, BEFORE
tailing begins. If the offset file is nonetheless lost, the derive-
from-log fallback refuses to re-snapshot a log that already contains
op='r' rows: with tail rows present it resumes tail-only from the
derived position; with none it raises (the hwm is unknowable, and
re-snapshotting would mint duplicate lsns with divergent content —
violating the log's unique-lsn contract).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from plugin_debezium_spark.models import KEY_COLS


class Dialect:
    """The per-engine surface of trigger-audit capture. Subclasses
    override SQL-text hooks; the capture protocol itself (snapshot
    consistency, offsets, LSN mint, batching) is shared and lives in
    ``install_cdc`` / ``capture_to_log`` below.

    HARD REQUIREMENT (checked per dialect via ``commit_ordered_ids``):
    the snapshot high-water mark (MAX(id) inside the snapshot txn) and
    id-ordered tailing are only sound when audit ids become VISIBLE in
    id order — i.e. the engine serializes writers (SQLite) or the
    audit id is allocated at commit. On MVCC engines with concurrent
    writers a row with id <= hwm can commit AFTER the snapshot read
    (landing in neither snapshot nor tail), and the tail loop can
    permanently skip a lower id that commits after last_audit has
    advanced past it. Such engines need a tail lag window / late-id
    re-scan before the protocol is sound; until a dialect implements
    that and declares ``commit_ordered_ids = True``,
    ``capture_to_log`` refuses it (r6 advice)."""

    name = "generic"
    audit_table = "_cdc_audit"
    placeholder = "?"  # DB-API paramstyle marker (qmark default)
    # see the class docstring: only dialects whose audit ids become
    # visible in id order may run the shared capture protocol
    commit_ordered_ids = False

    # -- connection ----------------------------------------------------
    def connect(self, dsn: str):
        """Return a DB-API connection in autocommit (the capture loop
        issues its own BEGIN/COMMIT for the snapshot)."""
        raise NotImplementedError(
            f"{self.name}: no live server available in this sandbox; "
            "config surface only (sources/connectors.py)"
        )

    # -- identifier / expression SQL ----------------------------------
    def quote(self, ident: str) -> str:
        return f'"{ident}"'

    def autoinc_pk(self) -> str:
        """Column DDL for the audit id: monotone, assigned at insert,
        never reused — commit order IS id order on engines that
        serialize writers; engines with concurrent writers must use a
        sequence that commits in allocation order."""
        return "id INTEGER PRIMARY KEY AUTOINCREMENT"

    def now_ms_expr(self) -> str:
        """SQL expression (usable inside a trigger body) for wall-clock
        epoch milliseconds."""
        raise NotImplementedError

    def json_image(self, rowref: str, cols: tuple[str, ...]) -> str:
        """SQL expression building a JSON object of ``cols`` from the
        trigger row reference (NEW/OLD or the engine's equivalent)."""
        pairs = ", ".join(f"'{c}', {rowref}.{self.quote(c)}" for c in cols)
        return f"json_object({pairs})"

    def trigger_row_refs(self) -> tuple[str, str]:
        """(inserted_ref, deleted_ref) row names inside trigger bodies
        (NEW/OLD almost everywhere; SQLServer uses inserted/deleted)."""
        return "NEW", "OLD"

    # -- DDL -----------------------------------------------------------
    def audit_table_ddl(self, n_keys: int) -> str:
        keys = ", ".join(f"k_{i} TEXT" for i in range(n_keys))
        return (
            f"CREATE TABLE IF NOT EXISTS {self.audit_table} ("
            f"{self.autoinc_pk()}, op TEXT NOT NULL, tbl TEXT NOT NULL, "
            f"{keys}, before_json TEXT, after_json TEXT, "
            f"ts_ms INTEGER NOT NULL)"
        )

    def trigger_ddl(
        self,
        table: str,
        key_cols: tuple[str, ...],
        payload_cols: tuple[str, ...],
    ) -> list[str]:
        """One AFTER trigger per op appending the audit row. The
        default emits the portable row-level form (SQLite/MySQL/
        Postgres-with-plpgsql differ only in header syntax — override
        where needed)."""
        new, old = self.trigger_row_refs()
        knames = ", ".join(f"k_{i}" for i in range(len(key_cols)))
        ts = self.now_ms_expr()
        stmts = []
        for name, when, op, before, after, keysrc in (
            ("ins", "INSERT", "c", "NULL",
             self.json_image(new, payload_cols), new),
            ("upd", "UPDATE", "u", self.json_image(old, payload_cols),
             self.json_image(new, payload_cols), new),
            ("del", "DELETE", "d", self.json_image(old, payload_cols),
             "NULL", old),
        ):
            vals = ", ".join(
                f"{keysrc}.{self.quote(c)}" for c in key_cols
            )
            stmts.append(
                f"CREATE TRIGGER IF NOT EXISTS _cdc_{table}_{name} "
                f"AFTER {when} ON {self.quote(table)} BEGIN "
                f"INSERT INTO {self.audit_table} "
                f"(op, tbl, {knames}, before_json, after_json, ts_ms) "
                f"VALUES ('{op}', '{table}', {vals}, {before}, {after}, "
                f"{ts}); END"
            )
        return stmts

    # -- snapshot isolation ---------------------------------------------
    def begin_snapshot(self, cur) -> None:
        """Enter the consistent-snapshot read: the table image and the
        audit high-water mark MUST come from one atomic point. The
        portable strategy is a write-block (SQLite BEGIN IMMEDIATE);
        MVCC engines use a repeatable-read transaction instead
        (Debezium's 'minimal' locking mode)."""
        raise NotImplementedError

    def end_snapshot(self, cur) -> None:
        cur.execute("COMMIT")


class SqliteDialect(Dialect):
    """The live-tested dialect: SQLite serializes writers, so audit
    AUTOINCREMENT id order IS commit order, and BEGIN IMMEDIATE gives
    the consistent snapshot write-block."""

    name = "sqlite"
    commit_ordered_ids = True  # writers serialize: id order == commit order

    def connect(self, dsn: str):
        import sqlite3

        con = sqlite3.connect(dsn)
        con.isolation_level = None
        return con

    def now_ms_expr(self) -> str:
        return "CAST(strftime('%s','now') AS INTEGER) * 1000"

    def begin_snapshot(self, cur) -> None:
        cur.execute("BEGIN IMMEDIATE")


class MySqlDialect(Dialect):
    """mysql/Capture.java:74-95. Real MySQL trigger/JSON SQL; no live
    server here, so connect() raises (use MySqlConfig for the property
    surface)."""

    name = "mysql"
    placeholder = "%s"  # pymysql/mysqlclient paramstyle

    def quote(self, ident: str) -> str:
        return f"`{ident}`"

    def autoinc_pk(self) -> str:
        return "id BIGINT AUTO_INCREMENT PRIMARY KEY"

    def now_ms_expr(self) -> str:
        return "CAST(UNIX_TIMESTAMP(NOW(3)) * 1000 AS UNSIGNED)"

    def begin_snapshot(self, cur) -> None:
        # Debezium's snapshot.locking.mode=minimal equivalent
        cur.execute("START TRANSACTION WITH CONSISTENT SNAPSHOT")


class PostgresDialect(Dialect):
    """postgres/Capture.java:100-108. Postgres triggers need a plpgsql
    function per table; trigger_ddl emits function + trigger pairs."""

    name = "postgres"
    placeholder = "%s"  # psycopg paramstyle

    def now_ms_expr(self) -> str:
        return "(extract(epoch from clock_timestamp()) * 1000)::bigint"

    def json_image(self, rowref: str, cols: tuple[str, ...]) -> str:
        pairs = ", ".join(f"'{c}', {rowref}.{self.quote(c)}" for c in cols)
        return f"jsonb_build_object({pairs})::text"

    def autoinc_pk(self) -> str:
        return "id BIGSERIAL PRIMARY KEY"

    def trigger_ddl(self, table, key_cols, payload_cols) -> list[str]:
        knames = ", ".join(f"k_{i}" for i in range(len(key_cols)))
        kvals_new = ", ".join(f"NEW.{self.quote(c)}" for c in key_cols)
        kvals_old = ", ".join(f"OLD.{self.quote(c)}" for c in key_cols)
        fn = (
            f"CREATE OR REPLACE FUNCTION _cdc_{table}_fn() RETURNS trigger"
            " AS $$ BEGIN "
            f"IF TG_OP = 'INSERT' THEN INSERT INTO {self.audit_table} "
            f"(op, tbl, {knames}, before_json, after_json, ts_ms) VALUES "
            f"('c', '{table}', {kvals_new}, NULL, "
            f"{self.json_image('NEW', payload_cols)}, {self.now_ms_expr()});"
            f" ELSIF TG_OP = 'UPDATE' THEN INSERT INTO {self.audit_table} "
            f"(op, tbl, {knames}, before_json, after_json, ts_ms) VALUES "
            f"('u', '{table}', {kvals_new}, "
            f"{self.json_image('OLD', payload_cols)}, "
            f"{self.json_image('NEW', payload_cols)}, {self.now_ms_expr()});"
            f" ELSE INSERT INTO {self.audit_table} "
            f"(op, tbl, {knames}, before_json, after_json, ts_ms) VALUES "
            f"('d', '{table}', {kvals_old}, "
            f"{self.json_image('OLD', payload_cols)}, NULL, "
            f"{self.now_ms_expr()}); END IF; RETURN NULL; END $$ "
            "LANGUAGE plpgsql"
        )
        trg = (
            f"CREATE OR REPLACE TRIGGER _cdc_{table}_trg AFTER INSERT OR "
            f"UPDATE OR DELETE ON {self.quote(table)} FOR EACH ROW "
            f"EXECUTE FUNCTION _cdc_{table}_fn()"
        )
        return [fn, trg]

    def begin_snapshot(self, cur) -> None:
        cur.execute("BEGIN ISOLATION LEVEL REPEATABLE READ")


class SqlServerDialect(Dialect):
    """sqlserver/SqlServerInterface.java:35-41. Statement-level
    triggers over the inserted/deleted pseudo-tables."""

    name = "sqlserver"

    def quote(self, ident: str) -> str:
        return f"[{ident}]"

    def autoinc_pk(self) -> str:
        return "id BIGINT IDENTITY(1,1) PRIMARY KEY"

    def now_ms_expr(self) -> str:
        return "DATEDIFF_BIG(millisecond, '1970-01-01', SYSUTCDATETIME())"

    def trigger_row_refs(self) -> tuple[str, str]:
        return "inserted", "deleted"

    def begin_snapshot(self, cur) -> None:
        cur.execute("SET TRANSACTION ISOLATION LEVEL SNAPSHOT")
        cur.execute("BEGIN TRANSACTION")


class OracleDialect(Dialect):
    """oracle/Capture.java:96-117."""

    name = "oracle"

    def autoinc_pk(self) -> str:
        return "id NUMBER GENERATED ALWAYS AS IDENTITY PRIMARY KEY"

    def now_ms_expr(self) -> str:
        return (
            "TRUNC((CAST(SYSTIMESTAMP AT TIME ZONE 'UTC' AS DATE) - "
            "DATE '1970-01-01') * 86400000)"
        )

    def begin_snapshot(self, cur) -> None:
        cur.execute("SET TRANSACTION ISOLATION LEVEL SERIALIZABLE")

    def trigger_row_refs(self) -> tuple[str, str]:
        return ":NEW", ":OLD"


class Db2Dialect(Dialect):
    """db2/Capture.java:73-90."""

    name = "db2"

    def autoinc_pk(self) -> str:
        return (
            "id BIGINT GENERATED ALWAYS AS IDENTITY PRIMARY KEY"
        )

    def now_ms_expr(self) -> str:
        return (
            "BIGINT((DAYS(CURRENT TIMESTAMP - CURRENT TIMEZONE) - "
            "DAYS('1970-01-01')) ) * 86400000 + "
            "MIDNIGHT_SECONDS(CURRENT TIMESTAMP - CURRENT TIMEZONE) * 1000"
        )

    def begin_snapshot(self, cur) -> None:
        cur.execute("SET CURRENT ISOLATION RR")


class MongoDialect(Dialect):
    """mongodb/Capture.java:122-146. Mongo has no SQL triggers; its
    capture path is change streams (capture.mode in MongoConfig), a
    push protocol this trigger-audit machinery cannot host. Every hook
    raises with that explanation so a misconfiguration fails loudly."""

    name = "mongodb"
    _MSG = (
        "mongodb capture is change-stream-based "
        "(mongodb/Capture.java:122-146); the trigger-audit protocol "
        "does not apply — use MongoConfig + debezium_json.import_to_log "
        "over an exported change stream"
    )

    def connect(self, dsn: str):
        raise NotImplementedError(self._MSG)

    def now_ms_expr(self) -> str:
        raise NotImplementedError(self._MSG)

    def trigger_ddl(self, table, key_cols, payload_cols) -> list[str]:
        raise NotImplementedError(self._MSG)

    def begin_snapshot(self, cur) -> None:
        raise NotImplementedError(self._MSG)


DIALECTS = {
    d.name: d
    for d in (
        SqliteDialect(),
        MySqlDialect(),
        PostgresDialect(),
        SqlServerDialect(),
        OracleDialect(),
        Db2Dialect(),
        MongoDialect(),
    )
}


@dataclass
class DbApiSource:
    """One captured table on one database. ``key_cols`` are mapped
    positionally onto the envelope key struct (models.KEY_COLS), so
    their arity must match — validated loudly (ADVICE r5, low)."""

    dialect: Dialect
    dsn: str
    table: str = "repofiles"
    key_cols: tuple[str, ...] = tuple(KEY_COLS)
    payload_cols: tuple[str, ...] = (
        "repo", "path", "commit", "lang", "content",
    )

    def validate(self) -> None:
        if len(self.key_cols) != len(KEY_COLS):
            raise ValueError(
                f"key_cols arity {len(self.key_cols)} != envelope key "
                f"arity {len(KEY_COLS)} ({KEY_COLS}); positional mapping "
                "would silently truncate — configure exactly "
                f"{len(KEY_COLS)} key columns"
            )


def _offset_path(log_dir: str) -> str:
    return os.path.join(log_dir, "_cdc_offset.json")


def _log_offset(spark: SparkSession, log_dir: str) -> tuple[int, int]:
    """(n_snapshot_rows, max_audit_id_consumed): the connector's offset
    store (Debezium offset-storage parity), a JSON checkpoint beside
    the log; (0, -1) = fresh. The snapshot's audit high-water mark
    exists ONLY here — so the file is authoritative, and the derive-
    from-log fallback NEVER re-snapshots a log that already holds
    op='r' rows (ADVICE r5): with tail rows it resumes tail-only from
    the derived position; snapshot-only logs raise (the hwm is
    unknowable and duplicate-lsn re-snapshot would corrupt the log)."""
    try:
        with open(_offset_path(log_dir)) as f:
            o = json.load(f)
        return int(o["n_snap"]), int(o["last_audit"])
    except FileNotFoundError:
        pass
    try:
        df = spark.read.parquet(log_dir)
    except Exception:
        return 0, -1
    row = df.agg(
        F.coalesce(
            F.sum(F.when(F.col("op") == "r", 1).otherwise(0)), F.lit(0)
        ).alias("n_snap"),
        F.max("lsn").alias("mx"),
    ).collect()[0]
    n_snap = int(row["n_snap"])
    mx = row["mx"]
    if mx is None:
        return 0, -1
    last_audit = int(mx) - n_snap
    if n_snap > 0 and last_audit < 0:
        raise RuntimeError(
            f"offset file missing at {_offset_path(log_dir)} and the log "
            "holds only snapshot rows: the snapshot's audit high-water "
            "mark is unrecoverable. Refusing to re-snapshot — that would "
            "mint duplicate lsns with divergent content. Restore the "
            "offset file, or start a fresh log directory."
        )
    return n_snap, last_audit


def _write_offset(log_dir: str, n_snap: int, last_audit: int) -> None:
    """Atomic pointer swap (same crash-safety idiom as plans/lake.py):
    the offset only moves AFTER the rows it covers are durably in the
    log; a crash between log append and offset write re-delivers, and
    the engine's LWW dedupe absorbs the replay (at-least-once capture,
    exactly-once apply)."""
    os.makedirs(log_dir, exist_ok=True)
    tmp = _offset_path(log_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"n_snap": n_snap, "last_audit": last_audit}, f)
    os.replace(tmp, _offset_path(log_dir))


def install_cdc(src: DbApiSource) -> None:
    """Create the audit table + triggers (idempotent). ts is wall-clock
    ms; ordering authority is the audit id."""
    src.validate()
    d = src.dialect
    con = d.connect(src.dsn)
    try:
        cur = con.cursor()
        cur.execute(d.audit_table_ddl(len(src.key_cols)))
        for stmt in d.trigger_ddl(src.table, src.key_cols, src.payload_cols):
            cur.execute(stmt)
        con.commit()
    finally:
        con.close()


def capture_to_log(
    spark: SparkSession,
    src: DbApiSource,
    log_dir: str,
    bucket_size: int = 100_000,
    fetch_batch: int = 100_000,
    snapshot_mode: str = "INITIAL",
) -> dict:
    """Snapshot (first call) + tail the audit log into the envelope log
    at ``log_dir``. Resumes from the log's own offset. Returns capture
    counters.

    Scale shape, honestly: extraction is driver-side batched reads —
    inherently single-process, exactly like the reference's embedded
    engine (AbstractDebeziumTask.java: ONE in-process consumer pulling
    into a queue). Distribution starts at the emitted bucket-
    partitioned log; everything downstream is the distributed engine."""
    src.validate()
    d = src.dialect
    if not d.commit_ordered_ids:
        raise NotImplementedError(
            f"{d.name}: audit ids are not known to become visible in "
            "id order under concurrent writers — the snapshot hwm and "
            "id-ordered tail would silently skip late-committing rows. "
            "Implement a tail lag window / late-id re-scan for this "
            "engine and declare commit_ordered_ids=True (Dialect "
            "docstring)."
        )
    n_snap, last_audit = _log_offset(spark, log_dir)
    con = d.connect(src.dsn)
    kc, pc = src.key_cols, src.payload_cols
    out_rows: list[tuple] = []
    stats = {"snapshot_rows": 0, "change_rows": 0}

    if len(src.key_cols) != len(KEY_COLS):
        # flat out_rows tuples map key values positionally onto the
        # envelope key struct — the arity check the old dict zip
        # (strict=True) used to do per row happens once up front
        raise ValueError(
            f"key_cols arity {len(src.key_cols)} != envelope key "
            f"arity {len(KEY_COLS)}"
        )

    def _flush(force: bool = False) -> None:
        nonlocal out_rows
        if out_rows and (force or len(out_rows) >= fetch_batch):
            # Arrow ingest path: rows cross to the JVM as columnar
            # batches via pandas instead of 11-field pickled tuples
            # (the struct fields are assembled JVM-side) — measured
            # ~2s faster per 100k-row flush (r07). The emitted frame
            # is value-identical to the previous
            # createDataFrame(out_rows, envelope_log_schema()).
            import pandas as pd

            from plugin_debezium_spark.models import TRANSACTION_SCHEMA

            pdf = pd.DataFrame(
                out_rows,
                columns=[
                    "lsn",
                    "ts_ms",
                    "op",
                    *(f"_k{i}" for i in range(len(KEY_COLS))),
                    "before_json",
                    "after_json",
                    "_snapshot",
                    "lsn_bucket",
                ],
            )
            flat = spark.createDataFrame(pdf)
            null_s = F.lit(None).cast("string")
            df = flat.select(
                F.col("lsn").cast("long").alias("lsn"),
                F.col("ts_ms").cast("long").alias("ts_ms"),
                F.col("op").cast("string").alias("op"),
                F.struct(
                    *[
                        F.col(f"_k{i}").cast("string").alias(k)
                        for i, k in enumerate(KEY_COLS)
                    ]
                ).alias("key"),
                F.col("before_json").cast("string").alias("before_json"),
                F.col("after_json").cast("string").alias("after_json"),
                F.struct(
                    F.lit(d.name).alias("db"),
                    F.lit(src.table).alias("table"),
                    F.col("_snapshot").cast("string").alias("snapshot"),
                    F.lit(d.name).alias("connector"),
                    null_s.alias("name"),
                    null_s.alias("version"),
                    null_s.alias("sequence"),
                    F.lit(None).cast("int").alias("row"),
                ).alias("source"),
                F.lit(None).cast(TRANSACTION_SCHEMA).alias("transaction"),
                null_s.alias("message_json"),
                F.lit(None).cast("long").alias("epoch_hint"),
                F.col("lsn_bucket").cast("long").alias("lsn_bucket"),
            )
            (
                df.repartition(1, "lsn_bucket")
                .sortWithinPartitions("lsn")
                .write.mode("append")
                .partitionBy("lsn_bucket")
                .parquet(log_dir)
            )
            out_rows = []

    try:
        cur = con.cursor()
        fresh = last_audit < 0
        if fresh and snapshot_mode == "INITIAL":
            # consistent snapshot: table image + audit high-water mark
            # from ONE atomic point (Debezium's snapshot contract)
            d.begin_snapshot(cur)
            cur.execute(f"SELECT COALESCE(MAX(id), 0) FROM {d.audit_table}")
            hwm = cur.fetchone()[0]
            sel = ", ".join(d.quote(c) for c in pc)
            keysel = ", ".join(d.quote(c) for c in kc)
            now_ms = int(time.time() * 1000)
            lsn = 0
            cur.execute(
                f"SELECT {keysel}, {sel} FROM {d.quote(src.table)} "
                f"ORDER BY {keysel}"
            )
            while True:
                batch = cur.fetchmany(fetch_batch)
                if not batch:
                    break
                for r in batch:
                    kvals, pvals = r[: len(kc)], r[len(kc):]
                    out_rows.append(
                        (
                            lsn,
                            now_ms,
                            "r",
                            *kvals,
                            None,
                            json.dumps(dict(zip(pc, pvals))),
                            "true",
                            lsn // bucket_size,
                        )
                    )
                    lsn += 1
                    stats["snapshot_rows"] += 1
                _flush()
            d.end_snapshot(cur)
            n_snap, last_audit = lsn, hwm
            # PROVISIONAL offset (ADVICE r5, medium): the snapshot rows
            # and their high-water mark become durable together, BEFORE
            # tailing — a crash past this point resumes tail-only
            # instead of re-running a full snapshot over a now-changed
            # table (which would mint duplicate lsns with divergent
            # content).
            _flush(force=True)
            _write_offset(log_dir, n_snap, last_audit)
        elif fresh:
            n_snap, last_audit = 0, 0

        # tail: audit rows past the offset (plain reads; writers keep
        # committing — each batch sees a consistent prefix)
        keycols = ", ".join(f"k_{i}" for i in range(len(kc)))
        while True:
            ph = d.placeholder
            cur.execute(
                f"SELECT id, op, {keycols}, before_json, after_json, ts_ms "
                f"FROM {d.audit_table} WHERE id > {ph} "
                f"ORDER BY id LIMIT {ph}",
                (last_audit, fetch_batch),
            )
            rows = cur.fetchall()
            if not rows:
                break
            for r in rows:
                aid, op = int(r[0]), r[1]
                kvals = r[2 : 2 + len(kc)]
                before, after, ts_ms = r[2 + len(kc):]
                lsn = n_snap + aid
                out_rows.append(
                    (
                        lsn,
                        int(ts_ms),
                        op,
                        *kvals,
                        before,
                        after,
                        "false",
                        lsn // bucket_size,
                    )
                )
                stats["change_rows"] += 1
            last_audit = int(rows[-1][0])
            _flush()
        _flush(force=True)
        _write_offset(log_dir, n_snap, last_audit)
    finally:
        con.close()
    stats["last_audit_id"] = last_audit
    return stats
