"""Live CDC capture from a real database: SQLite + audit triggers.

The reference's six connectors (S4) wrap Debezium's embedded engine
around live servers this sandbox cannot run — EXCEPT one: SQLite is a
real, transactional SQL database available in-process. This module
implements genuine end-to-end CDC against it using the classic
trigger-audit pattern (how CDC was done before binlog decoders, and
how Debezium's own "incubating" connectors for triggerless-less stores
work): AFTER INSERT/UPDATE/DELETE triggers append (op, key,
before/after JSON images, ts) to an ``_cdc_audit`` table whose
AUTOINCREMENT id is the commit-ordered change position (SQLite
serializes writers, so audit id order IS commit order).

Capture protocol (Debezium's consistent-snapshot contract,
AbstractDebeziumTask parity):

1. ``install_cdc`` creates the audit table + triggers (idempotent).
2. First ``capture_to_log`` opens ``BEGIN IMMEDIATE`` (write-locks the
   db), reads the snapshot SELECT and the audit high-water mark M in
   the SAME transaction — every change ≤ M is inside the snapshot,
   every change > M is not — then emits snapshot rows as op='r'
   envelopes and tails audit rows > M.
3. Later calls resume from the offset stored in the log itself
   (max audit id already imported) — the same lake-resident-checkpoint
   rule the engine's WHEN_NEEDED mode uses.

LSN minting keeps the log contract (unique, total-ordered): snapshot
rows take lsn 0..n-1, audit id a takes lsn = n_snapshot + a (audit ids
are 1-based and never reused).

Scale shape, honestly: extraction is driver-side batched reads
(``fetch_batch`` rows per round trip) — inherently single-process,
exactly like the reference, whose Debezium embedded engine is ONE
in-process consumer per task (AbstractDebeziumTask.java: the engine
pulls into an in-memory queue). Distribution starts where it does in
the reference too: the emitted log is bucket-partitioned parquet and
everything downstream (dedupe, merge, evolution) is the distributed
engine. Reference parity: io.kestra.plugin.debezium.AbstractDebeziumTask
(capture loop), mysql/Capture.java:74-95 (connector config head).
"""

from __future__ import annotations

import json
import os
import sqlite3
import time
from dataclasses import dataclass

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from plugin_debezium_spark.models import envelope_log_schema

AUDIT_TABLE = "_cdc_audit"


@dataclass
class SqliteSource:
    """One captured table: the north-rule shape by default."""

    db_path: str
    table: str = "repofiles"
    key_cols: tuple[str, ...] = ("repo", "path", "commit")
    payload_cols: tuple[str, ...] = ("repo", "path", "commit", "lang", "content")


def _q(col: str) -> str:
    return f'"{col}"'


def _image(prefix: str, cols: tuple[str, ...]) -> str:
    pairs = ", ".join(f"'{c}', {prefix}.{_q(c)}" for c in cols)
    return f"json_object({pairs})"


def install_cdc(src: SqliteSource) -> None:
    """Create the audit table + one trigger per op (idempotent).
    ts is wall-clock ms; ordering authority is the audit id."""
    con = sqlite3.connect(src.db_path)
    try:
        keys = ", ".join(f"k_{i} TEXT" for i in range(len(src.key_cols)))
        con.execute(
            f"""CREATE TABLE IF NOT EXISTS {AUDIT_TABLE} (
                id INTEGER PRIMARY KEY AUTOINCREMENT,
                op TEXT NOT NULL, tbl TEXT NOT NULL, {keys},
                before_json TEXT, after_json TEXT, ts_ms INTEGER NOT NULL)"""
        )
        t, kc, pc = src.table, src.key_cols, src.payload_cols
        knames = ", ".join(f"k_{i}" for i in range(len(kc)))
        ts = "CAST(strftime('%s','now') AS INTEGER) * 1000"

        def _vals(prefix: str) -> str:
            return ", ".join(f"{prefix}.{_q(c)}" for c in kc)

        for name, when, op, before, after, keysrc in (
            ("ins", "INSERT", "c", "NULL", _image("NEW", pc), "NEW"),
            ("upd", "UPDATE", "u", _image("OLD", pc), _image("NEW", pc), "NEW"),
            ("del", "DELETE", "d", _image("OLD", pc), "NULL", "OLD"),
        ):
            con.execute(
                f"""CREATE TRIGGER IF NOT EXISTS _cdc_{t}_{name}
                    AFTER {when} ON {_q(t)} BEGIN
                      INSERT INTO {AUDIT_TABLE}
                        (op, tbl, {knames}, before_json, after_json, ts_ms)
                      VALUES ('{op}', '{t}', {_vals(keysrc)},
                              {before}, {after}, {ts});
                    END"""
            )
        con.commit()
    finally:
        con.close()


def _offset_path(log_dir: str) -> str:
    return os.path.join(log_dir, "_cdc_offset.json")


def _log_offset(spark: SparkSession, log_dir: str) -> tuple[int, int]:
    """(n_snapshot_rows, max_audit_id_consumed): the connector's
    offset store (Debezium offset-storage parity —
    AbstractDebeziumTask's offset file), a JSON checkpoint living
    beside the log. Falls back to deriving from the log itself for
    logs written before the offset file existed; (0, -1) = fresh.
    The snapshot's audit high-water mark exists ONLY here — change
    rows it covers were folded into the snapshot, never imported —
    so the file, not the log scan, is authoritative."""
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
    return n_snap, (-1 if mx is None else int(mx) - n_snap)


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


def capture_to_log(
    spark: SparkSession,
    src: SqliteSource,
    log_dir: str,
    bucket_size: int = 100_000,
    fetch_batch: int = 100_000,
    snapshot_mode: str = "INITIAL",
) -> dict:
    """Snapshot (first call) + tail the audit log into the envelope
    log at ``log_dir``. Resumes from the log's own offset. Returns
    capture counters."""
    n_snap, last_audit = _log_offset(spark, log_dir)
    con = sqlite3.connect(src.db_path)
    con.isolation_level = None
    kc, pc = src.key_cols, src.payload_cols
    out_rows: list[tuple] = []
    stats = {"snapshot_rows": 0, "change_rows": 0}

    def _key(vals) -> dict:
        return {k: vals[i] for i, k in enumerate(("repo", "path", "commit"))}

    def _source(snapshot: str) -> dict:
        return {
            "db": "sqlite",
            "table": src.table,
            "snapshot": snapshot,
            "connector": "sqlite",
        }

    def _flush(force: bool = False) -> None:
        nonlocal out_rows
        if out_rows and (force or len(out_rows) >= fetch_batch):
            df = spark.createDataFrame(out_rows, envelope_log_schema())
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
            # consistent snapshot: write-lock, read table + high-water
            # mark in ONE transaction (Debezium's snapshot contract)
            cur.execute("BEGIN IMMEDIATE")
            hwm = cur.execute(
                f"SELECT COALESCE(MAX(id), 0) FROM {AUDIT_TABLE}"
            ).fetchone()[0]
            sel = ", ".join(_q(c) for c in pc)
            keysel = ", ".join(_q(c) for c in kc)
            now_ms = int(time.time() * 1000)
            lsn = 0
            cur.execute(
                f"SELECT {keysel}, {sel} FROM {_q(src.table)} "
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
                            _key(kvals),
                            None,
                            json.dumps(dict(zip(pc, pvals))),
                            _source("true"),
                            None,
                            None,
                            None,
                            lsn // bucket_size,
                        )
                    )
                    lsn += 1
                    stats["snapshot_rows"] += 1
                _flush()
            cur.execute("COMMIT")
            n_snap, last_audit = lsn, hwm
        elif fresh:
            n_snap, last_audit = 0, 0

        # tail: audit rows past the offset (plain reads; writers keep
        # committing — each batch sees a consistent prefix)
        keycols = ", ".join(f"k_{i}" for i in range(len(kc)))
        while True:
            rows = con.execute(
                f"SELECT id, op, {keycols}, before_json, after_json, ts_ms "
                f"FROM {AUDIT_TABLE} WHERE id > ? ORDER BY id LIMIT ?",
                (last_audit, fetch_batch),
            ).fetchall()
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
                        _key(kvals),
                        before,
                        after,
                        _source("false"),
                        None,
                        None,
                        None,
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
